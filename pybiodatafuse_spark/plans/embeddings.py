"""Skip-gram (SGNS) node embeddings over random walks (SURVEY.md §2.8 G9).

Reference: DREAMwalk shells out to a pthreaded C++ word2vec
(`algorithms/DREAMwalk/HeterogeneousSG.py:86-93`,
`HeterogeneousSG.cpp:502-511`) over a text corpus of walks. SURVEY's Spark
mapping — "distribute walks, per-partition training" — is implemented here
directly:

- walks are hash-partitioned by walk_id and SORTED within partition, so
  training is deterministic for a fixed partition count;
- each epoch (a superstep): the current embedding matrix is broadcast, every
  partition runs sequential SGNS over its walks on a local numpy copy
  (window context, k hash-seeded negative samples per positive — the
  negatives depend only on (walk_id, position, j), not on RNG state), and
  emits per-vertex delta sums;
- deltas are averaged per vertex (`groupBy(id)` — map-side combinable) and
  applied driver-side to the small dense matrix, which is re-broadcast.

This is synchronous data-parallel SGD (parameter averaging). At 10^12-vertex
scale the matrix itself shards (parameter server / sharded broadcast joins);
the walk-side structure — partition-local training, one averaging shuffle of
O(V·dim) per epoch — is unchanged.

Initialization is word2vec-style uniform in [-0.5/dim, 0.5/dim), seeded by
splitmix64(vertex_id, dim_index) — partition-independent and reproducible.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (np.asarray(x, dtype=np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & _MASK
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
        return z ^ (z >> np.uint64(31))


def _u01(x: np.ndarray, slot: int, seed: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        mixed = _splitmix64(
            np.asarray(x, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ np.uint64((slot * 0xC2B2AE3D27D4EB4F + seed) & 0xFFFFFFFFFFFFFFFF)
        )
    return (mixed >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def init_vectors(ids: np.ndarray, dim: int, seed: int = 42) -> np.ndarray:
    """word2vec-style init: uniform [-0.5/dim, 0.5/dim) per (id, j)."""
    out = np.empty((len(ids), dim), dtype=np.float64)
    for j in range(dim):
        out[:, j] = (_u01(ids, j, seed) - 0.5) / dim
    return out


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -30.0, 30.0)))


def skipgram_embeddings(
    spark: SparkSession,
    walks: DataFrame,
    *,
    dim: int = 32,
    epochs: int = 3,
    window: int = 2,
    negatives: int = 3,
    lr: float = 0.025,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """walks(walk_id, path array<long>) → (id: long, vector: array<double>).

    Deterministic for fixed (partitions, hyperparameters): walks sort by
    walk_id within hash partitions; negative sample j for the pair at
    (walk_id, pos) is vocab[floor(u01(walk_id*P+pos, j) * V)].
    """
    part = partitions or spark.sparkContext.defaultParallelism
    vocab_rows = (
        walks.select(F.explode("path").alias("id")).distinct().orderBy("id").collect()
    )
    vocab = np.array([r["id"] for r in vocab_rows], dtype=np.int64)
    v_index = {int(v): i for i, v in enumerate(vocab)}
    V = len(vocab)
    if V == 0:
        raise ValueError("skipgram_embeddings: empty walk corpus")
    emb = init_vectors(vocab, dim, seed)  # input vectors
    ctx = np.zeros((V, dim), dtype=np.float64)  # output (context) vectors

    walks_p = (
        walks.select("walk_id", "path")
        .repartition(part, "walk_id")
        .persist()
    )
    walks_p.count()

    for _epoch in range(epochs):
        b_emb = spark.sparkContext.broadcast(emb)
        b_ctx = spark.sparkContext.broadcast(ctx)
        b_vocab = spark.sparkContext.broadcast(vocab)
        b_index = spark.sparkContext.broadcast(v_index)

        def train(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            W = b_emb.value.copy()
            C = b_ctx.value.copy()
            voc = b_vocab.value
            idx = b_index.value
            nV = len(voc)
            touched = np.zeros(nV, dtype=bool)
            rows = []
            for pdf in batches:
                if pdf.empty:
                    continue
                pdf = pdf.sort_values("walk_id", kind="mergesort")
                for wid, path in zip(pdf["walk_id"], pdf["path"]):
                    p = [idx[int(x)] for x in path]
                    for pos, center in enumerate(p):
                        lo = max(0, pos - window)
                        hi = min(len(p), pos + window + 1)
                        for cpos in range(lo, hi):
                            if cpos == pos:
                                continue
                            target = p[cpos]
                            # positive update
                            g = (1.0 - _sigmoid(W[center] @ C[target])) * lr
                            C[target] += g * W[center]
                            W[center] += g * C[target]
                            touched[center] = touched[target] = True
                            # hash-seeded negatives
                            key = np.int64(wid) * np.int64(1_000_003) + np.int64(
                                pos * (hi - lo) + cpos
                            )
                            for j in range(negatives):
                                u = _u01(np.array([key]), j, 7)[0]
                                neg = int(u * nV)
                                if neg == target:
                                    continue
                                gn = -_sigmoid(W[center] @ C[neg]) * lr
                                C[neg] += gn * W[center]
                                W[center] += gn * C[neg]
                                touched[neg] = True
                for i in np.nonzero(touched)[0]:
                    rows.append(
                        {
                            "id": int(voc[i]),
                            "d_emb": (W[i] - b_emb.value[i]).tolist(),
                            "d_ctx": (C[i] - b_ctx.value[i]).tolist(),
                            "cnt": 1,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["id", "d_emb", "d_ctx", "cnt"]
            ) if rows else pd.DataFrame(
                {"id": pd.Series(dtype="int64"), "d_emb": [], "d_ctx": [], "cnt": pd.Series(dtype="int64")}
            )

        deltas = (
            walks_p.mapInPandas(
                train,
                schema="id long, d_emb array<double>, d_ctx array<double>, cnt int",
            )
            .groupBy("id")
            .agg(
                F.array(*[
                    F.avg(F.element_at("d_emb", i + 1)) for i in range(dim)
                ]).alias("d_emb"),
                F.array(*[
                    F.avg(F.element_at("d_ctx", i + 1)) for i in range(dim)
                ]).alias("d_ctx"),
            )
            .collect()
        )
        for r in deltas:
            i = v_index[r["id"]]
            emb[i] += np.asarray(r["d_emb"])
            ctx[i] += np.asarray(r["d_ctx"])
        for b in (b_emb, b_ctx, b_vocab, b_index):
            b.unpersist()

    walks_p.unpersist()
    out = [(int(v), emb[i].tolist()) for i, v in enumerate(vocab)]
    return spark.createDataFrame(out, "id long, vector array<double>")
