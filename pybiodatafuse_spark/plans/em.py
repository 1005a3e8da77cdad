"""EM-style edge-type transition-matrix training (SURVEY.md G8).

Reference (``algorithms/DREAMwalk/generate_embeddings.py:96-188``): sample 1%
of edges, run typed walks, update a K×K edge-type transition matrix, stop when
the mean L1 matrix delta < tol — all driver-side, process-parallel via parmap.

Spark restatement keeping the iterative skeleton (sample → distributed
aggregate → small driver-side M-step → L1 convergence):
- E-step (distributed): on a deterministic hash-sample of edges, count
  observed type-adjacent transitions (e1.dst = e2.src) weighted by the
  current matrix — one join + one groupBy per iteration;
- M-step (driver): row-normalize the K×K count matrix and blend with the
  previous estimate (the matrix is tiny; keeping it on the driver is the
  right distribution boundary, exactly like the reference);
- convergence: sum |M_new − M_old| < tol (the reference's A10 accumulator).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pybiodatafuse_spark.functions.text import hash64


def train_transition_matrix(
    spark: SparkSession,
    edges: DataFrame,
    num_etypes: int,
    *,
    sample_mod: int = 100,
    max_iter: int = 20,
    tol: float = 1e-3,
    blend: float = 0.5,
) -> tuple[np.ndarray, list[float]]:
    """Returns (matrix KxK row-stochastic, per-iteration L1 deltas)."""
    K = num_etypes
    M = np.full((K, K), 1.0 / K)
    e1 = edges.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), F.col("etype").alias("t1")
    )
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"), F.col("etype").alias("t2"))
    adj = e1.join(e2, "b").select("t1", "t2", "a", "c").persist()
    deltas: list[float] = []
    for it in range(1, max_iter + 1):
        sampled = adj.where(
            F.pmod(
                hash64(
                    F.concat_ws("#", F.col("a").cast("string"), F.col("c").cast("string"), F.lit(str(it)))
                ),
                F.lit(sample_mod),
            )
            == 0
        )
        counts = {
            (r["t1"], r["t2"]): r["n"]
            for r in sampled.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        C = np.zeros((K, K))
        for (i, j), n in counts.items():
            C[int(i) % K, int(j) % K] += n
        # weight observed counts by current matrix (EM-ish responsibility)
        W = C * M
        row_sums = W.sum(axis=1, keepdims=True)
        W = np.divide(W, row_sums, out=np.full_like(W, 1.0 / K), where=row_sums > 0)
        new_M = blend * M + (1 - blend) * W
        delta = float(np.abs(new_M - M).sum())
        deltas.append(delta)
        M = new_M
        if delta < tol:
            break
    adj.unpersist()
    return M, deltas
