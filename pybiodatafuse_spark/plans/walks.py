"""Distributed weighted random walks (SURVEY.md G7 — the reference's
DREAMwalk traversal, ``generate_embeddings.py:191-263``, is a driver-side
networkx loop with per-process RNG; neither distributed nor reproducible).

Spark-first restatement:
- adjacency prepared ONCE per run: per-src neighbor array sorted by dst with
  a normalized cumulative-weight array (the sampling CDF);
- each superstep advances EVERY walk one hop via a frontier ⋈ adjacency join;
- randomness is hash-based — ``u = hash64(f"{walk_id}#{step}") / 2^60`` — so
  walks are deterministic, partition-independent, and exactly reproducible by
  the pure-Python oracle (tests/test_walks.py);
- the entire hop (CDF inversion included) is built-in expressions
  (filter/size/element_at), no Python in the loop.

Walks stop early at dangling vertices (no teleport by default).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pybiodatafuse_spark.functions.text import hash64

_HASH_SPACE = float(1 << 60)


def _adjacency_with_cdf(edges: DataFrame) -> DataFrame:
    """(src, dsts array<long>, cdf array<double>) — neighbors sorted by dst,
    cdf normalized to end at 1.0."""
    pairs = edges.groupBy("src").agg(
        F.array_sort(F.collect_list(F.struct("dst", "weight"))).alias("nbrs")
    )
    cum = F.aggregate(
        F.col("nbrs"),
        F.array().cast("array<double>"),
        lambda acc, x: F.concat(
            acc,
            F.array(F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0.0)) + x["weight"]),
        ),
    )
    return pairs.select(
        "src",
        F.transform(F.col("nbrs"), lambda x: x["dst"]).alias("dsts"),
        F.transform(cum, lambda c: c / F.element_at(cum, -1)).alias("cdf"),
    )


def random_walks(
    spark: SparkSession,
    edges: DataFrame,
    start_vertices: DataFrame,
    *,
    num_walks: int = 1,
    walk_length: int = 10,
) -> DataFrame:
    """Returns (walk_id, start, path array<long>) with path[0] = start.

    walk_id = start_id * num_walks + w (deterministic); u for step k of a
    walk depends only on (walk_id, k).
    """
    adj = _adjacency_with_cdf(edges).persist(StorageLevel.MEMORY_AND_DISK)
    adj.count()
    frontier = (
        start_vertices.select(F.col("id").alias("start"))
        .crossJoin(spark.range(num_walks).select(F.col("id").alias("w")))
        .select(
            (F.col("start") * num_walks + F.col("w")).alias("walk_id"),
            F.col("start"),
            F.col("start").alias("cur"),
            F.array(F.col("start")).alias("path"),
            F.lit(False).alias("done"),
        )
        .localCheckpoint(eager=True)
    )
    for step in range(1, walk_length + 1):
        u = (
            hash64(F.concat_ws("#", F.col("walk_id").cast("string"), F.lit(str(step))))
            / F.lit(_HASH_SPACE)
        )
        moved = (
            frontier.where(~F.col("done"))
            .join(adj, F.col("cur") == adj["src"], "left")
            .select(
                "walk_id",
                "start",
                F.col("dsts").isNull().alias("now_done"),
                F.when(
                    F.col("dsts").isNull(), F.col("cur")
                ).otherwise(
                    F.element_at(
                        "dsts",
                        (F.size(F.filter("cdf", lambda c: c < u)) + 1).cast("int"),
                    )
                ).alias("nxt"),
                "path",
            )
            .select(
                "walk_id",
                "start",
                F.col("nxt").alias("cur"),
                F.when(F.col("now_done"), F.col("path")).otherwise(
                    F.concat("path", F.array("nxt"))
                ).alias("path"),
                F.col("now_done").alias("done"),
            )
        )
        frontier = (
            moved.unionByName(frontier.where(F.col("done")))
            .localCheckpoint(eager=True)
        )
    adj.unpersist()
    return frontier.select("walk_id", "start", "path")


def _typed_adjacency(edges: DataFrame) -> DataFrame:
    """(src, dsts, ws, ets) aligned neighbor arrays sorted by (dst, weight,
    etype) — the biased walk computes its CDF per step (it depends on the
    previous edge type), so raw weights are kept, not a precomputed CDF."""
    pairs = edges.groupBy("src").agg(
        F.array_sort(F.collect_list(F.struct("dst", "weight", "etype"))).alias("nbrs")
    )
    return pairs.select(
        "src",
        F.transform("nbrs", lambda x: x["dst"]).alias("dsts"),
        F.transform("nbrs", lambda x: x["weight"]).alias("ws"),
        F.transform("nbrs", lambda x: x["etype"]).alias("ets"),
    )


def biased_random_walks(
    spark: SparkSession,
    edges: DataFrame,
    start_vertices: DataFrame,
    transition_matrix: list[list[float]],
    *,
    num_walks: int = 1,
    walk_length: int = 10,
    teleport: float = 0.0,
    teleport_targets: list[int] | None = None,
) -> DataFrame:
    """Edge-type-biased walks with teleport — the reference's DREAMwalk
    traversal (``generate_embeddings.py:191-231`` biased transition by the
    EM-trained K×K edge-type matrix, ``:234-263`` teleport jump), made
    distributed + deterministic.

    Semantics per step (walk at ``cur`` arrived via edge type ``pet``;
    ``pet = -1`` before the first hop and after a teleport):
    - with probability ``teleport`` (decided by ``u_tp = h(walk_id#step#tp)``)
      jump to ``teleport_targets[floor(u_tp/teleport × T)]`` — the reference
      teleports to a random node of a *different node type*; the caller
      passes that candidate set (any deterministic list);
    - else choose neighbor i ∝ ``weight_i × M[pet][etype_i]`` (bias factor 1
      on the first hop / after teleport), by CDF inversion of
      ``u = h(walk_id#step)``; a vertex whose biased weights all vanish (or
      with no out-edges) ends the walk.

    Transition-matrix entries index etypes 0..K-1 (row = previous type).
    Exactly reproduced by the pure-Python oracle in tests/test_walks.py.
    """
    K = len(transition_matrix)
    mflat = F.array(
        *[F.lit(float(v)) for row in transition_matrix for v in row]
    )
    tp_arr = (
        F.array(*[F.lit(int(t)) for t in teleport_targets])
        if teleport_targets
        else None
    )
    adj = _typed_adjacency(edges).persist(StorageLevel.MEMORY_AND_DISK)
    adj.count()
    frontier = (
        start_vertices.select(F.col("id").alias("start"))
        .crossJoin(spark.range(num_walks).select(F.col("id").alias("w")))
        .select(
            (F.col("start") * num_walks + F.col("w")).alias("walk_id"),
            F.col("start"),
            F.col("start").alias("cur"),
            F.lit(-1).cast("int").alias("pet"),
            F.array(F.col("start")).alias("path"),
            F.lit(False).alias("done"),
        )
        .localCheckpoint(eager=True)
    )
    for step in range(1, walk_length + 1):
        u = (
            hash64(F.concat_ws("#", F.col("walk_id").cast("string"), F.lit(str(step))))
            / F.lit(_HASH_SPACE)
        )
        u_tp = (
            hash64(
                F.concat_ws(
                    "#", F.col("walk_id").cast("string"), F.lit(str(step)), F.lit("tp")
                )
            )
            / F.lit(_HASH_SPACE)
        )
        active = frontier.where(~F.col("done")).join(
            adj, F.col("cur") == adj["src"], "left"
        )
        # biased per-neighbor weights given previous edge type
        bias = lambda t: F.when(F.col("pet") < 0, F.lit(1.0)).otherwise(
            F.element_at(mflat, (F.col("pet") * K + t + 1).cast("int"))
        )
        bw = F.zip_with(F.col("ws"), F.col("ets"), lambda w, t: w * bias(t))
        total = F.aggregate(bw, F.lit(0.0), lambda a, x: a + x)
        cum = F.aggregate(
            bw,
            F.array().cast("array<double>"),
            lambda acc, x: F.concat(
                acc,
                F.array(F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0.0)) + x),
            ),
        )
        idx = (
            F.size(F.filter(F.transform(cum, lambda c: c / total), lambda c: c < u)) + 1
        ).cast("int")
        is_tp = (
            (F.lit(teleport) > 0) & (u_tp < F.lit(teleport))
            if tp_arr is not None
            else F.lit(False)
        )
        tp_next = (
            F.element_at(
                tp_arr,
                (F.floor(u_tp / F.lit(teleport) * len(teleport_targets)) + 1).cast("int"),
            )
            if tp_arr is not None
            else F.lit(None).cast("long")
        )
        stuck = F.col("dsts").isNull() | (total <= F.lit(0.0))
        moved = active.select(
            "walk_id",
            "start",
            F.when(is_tp, F.lit(False)).otherwise(stuck).alias("now_done"),
            F.when(is_tp, tp_next)
            .when(stuck, F.col("cur"))
            .otherwise(F.element_at("dsts", idx))
            .alias("nxt"),
            F.when(is_tp, F.lit(-1).cast("int"))
            .when(stuck, F.col("pet"))
            .otherwise(F.element_at("ets", idx).cast("int"))
            .alias("new_pet"),
            "path",
        ).select(
            "walk_id",
            "start",
            F.col("nxt").alias("cur"),
            F.col("new_pet").alias("pet"),
            F.when(F.col("now_done"), F.col("path"))
            .otherwise(F.concat("path", F.array("nxt")))
            .alias("path"),
            F.col("now_done").alias("done"),
        )
        frontier = (
            moved.unionByName(frontier.where(F.col("done"))).localCheckpoint(eager=True)
        )
    adj.unpersist()
    return frontier.select("walk_id", "start", "path")
