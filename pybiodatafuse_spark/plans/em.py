"""EM-style edge-type transition-matrix training (SURVEY.md G8).

Reference (``algorithms/DREAMwalk/generate_embeddings.py:96-188``): sample 1%
of edges, run typed walks, update a K×K edge-type transition matrix, stop when
the mean L1 matrix delta < tol — all driver-side, process-parallel via parmap.

Spark restatement keeping the iterative skeleton (sample → distributed
aggregate → small driver-side M-step → L1 convergence):
- E-step (distributed): **edges are hash-sampled FIRST** (rate
  ``1/sample_mod``, deterministic per iteration), and only then joined into
  length-2 typed transitions (e1.dst = e2.src) — the wedge relation is built
  from the sampled edge set, never materialized in full. This mirrors the
  reference (sample 1% of edges, then walk) and keeps the join size at
  O(Σ deg_s²) over SAMPLED degrees — a power-law hub with degree d contributes
  (d/mod)² wedges, not d²; the sample predicate references a single edge row,
  so Catalyst pushes it below the join into both scan sides
  (tests/test_plans_quality.py::test_em_sample_filter_below_wedge_join).
- M-step (driver): row-normalize the K×K count matrix weighted by the current
  estimate and blend with the previous one (the matrix is tiny; the driver is
  the right distribution boundary, exactly like the reference);
- convergence: sum |M_new − M_old| < tol (the reference's A10 accumulator).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pybiodatafuse_spark.functions.text import hash64


def sampled_wedges(edges: DataFrame, it: int, sample_mod: int) -> DataFrame:
    """(t1, t2) typed length-2 transitions over the iteration-``it``
    hash-sample of ``edges``. The sample predicate is applied to the edge
    relation BEFORE the self-join, so the full wedge set is never built."""
    sampled = edges.where(
        F.pmod(
            hash64(
                F.concat_ws(
                    "#",
                    F.col("src").cast("string"),
                    F.col("dst").cast("string"),
                    F.lit(str(it)),
                )
            ),
            F.lit(sample_mod),
        )
        == 0
    )
    e1 = sampled.select(F.col("dst").alias("b"), F.col("etype").alias("t1"))
    e2 = sampled.select(F.col("src").alias("b"), F.col("etype").alias("t2"))
    return e1.join(e2, "b").select("t1", "t2")


def train_transition_matrix(
    spark: SparkSession,
    edges: DataFrame,
    num_etypes: int,
    *,
    sample_mod: int | None = None,
    max_iter: int = 20,
    tol: float = 1e-3,
    blend: float = 0.5,
) -> tuple[np.ndarray, list[float]]:
    """Returns (matrix KxK row-stochastic, per-iteration L1 deltas).

    ``sample_mod=None`` (default) auto-scales the per-edge hash-sample rate
    from one cheap ``edges.count()``: keep ~500k sampled edges per iteration
    (bounded wedge self-join at crawl scale) but NEVER sample below the full
    edge set on small graphs — a fixed mod of 10 meant a small e2e fixture
    drew zero wedges and the estimator silently fell back toward uniform."""
    K = num_etypes
    M = np.full((K, K), 1.0 / K)
    edges_c = edges.select("src", "dst", "etype").persist()
    if sample_mod is None:
        sample_mod = max(1, edges_c.count() // 500_000)
    deltas: list[float] = []
    for it in range(1, max_iter + 1):
        counts = {
            (r["t1"], r["t2"]): r["n"]
            for r in sampled_wedges(edges_c, it, sample_mod)
            .groupBy("t1", "t2")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        C = np.zeros((K, K))
        for (i, j), n in counts.items():
            C[int(i) % K, int(j) % K] += n
        if C.sum() == 0:
            # the sample predicate applies PER EDGE, so a wedge survives at
            # rate 1/sample_mod² — on small/sparse graphs an iteration can
            # draw zero wedges; updating from an all-zero C would silently
            # pull every row to the uniform 1/K fallback, so skip the update
            # and try the next iteration's (different) hash sample instead
            import warnings

            warnings.warn(
                f"train_transition_matrix: iteration {it} sampled zero wedges "
                f"(sample_mod={sample_mod} applies per edge → wedge rate "
                f"1/{sample_mod ** 2}); lower sample_mod for small graphs",
                stacklevel=2,
            )
            continue
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
    edges_c.unpersist()
    return M, deltas
