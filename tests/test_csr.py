"""CSR fast path: identical results to the DataFrame PageRank (1e-12), block
structure integrity, chunking."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pybiodatafuse_spark.plans.csr import build_csr_blocks, pagerank_csr
from pybiodatafuse_spark.plans.pagerank import pagerank


@pytest.fixture(scope="module")
def graph(graph400):
    verts, edges, _ = graph400
    return verts, edges


def test_csr_matches_dataframe_path(spark, graph):
    verts, edges = graph
    a = pagerank(spark, edges, verts, tol=None, max_iter=8, hub_threshold=5)
    b = pagerank_csr(spark, edges, verts, tol=None, max_iter=8, num_blocks=8)
    ra = {r["id"]: r["rank"] for r in a.state.select("id", "rank").collect()}
    rb = {r["id"]: r["rank"] for r in b.state.select("id", "rank").collect()}
    assert ra.keys() == rb.keys()
    assert max(abs(ra[k] - rb[k]) for k in ra) < 1e-12


def test_csr_convergence(spark, graph):
    """The CSR path's STOPPING machinery (tol reached → converged flag, mass
    conserved). tol=1e-4 keeps this ~30 supersteps cheaper than a full 1e-6
    run; the north-rule 1e-6 convergence itself is covered once in
    test_pagerank (DataFrame path) + gate q40, and CSR↔DataFrame identity is
    pinned at 1e-12 by test_csr_matches_dataframe_path above."""
    verts, edges = graph
    res = pagerank_csr(spark, edges, verts, tol=1e-4, max_iter=120, num_blocks=8)
    assert res.converged and res.deltas[-1] < 1e-4
    total = res.state.agg(F.sum("rank").alias("s")).first()["s"]
    assert abs(total - 1.0) < 1e-9


def test_block_structure(spark, graph):
    _, edges = graph
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    edges_norm = edges.join(out_w, "src").select(
        "src", "dst", (F.col("weight") / F.col("out_w")).alias("frac")
    )
    blocks = build_csr_blocks(edges_norm, num_blocks=4, max_chunk_edges=50)
    rows = blocks.collect()
    n_edges = edges.count()
    assert sum(len(r["dsts"]) for r in rows) == n_edges
    for r in rows:
        assert len(r["indptr"]) == len(r["srcs"]) + 1
        assert r["indptr"][-1] == len(r["dsts"])
        assert all(s % 4 == r["pid"] for s in np.array(r["srcs"]) % 4)
        assert len(r["dsts"]) <= 50 + max(np.diff(r["indptr"])) if len(r["srcs"]) else True
    # per-src frac sums to 1 across all blocks of that src
    frac_sums = {}
    for r in rows:
        srcs, indptr, fracs = r["srcs"], r["indptr"], r["fracs"]
        for i, s in enumerate(srcs):
            frac_sums[s] = frac_sums.get(s, 0.0) + sum(fracs[indptr[i]:indptr[i + 1]])
    assert all(abs(v - 1.0) < 1e-9 for v in frac_sums.values())
    blocks.unpersist()


def test_sidecar_respill_same_store_invalidates(spark, tmp_path):
    """Re-spilling DIFFERENT edges into the SAME store path must not serve
    stale cached blocks from reused Python workers (content-aware cache key)."""
    store = str(tmp_path / "csr_store")
    e1 = spark.createDataFrame(
        [(i, (i + 1) % 20, 1.0, 1) for i in range(20)],
        "src long, dst long, weight double, etype int",
    )
    e2 = spark.createDataFrame(
        [(i, (i + 7) % 20, 1.0, 1) for i in range(20)]
        + [(0, 13, 4.0, 1), (5, 2, 2.0, 1)],
        "src long, dst long, weight double, etype int",
    )
    # run 1 populates worker caches for this store path
    pagerank_csr(spark, e1, tol=None, max_iter=3, num_blocks=4, block_store=store)
    # run 2 re-spills different edges into the SAME path
    got = pagerank_csr(spark, e2, tol=None, max_iter=5, num_blocks=4, block_store=store)
    want = pagerank_csr(
        spark, e2, tol=None, max_iter=5, num_blocks=4,
        block_store=str(tmp_path / "fresh_store"),
    )
    g = {r["id"]: r["rank"] for r in got.state.select("id", "rank").collect()}
    w = {r["id"]: r["rank"] for r in want.state.select("id", "rank").collect()}
    assert g.keys() == w.keys()
    assert max(abs(g[k] - w[k]) for k in g) < 1e-15
