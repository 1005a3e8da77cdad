"""SCC / bow-tie / BFS / ANF / clustering / overlap / scalars vs pure-Python
oracles on the deterministic 400-page link graph plus adversarial small
graphs (nested SCC layers, cycles with tails)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.graph_fixture import id_maps, oracle_edges, spark_graph
from tests.oracles import (
    bfs_oracle,
    bowtie_oracle,
    clustering_oracle,
    neighborhood_oracle,
    overlap_oracle,
    scc_oracle,
)

N = 400


@pytest.fixture(scope="module")
def graph(spark, pages_df):
    verts, edges = spark_graph(pages_df)
    edges = edges.cache()
    verts = verts.cache()
    edges.count()
    _, page_to_id = id_maps(verts)
    return verts, edges, page_to_id


def _edge_df(spark, pairs):
    return spark.createDataFrame(
        [(int(s), int(d)) for s, d in pairs], "src long, dst long"
    )


def test_scc_fixture_graph(spark, graph):
    from pybiodatafuse_spark.plans.scc import strongly_connected_components

    verts, edges, page_to_id = graph
    got = {
        r["id"]: r["scc"]
        for r in strongly_connected_components(spark, edges, verts).collect()
    }
    oe = [(s, d) for s, d, _ in oracle_edges(N, page_to_id)]
    vs = set(page_to_id.values())
    want = scc_oracle(oe, vs)
    assert got == {v: want.get(v, v) for v in vs}


def test_scc_adversarial_layers(spark):
    # two nested cycles bridged one-way + a chain tail: forces >1 outer round
    from pybiodatafuse_spark.plans.scc import strongly_connected_components

    pairs = [
        (1, 2), (2, 3), (3, 1),          # SCC {1,2,3}
        (3, 4),                           # bridge
        (4, 5), (5, 6), (6, 4),           # SCC {4,5,6}
        (6, 7), (7, 8),                   # tail singletons
        (9, 9),                           # self loop (ignored), isolated
        (10, 11), (11, 10), (11, 12), (12, 13), (13, 11),  # SCC {10..13}
    ]
    e = _edge_df(spark, pairs)
    got = {
        r["id"]: r["scc"]
        for r in strongly_connected_components(spark, e).collect()
    }
    vs = {v for p in pairs for v in p}
    want = scc_oracle([(s, d) for s, d in pairs if s != d], vs)
    assert got == {v: want.get(v, v) for v in vs}
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == got[5] == got[6] == 4
    assert got[10] == got[11] == got[12] == got[13] == 10
    assert got[7] == 7 and got[8] == 8 and got[9] == 9


def test_bowtie(spark):
    from pybiodatafuse_spark.plans.scc import bowtie_decomposition

    # IN (0) -> CORE {1,2,3} -> OUT (4,5); disconnected 6<->7 smaller SCC
    pairs = [
        (0, 1), (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (6, 7), (7, 6),
    ]
    e = _edge_df(spark, pairs)
    got = {r["id"]: r["cls"] for r in bowtie_decomposition(spark, e).collect()}
    want = bowtie_oracle(pairs, {v for p in pairs for v in p})
    assert got == want
    assert got[0] == "IN" and got[1] == "CORE" and got[5] == "OUT"
    assert got[6] == "OTHER"


def test_bfs_distances(spark, graph):
    from pybiodatafuse_spark.plans.bfs import bfs_distances

    verts, edges, page_to_id = graph
    seed_ids = sorted(page_to_id.values())[:5]
    seeds = spark.createDataFrame([(int(s),) for s in seed_ids], "id long")
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(spark, edges, seeds).collect()
    }
    oe = [(s, d) for s, d, _ in oracle_edges(N, page_to_id)]
    want = bfs_oracle(oe, set(seed_ids))
    assert got == want


def test_neighborhood_exact_vs_oracle(spark, graph):
    from pybiodatafuse_spark.plans.bfs import neighborhood_sizes

    verts, edges, page_to_id = graph
    got = {
        r["id"]: r["n_within"]
        for r in neighborhood_sizes(spark, edges, hops=3).collect()
    }
    oe = [(s, d) for s, d, _ in oracle_edges(N, page_to_id)]
    vs = {v for p in oe for v in p}
    want = neighborhood_oracle(oe, vs, 3)
    assert got == want


def test_anf_hll_accuracy(spark, graph):
    from pybiodatafuse_spark.plans.bfs import anf_hll, neighborhood_sizes

    verts, edges, page_to_id = graph
    exact = {
        r["id"]: r["n_within"]
        for r in neighborhood_sizes(spark, edges, hops=3).collect()
    }
    est = {
        r["id"]: r["n_est"] for r in anf_hll(spark, edges, hops=3, lgk=12).collect()
    }
    assert set(est) == set(exact)
    # HLL lgk=12 has ~1.6% relative stddev; allow 10% + absolute slack 2
    for v, n in exact.items():
        assert abs(est[v] - n) <= max(2.0, 0.10 * n), (v, n, est[v])
    # totals within 5%
    t_exact = sum(exact.values())
    t_est = sum(est.values())
    assert abs(t_est - t_exact) / t_exact < 0.05


def test_effective_diameter_monotone(spark, graph):
    from pybiodatafuse_spark.plans.bfs import effective_diameter

    verts, edges, _ = graph
    h_eff, totals = effective_diameter(spark, edges, quantile=0.9, max_hops=12)
    assert 1 <= h_eff <= len(totals)
    assert all(b >= a * 0.999 for a, b in zip(totals, totals[1:]))


def test_clustering_coefficients(spark, graph):
    from pybiodatafuse_spark.operators.graphstats import clustering_coefficients

    verts, edges, page_to_id = graph
    got = {
        r["id"]: (r["deg"], r["triangles"], r["coeff"])
        for r in clustering_coefficients(spark, edges).collect()
    }
    oe = [(s, d) for s, d, _ in oracle_edges(N, page_to_id)]
    vs = {v for p in oe for v in p}
    want = clustering_oracle(oe, vs)
    assert set(got) == set(want)
    for v, (deg, tri, coeff) in want.items():
        assert got[v][0] == deg and got[v][1] == tri
        assert got[v][2] == pytest.approx(coeff, abs=1e-12)


def test_neighbor_overlap_scores(spark):
    from pybiodatafuse_spark.operators.graphstats import neighbor_overlap_scores

    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 1), (5, 1), (5, 2)]
    e = _edge_df(spark, pairs)
    got = {
        (r["a"], r["b"]): (r["common"], r["jaccard"], r["adamic_adar"], r["resource_alloc"])
        for r in neighbor_overlap_scores(spark, e).collect()
    }
    want = overlap_oracle(pairs)
    assert set(got) == set(want)
    for k, (c, j, aa, ra) in want.items():
        assert got[k][0] == c
        assert got[k][1] == pytest.approx(j, abs=1e-12)
        assert got[k][2] == pytest.approx(aa, abs=1e-12)
        assert got[k][3] == pytest.approx(ra, abs=1e-12)


def test_graph_scalars(spark):
    from pybiodatafuse_spark.operators.graphstats import graph_scalars

    pairs = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 4), (4, 2)]
    e = _edge_df(spark, pairs)
    row = graph_scalars(spark, e).first()
    assert row["n_vertices"] == 4 and row["n_edges"] == 6
    assert row["density"] == pytest.approx(6 / 12, abs=1e-12)
    assert row["reciprocity"] == pytest.approx(2 / 6, abs=1e-12)
    # oracle assortativity: Pearson corr of (outdeg(src), indeg(dst)) per edge
    outd = {1: 2, 2: 2, 3: 1, 4: 1}
    ind = {1: 2, 2: 2, 3: 1, 4: 1}
    xs = [outd[s] for s, d in pairs]
    ys = [ind[d] for s, d in pairs]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / n
    sx = math.sqrt(sum((x - mx) ** 2 for x in xs) / n)
    sy = math.sqrt(sum((y - my) ** 2 for y in ys) / n)
    assert row["assortativity"] == pytest.approx(cov / (sx * sy), abs=1e-12)


def test_harmonic_centrality(spark, graph):
    from pybiodatafuse_spark.plans.bfs import harmonic_centrality
    from tests.oracles import harmonic_oracle

    verts, edges, page_to_id = graph
    seed_ids = sorted(page_to_id.values())[:7]
    seeds = spark.createDataFrame([(int(s),) for s in seed_ids], "id long")
    got = {
        r["id"]: r["harmonic"]
        for r in harmonic_centrality(spark, edges, seeds).collect()
    }
    oe = [(s, d) for s, d, _ in oracle_edges(N, page_to_id)]
    want = harmonic_oracle(oe, set(seed_ids))
    assert set(got) == set(want)
    for v, h in want.items():
        assert got[v] == pytest.approx(h, abs=1e-9)


def test_modularity_closed_form(spark):
    from pybiodatafuse_spark.operators.graphstats import modularity

    # two triangles joined by one bridge; partition = the two triangles
    pairs = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)]
    e = _edge_df(spark, pairs)
    labels = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 1), (5, 1), (6, 1)], "id long, label long"
    )
    row = modularity(spark, e, labels).first()
    # m=7, e_c=3 each, d_c=7 each: Q = 2*(3/7 - (7/14)^2) = 6/7 - 1/2
    assert row["n_communities"] == 2
    assert row["modularity"] == pytest.approx(6 / 7 - 0.5, abs=1e-12)
    # degenerate: all one community → Q = 1 - 1 = 0
    one = spark.createDataFrame([(i, 9) for i in range(1, 7)], "id long, label long")
    row1 = modularity(spark, e, one).first()
    assert row1["n_communities"] == 1
    assert row1["modularity"] == pytest.approx(0.0, abs=1e-12)


def test_diameter_lower_bound(spark):
    from pybiodatafuse_spark.plans.bfs import diameter_lower_bound

    # directed path 0→1→…→6: diameter 6, double sweep finds it exactly
    path = [(i, i + 1) for i in range(6)]
    assert diameter_lower_bound(spark, _edge_df(spark, path)) == 6
    # cycle of 5: eccentricity 4 from any start
    cyc = [(i, (i + 1) % 5) for i in range(5)]
    assert diameter_lower_bound(spark, _edge_df(spark, cyc)) == 4


def test_scc_long_cycle_no_silent_split(spark):
    """Regression (round-3 advice): a directed cycle longer than any fixed
    inner-loop cap is ONE SCC — the coloring loop must run to fixpoint, and
    an insufficient explicit cap must RAISE, never silently split the
    component into singletons."""
    from pybiodatafuse_spark.plans.scc import strongly_connected_components

    n = 10  # well past the max_inner=5 cap below; fixpoint needs ~n rounds
    cyc = [(i, (i + 1) % n) for i in range(n)]
    got = {
        r["id"]: r["scc"]
        for r in strongly_connected_components(spark, _edge_df(spark, cyc)).collect()
    }
    assert got == {i: 0 for i in range(n)}  # one SCC rooted at min id
    with pytest.raises(RuntimeError, match="did not converge"):
        strongly_connected_components(
            spark, _edge_df(spark, cyc), max_inner=5
        )


def test_bfs_truncation_contract(spark):
    """bfs_distances raises when the frontier would expand past max_hops
    unless allow_truncate=True, in which case distances ≤ max_hops are
    returned complete."""
    from pybiodatafuse_spark.plans.bfs import bfs_distances

    chain = [(i, i + 1) for i in range(8)]
    seeds = spark.createDataFrame([(0,)], "id long")
    with pytest.raises(RuntimeError, match="still expanding"):
        bfs_distances(spark, _edge_df(spark, chain), seeds, max_hops=3)
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(
            spark, _edge_df(spark, chain), seeds, max_hops=3, allow_truncate=True
        ).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    # a cap at/after the reachability fixpoint is not truncation: no raise
    full = bfs_distances(spark, _edge_df(spark, chain), seeds, max_hops=8)
    assert full.count() == 9


def test_clustering_includes_isolated_vertices(spark):
    """Regression (round-3 advice): with an explicit vertex table, isolated
    and self-loop-only vertices appear with deg=0, coeff=0.0 (the reference
    networkx summarize path reports every node)."""
    from pybiodatafuse_spark.operators.graphstats import clustering_coefficients

    tri = [(1, 2), (2, 3), (3, 1), (9, 9)]  # triangle + self-loop-only 9
    verts = spark.createDataFrame([(i,) for i in (1, 2, 3, 9, 50)], "id long")
    got = {
        r["id"]: (r["deg"], r["triangles"], r["coeff"])
        for r in clustering_coefficients(
            spark, _edge_df(spark, tri), verts
        ).collect()
    }
    assert got[1] == (2, 1, 1.0) and got[2] == (2, 1, 1.0) and got[3] == (2, 1, 1.0)
    assert got[9] == (0, 0, 0.0)
    assert got[50] == (0, 0, 0.0)
