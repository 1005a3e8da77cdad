"""IC/Jiang–Conrath similarity vs a pure-Python oracle; EM transition-matrix
trainer convergence; combine_with_homologs gap-filling semantics."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from pybiodatafuse_spark.operators.collapse import collapse_data_sources, combine_with_homologs
from pybiodatafuse_spark.operators.ic_similarity import jiang_conrath_similarity
from pybiodatafuse_spark.plans.em import train_transition_matrix

HIER = [("a1", "m"), ("a2", "m"), ("m", "r"), ("b1", "r"), ("b2", "b1")]


def _oracle_jc():
    parents = {}
    for c, p in HIER:
        parents[c] = p
    nodes = {"a1", "a2", "m", "r", "b1", "b2"}

    def anc(x):
        out = {x}
        while x in parents:
            x = parents[x]
            out.add(x)
        return out

    n = len(nodes)
    freq = {t: sum(1 for v in nodes if t in anc(v)) for t in nodes}
    ic = {t: -math.log(freq[t] / n) for t in nodes}
    out = {}
    for a in sorted(nodes):
        for b in sorted(nodes):
            if a >= b:
                continue
            common = anc(a) & anc(b)
            if not common:
                continue
            mica = max(ic[t] for t in common)
            out[(a, b)] = 1.0 / (1.0 + ic[a] + ic[b] - 2 * mica)
    return out


def test_jiang_conrath_matches_oracle(spark):
    h = spark.createDataFrame(HIER, "child string, parent string")
    got = {
        (r["a"], r["b"]): r["sim"] for r in jiang_conrath_similarity(h).collect()
    }
    want = _oracle_jc()
    assert got.keys() == want.keys()
    assert all(abs(got[k] - want[k]) < 1e-9 for k in want)
    # identical-ancestor siblings more similar than cross-branch pairs
    assert got[("a1", "a2")] > got[("a1", "b1")]


def test_em_transition_matrix_converges(spark):
    rng = np.random.default_rng(9)
    rows = []
    # typed ring graph: etype 0 edges strongly followed by etype 1
    for i in range(300):
        rows.append((i, (i + 1) % 300, 1.0, i % 2))
    edges = spark.createDataFrame(rows, "src long, dst long, weight double, etype int")
    M, deltas = train_transition_matrix(
        spark, edges, num_etypes=2, sample_mod=2, max_iter=15, tol=1e-4
    )
    assert M.shape == (2, 2)
    assert np.allclose(M.sum(axis=1), 1.0)
    assert deltas == sorted(deltas, reverse=True) or deltas[-1] < deltas[0]
    # ring alternates types: 0→1 and 1→0 dominate their rows
    assert M[0, 1] > M[0, 0] and M[1, 0] > M[1, 1]


def test_combine_with_homologs_fills_gaps(spark):
    xref = spark.createDataFrame(
        [("g1", "x", "t1", "ns"), ("g2", "x", "t2", "ns")],
        "identifier string, identifier_source string, target string, target_source string",
    )
    ann = spark.createDataFrame(
        [("t1", "P1", "pathway")], "target string, pid string, plabel string"
    )
    combined = collapse_data_sources(xref, ann, source_name="src1")
    homologs = spark.createDataFrame([("t2", "t1")], "target string, homolog string")
    out = combine_with_homologs(combined, homologs, ["src1"]).collect()
    by_t = {r["target"]: r for r in out}
    # t2 had only the null-entry; borrows t1's annotation
    assert by_t["t2"]["src1"][0]["pid"] == "P1"
    assert by_t["t2"]["homolog_of"] == "t1"
    assert by_t["t1"]["src1"][0]["pid"] == "P1"


def test_ic_similarity_root_cap_bounds_candidates(spark):
    """Single-root deep hierarchy: candidate generation with max_ancestor_df
    must stay far below N²/2, and every emitted pair must be value-exact vs
    the uncapped semantics (the cap only drops pairs whose sole common
    ancestors are high-df terms — never alters a retained pair's MICA)."""
    from pybiodatafuse_spark.operators.ic_similarity import (
        ancestors_with_self,
        candidate_mica,
        information_content,
    )

    # 2 top-level subtrees under one root; k -> floor((k-1)/3) tree, 200 nodes
    h = spark.createDataFrame(
        [(k, (k - 1) // 3) for k in range(1, 200)], "child long, parent long"
    )
    n = 200
    anc = ancestors_with_self(h).persist()
    ic = information_content(anc)
    cap = 40
    capped = candidate_mica(anc, ic, max_ancestor_df=cap)
    n_capped = capped.count()
    assert n_capped < n * n / 8  # far below the N²/2 root blowup
    full = candidate_mica(anc, ic, None)
    fm = {(r["a"], r["b"]): r["ic_mica"] for r in full.collect()}
    for r in capped.collect():
        assert abs(fm[(r["a"], r["b"])] - r["ic_mica"]) < 1e-12
    anc.unpersist()


def test_em_zero_wedge_sample_warns_not_collapses(spark):
    """Per-edge sampling means wedge rate 1/mod²: an iteration that draws
    zero wedges must warn and SKIP the update (not silently drive every row
    of the matrix to the uniform fallback)."""
    import warnings

    import numpy as np

    from pybiodatafuse_spark.plans.em import train_transition_matrix

    edges = spark.createDataFrame(
        [(1, 2, 0), (2, 3, 1)], "src long, dst long, etype int"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        M, deltas = train_transition_matrix(
            spark, edges, num_etypes=2, sample_mod=10_000, max_iter=2
        )
    assert any("zero wedges" in str(w.message) for w in caught)
    assert np.allclose(M, 0.5) and deltas == []  # untouched uniform 1/K init
