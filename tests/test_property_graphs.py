"""Property-based differential tests: random small digraphs vs the
pure-Python oracles (hypothesis drives the graph shape — cycles, chains,
self-loops, multi-edges, isolated SCC layers — far beyond the fixed
fixtures). Example counts kept small: each example runs real Spark jobs.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.oracles import bfs_oracle, components_oracle, scc_oracle

N_MAX = 12

edge_sets = st.sets(
    st.tuples(
        st.integers(min_value=0, max_value=N_MAX), st.integers(min_value=0, max_value=N_MAX)
    ),
    min_size=1,
    max_size=30,
)

_SETTINGS = settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, pairs):
    return spark.createDataFrame(
        [(int(s), int(d)) for s, d in sorted(pairs)], "src long, dst long"
    )


@given(pairs=edge_sets)
@_SETTINGS
def test_scc_matches_tarjan(spark, pairs):
    from pybiodatafuse_spark.plans.scc import strongly_connected_components

    vs = {v for p in pairs for v in p}
    got = {
        r["id"]: r["scc"]
        for r in strongly_connected_components(spark, _df(spark, pairs)).collect()
    }
    want = scc_oracle([(s, d) for s, d in pairs if s != d], vs)
    assert got == {v: want.get(v, v) for v in vs}


@given(pairs=edge_sets)
@_SETTINGS
def test_bfs_matches_oracle(spark, pairs):
    from pybiodatafuse_spark.plans.bfs import bfs_distances

    vs = sorted({v for p in pairs for v in p})
    seeds = vs[: max(1, len(vs) // 3)]
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(
            spark,
            _df(spark, pairs),
            spark.createDataFrame([(int(s),) for s in seeds], "id long"),
        ).collect()
    }
    want = bfs_oracle([(s, d) for s, d in pairs if s != d], set(seeds))
    assert got == want


@given(pairs=edge_sets)
@_SETTINGS
def test_components_matches_union_find(spark, pairs):
    from pybiodatafuse_spark.plans.components import components

    clean = [(s, d) for s, d in pairs if s != d]
    if not clean:
        return
    vs = {v for p in clean for v in p}
    got = {
        r["id"]: r["component"]
        for r in components(spark, _df(spark, clean)).collect()
    }
    want = components_oracle(clean, vs)
    assert got == want
