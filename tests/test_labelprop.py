"""Label propagation exact vs the synchronous min-tie-break oracle."""

from __future__ import annotations

import numpy as np

from pybiodatafuse_spark.plans.labelprop import label_propagation
from tests.graph_fixture import id_maps, oracle_edges, spark_graph
from tests.oracles import lpa_oracle

N = 400


def test_lpa_matches_oracle_on_pages(spark, pages_df):
    verts, edges = spark_graph(pages_df)
    _, page_to_id = id_maps(verts)
    got = {
        r["id"]: r["label"]
        for r in label_propagation(spark, edges, verts, max_iter=10).collect()
    }
    want = lpa_oracle(
        [(s, d) for s, d, _ in oracle_edges(N, page_to_id)],
        set(page_to_id.values()),
        max_iter=10,
    )
    assert got == want


def test_lpa_random_graph(spark):
    rng = np.random.default_rng(3)
    vs = list(range(80))
    es = list({(int(rng.integers(0, 80)), int(rng.integers(0, 80))) for _ in range(150)})
    es = [(a, b) for a, b in es if a != b]
    edges = spark.createDataFrame(
        [(a, b, 1.0, 1) for a, b in es], "src long, dst long, weight double, etype int"
    )
    verts = spark.createDataFrame([(v,) for v in vs], "id long")
    got = {
        r["id"]: r["label"]
        for r in label_propagation(spark, edges, verts, max_iter=7).collect()
    }
    want = lpa_oracle(es, set(vs), max_iter=7)
    assert got == want
