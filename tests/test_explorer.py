"""Analyzer-explorer operators: batch construction + patent rollup.

Exact oracles computed in plain Python (reference semantics:
literature.py:40-47 fixed-size query batches; patent.py:27-47 per-office
distinct counts with separator normalization)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pybiodatafuse_spark.operators.explorer import (
    attribute_batches,
    patent_summary,
)


def test_attribute_batches_exact(spark):
    # 23 distinct ids (with dupes in the input), batch_size 10 → 3 batches
    ids = [f"g{i:03d}" for i in range(23)]
    df = spark.createDataFrame([(i,) for i in ids + ids[:5]], "gene string")
    out = {
        r["batch"]: (r["n_ids"], r["ids"])
        for r in attribute_batches(df, "gene", batch_size=10).collect()
    }
    want = {
        b: (len(ids[b * 10 : b * 10 + 10]), ",".join(ids[b * 10 : b * 10 + 10]))
        for b in range(3)
    }
    assert out == want


def test_attribute_batches_single_batch(spark):
    df = spark.createDataFrame([("b",), ("a",)], "x string")
    rows = attribute_batches(df, "x", batch_size=25).collect()
    assert len(rows) == 1
    assert rows[0]["batch"] == 0 and rows[0]["n_ids"] == 2
    assert rows[0]["ids"] == "a,b"


def test_patent_summary_normalizes_and_classifies(spark):
    rows = [
        # WO dashed and undashed variants of the SAME patent → one distinct
        ("c1", "WO-03078408-A1"),
        ("c1", "WO03078408A1"),
        ("c1", "US1234A"),
        ("c1", "us-1234-a"),  # case+dash variant of the same US patent
        ("c1", "EP99B"),
        ("c2", "JP77"),  # not US/EP/WO → Others
        ("c2", "DE-88"),
        ("c2", "US55"),
    ]
    df = spark.createDataFrame(rows, "cmpd string, pat string")
    out = {
        (r["entity"], r["office"]): r["n_patents"]
        for r in patent_summary(df, "cmpd", "pat").collect()
    }
    assert out == {
        ("c1", "WO"): 1,
        ("c1", "US"): 1,
        ("c1", "EP"): 1,
        ("c2", "Others"): 2,
        ("c2", "US"): 1,
    }


def test_attribute_batches_no_single_partition_window(spark):
    """Scale gate: the batch assignment must not funnel through one task —
    no Window over an unpartitioned global sort in the plan."""
    df = spark.range(1000).select(F.col("id").cast("string").alias("x"))
    plan = attribute_batches(df, "x")._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "partitionBy" not in line.lower():
            # the window must be partition-local (partitioned by pid)
            assert "pid" in line, f"unpartitioned global window in plan: {line}"
