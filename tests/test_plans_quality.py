"""Physical-plan quality gates: pushdown, pruning, broadcast, codegen.

These assert the *plan*, not the result — regressions here are silent
performance bugs at 100 TB even when outputs stay correct.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def pages_path(spark, pages_df, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "pages")
    pages_df.write.mode("overwrite").parquet(p)
    return p


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushed_to_parquet_scan(spark, pages_path):
    df = spark.read.parquet(pages_path).where(F.col("lang") == "en").select("url")
    plan = _fmt(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan


def test_column_pruned_scan(spark, pages_path):
    df = spark.read.parquet(pages_path).select("url", "lang")
    plan = _fmt(df)
    # html/text (the heavy columns) must NOT be read for a url/lang projection
    assert "ReadSchema: struct<url:string,lang:string>" in plan


def test_small_dim_join_broadcasts(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    dim = spark.createDataFrame([("en", "english")], "lang string, name string")
    j = pages.join(dim, "lang")
    assert "BroadcastHashJoin" in _plan(j)


def test_superstep_join_is_not_broadcast_or_sortmerge(spark):
    """The PageRank contribs path must stay shuffle-hash (no per-superstep
    sort of the edge table, no single-threaded broadcast build)."""
    from pybiodatafuse_spark.plans.pagerank import _prepare

    edges = spark.createDataFrame(
        [(i, (i + 1) % 50, 1.0, 1) for i in range(50)],
        "src long, dst long, weight double, etype int",
    )
    edges_norm, init = _prepare(edges, None, 4, 1000, None)
    ranks = init.select("id", F.lit(0.02).alias("rank")).withColumn(
        "salt", F.lit(0).cast("int")
    ).hint("shuffle_hash")
    joined = ranks.join(
        edges_norm,
        (ranks["id"] == edges_norm["src"]) & (ranks["salt"] == edges_norm["salt"]),
    )
    plan = _plan(joined)
    assert "ShuffledHashJoin" in plan
    edges_norm.unpersist()


def test_whole_stage_codegen_in_agg(spark, pages_path):
    df = (
        spark.read.parquet(pages_path)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    df.collect()  # AQE: codegen ids appear in the FINAL plan only
    assert "[codegen id :" in _fmt(df)  # agg runs inside WholeStageCodegen spans
