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


def test_superstep_edge_side_never_reshuffles(spark):
    """The loop-invariant edge table is pre-partitioned on the join keys, so
    the executed superstep join must read it straight from the cache with NO
    Exchange above the InMemoryTableScan — each superstep shuffles only the
    O(V) rank rows. Regressing this re-shuffles O(E) per superstep (measured
    1.6× superstep cost at 27M edges and the collapse of N→4N scaling)."""
    from pybiodatafuse_spark.plans.pagerank import _prepare

    edges = spark.createDataFrame(
        [(i, (i + 3) % 60, 1.0, 1) for i in range(60)],
        "src long, dst long, weight double, etype int",
    )
    edges_norm, init = _prepare(edges, None, 4, 1000, None)
    # salt must be a REAL column (explode output, as in the actual step): a
    # literal salt would constant-fold out of the join keys, change the
    # required distribution to [src] alone, and force a spurious exchange
    ranks = init.select(
        "id",
        F.lit(0.02).alias("rank"),
        F.explode(F.array(F.lit(0).cast("int"))).alias("salt"),
    ).hint("shuffle_hash")
    joined = ranks.join(
        edges_norm,
        (ranks["id"] == edges_norm["src"]) & (ranks["salt"] == edges_norm["salt"]),
    )
    joined.count()  # execute so AQE finalizes the plan
    plan = _plan(joined)
    assert "InMemoryTableScan" in plan and "ShuffledHashJoin" in plan, plan
    # the join's edge child (the right branch, ending at the cache scan) must
    # contain NO Exchange: its cached partitioning satisfies the join
    lines = plan.splitlines()
    scan_i = next(i for i, l in enumerate(lines) if "InMemoryTableScan" in l)
    start_i = next(
        i for i in range(scan_i, -1, -1) if lines[i].lstrip().startswith("+- ")
        and len(lines[i]) - len(lines[i].lstrip()) <= 3
    )
    edge_branch = "\n".join(lines[start_i:scan_i])
    assert "Exchange" not in edge_branch, plan
    edges_norm.unpersist()


def test_whole_stage_codegen_in_agg(spark, pages_path):
    df = (
        spark.read.parquet(pages_path)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    df.collect()  # AQE: codegen ids appear in the FINAL plan only
    assert "[codegen id :" in _fmt(df)  # agg runs inside WholeStageCodegen spans


def test_em_sample_filter_below_wedge_join(spark, tmp_path):
    """G8 scale gate: the EM edge sample must be applied BELOW the wedge
    self-join (pushed into both scan sides) so the O(Σ deg²) wedge set is
    never materialized — the sampled predicate appears as a Filter in each
    join child, not once above the join."""
    from pybiodatafuse_spark.plans.em import sampled_wedges

    p = str(tmp_path / "edges")
    spark.createDataFrame(
        [(i, (i + 1) % 40, 1.0, i % 2) for i in range(40)],
        "src long, dst long, weight double, etype int",
    ).write.mode("overwrite").parquet(p)
    edges = spark.read.parquet(p)
    w = sampled_wedges(edges, it=1, sample_mod=2)
    plan = _plan(w)
    join_i = plan.index("Join") if "Join" in plan else plan.index("join")
    below = plan[join_i:]
    # the md5-hash sample predicate must occur in BOTH children below the join
    assert below.count("pmod(cast(conv(substring(md5") >= 2, plan
