"""Analyzer-explorer operators: typed-entity attribute batching + rollups.

Reference anchors (the graph-side halves of the explorer modules; the REST/
SPARQL wire calls themselves are out of scope by SURVEY §2.1's n-a ruling):

- ``/root/reference/src/pyBiodatafuse/analyzer/explorer/literature.py:40-47``
  — ``get_wikidata_gene_literature`` splits the distinct identifier list
  into fixed-size query batches (25 ids per SPARQL call) before collecting
  per-gene PMID sets.
- ``/root/reference/src/pyBiodatafuse/analyzer/explorer/patent.py:27-47``
  (``process_patent_data``) + ``:71`` — per (compound, patent-office) counts
  over US/EP/WO/Others with the documented normalization TODO (``WO-03078408
  -A1`` vs ``WO03078408A1`` are the same patent).

Spark restatement: both are pure DataFrame programs.

- :func:`attribute_batches` assigns a deterministic global batch number
  WITHOUT a single-partition window: ``repartitionByRange`` on the id, a
  partition-local ``row_number``, and a driver-side merge of the ≤
  shuffle-partitions per-partition counts (the same offset-merge shape as
  ``operators/linkpred.py:106-130``) — so batching a 10^9-id list never
  funnels through one task.
- :func:`patent_summary` is normalize → classify → distinct → count: all
  built-in column expressions, two shuffles (distinct + rollup), no Python.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def attribute_batches(
    df: DataFrame,
    id_col: str,
    *,
    batch_size: int = 25,
) -> DataFrame:
    """Deterministic fixed-size batches of the distinct ``id_col`` values.

    Returns ``(batch: long, n_ids: long, ids: string)`` — ``ids`` is the
    comma-joined, sorted member list (the reference joins each batch into
    one SPARQL VALUES string, literature.py:44-47). Batch k holds ranks
    [k·batch_size, (k+1)·batch_size) of the global id order.
    """
    if batch_size < 1:
        raise ValueError("attribute_batches: batch_size must be >= 1")
    spark = df.sparkSession
    ids = df.select(F.col(id_col).cast("string").alias("id")).dropDuplicates(
        ["id"]
    )
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rb = (
        ids.repartitionByRange(parts, F.asc("id"))
        .withColumn("pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # ≤ `parts` rows to the driver: per-partition counts → rank offsets
    pid_cnt = sorted(
        (r["pid"], int(r["c"]))
        for r in rb.groupBy("pid").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    offs, acc = [], 0
    for pid, c in pid_cnt:
        offs.append((pid, acc))
        acc += c
    off_df = F.broadcast(
        spark.createDataFrame(offs or [(0, 0)], "pid int, off long")
    )
    w_in = Window.partitionBy("pid").orderBy("id")
    out = (
        rb.join(off_df, "pid")
        .select(
            "id",
            (
                (F.col("off") + F.row_number().over(w_in) - 1)
                / F.lit(batch_size)
            )
            .cast("long")
            .alias("batch"),
        )
        .groupBy("batch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ids"),
            F.array_join(F.array_sort(F.collect_list("id")), ",").alias("ids"),
        )
    )
    # materialize before releasing rb: the persisted partition assignment is
    # what makes the pid→offset map valid, so out must be pinned (eager
    # localCheckpoint) before unpersist — and unpersisting here (rather than
    # leaving it to the caller, linkpred-style) keeps repeat invocations
    # from accumulating cached relations for the session lifetime
    out = out.localCheckpoint(eager=True)
    rb.unpersist()
    return out


# patent-office classification vocabulary (reference patent.py:71)
PATENT_OFFICES = ("US", "EP", "WO")


def normalize_patent_id(col: F.Column) -> F.Column:
    """Uppercase and strip separators so ``WO-03078408-A1`` ==
    ``WO03078408A1`` (the reference's documented dedup TODO,
    patent.py:63-65)."""
    return F.regexp_replace(F.upper(col), "[-/ ]", "")


def patent_summary(
    df: DataFrame,
    entity_col: str,
    patent_col: str,
) -> DataFrame:
    """Per (entity, patent-office) distinct-patent counts.

    Returns ``(entity: string, office: string, n_patents: long)`` with
    ``office ∈ {US, EP, WO, Others}`` — the reference's
    ``process_patent_data`` rollup (patent.py:27-47) with normalization
    applied BEFORE the distinct so separator variants collapse.
    """
    norm = normalize_patent_id(F.col(patent_col).cast("string"))
    office = F.when(
        F.substring(norm, 1, 2).isin(*PATENT_OFFICES), F.substring(norm, 1, 2)
    ).otherwise(F.lit("Others"))
    return (
        df.select(
            F.col(entity_col).cast("string").alias("entity"),
            office.alias("office"),
            norm.alias("patent"),
        )
        .dropDuplicates(["entity", "office", "patent"])
        .groupBy("entity", "office")
        .agg(F.count(F.lit(1)).cast("long").alias("n_patents"))
    )
