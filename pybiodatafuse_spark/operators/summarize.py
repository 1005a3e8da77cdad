"""Graph summary / analyzer parity (SURVEY.md §3.2; reference
``analyzer/summarize.py``: node/edge histograms A6-A7, density/size stats A11,
typed subgraph G3).

Everything is plain aggregations over the nodes/edges DataFrames — the
reference's eager driver-memory computations become lazy distributed plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pybiodatafuse_spark.plans.components import components


def node_type_histogram(vertices: DataFrame) -> DataFrame:
    """Reference summarize.py:110-113 (value_counts)."""
    return vertices.groupBy("type").agg(F.count(F.lit(1)).alias("count")).orderBy(
        F.desc("count"), F.asc("type")
    )


def edge_type_histogram(edges: DataFrame) -> DataFrame:
    return edges.groupBy("etype").agg(F.count(F.lit(1)).alias("count")).orderBy(
        F.desc("count"), F.asc("etype")
    )


def summary(spark: SparkSession, vertices: DataFrame, edges: DataFrame) -> dict:
    """Reference BioGraph summary table (summarize.py:62-70): counts, density,
    weakly-connected-component count (via our CC operator)."""
    n = vertices.count()
    m = edges.count()
    density = m / (n * (n - 1)) if n > 1 else 0.0
    n_comp = (
        components(spark, edges, vertices)
        .select("component")
        .distinct()
        .count()
    )
    return {
        "num_nodes": n,
        "num_edges": m,
        "density": density,
        "num_weakly_connected_components": n_comp,
    }


def typed_subgraph(
    vertices: DataFrame, edges: DataFrame, types: list[str]
) -> tuple[DataFrame, DataFrame]:
    """Induced subgraph on a node-type filter (reference get_subgraph,
    summarize.py:244-259): vertices filtered, edges semi-joined on BOTH
    endpoints."""
    keep = vertices.where(F.col("type").isin(types))
    ids = keep.select("id")
    sub_edges = (
        edges.join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
    )
    return keep, sub_edges
