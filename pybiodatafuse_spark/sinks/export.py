"""Graph export sinks (SURVEY.md §2.1 K1-K4, K8).

Reference writes driver-side via networkx (``graph/saver.py:19-73``,
``graph/cytoscape.py:12-59``); here each sink is a distributed write:

- :func:`write_edgelist`   — K2: space-separated src/dst(/weight) text.
- :func:`write_tsv_graph`  — K3: nodes + edges TSVs with JSON attr columns.
- :func:`write_json_graph` — K4 analogue: Cytoscape-style JSON lines
  (node and edge objects), one file per partition.
- :func:`save_graph`       — K8 orchestrator: parquet (authoritative) +
  requested export formats in one call.

GraphML (K1) is emitted by ``write_graphml`` for small graphs only — it is
an inherently single-document XML format, so we coalesce(1); guarded by a
row-count cap to keep the driver safe.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_edgelist(edges: DataFrame, path: str, weighted: bool = True) -> None:
    cols = [
        F.col("src").cast("string"),
        F.lit(" "),
        F.col("dst").cast("string"),
    ]
    if weighted:
        cols += [F.lit(" "), F.col("weight").cast("string")]
    edges.select(F.concat(*cols).alias("value")).write.mode("overwrite").text(path)


def write_tsv_graph(vertices: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """K3: nodes.tsv(id, type, attrs-json) + edges.tsv(src, dst, attrs-json)."""
    (
        vertices.select(
            "id", "type", F.to_json(F.struct(*vertices.columns)).alias("attrs")
        )
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", True)
        .csv(os.path.join(out_dir, "nodes"))
    )
    (
        edges.select(
            "src", "dst", F.to_json(F.struct(*edges.columns)).alias("attrs")
        )
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", True)
        .csv(os.path.join(out_dir, "edges"))
    )


def write_json_graph(vertices: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """Cytoscape-ish JSON-lines: {"group":"nodes"|"edges","data":{...}}."""
    nodes_json = vertices.select(
        F.to_json(
            F.struct(F.lit("nodes").alias("group"), F.struct(*vertices.columns).alias("data"))
        ).alias("value")
    )
    edges_json = edges.select(
        F.to_json(
            F.struct(F.lit("edges").alias("group"), F.struct(*edges.columns).alias("data"))
        ).alias("value")
    )
    nodes_json.unionByName(edges_json).write.mode("overwrite").text(out_dir)


def write_graphml(
    vertices: DataFrame, edges: DataFrame, path: str, max_rows: int = 100_000
) -> None:
    """K1: single-file GraphML; small graphs only (driver-safe cap)."""
    n = vertices.count()
    m = edges.count()
    if n + m > max_rows:
        raise ValueError(f"graphml export capped at {max_rows} rows, got {n + m}")
    node_lines = vertices.select(
        F.concat(F.lit('    <node id="n'), F.col("id").cast("string"), F.lit('"/>')).alias("l")
    )
    edge_lines = edges.select(
        F.concat(
            F.lit('    <edge source="n'),
            F.col("src").cast("string"),
            F.lit('" target="n'),
            F.col("dst").cast("string"),
            F.lit('"/>'),
        ).alias("l")
    )
    header = '<?xml version="1.0" encoding="UTF-8"?>\n<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n  <graph edgedefault="directed">'
    footer = "  </graph>\n</graphml>"
    body = "\n".join(r["l"] for r in node_lines.collect() + edge_lines.collect())
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(header + "\n" + body + "\n" + footer + "\n")


def save_graph(
    vertices: DataFrame,
    edges: DataFrame,
    out_dir: str,
    formats: tuple[str, ...] = ("parquet", "edgelist", "tsv", "json"),
) -> None:
    """K8 orchestrator."""
    if "parquet" in formats:
        vertices.write.mode("overwrite").parquet(os.path.join(out_dir, "vertices.parquet"))
        edges.write.mode("overwrite").parquet(os.path.join(out_dir, "edges.parquet"))
    if "edgelist" in formats:
        write_edgelist(edges, os.path.join(out_dir, "edgelist"))
    if "tsv" in formats:
        write_tsv_graph(vertices, edges, os.path.join(out_dir, "tsv"))
    if "json" in formats:
        write_json_graph(vertices, edges, os.path.join(out_dir, "json"))
    if "graphml" in formats:
        write_graphml(vertices, edges, os.path.join(out_dir, "graph.graphml"))
