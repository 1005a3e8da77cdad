"""RDF / N-Triples sink (SURVEY.md K6).

Reference emits triples row-by-row through rdflib
(``graph/rdf/rdf.py:157-215``); here triple lines are a pure column
projection (JVM-side concat) written as text — distributed, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE = "urn:bdf"


def node_triples(vertices: DataFrame) -> DataFrame:
    """<urn:bdf:node:ID> <urn:bdf:pred:type> "TYPE" ."""
    return vertices.select(
        F.concat(
            F.lit(f"<{BASE}:node:"), F.col("id").cast("string"),
            F.lit(f"> <{BASE}:pred:type> \""), F.col("type"), F.lit('" .'),
        ).alias("triple")
    )


def edge_triples(edges: DataFrame, predicate: str = "links_to") -> DataFrame:
    """<urn:bdf:node:SRC> <urn:bdf:pred:links_to> <urn:bdf:node:DST> ."""
    return edges.select(
        F.concat(
            F.lit(f"<{BASE}:node:"), F.col("src").cast("string"),
            F.lit(f"> <{BASE}:pred:{predicate}> <{BASE}:node:"),
            F.col("dst").cast("string"), F.lit("> ."),
        ).alias("triple")
    )


def write_ntriples(vertices: DataFrame, edges: DataFrame, path: str) -> None:
    node_triples(vertices).unionByName(edge_triples(edges)).write.mode(
        "overwrite"
    ).text(path)
