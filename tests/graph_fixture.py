"""Shared helpers: build the Spark graph + the aligned oracle graph from the
deterministic pages fixture, mapping Spark's xxhash64 vertex ids back to
synthetic page ids via the url column."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from pybiodatafuse_spark.datagen import expected_edges_pdf
from pybiodatafuse_spark.operators.edges import build_edges, build_vertices


def spark_graph(pages_df: DataFrame):
    verts = build_vertices(pages_df)
    edges = build_edges(pages_df, verts)
    return verts, edges


def id_maps(verts: DataFrame):
    """url -> spark vertex id and page_id -> spark id (urls embed page ids)."""
    rows = verts.select("id", "url").collect()
    url_to_id = {r["url"]: r["id"] for r in rows}
    page_to_id = {int(u.rsplit("/p", 1)[1]): i for u, i in url_to_id.items()}
    return url_to_id, page_to_id


def oracle_edges(n_pages: int, page_to_id: dict[int, int]):
    """Weighted oracle edge list in spark-id space: [(src, dst, weight)]."""
    pdf = expected_edges_pdf(n_pages)
    grouped = pdf.groupby(["src_page", "dst_page"]).size().reset_index(name="w")
    return [
        (page_to_id[int(s)], page_to_id[int(d)], float(w))
        for s, d, w in grouped.itertuples(index=False)
    ]
