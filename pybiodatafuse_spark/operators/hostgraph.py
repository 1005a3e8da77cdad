"""Host-level (domain) rollup of the page link graph.

Reference analogue: the per-namespace aggregation the reference applies when
collapsing per-source annotations (``/root/reference/src/pyBiodatafuse/utils.py:286-310``
normalizes identifier namespaces the way a link graph normalizes page URLs to
their hosts). For a Common-Crawl-style corpus the host graph is the standard
first rollup: page-level edges (10^12-scale) collapse to host-level edges
(10^7-scale) on which the iterative algorithms (PageRank over hosts, host
spam-mass, etc.) are orders of magnitude cheaper.

Scale design: the rollup is two hash joins (edge endpoints → host of the
vertex) plus one partial-aggregatable groupBy — all built-in expressions, no
Python. At 10^12 edges the joins shuffle on the vertex id (the same key the
edge table is already produced on by ``build_edges``), and the groupBy's
map-side combine collapses the fan-in before the exchange: the shuffle volume
of the final agg is bounded by (distinct host pairs per partition), not edges.
``host_of`` is a single JVM regexp so extraction fuses into the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# authority without scheme/userinfo/port/path; anchored to the scheme so
# non-URLs yield '' (dropped). The SQL oracle uses the identical pattern.
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"


def host_of(url: Column) -> Column:
    """Lower-cased registered host of a URL column, NULL when there is none
    (non-URL strings, mailto:, fragments). Pure built-in (regexp) — stays in
    whole-stage codegen."""
    h = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    return F.when(h != "", h)


def host_graph(
    edges: DataFrame,
    vertices: DataFrame,
    *,
    url_col: str = "url",
    weight_col: str = "weight",
) -> DataFrame:
    """Collapse a page-level edge list to a host-level edge list.

    ``edges(src, dst, weight, ...)`` with vertex-id endpoints;
    ``vertices(id, url, ...)``. Returns
    ``(src_host, dst_host, weight, n_src_pages)`` where ``weight`` is the
    summed page-edge weight and ``n_src_pages`` the number of distinct source
    pages contributing. Intra-host edges (``src_host == dst_host``) are kept —
    callers filter if they want the inter-host graph only.
    """
    hosts = vertices.select(
        F.col("id"), host_of(F.col(url_col)).alias("host")
    ).where(F.col("host").isNotNull())
    e = (
        edges.join(
            hosts.select(F.col("id").alias("src"), F.col("host").alias("src_host")),
            "src",
        )
        .join(
            hosts.select(F.col("id").alias("dst"), F.col("host").alias("dst_host")),
            "dst",
        )
    )
    return e.groupBy("src_host", "dst_host").agg(
        F.sum(F.col(weight_col)).alias("weight"),
        F.countDistinct("src").alias("n_src_pages"),
    )
