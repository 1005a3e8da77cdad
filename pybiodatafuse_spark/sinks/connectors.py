"""Live graph-database connectors (SURVEY.md K5/K7 tail) — connector-SHAPED,
honestly stubbed transports.

Reference behavior being restated:

- Neo4j (``graph/neo4j.py:506-…`` ``load_graph``): connects with the bolt
  driver, then saves nodes and relationships ONE AT A TIME through neomodel
  OGM ``.save()`` calls in a driver-side loop — O(N) round-trips through a
  single Python process. ``graph/neo4j.py:391-477`` ``exporter`` instead
  ships a GraphML file into the server's import folder and post-processes
  labels/relationship types with two apoc UNWIND statements.
- Cytoscape (``graph/cytoscape.py:62-117`` ``load_graph``): renames node
  ``label``→``node_type`` / ``name``→``label`` and edge ``label``→
  ``interaction`` (``:12-47`` ``_replace_graph_attrs``), converts to
  cytoscape JSON and POSTs it to a running Cytoscape REST instance via
  py4cytoscape, then applies a visual style.

Spark restatement: the O(N) work — Cypher/JSON payload FORMATTING and
batching — runs distributed on executors (pure column projections + a
per-partition chunking pass); only the actual wire call goes through a
pluggable ``transport`` callable, because neither the ``neo4j`` driver nor
a Cytoscape instance exists in this container. The default transport raises
an actionable ImportError (the same honest-stub contract as
``operators/multimodal.py``'s codec stubs); tests inject a recording
transport and verify the full payload stream. At 100 TB the batches stream
from every executor concurrently (Neo4j's recommended UNWIND-batch import
shape) instead of the reference's single-threaded driver loop.
"""

from __future__ import annotations

import json
from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# UNWIND-batch import statements (the distributed analogue of the
# reference's per-node/per-edge OGM saves, neo4j.py:506-...; generic label +
# type property mirrors exporter's readLabels import, with the same two
# apoc post-passes re-typing nodes/relationships, neo4j.py:450-476)
NODE_CYPHER = (
    "UNWIND $rows AS row "
    "MERGE (n:Node {id: row.id}) "
    "SET n.label = row.label, n.type = row.type"
)
EDGE_CYPHER = (
    "UNWIND $rows AS row "
    "MATCH (a:Node {id: row.src}) MATCH (b:Node {id: row.dst}) "
    "MERGE (a)-[r:links_to]->(b) SET r.weight = row.weight"
)
POST_IMPORT_CYPHER = (
    # assign node types from the imported property (reference neo4j.py:452-460)
    "MATCH (n) WITH COLLECT(DISTINCT n.type) AS propertyValues, n "
    "UNWIND propertyValues AS propValue MATCH (n) WHERE n.type = propValue "
    "WITH n, propValue AS newLabel "
    "CALL apoc.create.addLabels(n, [newLabel]) YIELD node RETURN node",
    # assign relationship types (reference neo4j.py:463-476)
    "MATCH (source)-[r]->(target) "
    "WITH COLLECT(DISTINCT r.interaction) AS propertyValues, r "
    "UNWIND propertyValues AS propValue "
    "MATCH (source)-[r]->(target) WHERE r.interaction = propValue "
    "WITH r, source, target, propValue AS newType "
    "CALL apoc.create.relationship(source, newType, {}, target) YIELD rel "
    "DELETE r RETURN rel",
)


def _default_neo4j_transport(*_args, **_kwargs):
    raise ImportError(
        "neo4j bolt driver is not installed in this environment; pass "
        "transport=lambda cypher, rows: session.run(cypher, rows=rows) "
        "built from neo4j.GraphDatabase.driver(uri, auth=...) to "
        "write_neo4j (reference graph/neo4j.py:479-503 connect_db)"
    )


def neo4j_statements(
    vertices: DataFrame, edges: DataFrame, *, batch_size: int = 1000
) -> DataFrame:
    """(kind, cypher, rows_json, n_rows): one row per UNWIND batch, formatted
    DISTRIBUTED — the JSON rows arrays are assembled per partition on
    executors; no driver loop touches individual nodes/edges."""
    nodes = vertices.select(
        F.to_json(F.struct("id", "label", "type")).alias("row_json")
    ).withColumn("kind", F.lit("nodes"))
    rels = edges.select(
        F.to_json(F.struct("src", "dst", "weight")).alias("row_json")
    ).withColumn("kind", F.lit("edges"))
    both = nodes.unionByName(rels)
    schema = "kind string, cypher string, rows_json string, n_rows long"

    def chunk(it: Iterable) -> Iterator:
        import pandas as pd

        buf: dict[str, list[str]] = {"nodes": [], "edges": []}

        def flush(kind: str):
            rows = buf[kind]
            if not rows:
                return None
            cypher = NODE_CYPHER if kind == "nodes" else EDGE_CYPHER
            out = pd.DataFrame(
                {
                    "kind": [kind],
                    "cypher": [cypher],
                    "rows_json": ["[" + ",".join(rows) + "]"],
                    "n_rows": [len(rows)],
                }
            )
            buf[kind] = []
            return out

        for pdf in it:
            for kind, row_json in zip(pdf["kind"], pdf["row_json"]):
                buf[kind].append(row_json)
                if len(buf[kind]) >= batch_size:
                    yield flush(kind)
        for kind in ("nodes", "edges"):
            out = flush(kind)
            if out is not None:
                yield out

    return both.mapInPandas(chunk, schema=schema)


def write_neo4j(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    batch_size: int = 1000,
    transport: Callable[[str, list[dict]], None] | None = None,
) -> tuple[str, ...]:
    """K5 connector: stream UNWIND-batched MERGE statements to Neo4j from
    every executor in parallel (vs the reference's driver-side one-row-at-a-
    time OGM saves, neo4j.py:506-...). ``transport(cypher, rows)`` is called
    per batch ON THE EXECUTORS; returns the post-import re-typing statements
    the caller should run once (driver-side, O(1)) after the stream.
    """
    if transport is None:
        # fail at the driver, not as an opaque executor-side Py4J error
        _default_neo4j_transport()
    stmts = neo4j_statements(vertices, edges, batch_size=batch_size)

    def send(rows: Iterable) -> None:
        for r in rows:
            transport(r["cypher"], json.loads(r["rows_json"]))

    stmts.foreachPartition(send)
    return POST_IMPORT_CYPHER


CYTOSCAPE_STYLE = {
    # reference cytoscape.py:87-92 visual-style defaults
    "title": "BioDataFuse_style",
    "defaults": {"NODE_FILL_COLOR": "#808080", "EDGE_TARGET_ARROW_SHAPE": "ARROW"},
}

# the reference cycles every node type through a fixed shape vocabulary
# (constants.py:1319-1338 ALL_NODE_LABELS values)
CYTOSCAPE_SHAPES = [
    "ELLIPSE", "HEXAGON", "DIAMOND", "RECTANGLE", "ROUND_RECTANGLE", "OCTAGON",
]


def cytoscape_style(vertices: DataFrame, *, style_name: str = "BioDataFuse_style") -> dict:
    """Full visual-style payload with per-node-type discrete mappings —
    the Spark restatement of the reference's style application
    (graph/cytoscape.py:83-117: create_visual_style defaults +
    set_node_color_mapping / set_node_shape_mapping keyed on ``node_type``
    + set_node_label_mapping on ``labels``).

    The reference hardcodes a biological type→color/shape table
    (constants.py ALL_NODE_LABELS / COLOR_MAPPER); a generic link graph has
    an open type vocabulary, so the distinct types are computed DISTRIBUTED
    (one column-pruned distinct over the vertex table) and each type gets a
    deterministic md5-derived color plus a shape cycled from the
    reference's shape vocabulary. The payload stays O(#types)."""
    import hashlib

    types = [
        r["type"]
        for r in vertices.select("type")
        .where(F.col("type").isNotNull())
        .distinct()
        .orderBy("type")
        .collect()
    ]

    def color(t: str) -> str:
        return "#" + hashlib.md5(t.encode("utf-8")).hexdigest()[:6]

    mappings = [
        {
            "mappingType": "discrete",
            "mappingColumn": "node_type",
            "mappingColumnType": "String",
            "visualProperty": "NODE_FILL_COLOR",
            "map": [{"key": t, "value": color(t)} for t in types],
        },
        {
            "mappingType": "discrete",
            "mappingColumn": "node_type",
            "mappingColumnType": "String",
            "visualProperty": "NODE_SHAPE",
            "map": [
                {"key": t, "value": CYTOSCAPE_SHAPES[i % len(CYTOSCAPE_SHAPES)]}
                for i, t in enumerate(types)
            ],
        },
        {
            # reference cytoscape.py:111-113 set_node_label_mapping(LABEL)
            "mappingType": "passthrough",
            "mappingColumn": "label",
            "mappingColumnType": "String",
            "visualProperty": "NODE_LABEL",
        },
    ]
    return {
        "title": style_name,
        "defaults": dict(CYTOSCAPE_STYLE["defaults"]),
        "mappings": mappings,
    }


def _default_cytoscape_transport(*_args, **_kwargs):
    raise ImportError(
        "no running Cytoscape REST instance in this environment; pass "
        "transport=lambda url, payload: requests.post(url, json=payload) "
        "to push_cytoscape (reference graph/cytoscape.py:62-117 load_graph "
        "via py4cytoscape)"
    )


def cytoscape_elements(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """(kind, element_json): cytoscape-JSON node/edge elements with the
    reference's attribute renames (_replace_graph_attrs, cytoscape.py:12-47):
    node ``type``→``node_type``, ``label`` stays the display label; edge
    carries source/target/interaction. Formatting is a pure column
    projection — distributed, no driver loop."""
    nodes = vertices.select(
        F.lit("nodes").alias("kind"),
        F.to_json(
            F.struct(
                F.struct(
                    F.col("id").cast("string").alias("id"),
                    F.col("type").alias("node_type"),
                    F.col("label").alias("label"),
                ).alias("data")
            )
        ).alias("element_json"),
    )
    rels = edges.select(
        F.lit("edges").alias("kind"),
        F.to_json(
            F.struct(
                F.struct(
                    F.col("src").cast("string").alias("source"),
                    F.col("dst").cast("string").alias("target"),
                    F.lit("links_to").alias("interaction"),
                ).alias("data")
            )
        ).alias("element_json"),
    )
    return nodes.unionByName(rels)


def push_cytoscape(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    network_name: str = "Network",
    base_url: str = "http://127.0.0.1:1234/v1",
    max_rows: int = 100_000,
    transport: Callable[[str, dict], None] | None = None,
) -> None:
    """K7-adjacent connector: POST the graph to a running Cytoscape REST
    instance (reference load_graph → py4cytoscape create_network_from_
    networkx + visual style). Element JSON is formatted distributed; the
    final POST is inherently a driver→REST push, so it is guarded by
    ``max_rows`` exactly like the K4 JSON sink. Sends two calls through
    ``transport(url, payload)``: the network and the visual style."""
    if transport is None:
        _default_cytoscape_transport()
    els = cytoscape_elements(vertices, edges)
    n = els.count()
    if n > max_rows:
        raise ValueError(
            f"cytoscape push is a driver-side REST POST; {n} elements exceeds "
            f"max_rows={max_rows} — export with save_graph/write_ntriples "
            "instead, or raise max_rows explicitly"
        )
    grouped: dict[str, list[dict]] = {"nodes": [], "edges": []}
    for r in els.collect():
        grouped[r["kind"]].append(json.loads(r["element_json"]))
    payload = {
        "data": {"name": network_name},
        "elements": {"nodes": grouped["nodes"], "edges": grouped["edges"]},
    }
    transport(f"{base_url}/networks", payload)
    transport(f"{base_url}/styles", cytoscape_style(vertices))
