"""K5/K7 connector-shaped sinks: distributed payload formatting with
pluggable (recording) transports; honest ImportError without a driver."""

from __future__ import annotations

import glob
import json
import os

import pytest

from pybiodatafuse_spark.sinks.connectors import (
    EDGE_CYPHER,
    NODE_CYPHER,
    cytoscape_elements,
    neo4j_statements,
    push_cytoscape,
    write_neo4j,
)


@pytest.fixture()
def graph(spark):
    verts = spark.createDataFrame(
        [(i, f"node {i}", "even" if i % 2 == 0 else "odd") for i in range(10)],
        "id long, label string, type string",
    )
    edges = spark.createDataFrame(
        [(i, (i + 1) % 10, 1.0, 1) for i in range(10)],
        "src long, dst long, weight double, etype int",
    )
    return verts, edges


def test_neo4j_statements_batch_shape(spark, graph):
    verts, edges = graph
    stmts = neo4j_statements(verts, edges, batch_size=4).collect()
    # every batch is bounded and typed with the right cypher
    assert all(r["n_rows"] <= 4 for r in stmts)
    by_kind = {"nodes": 0, "edges": 0}
    for r in stmts:
        rows = json.loads(r["rows_json"])
        assert len(rows) == r["n_rows"]
        by_kind[r["kind"]] += len(rows)
        expect = NODE_CYPHER if r["kind"] == "nodes" else EDGE_CYPHER
        assert r["cypher"] == expect
    assert by_kind == {"nodes": 10, "edges": 10}
    # row payloads carry the merge keys
    node_rows = [
        row
        for r in stmts
        if r["kind"] == "nodes"
        for row in json.loads(r["rows_json"])
    ]
    assert {row["id"] for row in node_rows} == set(range(10))
    assert all({"id", "label", "type"} <= set(row) for row in node_rows)


def test_write_neo4j_streams_all_batches(spark, graph, tmp_path):
    verts, edges = graph
    out = str(tmp_path / "sent")
    os.makedirs(out)

    def transport(cypher, rows):  # runs ON EXECUTORS; records to shared disk
        import uuid

        with open(os.path.join(out, f"{uuid.uuid4().hex}.json"), "w") as f:
            json.dump({"cypher": cypher, "rows": rows}, f)

    post = write_neo4j(verts, edges, batch_size=3, transport=transport)
    sent = [json.load(open(p)) for p in glob.glob(f"{out}/*.json")]
    got_nodes = {
        r["id"] for s in sent if s["cypher"] == NODE_CYPHER for r in s["rows"]
    }
    got_edges = {
        (r["src"], r["dst"])
        for s in sent
        if s["cypher"] == EDGE_CYPHER
        for r in s["rows"]
    }
    assert got_nodes == set(range(10))
    assert got_edges == {(i, (i + 1) % 10) for i in range(10)}
    assert all(len(s["rows"]) <= 3 for s in sent)
    # post-import re-typing statements returned for the caller's O(1) pass
    assert len(post) == 2 and all("apoc" in s for s in post)


def test_neo4j_without_driver_raises_actionable(spark, graph):
    verts, edges = graph
    with pytest.raises(ImportError, match="neo4j bolt driver"):
        write_neo4j(verts, edges)


def test_cytoscape_payload_and_style(spark, graph):
    verts, edges = graph
    els = {r["kind"]: 0 for r in cytoscape_elements(verts, edges).collect()}

    calls = []
    push_cytoscape(
        verts, edges, network_name="net1",
        transport=lambda url, payload: calls.append((url, payload)),
    )
    assert [u for u, _ in calls] == [
        "http://127.0.0.1:1234/v1/networks",
        "http://127.0.0.1:1234/v1/styles",
    ]
    net = calls[0][1]
    assert net["data"]["name"] == "net1"
    nodes, edges_p = net["elements"]["nodes"], net["elements"]["edges"]
    assert len(nodes) == 10 and len(edges_p) == 10
    # reference _replace_graph_attrs renames: type -> node_type,
    # edge label -> interaction; ids are strings in cytoscape json
    assert nodes[0]["data"].keys() == {"id", "node_type", "label"}
    assert {n["data"]["node_type"] for n in nodes} == {"even", "odd"}
    assert edges_p[0]["data"]["interaction"] == "links_to"
    assert isinstance(edges_p[0]["data"]["source"], str)
    style = calls[1][1]
    assert style["defaults"]["NODE_FILL_COLOR"] == "#808080"
    # per-node-type discrete mappings (reference cytoscape.py:83-117:
    # color + shape keyed on node_type, passthrough label)
    by_prop = {m["visualProperty"]: m for m in style["mappings"]}
    assert set(by_prop) == {"NODE_FILL_COLOR", "NODE_SHAPE", "NODE_LABEL"}
    color_map = {e["key"]: e["value"] for e in by_prop["NODE_FILL_COLOR"]["map"]}
    assert set(color_map) == {"even", "odd"}
    assert all(v.startswith("#") and len(v) == 7 for v in color_map.values())
    shape_map = {e["key"]: e["value"] for e in by_prop["NODE_SHAPE"]["map"]}
    assert set(shape_map.values()) <= {
        "ELLIPSE", "HEXAGON", "DIAMOND", "RECTANGLE", "ROUND_RECTANGLE", "OCTAGON",
    }
    assert by_prop["NODE_LABEL"]["mappingType"] == "passthrough"
    assert set(els) == {"nodes", "edges"}


def test_cytoscape_row_guard(spark, graph):
    verts, edges = graph
    with pytest.raises(ValueError, match="max_rows"):
        push_cytoscape(verts, edges, max_rows=5, transport=lambda u, p: None)
    with pytest.raises(ImportError, match="Cytoscape REST"):
        push_cytoscape(verts, edges)
