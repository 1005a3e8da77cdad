"""Multimodal plumbing, summary/subgraph analyzers, export sinks, streaming."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from pybiodatafuse_spark.operators.multimodal import extract_features, synth_media
from pybiodatafuse_spark.operators.summarize import (
    edge_type_histogram,
    node_type_histogram,
    summary,
    typed_subgraph,
)
from pybiodatafuse_spark.sinks.export import save_graph, write_graphml
from tests.graph_fixture import spark_graph


def test_multimodal_features_plumbing(spark):
    media = synth_media(spark, 32)
    feats = extract_features(media, decode_fn="fake", batch_partitions=4)
    rows = feats.collect()
    assert len(rows) == 32
    assert all(len(r["features"]) == 8 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    # deterministic across partitionings
    again = {r["media_id"]: r["features"] for r in extract_features(media, decode_fn="fake").collect()}
    assert all(again[r["media_id"]] == r["features"] for r in rows)


def test_multimodal_real_decode_is_stubbed(spark):
    media = synth_media(spark, 4)
    with pytest.raises(Exception) as ei:
        extract_features(media, decode_fn="real").collect()
    assert "NotImplementedError" in str(ei.value) or "real media decode" in str(ei.value)


def test_summary_and_histograms(spark, pages_df):
    verts, edges = spark_graph(pages_df)
    s = summary(spark, verts, edges)
    assert s["num_nodes"] == 400
    assert s["num_edges"] == edges.count()
    assert s["num_weakly_connected_components"] >= 2
    assert 0 < s["density"] < 1
    hist = node_type_histogram(verts).collect()
    assert hist[0]["type"] == "page" and hist[0]["count"] == 400
    ehist = edge_type_histogram(edges).collect()
    assert ehist[0]["etype"] == 1


def test_typed_subgraph(spark):
    verts = spark.createDataFrame(
        [(1, "u1", "page"), (2, "u2", "media"), (3, "u3", "page")],
        "id long, url string, type string",
    )
    edges = spark.createDataFrame(
        [(1, 2, 1.0, 1), (1, 3, 1.0, 1), (2, 3, 1.0, 1)],
        "src long, dst long, weight double, etype int",
    )
    keep, sub = typed_subgraph(verts, edges, ["page"])
    assert keep.count() == 2
    assert [(r["src"], r["dst"]) for r in sub.collect()] == [(1, 3)]


def test_save_graph_sinks(spark, pages_df, tmp_path):
    verts, edges = spark_graph(pages_df)
    out = str(tmp_path / "g")
    save_graph(verts.limit(50), edges.limit(100), out,
               formats=("parquet", "edgelist", "tsv", "json"))
    assert spark.read.parquet(os.path.join(out, "vertices.parquet")).count() == 50
    el = spark.read.text(os.path.join(out, "edgelist")).collect()
    assert len(el) == 100 and all(len(r["value"].split(" ")) == 3 for r in el)
    nodes_tsv = spark.read.option("sep", "\t").option("header", True).csv(
        os.path.join(out, "tsv", "nodes")
    )
    assert nodes_tsv.count() == 50 and "attrs" in nodes_tsv.columns
    jl = spark.read.text(os.path.join(out, "json")).collect()
    parsed = [json.loads(r["value"]) for r in jl]
    assert {p["group"] for p in parsed} == {"nodes", "edges"}
    write_graphml(verts.limit(5), edges.limit(5), str(tmp_path / "g.graphml"))
    assert "<graphml" in open(tmp_path / "g.graphml").read()


def test_streaming_edges_and_windows(spark, pages_df, tmp_path):
    from pybiodatafuse_spark.streaming.events import (
        run_stream_to_parquet,
        stream_pages,
        streaming_edges,
        windowed_event_counts,
    )
    from pybiodatafuse_spark.operators.edges import build_edges

    src = str(tmp_path / "pages_in")
    pages_df.write.mode("overwrite").parquet(src)
    stream = streaming_edges(stream_pages(spark, src))
    q = run_stream_to_parquet(
        stream, str(tmp_path / "edges_out"), str(tmp_path / "ckpt"), once=True
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "edges_out"))
    # streaming extraction == batch extraction (pre-dedup/weight)
    batch = build_edges(pages_df, restrict_to_corpus=False)
    assert got.count() == batch.agg(F.sum("weight").cast("long").alias("s")).first()["s"]

    ev = spark.createDataFrame(
        [(i, f"2024-01-01 0{i % 3}:10:00", "click", 1.0) for i in range(9)],
        "event_id long, ts_s string, event_type string, value double",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value")
    ev_src = str(tmp_path / "events_in")
    ev.write.mode("overwrite").parquet(ev_src)
    estream = spark.readStream.schema(ev.schema).parquet(ev_src)
    agg = windowed_event_counts(estream, window="1 hour", watermark="2 hours")
    q2 = (
        agg.writeStream.format("memory").queryName("wincounts")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    res = spark.sql("select * from wincounts").collect()
    assert sum(r["n"] for r in res) == 9
    assert len(res) == 3


def test_multimodal_resize_plumbing(spark):
    from pybiodatafuse_spark.operators.multimodal import resize_images, synth_media

    media = synth_media(spark, 30)
    res = resize_images(media, width=4, height=4).collect()
    assert len(res) == 10  # every 3rd row is an image
    for r in res:
        assert r["width"] == 4 and r["height"] == 4
        assert len(r["pixels"]) == 16
        assert all(0 <= px <= 255 for px in r["pixels"])
    # deterministic
    res2 = resize_images(synth_media(spark, 30), width=4, height=4).collect()
    assert sorted(map(tuple, ((r["media_id"], tuple(r["pixels"])) for r in res))) == \
           sorted(map(tuple, ((r["media_id"], tuple(r["pixels"])) for r in res2)))


def test_multimodal_frame_sampling_explodes_rows(spark):
    from pybiodatafuse_spark.operators.multimodal import sample_frames, synth_media

    media = synth_media(spark, 30)  # videos have duration_ms=1000
    res = sample_frames(media, every_ms=250).collect()
    vids = {r["media_id"] for r in res}
    assert len(vids) == 10
    assert len(res) == 40  # 4 frames per video
    per = {}
    for r in res:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
        assert len(r["frame_feature"]) == 4
    assert all(sorted(v) == [0, 1, 2, 3] for v in per.values())
