"""Custom stateful streaming operator: state accumulates across micro-batches
AND across query restarts (checkpointed state — the streaming face of the
north rule's resumability)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pybiodatafuse_spark.streaming.stateful import running_counts


def _write_batch(spark, path, start, n):
    rows = [(i, "click" if i % 2 == 0 else "view", float(i)) for i in range(start, start + n)]
    spark.createDataFrame(rows, "event_id long, event_type string, value double") \
        .write.mode("append").parquet(path)


def test_state_survives_batches_and_restart(spark, tmp_path):
    src = str(tmp_path / "events_in")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, 0, 10)
    schema = "event_id long, event_type string, value double"

    out = str(tmp_path / "out")

    def run_once(qname):
        # memory sink can't recover from a checkpoint; foreachBatch + parquet
        # is the restartable sink shape
        stream = spark.readStream.schema(schema).parquet(src)

        def sink(batch_df, batch_id):
            batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(out)

        q = (
            running_counts(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(out).collect()
        latest = {}
        for r in rows:
            if r["key"] not in latest or r["batch_id"] >= latest[r["key"]]["batch_id"]:
                latest[r["key"]] = r
        return {k: (r["n_events"], r["total_value"]) for k, r in latest.items()}

    first = run_once("rc1")
    assert first["click"][0] == 5 and first["view"][0] == 5

    # new files + a fresh query on the SAME checkpoint → counters resume
    _write_batch(spark, src, 10, 6)
    second = run_once("rc2")
    assert second["click"][0] == 8  # 5 + 3 (evens in 10..15)
    assert second["view"][0] == 8
    assert second["click"][1] == float(sum(i for i in range(16) if i % 2 == 0))


def test_streaming_dedup_drops_recrawls(spark, tmp_path):
    """Watermarked content-hash dedup: duplicate texts across micro-batches
    are dropped while the hash is inside the watermark state."""
    from pybiodatafuse_spark.streaming.events import streaming_dedup

    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "ckpt_dedup")
    schema = "doc_id long, text string, ts timestamp"

    def write_docs(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)

    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    write_docs([(1, "alpha text", t0), (2, "beta text", t0), (3, "alpha text", t0)])

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            streaming_dedup(stream, watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(r["doc_id"] for r in spark.read.parquet(out).collect())

    first = run_once()
    assert len(first) == 2  # one of the two "alpha text" docs dropped
    # a recrawl of the same content in a later micro-batch run (same
    # checkpoint, state persisted) is also dropped; new content passes
    write_docs([(4, "alpha text", t0 + dt.timedelta(minutes=30)),
                (5, "gamma text", t0 + dt.timedelta(minutes=30))])
    second = run_once()
    assert len(second) == 3 and 5 in second and 4 not in second
    # STATE EVICTION (the OOM-on-unbounded-crawl guard): advance the
    # watermark past alpha's event time + delay (t0+2h) with an unrelated
    # doc at t0+5h, after which the alpha hash state is evicted...
    write_docs([(6, "delta text", t0 + dt.timedelta(hours=5))])
    third = run_once()
    assert 6 in third
    # ...so a recrawl AFTER eviction re-enters (dedup is within-horizon by
    # design; the batch compaction job catches cross-horizon dups)
    write_docs([(7, "alpha text", t0 + dt.timedelta(hours=5, minutes=30))])
    fourth = run_once()
    assert 7 in fourth
