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
