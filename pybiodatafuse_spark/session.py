"""SparkSession factory with scale-appropriate defaults.

Local-mode testing uses ``local[N]``; the same builder config is what we'd
ship to a multi-executor cluster via ``spark-submit --py-files`` (the
cluster-only knobs — executor memory/instances — come from submit args, not
code). AQE is on so runtime skew-join/coalesce backstops our explicit salting.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "pybiodatafuse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so the
    benchmark harness can run the identical job at two parallelism levels.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # SPARK_GRAFT_MASTER overrides: e.g. "local-cluster[4,2,6144]" gives the
    # bench a REAL multi-executor topology (separate executor JVMs) for the
    # north rule's N-vs-4N-executors scaling evidence
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    parts = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # explicit (it's the default): reused Python workers are what make the
        # CSR sidecar block cache (plans/csr._WORKER_BLOCK_CACHE) a hit after
        # the first superstep
        .config("spark.python.worker.reuse", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
