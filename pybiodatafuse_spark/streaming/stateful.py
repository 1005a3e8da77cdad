"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming (SURVEY.md §2.9); at crawl scale the engine
needs incremental per-key state — e.g. cumulative per-domain page counters
that survive across micro-batches and restarts (state lives in the stream
checkpoint). ``running_counts`` is the minimal such operator: per-key event
count + value sum, updated per micro-batch, emitted in update mode.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total_value": [total]})


def running_counts(events: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Streaming cumulative (count, sum(value)) per key; state persists in
    the query checkpoint, so a restarted query resumes the counters."""
    return (
        events.selectExpr(f"{key_col} as key", "value")
        .groupBy("key")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
