"""Custom stateful streaming operator: per-user session aggregation via
``applyInPandasWithState`` — the pattern for semantics Spark's built-in
windowed aggregations can't express (gap-based sessions whose lifetime
depends on the data, not the clock grid).

State per user: the open session's (start_us, last_us, n_events).  An
incoming batch extends or closes sessions; closed sessions are emitted,
the open one stays in state until the event-time timeout fires.  This is
the streaming twin of the batch ``w4_sessionization`` operator — same
gap rule, same output columns.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.event_time import event_time_us, event_ts
from .rollup import events_schema

if TYPE_CHECKING:
    import pandas as pd

SESSION_GAP_US = 30 * 60 * 1_000_000

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _sessionize(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
    import pandas as pd

    (user_id,) = key
    out = []
    if state.hasTimedOut:
        start, last, n = state.get
        out.append((user_id, start, last, n))
        state.remove()
    else:
        # ts_us is normalized to long µs Spark-side (event_time_us), so the
        # UDF never sees the raw encoding
        ts = []
        for pdf in pdfs:
            ts.extend(pdf["ts_us"].tolist())
        ts.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        for t in ts:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > SESSION_GAP_US:
                out.append((user_id, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = max(last, t), n + 1
        if start is not None:
            # the open session stays ONLY in state; it is emitted exactly
            # once, when its event-time timeout fires
            state.update((start, last, n))
            state.setTimeoutTimestamp(last // 1000 + SESSION_GAP_US // 1000)
    yield pd.DataFrame(
        out, columns=["user_id", "session_start_us", "session_end_us", "n_events"]
    )


def streaming_sessionize(spark: SparkSession, events_dir: str) -> DataFrame:
    """Gap-based streaming sessions: groupBy(user).applyInPandasWithState
    with event-time timeout = last event + gap.  Arrow-batched; state is
    3 longs per open session — bounded by active users, not history."""
    schema = events_schema(spark, events_dir)
    ev = (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        .withColumn("ts_us", event_time_us(schema))
        .withColumn("event_ts", event_ts(schema))
        .withWatermark("event_ts", "1 hour")
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
