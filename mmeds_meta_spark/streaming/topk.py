"""Bounded-memory streaming heavy hitters: SpaceSaving top-k per group.

"Who are the top spenders per event type, right now?" over an unbounded
stream cannot keep a counter per user — state must be bounded.
SpaceSaving (Metwally et al. 2005) keeps exactly ``m`` counters per
group: a tracked key increments its counter; an untracked key EVICTS the
minimum counter and inherits its count (recording that inherited amount
as the new counter's error bound).  Guarantees, with n = total observed
weight: (a) any key with true weight > n/m is tracked; (b) for every
tracked key, counter ≥ true ≥ counter − err.

Implemented as ``applyInPandasWithState`` grouped by event_type —
arbitrary stateful logic Spark's windowed aggs can't express — in
``update`` output mode: each micro-batch emits the group's refreshed
top-k snapshot (tagged with a monotone ``version`` so consumers keep the
latest).  State per group: 3 parallel arrays of length ≤ m — bounded by
construction, independent of user cardinality or stream length.  Values
are long micro-units (round(value,6)·10⁶) so state arithmetic is exact
integer — no float drift across checkpoints.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.event_time import event_time_us
from .rollup import events_schema

if TYPE_CHECKING:
    import pandas as pd

M_COUNTERS = 20
TOP_K = 10

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("version", T.LongType()),
        T.StructField("rank", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("est_value_micros", T.LongType()),
        T.StructField("err_micros", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("users", T.ArrayType(T.LongType())),
        T.StructField("cnts", T.ArrayType(T.LongType())),
        T.StructField("errs", T.ArrayType(T.LongType())),
        T.StructField("version", T.LongType()),
    ]
)


def spacesaving_update(counters: dict, user: int, w: int, m: int) -> None:
    """One SpaceSaving step on {user: [cnt, err]} with capacity m."""
    if user in counters:
        counters[user][0] += w
    elif len(counters) < m:
        counters[user] = [w, 0]
    else:
        evict = min(counters, key=lambda u: (counters[u][0], u))
        c_min = counters[evict][0]
        del counters[evict]
        counters[user] = [c_min + w, c_min]


def _topk(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
    import pandas as pd

    (etype,) = key
    if state.hasTimedOut:  # pragma: no cover - no timeout configured
        state.remove()
        yield pd.DataFrame([], columns=[f.name for f in OUTPUT_SCHEMA.fields])
        return
    users, cnts, errs, version = (
        state.get if state.exists else ([], [], [], 0)
    )
    counters = {u: [c, e] for u, c, e in zip(users, cnts, errs)}
    rows = []
    for pdf in pdfs:
        rows.extend(
            pdf[["ts_us", "event_id", "user_id", "v_micros"]].itertuples(index=False)
        )
    rows.sort(key=lambda r: (r.ts_us, r.event_id))  # deterministic replay order
    for r in rows:
        spacesaving_update(counters, int(r.user_id), int(r.v_micros), M_COUNTERS)
    version += 1
    items = sorted(counters.items(), key=lambda kv: (-kv[1][0], kv[0]))
    state.update(
        (
            [u for u, _ in items],
            [c for _, (c, _e) in items],
            [e for _, (_c, e) in items],
            version,
        )
    )
    out = [
        (etype, version, i + 1, u, c, e)
        for i, (u, (c, e)) in enumerate(items[:TOP_K])
    ]
    yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])


def streaming_topk_spenders(spark: SparkSession, events_dir: str) -> DataFrame:
    """Per-event-type SpaceSaving top-{k} users by cumulative value.

    Update-mode snapshots: keep the max-``version`` rows per event_type
    for the current answer."""
    schema = events_schema(spark, events_dir)
    ev = (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        .withColumn("ts_us", event_time_us(schema))
        # round AFTER scaling (repo-wide micro-unit convention, cf. w11 /
        # streaming rollup): round-then-multiply can land a hair below the
        # integer (8.165 → 8164999.999…) and truncate off by one micro-unit
        .withColumn(
            "v_micros",
            F.expr("CAST(ROUND(value * 1000000) AS BIGINT)"),
        )
    )
    return ev.groupBy("event_type").applyInPandasWithState(
        _topk,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


streaming_topk_spenders.__doc__ = streaming_topk_spenders.__doc__.format(k=TOP_K)
