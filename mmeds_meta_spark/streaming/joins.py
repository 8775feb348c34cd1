"""Stream-stream joins over the events feed.

The batch engine's attribution range join (``w5_range_join_bucketed``,
operators/filters_misc.py) answers "which events followed this purchase
within W" over a static corpus; this module is its INCREMENTAL shape: two
live feeds (purchases, activity) joined as they arrive, with watermarks on
BOTH sides so the join state ages out instead of growing with the stream.

Spark's stream-stream inner join requires exactly what the batch operator's
bucketing encodes manually: an equi-key (user_id) plus a bounded time-range
predicate.  The range bound + watermark is what lets the state store drop a
buffered purchase once no future event can still land in its window —
state is O(active horizon), never O(stream history).

Reference parity: none (the reference has no streams, SURVEY §2.12); this
is part of the beyond-reference incremental toolkit, next to the streaming
rollups and the incremental near-dup.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.event_time import event_ts
from .rollup import events_schema

_ATTR_WINDOW = "10 minutes"  # mirrors w5's _RANGE_W_US


def streaming_attribution_join(
    spark: SparkSession,
    events_dir: str,
    *,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Purchases ⋈ follow-up events within ``(t, t + 10 min]`` per user,
    as a watermarked stream-stream inner join.

    Emits one row per (purchase, follow-up event) pair in append mode —
    the pre-aggregation form of the batch ``w5`` operator (an exactly-
    once downstream agg turns it into the per-purchase rollup; joining
    and aggregating in one query would stack two stateful operators,
    which Spark supports but whose output-mode interplay is subtler
    than a pipeline needs).

    State bound: each side buffers only rows younger than
    ``watermark`` + the 10-minute range; a purchase is dropped from
    state as soon as the event-side watermark passes its window end."""
    schema = events_schema(spark, events_dir)

    def feed() -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .parquet(events_dir)
            .withColumn("event_ts", event_ts(schema))
        )

    purchases = (
        feed()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("event_ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    follows = (
        feed()
        .select(
            F.col("event_id").alias("follow_id"),
            F.col("user_id").alias("e_user"),
            F.col("event_ts").alias("e_ts"),
            F.col("value").alias("follow_value"),
        )
        .withWatermark("e_ts", watermark)
    )
    return purchases.join(
        follows,
        F.expr(
            f"p_user = e_user AND e_ts > p_ts AND e_ts <= p_ts + INTERVAL {_ATTR_WINDOW}"
        ),
    ).select("purchase_id", F.col("p_user").alias("user_id"), "p_ts", "follow_id", "e_ts", "follow_value")
