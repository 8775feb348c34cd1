"""Streaming rollups over the events feed.

``events.parquet`` carries TIMESTAMP(NANOS) which arrives as long ns (see
session.py); the streams convert to a proper timestamp for watermarking.

Both builders return un-started streaming DataFrames: callers attach
their own sink/trigger (tests use availableNow + memory sink, production
would use a Delta/parquet sink with checkpointing — exactly-once comes
from the checkpoint + idempotent sink pair).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # ns since epoch (nanosAsLong)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _event_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(events_dir)
        .withColumn("event_ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    )


def streaming_event_rollup(
    spark: SparkSession,
    events_dir: str,
    *,
    window: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Watermarked windowed aggregate: per (window, event_type) count +
    decimal-exact value sum.  Late rows beyond the watermark are dropped;
    state is bounded by watermark horizon × group cardinality."""
    ev = _event_stream(spark, events_dir)
    return (
        ev.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value"), 6).cast("decimal(28,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_exact_dedup(
    spark: SparkSession, events_dir: str, *, watermark: str = "2 days"
) -> DataFrame:
    """Arrival dedup on event_id within the watermark horizon
    (dropDuplicatesWithinWatermark): the streaming face of the exact-dedup
    operator — state stays bounded, duplicates across the horizon are the
    batch job's business."""
    ev = _event_stream(spark, events_dir)
    return ev.withWatermark("event_ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
