"""Streaming rollups over the events feed.

The ``ts`` encoding of ``events.parquet`` has changed between driver data
regenerations (long ns vs timestamp[us]); the stream schema is therefore
taken from the files actually present (one driver-side footer read) and
event time is derived via the dtype-dispatched helpers in
functions/event_time.py — never a hardcoded encoding.

Both builders return un-started streaming DataFrames: callers attach
their own sink/trigger (tests use availableNow + memory sink, production
would use a Delta/parquet sink with checkpointing — exactly-once comes
from the checkpoint + idempotent sink pair).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from ..functions.event_time import event_ts


def events_schema(spark: SparkSession, events_dir: str) -> T.StructType:
    """Schema of the events feed as the files actually encode it (footer
    read only — no data scan).  Streaming sources require an explicit
    schema; inferring it from the live directory is what keeps the stream
    correct across driver data regenerations."""
    return spark.read.parquet(events_dir).schema


def _event_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    schema = events_schema(spark, events_dir)
    return (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        .withColumn("event_ts", event_ts(schema))
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


def _parquet_bytes(path: str) -> int:
    """On-disk footprint of a parquet file-or-directory (no scan)."""
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def streaming_enrich(
    spark: SparkSession,
    events_dir: str,
    sf_dir: str,
    broadcast_cap_bytes: int = 10 * 1024 * 1024,
) -> DataFrame:
    """Stream-static enrichment: the event stream joined to the customer
    dimension (user_id = c_custkey) with the nation name attached — the
    standard "enrich facts in flight" micro-batch pattern.

    The static side is batch DataFrames, re-resolved per micro-batch by
    Structured Streaming.  The broadcast hint is SIZE-GATED, not
    unconditional: a customer dimension grows with the dataset, and
    force-broadcasting a dimension past the executor-memory budget OOMs
    at real scale.  Below ``broadcast_cap_bytes`` (default = Spark's own
    10 MB ``autoBroadcastJoinThreshold`` default) the hint pins every
    micro-batch to a broadcast hash join (no per-batch shuffle of the
    stream); above it we leave strategy choice to Catalyst, which
    shuffles the dimension once per micro-batch — the correct trade once
    the dimension no longer fits per-executor.  Dimension size is
    estimated once at plan time from the parquet file footprint (cheap,
    no scan).  Update the dimension files and the NEXT micro-batch sees
    the new rows (slowly-changing dims need a versioned static source
    instead).  Unmatched events keep NULL enrichment columns (left join)
    rather than silently dropping."""
    ev = _event_stream(spark, events_dir)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
        "c_nationkey",
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("nation")
    )
    # nation is a fixed 25-row table — always broadcastable; the customer
    # dimension is gated on its parquet footprint (compressed bytes are a
    # LOWER bound on in-memory size, so this errs toward broadcasting —
    # callers with memory-tight executors should pass a smaller cap).
    dim = cust.join(F.broadcast(nation), "c_nationkey", "left").select(
        "user_id", "segment", "nation"
    )
    dim_bytes = _parquet_bytes(f"{sf_dir}/customer.parquet")
    if dim_bytes <= broadcast_cap_bytes:
        dim = F.broadcast(dim)
    return ev.join(dim, "user_id", "left").select(
        "event_id", "event_ts", "user_id", "event_type", "value", "segment", "nation"
    )
