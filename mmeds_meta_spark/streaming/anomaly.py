"""Streaming seasonal-anomaly monitor: maintain the (event_type, hour)
moment baseline incrementally and score each micro-batch against the
CURRENT merged baseline.

The moments (s = Σhx, q = Σhx², n) are LINEAR, so the store follows the
CMS/histogram exactly-once convention: each micro-batch overwrites only
its own ``batch_id=N/`` partition with deterministic content (replay
rewrites, never double-counts), and the merged store — per-cell SUM
across batch partitions — equals the batch operator's moments over the
concatenated feed bit-exactly (integer sums, DECIMAL(38,0) state).
``store_flags`` therefore reproduces ``w15_seasonal_anomaly`` exactly
once the store has seen the same events (tested in
``tests/test_streaming_anomaly.py``).

The operational shape a monitor needs: the baseline lags the stream (a
batch is scored against moments that may or may not include it yet —
here: the merged store at read time), and the per-batch work is one
partial agg to ≤ |event_type|·24 rows plus a KB-sized partition write —
independent of feed volume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.filters_misc import SEASONAL_RULE, seasonal_moments, seasonal_prep
from .rollup import events_schema


def start_streaming_moments(
    spark: SparkSession,
    events_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Watch ``events_dir``; write each micro-batch's exact moment table
    to ``store_dir/moments/batch_id=N``."""
    schema = events_schema(spark, events_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )

    def _merge(batch: DataFrame, batch_id: int) -> None:
        moments = seasonal_moments(seasonal_prep(batch))
        moments.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(store_dir, "moments", f"batch_id={batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def store_baseline(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged (event_type, hour_of_day, s, q, n) baseline across all
    batches — equals the batch moments over the same events exactly."""
    from ._store import read_store

    mdir = os.path.join(store_dir, "moments")
    return (
        read_store(
            spark,
            mdir,
            "event_type STRING, hour_of_day INT,"
            " s DECIMAL(38,0), q DECIMAL(38,0), n DECIMAL(38,0)",
        )
        .groupBy("event_type", "hour_of_day")
        .agg(
            F.expr("SUM(s)").alias("s"),
            F.expr("SUM(q)").alias("q"),
            F.expr("SUM(n)").alias("n"),
        )
    )


def store_flags(spark: SparkSession, store_dir: str, events: DataFrame) -> DataFrame:
    """Score ``events`` against the store's current baseline with the
    batch operator's integer rule — identical flags once the store has
    absorbed the same feed."""
    ev = seasonal_prep(events)
    return (
        ev.join(F.broadcast(store_baseline(spark, store_dir)), ["event_type", "hour_of_day"])
        .filter(F.expr(SEASONAL_RULE))
        .select("event_id", "event_type", "hour_of_day", "value")
    )
