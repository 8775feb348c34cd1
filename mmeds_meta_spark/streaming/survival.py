"""Streaming survival store: fold an event feed's per-user lifetime
partials as batches arrive, then compute the Kaplan-Meier curve and the
log-rank test with the batch operators' exact plans
(operators.stats.km_from_lifetimes / logrank_from_lifetimes).

Why this twin is worth streaming: a cohort's events land continuously
(new subjects enroll, follow-ups arrive), and the survival curve is
re-read while the study runs — rebuilding per-user lifetimes per
reading is a whole-feed re-scan.  The per-user state is
``(t0 = MIN(us), tn = MAX(us), tp = MIN(us | terminal event))`` —
MIN/MAX are idempotent, commutative monoids, so replay safety needs NO
batch-id bookkeeping beyond the store layout: the same batch content
landing twice re-folds to the identical lifetimes, and a user whose
events straddle batches converges to exactly the batch operator's
aggregate.  (A third algebra among the twins: OR-monoid Blooms,
set-union memberships, and now MIN/MAX lifetime folds.)

A streamed curve therefore equals the batch operator over the
concatenated feed bit-for-bit (tests/test_streaming_survival.py).

At 100 TB the per-batch work is one partial-agg per-user fold over the
batch; the store grows with |users| (not events), and the read-side
re-fold plus the duration-bounded KM tail match the batch plan's scale
shape exactly.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..functions.event_time import event_time_us
from ..operators.stats import (
    _KM_EVENT,
    km_from_lifetimes,
    logrank_from_lifetimes,
)
from ._store import read_store
from .rollup import events_schema


def _user_partials(batch: DataFrame) -> DataFrame:
    """The batch's per-user lifetime partials — the same MIN/MAX/MIN
    aggregates the batch operator runs, over one micro-batch."""
    us = event_time_us(batch.schema)
    return batch.groupBy("user_id").agg(
        F.min(us).alias("t0"),
        F.max(us).alias("tn"),
        F.min(F.when(F.col("event_type") == _KM_EVENT, us)).alias("tp"),
    )


def start_streaming_survival_store(
    spark: SparkSession,
    events_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Fold an event feed's per-user lifetime partials into the store."""
    stream = (
        spark.readStream.schema(events_schema(spark, events_dir))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )

    def _merge(batch: DataFrame, batch_id: int) -> None:
        (
            _user_partials(batch)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(store_dir, f"batch_id={batch_id}"))
        )

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def lifetimes_from_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged per-user lifetimes — the MIN/MAX monoid re-fold across
    batch partitions (a user's events may straddle batches; a replayed
    batch re-folds to the identical values)."""
    return (
        read_store(
            spark,
            store_dir,
            "user_id BIGINT, t0 BIGINT, tn BIGINT, tp BIGINT",
        )
        .groupBy("user_id")
        .agg(
            F.min("t0").alias("t0"),
            F.max("tn").alias("tn"),
            F.min("tp").alias("tp"),
        )
    )


def km_from_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """The batch Kaplan-Meier plan verbatim over the merged store."""
    return km_from_lifetimes(lifetimes_from_store(spark, store_dir))


def logrank_from_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """The batch log-rank plan verbatim over the merged store."""
    return logrank_from_lifetimes(lifetimes_from_store(spark, store_dir))
