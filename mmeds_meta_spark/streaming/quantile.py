"""Streaming histogram-quantile sketch: per-micro-batch bin counts
merged into a batch-keyed counter store.

The histogram is the quantile member of the streaming sketch family, and
it teaches the one lesson the other three don't: its state is only
bounded (groups × 64 counters) because the bin DOMAIN is fixed — and a
stream cannot derive min/max from data it hasn't seen yet.  So unlike
the batch operator (``operators.sketches.sketch_hist_quantile``, which
profiles the data for per-group bounds), the store PINS a per-group
(lo, hi) micro-unit domain at init time — in practice from a historical
batch profile — and later out-of-domain values clamp into the edge
bins, trading the one-bin error bound at the extremes for bounded state.
The pinned bounds are part of the store (``bounds.parquet``), so every
reader interpolates against the same domain.

Bin counts merge by per-cell SUM — linear but NOT idempotent — so
exactly-once follows the CMS convention: each micro-batch overwrites
only its own ``batch_id=N/`` partition with deterministic content, and
checkpoint replay rewrites the same partition instead of
double-counting (contrast the HLL store's bookkeeping-free MAX merge).

Bit-identity with batch: counts are linear, so the merged store equals
``hist_bin_counts`` over the concatenated feed exactly, and
:func:`hist_store_quantiles` applies the identical pinned-order
interpolation — a store whose pinned bounds match the batch profile
yields the batch operator's bit-identical estimate rows (tested in
``tests/test_streaming_quantile.py``).

At 100 TB/day the per-batch work is one partial agg to ≤ groups×64 rows
and a KB-sized partition write — independent of corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.sketches import hist_bin_counts, hist_quantiles_from_counts, hist_values

EVENTS_VALUE_SCHEMA = "event_id BIGINT, event_type STRING, value DOUBLE"


def init_hist_store(bounds: DataFrame, store_dir: str) -> None:
    """Pin the per-group micro-unit domain: ``bounds`` is (grp, lo, hi)
    with lo/hi exact micro-unit BIGINTs.  Written once; every batch and
    every read bins against exactly these rows."""
    bounds.select("grp", "lo", "hi").coalesce(1).write.mode("error").parquet(
        os.path.join(store_dir, "bounds.parquet")
    )


def start_streaming_hist(
    spark: SparkSession,
    events_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Watch ``events_dir`` for event parquet files; maintain the bin
    counter store under ``store_dir`` (which must already hold the
    pinned ``bounds.parquet`` from :func:`init_hist_store`)."""
    bounds = spark.read.parquet(os.path.join(store_dir, "bounds.parquet"))
    stream = (
        spark.readStream.schema(EVENTS_VALUE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )

    def _merge(batch: DataFrame, batch_id: int) -> None:
        counts = hist_bin_counts(hist_values(batch), bounds)
        counts.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(store_dir, "counts", f"batch_id={batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def hist_store_counts(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged (grp, bin, c) counter table across all batches — equals
    batch ``hist_bin_counts`` over the same events exactly (counts are
    linear)."""
    from ._store import read_store

    counts_dir = os.path.join(store_dir, "counts")
    return (
        read_store(spark, counts_dir, "grp STRING, bin BIGINT, c BIGINT")
        .groupBy("grp", "bin")
        .agg(F.sum("c").alias("c"))
    )


def hist_store_quantiles(spark: SparkSession, store_dir: str) -> DataFrame:
    """Current quantile estimates from the store — the same pinned-order
    interpolation as the batch operator over the merged counters and the
    pinned bounds."""
    bounds = spark.read.parquet(os.path.join(store_dir, "bounds.parquet"))
    return hist_quantiles_from_counts(hist_store_counts(spark, store_dir), bounds)
