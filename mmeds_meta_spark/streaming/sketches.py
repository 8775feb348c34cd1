"""Streaming cardinality sketch: per-micro-batch HyperLogLog registers
merged into a persistent register store.

HLL is THE streaming sketch because its state is (a) fixed-size — 256
(bucket, m_j) rows regardless of how much data has flowed — and (b)
mergeable by per-bucket MAX, which is idempotent and monotone.  That
second property is the exactly-once story: a replayed micro-batch
re-merges the same maxes and changes nothing, so checkpoint replay
cannot corrupt the estimate — no per-batch-id bookkeeping needed
(contrast with the signature store in ``incremental_dedup``, whose
append-only state needs idempotent-by-batch-id writes).

``foreachBatch`` rather than a stateful operator for the same reason as
the signature store: the registers must outlive the stream, merge with
batch jobs' registers (same ``operators.sketches.hll_registers``
expressions), and stay human-readable — so they live as a tiny parquet
table, not in the state store.

At 100 TB/day intake the per-batch register aggregation is one partial
agg to ≤256 rows (map-side MAX combine), and the store merge touches
256 rows — sketch cost is independent of corpus size, which is the
entire point.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.sketches import hll_estimate_from_regs, hll_registers
from .ingest import DOCS_SCHEMA


def merge_registers(store: DataFrame | None, batch_regs: DataFrame) -> DataFrame:
    """Union + per-bucket MAX — the HLL merge. ``store=None`` on first batch."""
    both = batch_regs if store is None else store.unionByName(batch_regs)
    return both.groupBy("bucket").agg(F.max("m_j").alias("m_j"))


def start_streaming_hll(
    spark: SparkSession,
    docs_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Watch ``docs_dir`` for document parquet files; maintain the HLL
    register store at ``store_dir``.  ``hll_estimate(spark, store_dir)``
    reads the current estimate at any time."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def _merge(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        regs = hll_registers(batch)
        store = None
        if os.path.isdir(store_dir) and any(
            f.endswith(".parquet") for f in os.listdir(store_dir)
        ):
            # materialize the old store before overwriting it (parquet
            # overwrite deletes the files a lazy plan would still read)
            store = sp.createDataFrame(
                sp.read.parquet(store_dir).collect(), "bucket BIGINT, m_j INT"
            )
        merged = merge_registers(store, regs.withColumn("m_j", F.col("m_j").cast("int")))
        # ≤256 rows: one file, driver-cheap.  Overwrite is safe under
        # replay because MAX-merge is idempotent.
        merged.coalesce(1).write.mode("overwrite").parquet(store_dir)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def hll_estimate(spark: SparkSession, store_dir: str) -> DataFrame:
    """Current estimate from the register store — same exact-decimal
    expression as the batch operator, so a store fed the same documents
    yields the batch operator's BIT-IDENTICAL estimate row."""
    return hll_estimate_from_regs(
        spark.read.parquet(store_dir).select("bucket", F.col("m_j").cast("int").alias("m_j"))
    )


# ---------------------------------------------------------------------------
# streaming count-min counters — SUM-merge, so exactly-once needs batch keys
# ---------------------------------------------------------------------------


def start_streaming_cms(
    spark: SparkSession,
    docs_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Maintain a count-min counter store over a document feed.

    CMS counters merge by per-cell SUM — linear, but NOT idempotent: a
    replayed micro-batch must not add its counts twice.  The store is
    therefore PARTITIONED BY BATCH: each micro-batch overwrites only
    ``batch_id=N/`` with its own ≤ depth×width partial counter table,
    so checkpoint replay rewrites the same partition with the same
    deterministic content instead of double-counting (same
    idempotent-by-batch-id convention as the dedup signature store —
    contrast with the HLL store, whose MAX merge needs no bookkeeping).

    The global table is SUM over partitions at read time
    (:func:`cms_store_counters`); with 4×64 cells per batch the store
    stays KBs per batch — compact old partitions into one whenever
    batch count bothers you, the merge is associative."""
    from ..operators.sketches import cms_counters

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def _merge(batch: DataFrame, batch_id: int) -> None:
        cms_counters(batch).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(store_dir, f"batch_id={batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def cms_store_counters(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged (row_id, bucket, c) counter table across all batches —
    equals the batch ``cms_counters`` over the same documents exactly
    (counts are linear), so streaming estimates are bit-identical to
    batch ones."""
    from ._store import read_store

    return (
        read_store(spark, store_dir, "row_id INT, bucket BIGINT, c BIGINT")
        .groupBy("row_id", "bucket")
        .agg(F.sum("c").alias("c"))
    )
