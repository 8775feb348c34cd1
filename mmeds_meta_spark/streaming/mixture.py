"""Streaming source-mixture monitor: watch corpus composition drift as
data arrives.

Per-micro-batch source counts accumulate in a BATCH-KEYED parquet store
(per-source SUM merge is linear but NOT idempotent — the CMS discipline:
a replayed micro-batch overwrites only its own ``batch_id=N/`` partition
with the same deterministic content, so checkpoint replay cannot
double-count).  The read side merges the store and applies the SAME
profile expressions as the batch operator
(operators.sampling.mixture_profile), so a streaming Gini/entropy
reading is bit-identical to the batch one over the same documents —
the property that lets an ingest pipeline alarm on mixture drift
("one source now exceeds X% of intake") without a batch recompute.

At 100 TB/day the per-batch aggregation contracts to ≤ n_sources rows
(map-side combine) and the store grows one tiny partition per batch —
compact whenever batch count bothers you; the merge is associative.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.sampling import mixture_profile
from .ingest import DOCS_SCHEMA


def start_streaming_mixture(
    spark: SparkSession,
    docs_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Maintain the per-source count store over a document feed."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def _merge(batch: DataFrame, batch_id: int) -> None:
        (
            batch.groupBy("source")
            .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("x"))
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


def mixture_store_counts(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged (source, x) count relation across all batches."""
    from ._store import read_store

    return (
        read_store(spark, store_dir, "source STRING, x BIGINT")
        .groupBy("source")
        .agg(F.expr("CAST(SUM(x) AS BIGINT)").alias("x"))
    )


def mixture_store_profile(spark: SparkSession, store_dir: str) -> DataFrame:
    """The concentration profile (n_sources, gini, entropy, top shares)
    over the merged store — the batch operator's expressions verbatim."""
    return mixture_profile(mixture_store_counts(spark, store_dir))
