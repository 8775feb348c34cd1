"""Streaming diversity-counts store: live alpha metrics over an event
feed — the dashboard a sequencing facility (or an ingest pipeline
watching per-source token diversity) reads WITHOUT a batch recompute.

Every alpha metric in the engine (shannon, pielou evenness, chao1,
Good's coverage, observed features) is a closed-form expression over
the (sample, feature) COUNT relation, and counts merge linearly — so
the streaming store keeps per-batch partial counts (batch-keyed
partitions, the repo's replay discipline: a replayed micro-batch
overwrites only its own deterministic partition) and the read side
applies the IDENTICAL closing expressions over the merged counts.
tests/test_streaming_diversity.py asserts the streamed metrics equal
the batch operators bit-for-bit over the same events.

At 100 TB/day each micro-batch contracts map-side to its distinct
(sample, feature) pairs; the store grows one bounded partition per
batch and compacts associatively.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def start_streaming_diversity(
    spark: SparkSession,
    events_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Maintain per-(sample, feature) partial counts over an event feed."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )

    def _merge(batch: DataFrame, batch_id: int) -> None:
        (
            batch.groupBy("user_id", "event_type")
            .agg(F.count("*").cast("long").alias("c"))
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


def diversity_store_counts(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged (user_id, event_type, c) count relation — counts are
    linear, so the SUM across batch partitions equals one batch pass."""
    from ._store import read_store

    return (
        read_store(spark, store_dir, "user_id BIGINT, event_type STRING, c BIGINT")
        .groupBy("user_id", "event_type")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def alpha_from_counts(counts: DataFrame) -> DataFrame:
    """Every closed-form alpha metric over a (user_id, event_type, c)
    relation — the batch operators' closing expressions VERBATIM
    (diversity.d1_shannon_diversity / d15_chao1_coverage /
    d17_pielou_evenness), so streamed readings are bit-identical to the
    batch ones: (user_id, n_features, shannon, pielou_evenness, chao1,
    goods_coverage)."""
    terms = counts.groupBy("user_id").agg(
        F.expr("SUM(c)").alias("n"),
        F.expr("SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE)))").alias("clnc"),
        F.expr("COUNT(*)").alias("n_features"),
        F.expr("CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)").alias("f1"),
        F.expr("CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)").alias("f2"),
    )
    return terms.select(
        "user_id",
        F.col("n_features").cast("long").alias("n_features"),
        F.expr("ROUND(LN(CAST(n AS DOUBLE)) - clnc / n, 6)").alias("shannon"),
        F.expr(
            "CASE WHEN n_features > 1 THEN"
            " ROUND((LN(CAST(n AS DOUBLE)) - clnc / n)"
            " / LN(CAST(n_features AS DOUBLE)), 6)"
            " ELSE NULL END"
        ).alias("pielou_evenness"),
        F.expr(
            "CAST(n_features AS DOUBLE) + CAST(f1 * (f1 - 1) AS DOUBLE)"
            " / CAST(2 * (f2 + 1) AS DOUBLE)"
        ).alias("chao1"),
        F.expr("1.0 - CAST(f1 AS DOUBLE) / CAST(n AS DOUBLE)").alias("goods_coverage"),
    )
