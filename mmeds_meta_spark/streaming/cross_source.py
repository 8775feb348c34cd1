"""Streaming cross-source vocabulary store: fold a document feed's
distinct (source, shingle) pairs as batches arrive, then read the
cross-source duplication matrix from the merged store with the batch
operator's exact expressions (operators.dedup.dedup_cross_source_matrix).

Why this twin is worth streaming: the mixture-planning matrix is read
continuously while a crawl is still landing — rebuilding the full
distinct (shingle, source) relation per reading is a whole-corpus
re-scan.  Distinct-pair membership is a SET-UNION monoid — idempotent
and commutative, like the Bloom bit set — so the streaming fold is
replay-safe by algebra; the batch-keyed ``batch_id=N/`` layout is kept
for uniformity with the other stores (and each partition holds only the
batch's NEW pairs after the per-batch distinct).

The read side dedups across batches (a doc's shingles may recur in
later batches) and then applies the matrix expressions verbatim, so a
streamed matrix equals the batch operator over the concatenated feed
bit-for-bit (tests/test_streaming_cross_source.py).

At 100 TB the per-batch work is one partial-agg distinct over the
batch's shingles; the store grows with the distinct vocabulary, not the
corpus, and the matrix read is |sources|²-bounded exactly like the
batch plan.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ._store import read_store
from .ingest import DOCS_SCHEMA


def _source_shingles(docs: DataFrame) -> DataFrame:
    """Distinct (source, shingle) word-2-gram pairs — the batch
    operator's shingle expressions over an arbitrary docs relation."""
    d = docs.select("source", F.split("text", " ").alias("toks"))
    sh = F.expr(
        "CASE WHEN size(toks) >= 2 THEN "
        "array_distinct(transform(sequence(0, size(toks) - 2),"
        " i -> concat(toks[i], ' ', toks[i + 1]))) "
        "ELSE array() END"
    )
    return d.select("source", F.explode(sh).alias("shingle")).distinct()


def start_streaming_vocab_store(
    spark: SparkSession,
    docs_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Fold a document feed's (source, shingle) pairs into the store."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def _merge(batch: DataFrame, batch_id: int) -> None:
        (
            _source_shingles(batch)
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


def vocab_store_pairs(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged distinct (source, shingle) relation — union across
    batch partitions, deduped (a shingle may recur in later batches)."""
    return read_store(
        spark, store_dir, "source STRING, shingle STRING"
    ).distinct()


def cross_source_matrix_from_store(
    spark: SparkSession, store_dir: str
) -> DataFrame:
    """The batch operator's matrix expressions verbatim over the merged
    store: (source_a, source_b, n_a, n_b, n_shared, vocab_jaccard)."""
    ss = vocab_store_pairs(spark, store_dir)
    na = ss.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    a = ss.select(F.col("source").alias("source_a"), "shingle")
    b = ss.select(F.col("source").alias("source_b"), "shingle").hint("shuffle_hash")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    ta = na.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    tb = na.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        ta.crossJoin(tb)
        .filter(F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(shared), ["source_a", "source_b"], "left")
        .fillna(0, subset=["n_shared"])
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_shared",
            F.expr(
                "ROUND(CAST(n_shared AS DOUBLE) / (n_a + n_b - n_shared), 6)"
            ).alias("vocab_jaccard"),
        )
    )
