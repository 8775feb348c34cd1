"""Streaming Bloom-filter decontamination store: fold a benchmark/eval
feed into the fixed-size bit set as it arrives, then probe any corpus
against the merged filter with the batch operator's exact expressions.

Why this is the decontamination twin worth streaming: eval suites GROW
(new benchmarks land weekly), and re-building the filter from scratch
per release is a full bench re-scan.  The Bloom bit set is an OR-monoid
— set-bit union is idempotent AND commutative — so the streaming fold
is replay-safe by ALGEBRA, not just by the batch-keyed-store
discipline: a replayed micro-batch re-asserts bits that are already
set.  (The batch-keyed layout is kept anyway for uniformity with the
other stores and because it bounds per-batch file sizes.)

The store is the relational bit set (≤ m rows of positions — the
decon_bloom_filter representation), so the probe side IS the batch
operator's probe verbatim: k-way position explode → broadcast left join
→ all-bits vote → per-doc hit ratio.  tests/test_streaming_decon.py
asserts the streamed filter and a batch-built filter probe identically.

At 100 TB the corpus never enters this path — only the (MB-scale)
benchmark feed streams; the probe stays a broadcast of ≤ m positions
(8 KiB bit-packed equivalent) into the corpus scan.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import _BLOOM_K, _BLOOM_TAU, _bloom_pos
from .ingest import DOCS_SCHEMA

_JS = ", ".join(str(j) for j in range(_BLOOM_K))


def _shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) distinct word-2-grams — the operators.dedup
    shingle builder's expressions over an arbitrary docs relation."""
    d = docs.select("doc_id", F.split("text", " ").alias("toks"))
    sh = F.expr(
        "CASE WHEN size(toks) >= 2 THEN "
        "array_distinct(transform(sequence(0, size(toks) - 2),"
        " i -> concat(toks[i], ' ', toks[i + 1]))) "
        "ELSE array() END"
    )
    return d.select("doc_id", F.explode(sh).alias("shingle"))


def _positions(docs: DataFrame) -> DataFrame:
    """Distinct Bloom bit positions set by a docs relation."""
    return (
        _shingles(docs)
        .select(F.expr(f"explode(array({_JS}))").alias("j"), "shingle")
        .select(F.expr(_bloom_pos("spark", "j", "shingle")).alias("pos"))
        .distinct()
    )


def start_streaming_bloom_bench(
    spark: SparkSession,
    bench_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Fold a benchmark-document feed into the Bloom position store."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(bench_dir)
    )

    def _merge(batch: DataFrame, batch_id: int) -> None:
        (
            _positions(batch)
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


def bloom_store_bits(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged set-bit relation (pos) across all batches — the
    OR-fold of every benchmark batch seen so far."""
    from ._store import read_store

    return read_store(spark, store_dir, "pos BIGINT").distinct()


def probe_with_store(
    spark: SparkSession, store_dir: str, corpus: DataFrame, *, tau: float = _BLOOM_TAU
) -> DataFrame:
    """Probe a corpus against the streamed filter — the batch operator's
    probe expressions verbatim: (doc_id, n_shingles, n_bloom_hits,
    hit_ratio) for docs at or above ``tau``."""
    bits = bloom_store_bits(spark, store_dir).withColumn("hit", F.lit(1))
    probe = (
        _shingles(corpus)
        .select("doc_id", "shingle", F.expr(f"explode(array({_JS}))").alias("j"))
        .select(
            "doc_id", "shingle", F.expr(_bloom_pos("spark", "j", "shingle")).alias("pos")
        )
    )
    gram_hits = (
        probe.join(F.broadcast(bits), "pos", "left")
        .groupBy("doc_id", "shingle")
        .agg(F.min(F.coalesce(F.col("hit"), F.lit(0))).alias("all_set"))
    )
    return (
        gram_hits.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum("all_set").cast("long").alias("n_bloom_hits"),
        )
        .withColumn(
            "hit_ratio", F.col("n_bloom_hits").cast("double") / F.col("n_shingles")
        )
        .filter(F.col("hit_ratio") >= tau)
        .select("doc_id", "n_shingles", "n_bloom_hits", "hit_ratio")
    )
