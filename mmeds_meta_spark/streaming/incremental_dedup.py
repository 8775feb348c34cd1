"""Streaming incremental near-dup: each micro-batch of documents is
checked against a PERSISTENT signature store, and only then appended to
it — the streaming face of ``operators.dedup.dedup_simhash_incremental``.

Shape: ``foreachBatch`` is the right tool, not a stateful operator —
the "state" (every fingerprint ever seen) must outlive the stream, be
shared with batch jobs, and be readable by humans; so it lives as a
parquet signature table, not in the state store.  Per micro-batch:

1. fingerprint the batch (same 32-bit vote SimHash as the batch
   operator — one aggregation),
2. band-join batch signatures against store ∪ batch (probe side =
   batch only → cost |batch| × bucket density, exactly the incremental
   operator's bound),
3. append the batch's signatures to the store (idempotent by batch id:
   a replayed batch overwrites its own subdirectory, so checkpoint
   replays cannot duplicate signatures),
4. append discovered pairs to the pairs sink.

Exactly-once: checkpoint + per-batch-id idempotent writes.  At 100 TB
the store is partitioned by fingerprint band prefix so step 2 prunes;
here it is a plain parquet dir.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import (
    _HAMMING_TAU,
    _SH_BITS,
    _simhash_band_bounds,
    _simhash_bit_exprs,
    _simhash_word_expr,
)
from .ingest import DOCS_SCHEMA


def batch_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint): the batch operator's vote aggregation."""
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).selectExpr(
        "doc_id", f"{_simhash_word_expr('spark')} AS w"
    )
    votes = _simhash_bit_exprs("spark")
    agg = tok.groupBy("doc_id").agg(
        *[F.expr(f"SUM({v})").alias(f"s{i}") for i, v in enumerate(votes)]
    )
    fp = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN CAST({2 ** i} AS BIGINT) ELSE 0 END)"
        for i in range(_SH_BITS)
    )
    return agg.select("doc_id", F.expr(fp).alias("fingerprint"))


def _banded(sigs: DataFrame) -> DataFrame:
    band_rows = [
        f"({b}, CAST(shiftright(fingerprint, {off}) & {(1 << width) - 1} AS BIGINT))"
        for b, (off, width) in enumerate(_simhash_band_bounds())
    ]
    return sigs.selectExpr(
        "doc_id",
        "fingerprint",
        f"inline(array({', '.join('struct' + r for r in band_rows)})) AS (band_id, band_key)",
    )


def pairs_against_store(new_sigs: DataFrame, store_sigs: DataFrame) -> DataFrame:
    """Near-dup pairs with ≥1 side in ``new_sigs``: probe = new only,
    build = store ∪ new; new×new emitted once (lower-id probe), each
    pair once via the first-agreeing-band rule."""
    probe = _banded(new_sigs)
    new_ids = new_sigs.select(F.col("doc_id").alias("doc_b"))
    build_sigs = store_sigs.select("doc_id", "fingerprint").unionByName(
        new_sigs.select("doc_id", "fingerprint")
    )
    build = _banded(build_sigs).select(
        F.col("doc_id").alias("doc_b"), F.col("fingerprint").alias("fb"), "band_id", "band_key"
    )
    first_band = " AND ".join(
        f"(band_id <= {b} OR (shiftright(fingerprint, {off}) & {(1 << w) - 1})"
        f" != (shiftright(fb, {off}) & {(1 << w) - 1}))"
        for b, (off, w) in enumerate(_simhash_band_bounds())
    )
    # membership of doc_b in the new batch via a broadcast semi-join flag
    flagged_build = build.join(
        F.broadcast(new_ids.withColumn("__is_new", F.lit(True))), "doc_b", "left"
    ).withColumn("__is_new", F.coalesce("__is_new", F.lit(False)))
    return (
        probe.join(flagged_build, ["band_id", "band_key"])
        .filter(
            (F.col("doc_b") > F.col("doc_id")) | (~F.col("__is_new"))
        )
        .filter(F.col("doc_b") != F.col("doc_id"))
        .filter(F.expr(first_band))
        .select(
            F.least("doc_id", "doc_b").alias("doc_a"),
            F.greatest("doc_id", "doc_b").alias("doc_b"),
            F.expr("CAST(bit_count(fingerprint ^ fb) AS INT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= _HAMMING_TAU)
        # no dropDuplicates needed: first-agreeing-band keeps each pair in
        # exactly one band, and the probe/new×new orientation rules emit
        # each pair from exactly one side
    )


def process_batch(
    batch: DataFrame, batch_id: int, *, store_dir: str, pairs_dir: str
) -> None:
    """One micro-batch: fingerprint, pair against prior batches' store,
    write pairs + signatures idempotently by batch id.  Module-level so a
    checkpoint replay can be exercised directly in tests."""
    from pyspark.errors import AnalysisException

    sigs = batch_signatures(batch).localCheckpoint()
    try:
        # read WITH the batch_id partition column and keep prior batches
        # only: on a checkpoint replay the store already holds THIS
        # batch's signatures (written before the crash) — without the
        # filter the build side would contain each new doc twice and
        # every new×new pair would be emitted twice
        store = (
            batch.sparkSession.read.option("basePath", store_dir)
            .parquet(store_dir)
            .filter(F.col("batch_id") < F.lit(batch_id))
            .select("doc_id", "fingerprint")
        )
    except AnalysisException:  # first batch: store path absent/empty
        store = sigs.limit(0)
    pairs = pairs_against_store(sigs, store)
    # idempotent per-batch writes: a checkpoint replay overwrites the
    # SAME subdirectories instead of appending duplicates
    pairs.write.mode("overwrite").parquet(f"{pairs_dir}/batch_id={batch_id}")
    sigs.write.mode("overwrite").parquet(f"{store_dir}/batch_id={batch_id}")


def start_incremental_dedup(
    spark: SparkSession,
    docs_dir: str,
    *,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Start the stream.  Returns the StreamingQuery; callers trigger
    availableNow (tests) or continuous micro-batches (production).
    ``max_files_per_trigger`` bounds micro-batch size (and lets tests
    force multiple batches)."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        process_batch(batch, batch_id, store_dir=store_dir, pairs_dir=pairs_dir)

    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_dir)
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
