"""Streaming training-shard manifest: the export hand-off maintained
incrementally as documents arrive.

The batch exporter (sources/shard_export.py) writes one epoch of
deterministically shuffled shards plus a manifest of per-shard doc
counts, char volumes, and 60-bit order-independent content checksums.
Because the checksum is a SUM of per-document fingerprints mod 2^60 —
commutative and associative — the manifest is exactly incrementalizable:
each micro-batch contributes its per-shard partial sums, and the merged
store equals the batch manifest over the same documents BIT-FOR-BIT
(asserted in tests/test_streaming_export.py).

Replay discipline (the repo's batch-keyed store convention): per-shard
partial sums are linear but not idempotent, so each micro-batch
overwrites only its own ``batch_id=N/`` partition with deterministic
content — checkpoint replay rewrites the same bytes instead of
double-counting.

At 100 TB/day each batch contracts to ≤ n_shards rows map-side; the
store grows one tiny partition per batch and merges associatively —
an ingest pipeline gets a live, verifiable manifest ("what will shard 3
contain, and does yesterday's export still match?") without a batch
recompute.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..sources.shard_export import _MOD, _fingerprinted, _shard_stats
from .ingest import DOCS_SCHEMA


def start_streaming_export_manifest(
    spark: SparkSession,
    docs_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    *,
    epoch: int = 0,
    n_shards: int = 8,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Maintain per-shard manifest partials over a document feed."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def _merge(batch: DataFrame, batch_id: int) -> None:
        (
            _shard_stats(_fingerprinted(batch, epoch, n_shards))
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


def export_manifest_from_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged per-shard manifest relation across all batches —
    (shard, n_docs, n_chars, checksum), identical to the batch
    exporter's ``_shard_stats`` over the union of the batches' docs.
    Sums of per-batch residues mod 2^60 equal the whole-corpus residue
    (modular addition is associative), so checksums match exactly."""
    from ._store import read_store

    return (
        read_store(
            spark,
            store_dir,
            "shard INT, n_docs BIGINT, n_chars BIGINT, checksum BIGINT",
        )
        .groupBy("shard")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            (F.sum(F.col("checksum").cast("decimal(38,0)")) % F.lit(_MOD))
            .cast("long")
            .alias("checksum"),
        )
    )
