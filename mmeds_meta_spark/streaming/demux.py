"""Streaming demux-QC store: fold a demultiplexed-read feed's distinct
read memberships as batches arrive, then read the per-sample validation
report with the batch operator's exact expressions
(operators.demux.demux_validate).

Why this twin is worth streaming: a sequencing run lands lane/tile
file by file while the QC dashboard is read continuously — re-parsing
every landed FASTQ per reading is a whole-run re-scan.  Per-sample
counters (n_reads/n_kept/n_stripped) are NOT replay-safe as stored
partials (a crash between store commit and checkpoint commit lands the
same batch under two batch ids, and a count-sum would double), so the
store holds distinct ``(sample_id, fwd, rev, read_uid)`` read
MEMBERSHIPS — ``read_uid = file ':' record_id``, the read's stable
identity from the FASTQ DataSource — and the read side re-derives every
counter after the cross-batch distinct.  Set-union is idempotent and
commutative: the same algebra as the URL-dedup, cross-source, and
host-graph twins.

A streamed report therefore equals the batch operator over the
concatenated feed bit-for-bit for feeds whose read_uids are unique
across batches; a RE-INGESTED file (same (file, record_id) in two
batches — a re-delivered lane) intentionally folds to one membership
(tests/test_streaming_demux.py).

At 100 TB of reads the per-batch work is one narrow header/filename
parse plus a partial-agg distinct over the batch; the read is the batch
operator's broadcast mapping join + one |samples|-bounded shuffle.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.demux import demux_reads_from_fastq, demux_validate
from ._store import read_store

# the FASTQ DataSource's row shape (sources/fastq_datasource.py), as a
# parquet-feed schema for readStream
READS_SCHEMA = "file string, record_id bigint, header string, seq string, qual string"


def _read_memberships(fastq_rows: DataFrame) -> DataFrame:
    """Distinct (sample_id, fwd, rev, read_uid) memberships for a batch
    of FASTQ DataSource rows — the batch operator's header/filename
    parse plus the read's stable identity."""
    return demux_reads_from_fastq(fastq_rows, with_uid=True).distinct()


def start_streaming_demux_store(
    spark: SparkSession,
    reads_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Fold a demuxed-read feed's memberships into the store."""
    stream = (
        spark.readStream.schema(READS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(reads_dir)
    )

    def _merge(batch: DataFrame, batch_id: int) -> None:
        (
            _read_memberships(batch)
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


def demux_store_reads(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged distinct read-membership relation (replayed batches
    and re-delivered lanes fold to one membership per read_uid)."""
    return read_store(
        spark,
        store_dir,
        "sample_id STRING, fwd STRING, rev STRING, read_uid STRING",
    ).distinct()


def demux_validate_from_store(
    spark: SparkSession,
    store_dir: str,
    mapping: DataFrame,
    *,
    num_allowed_errors: int = 1,
) -> DataFrame:
    """The batch validation report verbatim over the merged store."""
    reads = demux_store_reads(spark, store_dir).select("sample_id", "fwd", "rev")
    return demux_validate(reads, mapping, num_allowed_errors=num_allowed_errors)
