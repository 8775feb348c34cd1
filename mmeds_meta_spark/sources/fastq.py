"""S12 — FASTQ barcode scan (reference util.py:1245-1282 parse_barcodes).

The reference streams 4-line FASTQ records single-threaded; here the file
is read distributed (`spark.read.text`), record membership derived from
the global line index, and the count is a plain groupBy — at 100 TB this
is an embarrassingly parallel scan + one small shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def parse_barcodes(
    spark: SparkSession, path: str, *, barcode_length: int = 8
) -> DataFrame:
    """Count barcode occurrences: sequence line of every 4-line record,
    first ``barcode_length`` bases → (barcode, n_reads)."""
    lines = (
        spark.read.text(path)
        .rdd.zipWithIndex()
        .map(lambda pair: (pair[1] // 4, pair[1] % 4, pair[0].value))
    )
    df = spark.createDataFrame(lines, "record_id long, field int, line string")
    seqs = df.filter(F.col("field") == 1).select(
        F.substring("line", 1, barcode_length).alias("barcode")
    )
    return seqs.groupBy("barcode").agg(F.count("*").alias("n_reads"))


def barcode_error_counts(
    observed: DataFrame, expected: DataFrame, *, max_distance: int = 2
) -> DataFrame:
    """F16 — per expected barcode, reads within Levenshtein ≤ d (the
    reference's python-Levenshtein loop as a broadcast join)."""
    return (
        observed.crossJoin(F.broadcast(expected))
        .withColumn("dist", F.levenshtein("barcode", "expected_barcode"))
        .filter(F.col("dist") <= max_distance)
        .groupBy("expected_barcode", "dist")
        .agg(F.sum("n_reads").alias("n_reads"))
    )


def write_demultiplexed_fastq(reads: DataFrame, out_dir: str) -> None:
    """Per-sample FASTQ sink — the output half of the error-stripping
    pass (reference util.py:1126-1198 strip_error_barcodes writes one
    gzipped FASTQ per sample; engine twin: ONE distributed write,
    partitioned by sample_id, so 100 TB of kept reads lands as
    ``out_dir/sample_id=<s>/part-*.txt`` without a driver-side
    per-sample loop).

    ``reads`` must carry (sample_id, file, record_id, header, seq,
    qual) — e.g. ``demux_strip`` output joined back to the FASTQ
    DataSource rows.  Records are sorted by (file, record_id) WITHIN
    write partitions after repartitioning by sample, so each sample's
    part files hold reads in stable input order (the reference's
    single-threaded append order is global; a distributed sink
    guarantees per-file order — documented divergence).
    """
    (
        reads.repartition("sample_id")
        .sortWithinPartitions("sample_id", "file", "record_id")
        .select(
            "sample_id",
            F.expr(
                "concat('@', header, '\\n', seq, '\\n+\\n', qual)"
            ).alias("value"),
        )
        .write.mode("overwrite")
        .partitionBy("sample_id")
        .text(out_dir)
    )
