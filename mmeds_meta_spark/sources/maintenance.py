"""Table maintenance: small-file compaction for parquet directories.

Streaming ingest (foreachBatch sinks, micro-batch appends) and
fine-grained ETL leave behind thousands of KB-scale parquet files; at
read time every file costs a footer fetch + a scheduler split, so a
100 TB table fragmented into 10⁷ files wastes more time opening files
than scanning them.  Compaction rewrites a directory into
size-targeted files, optionally range-clustered so parquet min/max
stats prune reads.

Scale notes: sizing uses the FILESYSTEM listing (no data scan) and the
rewrite is one pass — a round-robin ``repartition(n)`` for plain
compaction (uniform file sizes by construction), or
``repartitionByRange + sortWithinPartitions`` when cluster keys are
given (range partitioning samples the keys; the sort is per-file, not
global).  Write to a NEW directory and swap atomically at the catalog /
symlink level — compact-in-place cannot be atomic on a plain
filesystem, so the swap is the caller's transaction boundary.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def parquet_dir_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of a parquet directory — listing only."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    *,
    target_file_mb: int = 128,
    cluster_by: list[str] | None = None,
) -> dict:
    """Rewrite ``src_dir`` into ``dst_dir`` with ≈``target_file_mb``
    files.  ``cluster_by`` additionally range-partitions and sorts
    within files on those columns so min/max stats prune scans (the
    poor man's Z-order — right for one dominant filter column).

    Returns a report dict (files before/after, bytes).  The source is
    left untouched; callers swap directories when the write commits."""
    n_before, total = parquet_dir_stats(src_dir)
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df: DataFrame = spark.read.parquet(src_dir)
    if cluster_by:
        out = df.repartitionByRange(n_files, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst_dir)
    n_after, total_after = parquet_dir_stats(dst_dir)
    return {
        "files_before": n_before,
        "files_after": n_after,
        "bytes_before": total,
        "bytes_after": total_after,
        "target_files": n_files,
    }
