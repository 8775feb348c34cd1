"""FASTQ as a first-class Spark data source (PySpark 4 Python DataSource
API): ``spark.read.format("fastq").load(path)`` → one row per read.

Why a real DataSource instead of ``spark.read.text`` + line arithmetic:
the 4-line FASTQ frame is positional, so a line-level scan needs a GLOBAL
line index to recover record membership (the old ``zipWithIndex`` path —
an extra pass over the data and a driver-side index barrier).  A
DataSource partitions at FILE granularity: every partition independently
frames its own file's records — no global index, no extra pass, and a
100 TB sequencing run (always delivered as many lane/tile files) gets
file-level parallelism for free.  Byte-range splitting WITHIN one file is
deliberately not attempted: '@' opens both headers and quality strings,
so record boundaries are not locally recognizable mid-file — the classic
FASTQ splitting caveat; per-file partitions sidestep it exactly like
Hadoop-BAM's FastqInputFormat does by default.

Reference parity: util.py:1245-1282 ``parse_barcodes`` streams one file
single-threaded; this source is its distributed ingest layer.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

FASTQ_SCHEMA = (
    "file string, record_id bigint, header string, seq string, qual string"
)


class FastqFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class FastqReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fastq source requires a path")

    def partitions(self) -> Sequence[FastqFilePartition]:
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith((".fastq", ".fq"))
            )
        else:
            files = [self.path]
        if not files:
            raise ValueError(f"no .fastq/.fq files under {self.path}")
        return [FastqFilePartition(f) for f in files]

    def read(self, partition: FastqFilePartition) -> Iterator[tuple]:
        rid = 0
        with open(partition.path) as fh:
            while True:
                header = fh.readline()
                if not header:
                    break
                seq = fh.readline().rstrip("\n")
                plus = fh.readline()
                qual_raw = fh.readline()
                if qual_raw == "" or not plus:
                    # truncated trailing frame — the file ended before the
                    # qual line (or before the '+' separator), so drop the
                    # record (matching the reference's silent tail
                    # tolerance).  Only TRUE EOF ('' from readline) stops
                    # the parse: a bare '\n' qual line is a legal
                    # zero-length read (empty seq after adapter trimming)
                    # and must not terminate the rest of the file.
                    break
                qual = qual_raw.rstrip("\n")
                hdr = header.rstrip("\n")
                # strip exactly ONE marker: a header legitimately starting
                # '@@…' must keep its second '@' (lstrip would eat both)
                hdr = hdr[1:] if hdr.startswith("@") else hdr
                yield (
                    partition.path,
                    rid,
                    hdr,
                    seq,
                    qual,
                )
                rid += 1


class FastqDataSource(DataSource):
    """``spark.dataSource.register(FastqDataSource)`` then
    ``spark.read.format("fastq").load(path)``."""

    @classmethod
    def name(cls) -> str:
        return "fastq"

    def schema(self) -> str:
        return FASTQ_SCHEMA

    def reader(self, schema) -> FastqReader:
        return FastqReader(self.options)


def register_fastq_source(spark) -> None:
    """Idempotent registration of the fastq format for this session."""
    spark.dataSource.register(FastqDataSource)
