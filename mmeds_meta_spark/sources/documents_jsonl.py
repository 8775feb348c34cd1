"""JSONL document-corpus reader/writer.

Real training corpora overwhelmingly ship as JSON-Lines (one document
object per line: Common Crawl derivatives, RedPajama/Dolma-style dumps);
the engine's document operators all consume the parquet ``documents``
schema (doc_id, text, lang, source, n_chars).  This source bridges the
two: a schema-enforced, corrupt-line-tolerant JSONL reader that lands in
exactly that schema, and a writer for round-tripping.

Scale notes: ``spark.read.json`` with an EXPLICIT schema is a streaming
line parser — no inference pass over 100 TB (schema inference would scan
everything once before the real job).  PERMISSIVE mode quarantines
malformed lines into ``_corrupt_record`` instead of failing the 10-hour
job at line 9 billion; the reader splits them into a separate relation
so ingest can log-and-continue.  Text files are splittable by line, so
parallelism follows file splits as usual.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

# The documents-table schema the operator suite expects (TESTDATA.md).
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus into the engine's documents schema.

    Returns ``(docs, rejects)``: ``docs`` has exactly the documents
    columns with ``n_chars`` backfilled from ``text`` when absent;
    ``rejects`` carries the raw malformed lines for quarantine.  Both
    are lazy — nothing is scanned until an action runs.

    Implementation note: this reads lines with the TEXT source and
    parses via ``from_json`` (with a corrupt-record field in the parse
    schema) instead of ``spark.read.json``.  Same streaming line parser
    underneath, but the raw line stays available for the quarantine
    relation — Spark's JSON source forbids queries that touch only its
    internal corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the
    workaround it suggests (cache the parsed frame) is exactly what a
    100 TB ingest must not do."""
    schema = T.StructType(
        DOCUMENT_SCHEMA.fields + [T.StructField(_CORRUPT, T.StringType())]
    )
    parsed = spark.read.text(path).select(
        F.col("value").alias("raw_line"),
        F.from_json(
            "value", schema, {"columnNameOfCorruptRecord": _CORRUPT}
        ).alias("j"),
    )
    docs = (
        parsed.filter(F.col(f"j.{_CORRUPT}").isNull())
        .filter(F.col("j.doc_id").isNotNull() & F.col("j.text").isNotNull())
        .select(
            F.col("j.doc_id").alias("doc_id"),
            F.col("j.text").alias("text"),
            F.col("j.lang").alias("lang"),
            F.col("j.source").alias("source"),
            F.coalesce(F.col("j.n_chars"), F.length("j.text").cast("long")).alias(
                "n_chars"
            ),
        )
    )
    rejects = parsed.filter(F.col(f"j.{_CORRUPT}").isNotNull()).select("raw_line")
    return docs, rejects


def write_documents_jsonl(docs: DataFrame, path: str, *, partitions: int | None = None) -> None:
    """Write a documents relation back out as JSONL (one object per line).

    ``partitions`` controls output file count (None keeps the input
    partitioning — at scale, size output files via
    ``spark.sql.files.maxRecordsPerFile`` instead of a global
    repartition)."""
    out = docs if partitions is None else docs.repartition(partitions)
    out.select("doc_id", "text", "lang", "source", "n_chars").write.mode(
        "overwrite"
    ).json(path)
