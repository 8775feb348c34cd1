"""Streaming canonical-URL dedup store: fold a document feed's
distinct (url_canonical, doc_id) memberships as batches arrive, then
read the duplicate-group report with the batch operator's exact
expressions (operators.web.dedup_url_canonical).

Why this twin is worth streaming: URL dedup is the FIRST stage of a
web-corpus pipeline, and a crawl lands continuously — re-canonicalizing
the full corpus per reading is a whole-corpus re-scan.  Group SIZES are
NOT replay-safe as stored partials (a crash between store commit and
checkpoint commit lands the same batch under two batch ids, and a
count-sum would double), so the store holds distinct
``(url_canonical, doc_id)`` MEMBERSHIP pairs instead — set-union is
idempotent and commutative, the same algebra that makes the Bloom and
cross-source twins replay-safe — and the read side derives
``n_docs = count(*)`` / ``keeper = min(doc_id)`` after the cross-batch
distinct.  A streamed report therefore equals the batch operator over
the concatenated feed bit-for-bit (tests/test_streaming_url_dedup.py).

At 100 TB the per-batch work is one narrow canonicalization map plus a
partial-agg distinct over the batch; the store grows with the distinct
(URL, doc) memberships — the index a real incremental URL-dedup service
keeps — and the read is one shuffle keyed by the canonical URL.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..functions.urls import url_canonical
from ..operators.web import _synth_url_expr
from ._store import read_store
from .ingest import DOCS_SCHEMA


def _url_pairs(docs: DataFrame) -> DataFrame:
    """Distinct (url_canonical, doc_id) memberships for a batch.  A feed
    that already carries a ``url`` column (e.g. the WET source's
    target_uri) is canonicalized directly; the documents feed synthesizes
    the same deterministic workload the batch operator uses."""
    if "url" in docs.columns:
        u = docs.select("doc_id", "url")
    else:
        u = docs.select(
            "doc_id",
            F.expr(_synth_url_expr("doc_id", "source")).alias("url"),
        )
    return u.select(
        url_canonical("url").alias("url_canonical"), "doc_id"
    ).distinct()


def start_streaming_url_store(
    spark: SparkSession,
    docs_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Fold a document feed's canonical-URL memberships into the store."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def _merge(batch: DataFrame, batch_id: int) -> None:
        (
            _url_pairs(batch)
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


def url_store_pairs(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged distinct (url_canonical, doc_id) relation — union
    across batch partitions, deduped (replayed batches and re-crawled
    documents fold to one membership)."""
    return read_store(
        spark, store_dir, "url_canonical STRING, doc_id BIGINT"
    ).distinct()


def url_dedup_from_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """The batch operator's duplicate-group expressions verbatim over
    the merged store: (url_canonical, n_docs, keeper_doc_id)."""
    return (
        url_store_pairs(spark, store_dir)
        .groupBy("url_canonical")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )
