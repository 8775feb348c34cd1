"""Streaming host-graph store: fold a document feed's distinct link
memberships as batches arrive, then rank the merged graph with the
batch operators' exact plans (operators.web.web_host_pagerank /
web_host_harmonic via their ``edges=`` passthrough).

Why this twin is worth streaming: host rankings are read continuously
while a crawl is still landing — rebuilding the full link extraction
per reading is a whole-corpus re-scan.  Edge WEIGHTS are not
replay-safe as stored partials (a crash between store commit and
checkpoint commit lands the same batch under two batch ids, and a
count-sum would double), so the store holds distinct
``(src_host, dst_host, doc_id, slot)`` link MEMBERSHIPS — set-union is
idempotent and commutative, the same algebra as the Bloom, cross-source
and URL-dedup twins — and the read side derives ``w = count(*)`` after
the cross-batch distinct.  ``slot`` (which of the document's two
outlinks produced the row) keeps the multiset faithful when both links
of one document hit the same host: the batch operator counts that
document twice, and membership alone would fold it to once.

A streamed ranking therefore equals the batch operator over the
concatenated feed bit-for-bit (tests/test_streaming_host_graph.py) —
for feeds whose doc_ids are unique across batches.  A RE-INGESTED
document (same doc_id in two batches — a re-crawl or replayed segment)
intentionally folds to ONE edge contribution via the membership
distinct, where the batch operator over a feed containing it twice
would double its edge weights: the same one-vote-per-document
semantics as the url_dedup twin's re-crawl handling
(tests/test_streaming_host_graph.py::test_duplicate_doc_folds_once).

At 100 TB the per-batch work is one narrow link projection plus a
partial-agg distinct over the batch; the store grows with the distinct
link memberships, and every read-side ranking runs on the
|hosts|²-bounded weighted edge list exactly like the batch plans.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..functions.urls import url_canonical
from ..operators.web import (
    _dst2_expr,
    _synth_host_expr,
    _synth_url_expr,
    web_host_harmonic,
    web_host_pagerank,
)
from ._store import read_store
from .ingest import DOCS_SCHEMA


def _link_memberships(docs: DataFrame) -> DataFrame:
    """Distinct (src_host, dst_host, doc_id, slot) link memberships for
    a batch — the batch operator's link expressions, kept per-document
    so the read-side count reproduces the batch edge weights."""
    canon = docs.select(
        "doc_id",
        "source",
        F.expr(_synth_url_expr("doc_id", "source")).alias("url"),
    ).select("doc_id", "source", url_canonical("url").alias("cu"))
    hosts = canon.select(
        "doc_id",
        F.expr("split_part(split_part(cu, '://', 2), '/', 1)").alias("src_host"),
        F.expr(_synth_host_expr("(doc_id * 7 + 1)", "source")).alias("dst1"),
        F.expr(_dst2_expr("doc_id", "source")).alias("dst2"),
    )
    links = hosts.select(
        "doc_id",
        "src_host",
        F.posexplode(F.array("dst1", "dst2")).alias("slot", "dst_host"),
    ).filter("src_host <> dst_host")
    return links.select("src_host", "dst_host", "doc_id", "slot").distinct()


def start_streaming_link_store(
    spark: SparkSession,
    docs_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Fold a document feed's link memberships into the store."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def _merge(batch: DataFrame, batch_id: int) -> None:
        (
            _link_memberships(batch)
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


def host_edges_from_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged weighted edge list — union across batch partitions,
    deduped (replayed batches fold to one membership), then the batch
    operator's weight aggregation.  Checkpointed like the batch
    :func:`~mmeds_meta_spark.operators.web.host_edges` so downstream
    rankings read a bounded materialization."""
    pairs = read_store(
        spark,
        store_dir,
        "src_host STRING, dst_host STRING, doc_id BIGINT, slot INT",
    ).distinct()
    return (
        pairs.groupBy("src_host", "dst_host")
        .agg(F.count("*").cast("long").alias("w"))
        .localCheckpoint(eager=True)
    )


def pagerank_from_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """The batch pagerank plan verbatim over the merged store."""
    return web_host_pagerank(
        spark, "unused", edges=host_edges_from_store(spark, store_dir)
    )


def harmonic_from_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """The batch harmonic-centrality plan verbatim over the merged store."""
    return web_host_harmonic(
        spark, "unused", edges=host_edges_from_store(spark, store_dir)
    )


def harmonic_hll_from_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """The HyperBall sketch ranking verbatim over the merged store — the
    scale path's streaming read: the store's set-union memberships feed
    the same edges relation, and the sketch's register MAX-merges are
    themselves an idempotent monoid, so the whole chain (store fold →
    register fold) is replay-safe end-to-end by algebra."""
    from ..operators.web import web_host_harmonic_hll

    return web_host_harmonic_hll(
        spark, "unused", edges=host_edges_from_store(spark, store_dir)
    )
