"""Streaming CCNet paragraph-dedup store: fold a document feed's
distinct (h, doc_id, pos, para) paragraph memberships as batches
arrive, then read the keep-first dedup report with the batch
operator's exact tail (operators.dedup.ccnet_paras_report).

Replay algebra (the url_dedup convention): keep-first election is
``MIN(struct(doc_id, pos)) per normalized-paragraph hash`` — a MIN
monoid — and the reassembly needs each membership's paragraph text, so
the store holds distinct ``(h, doc_id, pos, para)`` tuples.  Set-union
of memberships is idempotent/commutative: a batch replayed under two
batch ids (crash between store commit and checkpoint commit) folds to
the same distinct set, and the read side derives keepers AFTER the
cross-batch distinct — so a streamed report equals the batch operator
over the concatenated feed bit-for-bit
(tests/test_streaming_paragraphs.py).

The round-10 additions' other operator, ``text_badwords_filter``, gets
NO twin by design: it is STATELESS (a per-row broadcast-blocklist
predicate with no cross-batch state), so its streaming form is the
same expression applied inside any foreachBatch/map — there is no
store algebra to verify.

At 100 TB the per-batch work is the narrow paragraph explode plus a
partial-agg distinct over the batch; the store grows with distinct
paragraph memberships (the index an incremental CCNet-style service
keeps) and the read is one shuffle on the paragraph hash.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import ccnet_paras, ccnet_paras_report
from ._store import read_store
from .ingest import DOCS_SCHEMA

_MEMBER_SCHEMA = "h STRING, doc_id BIGINT, pos INT, para STRING"


def _para_members(docs: DataFrame) -> DataFrame:
    """Distinct paragraph memberships of one batch."""
    return ccnet_paras(docs).select("h", "doc_id", "pos", "para").distinct()


def start_streaming_paragraph_store(
    spark: SparkSession,
    docs_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Fold a document feed's paragraph memberships into the store."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def _merge(batch: DataFrame, batch_id: int) -> None:
        (
            _para_members(batch)
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


def paragraph_store_members(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged distinct membership relation — union across batch
    partitions, deduped (replayed batches fold to one membership)."""
    return read_store(spark, store_dir, _MEMBER_SCHEMA).distinct()


def dedup_paragraphs_from_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """The batch operator's keeper-election + reassembly tail verbatim
    over the merged store."""
    return ccnet_paras_report(paragraph_store_members(spark, store_dir))
