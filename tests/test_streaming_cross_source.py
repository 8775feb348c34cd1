"""Streaming cross-source vocabulary store: the streamed matrix must
equal the batch operator over the concatenated feed bit-for-bit, and an
un-fed store must read as an empty matrix (well-defined probe)."""

from __future__ import annotations

import shutil

from conftest import SF_SMOKE

from mmeds_meta_spark.operators import registry
from mmeds_meta_spark.streaming.cross_source import (
    cross_source_matrix_from_store,
    start_streaming_vocab_store,
    vocab_store_pairs,
)


def test_streamed_matrix_equals_batch_operator(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")

    feed = tmp_path / "feed"
    feed.mkdir()
    # two plain files -> two availableNow micro-batches whose shingle
    # vocabularies OVERLAP (both halves carry every source), so the
    # read-side cross-batch dedup is actually exercised
    for name, pred in (("a", "doc_id % 2 = 0"), ("b", "doc_id % 2 = 1")):
        out = tmp_path / f"half_{name}"
        docs.where(pred).coalesce(1).write.parquet(str(out))
        part = next(out.glob("part-*.parquet"))
        shutil.copy(part, feed / f"{name}.parquet")

    store = str(tmp_path / "store")
    q = start_streaming_vocab_store(spark, str(feed), store, str(tmp_path / "ck"))
    q.awaitTermination(180)

    streamed = sorted(
        tuple(r) for r in cross_source_matrix_from_store(spark, store).collect()
    )
    batch = sorted(
        tuple(r)
        for r in registry()["dedup_cross_source_matrix"].spark(spark, SF_SMOKE).collect()
    )
    assert streamed == batch and streamed


def test_unfed_store_reads_as_empty_matrix(spark, tmp_path):
    store = str(tmp_path / "never_fed")
    assert vocab_store_pairs(spark, store).collect() == []
    assert cross_source_matrix_from_store(spark, store).collect() == []
