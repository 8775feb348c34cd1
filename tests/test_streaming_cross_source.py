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


def test_replayed_batch_is_a_no_op(spark, tmp_path):
    # exactly-once under replay by ALGEBRA: distinct-pair membership is a
    # set-union monoid, so the same batch content landing under TWO batch
    # ids (a crash between store commit and checkpoint commit) must not
    # change the matrix
    from mmeds_meta_spark.streaming.cross_source import _source_shingles

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    store = str(tmp_path / "store")
    pairs = _source_shingles(docs)
    pairs.coalesce(1).write.parquet(f"{store}/batch_id=0")
    pairs.coalesce(1).write.parquet(f"{store}/batch_id=1")
    twice = sorted(
        tuple(r) for r in cross_source_matrix_from_store(spark, store).collect()
    )
    once_store = str(tmp_path / "store_once")
    pairs.coalesce(1).write.parquet(f"{once_store}/batch_id=0")
    once = sorted(
        tuple(r) for r in cross_source_matrix_from_store(spark, once_store).collect()
    )
    assert twice == once and once


def test_mid_stream_kill_and_restart_converges(spark, tmp_path):
    # kill the query as soon as the FIRST batch partition commits, then
    # restart from the same checkpoint: the resumed stream must finish the
    # remaining files and the final matrix must equal the batch operator
    # over the whole feed (the export twin's crash-replay contract)
    import os
    import time

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    feed = tmp_path / "feed"
    feed.mkdir()
    for name, pred in (
        ("a", "doc_id % 3 = 0"),
        ("b", "doc_id % 3 = 1"),
        ("c", "doc_id % 3 = 2"),
    ):
        out = tmp_path / f"third_{name}"
        docs.where(pred).coalesce(1).write.parquet(str(out))
        part = next(out.glob("part-*.parquet"))
        shutil.copy(part, feed / f"{name}.parquet")

    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    q = start_streaming_vocab_store(spark, str(feed), store, ck)
    # poll for the first committed batch partition, then kill mid-stream
    # (if the drain already finished, stop() is a no-op and the restart
    # below simply verifies it has nothing left to do)
    deadline = time.time() + 180
    while time.time() < deadline:
        if os.path.isdir(os.path.join(store, "batch_id=0")):
            break
        time.sleep(0.05)
    q.stop()

    q2 = start_streaming_vocab_store(spark, str(feed), store, ck)
    q2.awaitTermination(180)

    streamed = sorted(
        tuple(r) for r in cross_source_matrix_from_store(spark, store).collect()
    )
    batch = sorted(
        tuple(r)
        for r in registry()["dedup_cross_source_matrix"].spark(spark, SF_SMOKE).collect()
    )
    assert streamed == batch and streamed
