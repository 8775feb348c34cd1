"""Streaming CCNet paragraph-dedup store: the streamed keep-first
report must equal the batch operator over the concatenated feed
bit-for-bit, replay must be a no-op by set-union + MIN-monoid algebra,
and an un-fed store must read as an empty report."""

from __future__ import annotations

import shutil

from conftest import SF_SMOKE

from mmeds_meta_spark.operators import registry
from mmeds_meta_spark.streaming.paragraphs import (
    _para_members,
    dedup_paragraphs_from_store,
    paragraph_store_members,
    start_streaming_paragraph_store,
)


def test_streamed_report_equals_batch_operator(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    feed = tmp_path / "feed"
    feed.mkdir()
    # two micro-batches whose duplicate paragraph groups straddle the
    # split, so keeper election really crosses batches
    for name, pred in (("a", "doc_id % 2 = 0"), ("b", "doc_id % 2 = 1")):
        out = tmp_path / f"half_{name}"
        docs.where(pred).coalesce(1).write.parquet(str(out))
        shutil.copy(next(out.glob("part-*.parquet")), feed / f"{name}.parquet")

    store = str(tmp_path / "store")
    q = start_streaming_paragraph_store(spark, str(feed), store, str(tmp_path / "ck"))
    q.awaitTermination(180)

    streamed = sorted(
        tuple(r) for r in dedup_paragraphs_from_store(spark, store).collect()
    )
    batch = sorted(
        tuple(r)
        for r in registry()["dedup_paragraphs_ccnet"].spark(spark, SF_SMOKE).collect()
    )
    assert streamed == batch and streamed
    # the workload actually removes something, or the twin proves nothing
    assert any(r[2] > 0 for r in streamed)


def test_unfed_store_reads_as_empty_report(spark, tmp_path):
    store = str(tmp_path / "never_fed")
    assert paragraph_store_members(spark, store).collect() == []
    assert dedup_paragraphs_from_store(spark, store).collect() == []


def test_replayed_batch_is_a_no_op(spark, tmp_path):
    # the same batch content under TWO batch ids (crash between store
    # commit and checkpoint commit) must not change any keeper or count
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    members = _para_members(docs)
    store = str(tmp_path / "store")
    members.coalesce(1).write.parquet(f"{store}/batch_id=0")
    members.coalesce(1).write.parquet(f"{store}/batch_id=1")
    twice = sorted(
        tuple(r) for r in dedup_paragraphs_from_store(spark, store).collect()
    )
    once_store = str(tmp_path / "once")
    members.coalesce(1).write.parquet(f"{once_store}/batch_id=0")
    once = sorted(
        tuple(r) for r in dedup_paragraphs_from_store(spark, once_store).collect()
    )
    assert twice == once and once
