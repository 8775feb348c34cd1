"""Streaming canonical-URL dedup store: the streamed duplicate-group
report must equal the batch operator over the concatenated feed
bit-for-bit, replay must be a no-op by set-union algebra (group sizes
derive from distinct memberships, never from summed partials), and an
un-fed store must read as an empty report."""

from __future__ import annotations

import shutil

from conftest import SF_SMOKE

from mmeds_meta_spark.operators import registry
from mmeds_meta_spark.streaming.url_dedup import (
    start_streaming_url_store,
    url_dedup_from_store,
    url_store_pairs,
)


def test_streamed_report_equals_batch_operator(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")

    feed = tmp_path / "feed"
    feed.mkdir()
    # two plain files -> two availableNow micro-batches whose canonical
    # URL groups STRADDLE the split (the synth workload's duplicate
    # groups pair even with odd doc_ids), so the read-side cross-batch
    # aggregation is actually exercised
    for name, pred in (("a", "doc_id % 2 = 0"), ("b", "doc_id % 2 = 1")):
        out = tmp_path / f"half_{name}"
        docs.where(pred).coalesce(1).write.parquet(str(out))
        part = next(out.glob("part-*.parquet"))
        shutil.copy(part, feed / f"{name}.parquet")

    store = str(tmp_path / "store")
    q = start_streaming_url_store(spark, str(feed), store, str(tmp_path / "ck"))
    q.awaitTermination(180)

    streamed = sorted(
        tuple(r) for r in url_dedup_from_store(spark, store).collect()
    )
    batch = sorted(
        tuple(r)
        for r in registry()["dedup_url_canonical"].spark(spark, SF_SMOKE).collect()
    )
    assert streamed == batch and streamed


def test_unfed_store_reads_as_empty_report(spark, tmp_path):
    store = str(tmp_path / "never_fed")
    assert url_store_pairs(spark, store).collect() == []
    assert url_dedup_from_store(spark, store).collect() == []


def test_replayed_batch_is_a_no_op(spark, tmp_path):
    # exactly-once under replay by ALGEBRA: the store holds distinct
    # (url_canonical, doc_id) memberships — a set-union monoid — so the
    # same batch content landing under TWO batch ids (a crash between
    # store commit and checkpoint commit) must not change any group size
    from mmeds_meta_spark.streaming.url_dedup import _url_pairs

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    store = str(tmp_path / "store")
    pairs = _url_pairs(docs)
    pairs.coalesce(1).write.parquet(f"{store}/batch_id=0")
    pairs.coalesce(1).write.parquet(f"{store}/batch_id=1")
    twice = sorted(
        tuple(r) for r in url_dedup_from_store(spark, store).collect()
    )
    once_store = str(tmp_path / "store_once")
    pairs.coalesce(1).write.parquet(f"{once_store}/batch_id=0")
    once = sorted(
        tuple(r) for r in url_dedup_from_store(spark, once_store).collect()
    )
    assert twice == once and once


def test_mid_stream_kill_and_restart_converges(spark, tmp_path):
    # kill the query as soon as the FIRST batch partition commits, then
    # restart from the same checkpoint: the resumed stream must finish
    # the remaining files and the final report must equal the batch
    # operator over the whole feed (the export twin's crash-replay
    # contract)
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
    q = start_streaming_url_store(spark, str(feed), store, ck)
    deadline = time.time() + 180
    while time.time() < deadline:
        if os.path.isdir(os.path.join(store, "batch_id=0")):
            break
        time.sleep(0.05)
    q.stop()

    q2 = start_streaming_url_store(spark, str(feed), store, ck)
    q2.awaitTermination(180)

    streamed = sorted(
        tuple(r) for r in url_dedup_from_store(spark, store).collect()
    )
    batch = sorted(
        tuple(r)
        for r in registry()["dedup_url_canonical"].spark(spark, SF_SMOKE).collect()
    )
    assert streamed == batch and streamed


def test_wet_url_feed_uses_real_url_column(spark):
    # a feed that already carries a `url` column (the WET target_uri
    # path) is canonicalized directly — no synthetic workload
    from mmeds_meta_spark.streaming.url_dedup import _url_pairs

    feed = spark.createDataFrame(
        [
            (1, "http://www.example.com/a?utm_source=x"),
            (2, "HTTP://EXAMPLE.COM:80/a"),
            (3, "https://other.org/b"),
        ],
        "doc_id long, url string",
    )
    got = sorted(tuple(r) for r in _url_pairs(feed).collect())
    assert got == [
        ("http://example.com/a", 1),
        ("http://example.com/a", 2),
        ("https://other.org/b", 3),
    ]
