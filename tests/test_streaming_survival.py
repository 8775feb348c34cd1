"""Streaming survival store: the streamed Kaplan-Meier curve and
log-rank test must equal the batch operators over the concatenated
feed bit-for-bit; replay must be a no-op by MIN/MAX monoid algebra;
an un-fed store must read as an empty curve."""

from __future__ import annotations

import shutil

from conftest import SF_SMOKE

from mmeds_meta_spark.operators import registry
from mmeds_meta_spark.streaming.survival import (
    km_from_store,
    lifetimes_from_store,
    logrank_from_store,
    start_streaming_survival_store,
)


def _feed(spark, tmp_path, preds):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    feed = tmp_path / "feed"
    feed.mkdir()
    for name, pred in preds:
        out = tmp_path / f"part_{name}"
        ev.where(pred).coalesce(1).write.parquet(str(out))
        part = next(out.glob("part-*.parquet"))
        shutil.copy(part, feed / f"{name}.parquet")
    return str(feed)


def test_streamed_survival_equals_batch_operators(spark, tmp_path):
    # split by EVENT id parity, so nearly every user's events straddle
    # the two micro-batches and the cross-batch MIN/MAX re-fold is
    # genuinely exercised (a per-user split would leave each user's
    # lifetime complete within one batch)
    feed = _feed(
        spark, tmp_path, (("a", "event_id % 2 = 0"), ("b", "event_id % 2 = 1"))
    )
    store = str(tmp_path / "store")
    q = start_streaming_survival_store(spark, feed, store, str(tmp_path / "ck"))
    q.awaitTermination(180)

    reg = registry()
    for streamed_fn, batch_name in (
        (km_from_store, "d18_kaplan_meier"),
        (logrank_from_store, "d19_logrank_test"),
    ):
        streamed = sorted(tuple(r) for r in streamed_fn(spark, store).collect())
        batch = sorted(
            tuple(r) for r in reg[batch_name].spark(spark, SF_SMOKE).collect()
        )
        assert streamed == batch and streamed


def test_unfed_store_reads_as_empty_curve(spark, tmp_path):
    store = str(tmp_path / "never_fed")
    assert lifetimes_from_store(spark, store).collect() == []
    assert km_from_store(spark, store).collect() == []


def test_replayed_batch_is_a_no_op(spark, tmp_path):
    # exactly-once under replay by ALGEBRA: MIN/MAX are idempotent
    # monoids, so the same partials landing under TWO batch ids (a crash
    # between store commit and checkpoint commit) re-fold to identical
    # lifetimes and an identical curve
    from mmeds_meta_spark.streaming.survival import _user_partials

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    store = str(tmp_path / "store")
    partials = _user_partials(ev)
    partials.coalesce(1).write.parquet(f"{store}/batch_id=0")
    partials.coalesce(1).write.parquet(f"{store}/batch_id=1")
    twice = sorted(tuple(r) for r in km_from_store(spark, store).collect())
    once_store = str(tmp_path / "store_once")
    partials.coalesce(1).write.parquet(f"{once_store}/batch_id=0")
    once = sorted(tuple(r) for r in km_from_store(spark, once_store).collect())
    assert twice == once and once


def test_mid_stream_kill_and_restart_converges(spark, tmp_path):
    import os
    import time

    feed = _feed(
        spark,
        tmp_path,
        (
            ("a", "event_id % 3 = 0"),
            ("b", "event_id % 3 = 1"),
            ("c", "event_id % 3 = 2"),
        ),
    )
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    q = start_streaming_survival_store(spark, feed, store, ck)
    deadline = time.time() + 180
    while time.time() < deadline:
        if os.path.isdir(os.path.join(store, "batch_id=0")):
            break
        time.sleep(0.05)
    q.stop()

    q2 = start_streaming_survival_store(spark, feed, store, ck)
    q2.awaitTermination(180)

    streamed = sorted(tuple(r) for r in km_from_store(spark, store).collect())
    batch = sorted(
        tuple(r)
        for r in registry()["d18_kaplan_meier"].spark(spark, SF_SMOKE).collect()
    )
    assert streamed == batch and streamed
