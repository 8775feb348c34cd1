"""Streaming seasonal-anomaly store: batch bit-identity + replay safety."""

from __future__ import annotations

import shutil

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.filters_misc import (
    seasonal_moments,
    seasonal_prep,
    w15_seasonal_anomaly,
)
from mmeds_meta_spark.streaming.anomaly import (
    start_streaming_moments,
    store_baseline,
    store_flags,
)


def _two_file_feed(spark, tmp_path):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    feed = tmp_path / "feed"
    feed.mkdir()
    for name, pred in (("a", "event_id % 2 = 0"), ("b", "event_id % 2 = 1")):
        out = tmp_path / f"half_{name}"
        ev.where(pred).coalesce(1).write.parquet(str(out))
        part = next(out.glob("part-*.parquet"))
        shutil.copy(part, feed / f"{name}.parquet")
    return ev, feed


def test_streaming_baseline_matches_batch_bit_identical(spark, tmp_path):
    """Two micro-batches of moments merge to the batch moment table
    exactly (linear integer state), so store flags == batch flags."""
    ev, feed = _two_file_feed(spark, tmp_path)
    store = str(tmp_path / "store")
    q = start_streaming_moments(spark, str(feed), store, str(tmp_path / "ck"))
    q.awaitTermination(180)

    batch = {
        (r.event_type, r.hour_of_day): (r.s, r.q, r.n)
        for r in seasonal_moments(seasonal_prep(ev)).collect()
    }
    merged = {
        (r.event_type, r.hour_of_day): (r.s, r.q, r.n)
        for r in store_baseline(spark, store).collect()
    }
    assert merged == batch

    got = {r.event_id for r in store_flags(spark, store, ev).collect()}
    expect = {r.event_id for r in w15_seasonal_anomaly(spark, SF_SMOKE).collect()}
    assert got == expect and got


def test_streaming_moments_replay_is_idempotent(spark, tmp_path):
    """Re-running the stream over the same feed (fresh checkpoint, same
    batch ids) rewrites the same partitions — baseline unchanged."""
    _, feed = _two_file_feed(spark, tmp_path)
    store = str(tmp_path / "store")
    q = start_streaming_moments(spark, str(feed), store, str(tmp_path / "ck1"))
    q.awaitTermination(180)
    before = sorted(
        map(tuple, store_baseline(spark, store).collect()), key=repr
    )
    q2 = start_streaming_moments(spark, str(feed), store, str(tmp_path / "ck2"))
    q2.awaitTermination(180)
    after = sorted(map(tuple, store_baseline(spark, store).collect()), key=repr)
    assert before == after
