"""SpaceSaving streaming top-k: bounded state, published error bounds."""

from __future__ import annotations

import shutil
from collections import defaultdict

import pyspark.sql.functions as F

from conftest import SF_SMOKE


def test_spacesaving_guarantees(spark, tmp_path):
    from mmeds_meta_spark.streaming.topk import (
        M_COUNTERS,
        streaming_topk_spenders,
    )

    feed = tmp_path / "feed"
    feed.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", feed / "events.parquet")

    q = (
        streaming_topk_spenders(spark, str(feed))
        .writeStream.format("memory")
        .queryName("topk_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM topk_test").collect()
    assert rows, "no snapshots emitted"
    latest_ver = defaultdict(int)
    for r in rows:
        latest_ver[r.event_type] = max(latest_ver[r.event_type], r.version)
    snap = defaultdict(dict)
    for r in rows:
        if r.version == latest_ver[r.event_type]:
            snap[r.event_type][r.user_id] = (r.est_value_micros, r.err_micros)

    # exact truth per (event_type, user)
    raw = spark.read.parquet(str(feed))
    truth_rows = (
        raw.groupBy("event_type", "user_id")
        .agg(
            # same round-after-scaling micro-unit convention as the stream
            F.sum(F.expr("CAST(ROUND(value * 1000000) AS BIGINT)")).alias("w")
        )
        .collect()
    )
    truth = defaultdict(dict)
    totals = defaultdict(int)
    for r in truth_rows:
        truth[r.event_type][r.user_id] = r.w
        totals[r.event_type] += r.w

    for etype, users in snap.items():
        assert len(users) <= M_COUNTERS
        for u, (est, err) in users.items():
            t = truth[etype].get(u, 0)
            assert est >= t >= est - err, (etype, u, est, err, t)
        # guarantee (a): every key with true weight > n/m is tracked —
        # check against the snapshot's tracked set (top-k emission may
        # truncate, so only enforce for the emitted top-k weights)
        floor = totals[etype] // M_COUNTERS
        heavy = [u for u, w in truth[etype].items() if w > floor]
        emitted_min = min(est for est, _ in users.values())
        for u in heavy:
            if truth[etype][u] >= emitted_min:
                assert u in users or len(users) == M_COUNTERS
