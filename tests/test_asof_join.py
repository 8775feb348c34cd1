"""As-of join: hand-computed attribution fixture + corpus invariants."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.filters_misc import asof_join_attribution


def _fixture_dir(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)

    def t(s):
        return base + dt.timedelta(seconds=s)

    rows = [
        # user 1: click@10, click@20, purchase@25 → matched to click 2 (latest)
        (1, t(10), 1, "click", 1.0, "{}"),
        (2, t(20), 1, "click", 2.0, "{}"),
        (3, t(25), 1, "purchase", 9.0, "{}"),
        # user 2: purchase@5 BEFORE any click → NULL attribution,
        # then click@10 and same-instant purchase@10 → matched (tie: build first)
        (4, t(5), 2, "purchase", 9.0, "{}"),
        (5, t(10), 2, "click", 3.0, "{}"),
        (6, t(10), 2, "purchase", 9.0, "{}"),
        # user 3: two clicks at the SAME µs → highest event_id wins
        (7, t(1), 3, "click", 4.0, "{}"),
        (8, t(1), 3, "click", 5.0, "{}"),
        (9, t(2), 3, "purchase", 9.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "sf_asof")
    df.coalesce(1).write.parquet(f"{d}/events.parquet")
    return d


def test_asof_hand_computed(spark, tmp_path):
    out = {
        r.purchase_id: r
        for r in asof_join_attribution(spark, _fixture_dir(spark, tmp_path)).collect()
    }
    assert set(out) == {3, 4, 6, 9}
    assert out[3].click_id == 2 and out[3].latency_us == 5_000_000
    assert out[3].click_value == 2.0
    assert out[4].click_id is None and out[4].latency_us is None
    assert out[6].click_id == 5 and out[6].latency_us == 0
    assert out[9].click_id == 8 and out[9].click_value == 5.0


def test_asof_invariants_on_corpus(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    out = asof_join_attribution(spark, SF_SMOKE)
    assert out.count() == n_purch  # outer as-of: every purchase survives
    bad = out.filter(
        F.col("click_id").isNotNull()
        & ((F.col("latency_us") < 0) | (F.col("click_ts_us") > F.col("purchase_ts_us")))
    )
    assert bad.count() == 0


def test_asof_matches_bruteforce_on_random_feed(spark, tmp_path):
    """Seeded random feed cross-checked against a Python brute force:
    for every purchase, the matched click must be the max-(ts, event_id)
    click with ts <= purchase ts for that user."""
    import random

    rng = random.Random(42)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for eid in range(400):
        rows.append(
            (
                eid,
                base + dt.timedelta(seconds=rng.randrange(0, 3600)),
                rng.randrange(0, 12),
                rng.choice(["click", "purchase", "view"]),
                float(rng.randrange(0, 100)),
                "{}",
            )
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "sf_rand")
    df.coalesce(1).write.parquet(f"{d}/events.parquet")

    got = {r.purchase_id: r.click_id for r in asof_join_attribution(spark, d).collect()}
    clicks_by_user = {}
    for eid, ts, uid, et, _v, _p in rows:
        if et == "click":
            clicks_by_user.setdefault(uid, []).append((ts, eid))
    expected = {}
    for eid, ts, uid, et, _v, _p in rows:
        if et != "purchase":
            continue
        prior = [(cts, cid) for cts, cid in clicks_by_user.get(uid, []) if cts <= ts]
        expected[eid] = max(prior)[1] if prior else None
    assert got == expected
