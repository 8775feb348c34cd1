"""Shuffle-key skew profile: hand-computed fixture + corpus invariants."""

from __future__ import annotations

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.stats import a24_skew_profile


def test_hand_computed(spark, tmp_path):
    # key loads: u1×6, u2×2, u3×1, u4×1  → n_rows=10, n_keys=4
    loads = {1: 6, 2: 2, 3: 1, 4: 1}
    rows = []
    i = 0
    for u, c in loads.items():
        for _ in range(c):
            rows.append((i, None, u, "click", 1.0))
            i += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )
    d = str(tmp_path / "sf_fixture")
    df.coalesce(1).write.parquet(f"{d}/events.parquet")

    r = a24_skew_profile(spark, d).collect()[0]
    assert r.n_rows == 10 and r.n_keys == 4
    assert r.max_cnt == 6
    # count-of-counts CDF: cnt=1 covers 2 keys (cum 2 ≥ 0.5·4) → p50=1
    assert r.p50_cnt == 1
    # p99 rank = ceil-ish: first cnt with cum·100 ≥ 99·4 → cum ≥ 3.96 → cnt=2 (cum 3)? no: 3·100=300 < 396 → cnt=6 (cum 4)
    assert r.p99_cnt == 6
    assert r.mean_cnt == 2.5
    assert r.skew_ratio == 6 / 2.5
    assert r.top_key_share == 0.6
    # hot keys: cnt·4 > 10·10 → cnt > 25: none at this scale
    assert r.hot_keys == 0
    assert r.selfjoin_rows == 36 + 4 + 1 + 1


def test_corpus_invariants(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    r = a24_skew_profile(spark, SF_SMOKE).collect()[0]
    assert r.n_rows == ev.count()
    assert r.n_keys == ev.select("user_id").distinct().count()
    assert 1 <= r.p50_cnt <= r.p99_cnt <= r.max_cnt
    assert r.skew_ratio >= 1.0
    # Σcnt² is the exact self-join size
    truth = ev.alias("a").join(ev.alias("b"), "user_id").count()
    assert r.selfjoin_rows == truth
