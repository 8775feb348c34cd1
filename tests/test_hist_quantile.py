"""Histogram quantile sketch: hand-computed fixture + accuracy bound."""

from __future__ import annotations

import math

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.sketches import _HQ_PCTS, sketch_hist_quantile


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )
    d = str(tmp_path / "sf_fixture")
    df.coalesce(1).write.parquet(f"{d}/events.parquet")
    return d


def test_hand_computed_single_group(spark, tmp_path):
    # values 0..9 → lo=0, hi=9e6 micro-units, W=9e6+1; every value gets
    # its own bin, so each estimate sits within one bin of the true rank
    rows = [(i, None, 1, "a", float(i)) for i in range(10)]
    out = {r.p: r for r in sketch_hist_quantile(spark, _write_events(spark, tmp_path, rows)).collect()}
    assert set(out) == set(_HQ_PCTS)
    for p, r in out.items():
        assert r.n == 10
        assert r.err_bound == (9_000_001 / 1e6) / 64
        # rank-r order statistic: ceil(p·n/100) → exact value r-1
        exact = math.ceil(p * 10 / 100) - 1
        assert abs(r.est - exact) <= r.err_bound, (p, r.est, exact)


def test_degenerate_constant_group(spark, tmp_path):
    # all values equal → W=1, every row in bin 0, estimate == the value
    rows = [(i, None, 1, "a", 7.5) for i in range(4)]
    out = sketch_hist_quantile(spark, _write_events(spark, tmp_path, rows)).collect()
    for r in out:
        assert abs(r.est - 7.5) <= r.err_bound
        assert r.err_bound == (1 / 1e6) / 64


def test_accuracy_bound_on_corpus(spark):
    """Every estimate is within one bin width of the exact disc-quantile."""
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select("event_type", "value")
    by_grp: dict[str, list[float]] = {}
    for r in ev.collect():
        by_grp.setdefault(r.event_type, []).append(round(r.value * 1e6) / 1e6)
    out = sketch_hist_quantile(spark, SF_SMOKE).collect()
    assert len(out) == len(by_grp) * len(_HQ_PCTS)
    for r in out:
        vals = sorted(by_grp[r.grp])
        assert r.n == len(vals)
        exact = vals[math.ceil(r.p * len(vals) / 100) - 1]
        assert abs(r.est - exact) <= r.err_bound + 1e-9, (r.grp, r.p, r.est, exact)


def test_sliding_hll_estimates_track_truth(spark):
    """w16_sliding_distinct_hll: each window's estimate must be within
    HLL error bounds of the TRUE distinct-user count (256 registers →
    6.5% std error; 25% is a >3σ ceiling), and full windows must
    estimate at least as many users as any member hour alone."""
    import pyspark.sql.functions as F

    from mmeds_meta_spark.functions.event_time import event_time_us
    from mmeds_meta_spark.operators import registry

    raw = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    ev = raw.select(
        (event_time_us(raw.schema) / F.lit(3_600_000_000)).cast("long").alias("h"),
        "user_id",
    )
    hours = {(r.h, r.user_id) for r in ev.distinct().collect()}
    got = registry()["w16_sliding_distinct_hll"].spark(spark, SF_SMOKE).collect()
    assert got
    for r in got:
        truth = len({u for (h, u) in hours if r.win_start_hour <= h < r.win_start_hour + 3})
        assert truth > 0
        assert abs(r.est_distinct - truth) / truth < 0.25, (
            r.win_start_hour,
            r.est_distinct,
            truth,
        )
