"""MAD outliers: pure-Python recompute of the exact integer decision rule."""

from __future__ import annotations

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.stats import a22_mad_outliers


def _median100(vals):
    s = sorted(vals)
    n = len(s)
    t = 50 * (n - 1)
    lo, f = t // 100, t % 100
    return 100 * s[lo] if f == 0 else 100 * s[lo] + f * (s[lo + 1] - s[lo])


def test_mad_matches_pure_python(spark):
    rows = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .selectExpr("event_id", "value", "CAST(ROUND(value * 1e6) AS BIGINT) AS v")
        .collect()
    )
    vs = [r.v for r in rows]
    m = _median100(vs)
    devs = [abs(100 * r.v - m) for r in rows]
    m4 = _median100(devs)
    exp = {
        r.event_id: 67.45 * (100 * r.v - m) / m4
        for r in rows
        if m4 > 0 and 1349 * abs(100 * r.v - m) > 70 * m4
    }
    got = {r.event_id: r for r in a22_mad_outliers(spark, SF_SMOKE).collect()}
    assert set(got) == set(exp)
    assert len(got) > 0  # the heavy tail is real at this SF
    for eid, r in got.items():
        assert abs(r.robust_z - exp[eid]) < 5.1e-7
        assert abs(r.robust_z) > 3.5 - 1e-6
