"""feature-table summarize: quantile_cont semantics recomputed in pure
Python over both entity axes."""

from __future__ import annotations

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.diversity import d12_feature_table_summarize


def _qcont(vals, p):
    s = sorted(vals)
    t = p * (len(s) - 1)
    lo, f = int(t // 100), t % 100
    if f == 0:
        return float(s[lo])
    return (100 * s[lo] + f * (s[lo + 1] - s[lo])) / 100.0


def test_fts_matches_pure_python(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    samples = [r["count"] for r in ev.groupBy("user_id").count().collect()]
    feats = [r["count"] for r in ev.groupBy("event_type").count().collect()]
    got = {r.entity: r for r in d12_feature_table_summarize(spark, SF_SMOKE).collect()}
    assert set(got) == {"sample", "feature"}
    for entity, vals in (("sample", samples), ("feature", feats)):
        r = got[entity]
        assert r.n == len(vals)
        assert r.total_freq == sum(vals)
        assert r.f_min == min(vals) and r.f_max == max(vals)
        assert r.f_mean == sum(vals) / len(vals)
        for p in (25, 50, 75):
            assert abs(r[f"f_q{p}"] - _qcont(vals, p)) < 1e-9
