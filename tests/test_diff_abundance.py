"""Differential abundance: a planted differential feature must be found,
flat features must not."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from mmeds_meta_spark.functions.diff_abundance import clr_transform, differential_abundance


@pytest.fixture(scope="module")
def planted(spark):
    rows, meta = [], []
    for s in range(12):
        cls = "case" if s < 6 else "control"
        meta.append((f"S{s}", cls))
        for f in range(5):
            base = 50.0
            if f == 0 and cls == "case":
                base = 500.0  # planted: OTU_0 enriched in cases
            rows.append((f"OTU_{f}", f"S{s}", base + (s * 7 + f * 3) % 11))
    ft = spark.createDataFrame(rows, "feature_id string, sample_id string, count double")
    sm = spark.createDataFrame(meta, "sample_id string, condition string")
    return ft, sm


def test_clr_centers_per_sample(spark, planted):
    ft, _ = planted
    clr = clr_transform(ft)
    sums = clr.groupBy("sample_id").agg(F.sum("clr").alias("s")).collect()
    for r in sums:
        assert r.s == pytest.approx(0.0, abs=1e-9)


def test_planted_feature_detected(spark, planted):
    ft, sm = planted
    res = differential_abundance(ft, sm, class_col="condition")
    rows = {r.feature_id: r for r in res.collect()}
    assert rows["OTU_0"].significant, rows["OTU_0"]
    assert rows["OTU_0"].top_class == "case"
    assert rows["OTU_0"].effect_size > max(
        rows[f"OTU_{i}"].effect_size for i in range(1, 5)
    )
    assert rows["OTU_0"].df == 1
    # CLR is compositional: the planted spike shifts every feature's
    # ratios, so the rank test saturates for ALL features (identical H)
    # — which is precisely why LEfSe ranks by effect size, not p-value.
    # The unaffected features are "enriched" in controls only by ratio.
    assert all(rows[f"OTU_{i}"].top_class == "control" for i in range(1, 5))


def test_ancombc_planted_feature(spark, planted):
    """ANCOM-BC must flag the planted feature with a positive LFC toward
    'case' and leave a bias-free flat feature unflagged; the estimated δ
    offsets must absorb the compositional shift the CLR test saturates on."""
    from mmeds_meta_spark.functions.diff_abundance import ancombc

    ft, sm = planted
    # group codes sorted: 'case' < 'control' → lo=case, hi=control
    res = ancombc(
        ft.select("sample_id", "feature_id", "count"), sm, group_col="condition"
    )
    rows = {r.feature_id: r for r in res.collect()}
    assert set(rows) == {f"OTU_{i}" for i in range(5)}
    # lfc = β_control − β_case: planted OTU_0 is enriched in case → negative
    assert rows["OTU_0"].lfc < 0 and rows["OTU_0"].significant
    # the bias correction absorbs the sampling-fraction shift: unplanted
    # features keep |W| far below the planted one
    planted_w = abs(rows["OTU_0"].w_stat)
    for i in range(1, 5):
        assert abs(rows[f"OTU_{i}"].w_stat) < planted_w / 2, rows[f"OTU_{i}"]


def test_ancombc_null_case(spark):
    """No group difference → nothing significant."""
    from mmeds_meta_spark.functions.diff_abundance import ancombc

    rows, meta = [], []
    for s in range(10):
        meta.append((f"S{s}", "a" if s % 2 == 0 else "b"))
        for f in range(4):
            rows.append((f"S{s}", f"OTU_{f}", 40.0 + ((s * 3 + f * 5) % 7)))
    ft = spark.createDataFrame(rows, "sample_id string, feature_id string, count double")
    sm = spark.createDataFrame(meta, "sample_id string, grp string")
    res = ancombc(ft, sm, group_col="grp").collect()
    assert len(res) == 4
    assert not any(r.significant for r in res)
