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
