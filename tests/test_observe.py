"""StageMetrics: observe-based instrumentation matches recomputed aggs."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from conftest import SF_SMOKE

from mmeds_meta_spark.functions.observe import StageMetrics
from mmeds_meta_spark.testdata import table as _t


def test_stage_metrics_match_recomputed_aggregates(spark, tmp_path):
    """A two-stage filter pipeline instrumented with observe reports the
    same counts/sums a separate aggregation pass computes — with the
    metrics riding the pipeline's single write action."""
    d = _t(spark, SF_SMOKE, "documents")
    obs = StageMetrics()
    s1 = obs.track(
        d, "raw", F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars")
    ).filter(F.col("n_chars") > 200)
    s2 = obs.track(
        s1, "after_length", F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars")
    ).filter(F.col("lang") == "en")
    out = obs.track(s2, "after_lang", F.count(F.lit(1)).alias("n"))
    out.write.mode("overwrite").parquet(str(tmp_path / "sink"))

    raw = obs.get("raw")
    mid = obs.get("after_length")
    end = obs.get("after_lang")
    assert raw["n"] == d.count()
    assert raw["chars"] == d.agg(F.sum("n_chars")).collect()[0][0]
    exp_mid = d.filter("n_chars > 200")
    assert mid["n"] == exp_mid.count()
    assert end["n"] == exp_mid.filter("lang = 'en'").count()
    # monotone survivorship
    assert raw["n"] >= mid["n"] >= end["n"]
    # full report covers every tracked stage
    assert set(obs.report()) == {"raw", "after_length", "after_lang"}


def test_stage_metrics_duplicate_name_rejected(spark):
    d = _t(spark, SF_SMOKE, "documents")
    obs = StageMetrics()
    obs.track(d, "s", F.count(F.lit(1)).alias("n"))
    with pytest.raises(ValueError):
        obs.track(d, "s", F.count(F.lit(1)).alias("n"))
