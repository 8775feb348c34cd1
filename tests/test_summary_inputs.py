"""DADA2 stats / alpha-rarefaction readers, retention + summary aggs,
config YAML, email/web validation rules."""

from __future__ import annotations

import pytest

from mmeds_meta_spark.sources.summary_inputs import (
    alpha_summary,
    load_analysis_config,
    read_alpha_rarefaction,
    read_dada2_stats,
    read_retention,
)


@pytest.fixture()
def dada2_path(tmp_path):
    p = tmp_path / "stats.tsv"
    p.write_text(
        "sample-id\tinput\tfiltered\tdenoised\tnon-chimeric\n"
        "#q2:types\tnumeric\tnumeric\tnumeric\tnumeric\n"
        "S1\t1000\t900\t850\t800\n"
        "S2\t2000\t1500\t1400\t1300\n"
    )
    return str(p)


def test_read_dada2_and_retention(spark, dada2_path):
    stats = read_dada2_stats(spark, dada2_path)
    assert stats.count() == 2
    ret = read_retention(stats)
    got = {(r.sample_id, r.stage): (r.reads_lost, r.reads_retained) for r in ret.collect()}
    assert got[("S1", "filtered")] == (100, 900)
    assert got[("S1", "non-chimeric")] == (50, 800)
    assert got[("S2", "denoised")] == (100, 1400)
    assert len(got) == 6  # 2 samples × 3 stage transitions


@pytest.fixture()
def alpha_path(tmp_path):
    p = tmp_path / "alpha.csv"
    p.write_text(
        "sample-id,depth-10_iter-1,depth-10_iter-2,depth-20_iter-1,depth-20_iter-2,cohort\n"
        "S1,1.0,2.0,3.0,5.0,case\n"
        "S2,2.0,4.0,4.0,6.0,case\n"
        "S3,1.0,1.0,2.0,2.0,control\n"
    )
    return str(p)


def test_alpha_rarefaction_summary(spark, alpha_path):
    long_df = read_alpha_rarefaction(spark, alpha_path, group_col="cohort")
    assert long_df.count() == 12
    per_sample = alpha_summary(long_df.drop("group"))
    m = {(r.sample_id, r.depth): r.mean_value for r in per_sample.collect()}
    assert m[("S1", 10)] == pytest.approx(1.5)
    assert m[("S1", 20)] == pytest.approx(4.0)
    grouped = alpha_summary(long_df, has_group=True)
    g = {(r.group, r.depth): (r.group_mean, r.group_sem, r.n_samples) for r in grouped.collect()}
    mean, sem, n = g[("case", 10)]
    assert mean == pytest.approx((1.5 + 3.0) / 2)
    assert n == 2
    # pandas-style SEM: std([1.5, 3.0], ddof=1)/sqrt(2)
    import statistics

    assert sem == pytest.approx(statistics.stdev([1.5, 3.0]) / (2 ** 0.5))
    # control group has a single sample → SEM undefined (null)
    assert g[("control", 10)][1] is None


def test_load_analysis_config(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text("sampling_depth: 500\ntaxa_levels: [2, 4]\nmetadata: all\n")
    cfg = load_analysis_config(str(p), ["BodySite", "Nationality"])
    assert cfg["sampling_depth"] == 500
    assert cfg["taxa_levels"] == [2, 4]
    assert cfg["metadata"] == ["BodySite", "Nationality"]
    dflt = load_analysis_config(None, ["A"])
    assert dflt["taxa_levels"] == list(range(1, 8))
    assert dflt["sampling_depth"] == 1000


def test_email_and_web_validation(spark, tmp_path):
    from fixtures import write_specimen
    from mmeds_meta_spark.validation import validate_file

    p = write_specimen(tmp_path, mutate={"row": 2, "set": {"ContactEmail": "not-an-email"}})
    diags = validate_file(spark, str(p)).collect()
    assert any(d.code == "invalid_email" and d.row_idx == 2 for d in diags)
