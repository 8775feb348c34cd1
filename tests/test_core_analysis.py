"""The full core-analysis pipeline end-to-end, plus restart-from-
materialized-stages behavior."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from conftest import SF_SMOKE

from mmeds_meta_spark.plans.analysis import run_core_analysis


@pytest.fixture(scope="module")
def corpus(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    rows = []
    for s in range(10):
        cls = "case" if s < 5 else "control"
        for f in range(8):
            lam = 40 if not (f == 0 and cls == "case") else 160
            rows.append((f"OTU_{f}", f"S{s}", float(rng.poisson(lam) + 1)))
    # one shallow sample that must be filtered out
    for f in range(8):
        rows.append((f"OTU_{f}", "S_shallow", 2.0))
    ft = spark.createDataFrame(rows, "feature_id string, sample_id string, count double")
    tax = spark.createDataFrame(
        [(f"OTU_{f}", f"k__K|p__P{f % 2}|c__C{f}") for f in range(8)],
        "feature_id string, lineage string",
    )
    meta = spark.createDataFrame(
        [(f"S{s}", "case" if s < 5 else "control") for s in range(10)]
        + [("S_shallow", "case")],
        "sample_id string, condition string",
    )
    return ft, tax, meta


CONFIG = {
    "sampling_depth": 150,
    "taxa_levels": [2],
    "rarefaction_iterations": 3,
    "class_column": "condition",
    "permanova_permutations": 99,
}


def test_full_pipeline(spark, corpus):
    ft, tax, meta = corpus
    res = run_core_analysis(spark, ft, tax, meta, CONFIG)
    # shallow sample dropped by the min-frequency filter
    kept = {r.sample_id for r in res["filtered"].select("sample_id").distinct().collect()}
    assert "S_shallow" not in kept and len(kept) == 10
    # collapse level 2: 8 OTUs → 2 phyla
    taxa = {r.feature_id for r in res["collapsed"][2].select("feature_id").distinct().collect()}
    assert taxa == {"k__K|p__P0", "k__K|p__P1"}
    # alpha over 3 iterations for every kept sample
    alpha = res["alpha"].collect()
    assert {r.sample_id for r in alpha} == kept
    assert all(r.n_iterations == 3 for r in alpha)
    assert set(res["alpha_group_summary"].toPandas()["condition"]) == {"case", "control"}
    # beta: full pairwise over kept samples
    assert res["beta"].count() == 45
    # ordination + significance products exist and are sane
    assert res["pcoa"].coordinates.shape == (10, 3)
    assert 0 < res["permanova"].p_value <= 1
    # the planted feature's phylum is enriched in cases (with only 2
    # collapsed features, CLR makes the effect sizes symmetric — the
    # direction, not the magnitude, is the discriminator here)
    da = {r.feature_id: r for r in res["diff_abundance"][2].collect()}
    assert da["k__K|p__P0"].top_class == "case"
    assert da["k__K|p__P1"].top_class == "control"


def test_restart_skips_materialized_stages(spark, corpus, tmp_path):
    ft, tax, meta = corpus
    out = tmp_path / "stages"
    out.mkdir()
    res1 = run_core_analysis(spark, ft, tax, meta, CONFIG, out_dir=str(out))
    rarefied_first = sorted(map(tuple, res1["rarefied"].collect()))
    # second run must REUSE the materialized rarefaction (bit-identical),
    # proving restartability
    res2 = run_core_analysis(spark, ft, tax, meta, CONFIG, out_dir=str(out))
    rarefied_second = sorted(map(tuple, res2["rarefied"].collect()))
    assert rarefied_first == rarefied_second
    assert (out / "beta_braycurtis").exists() and (out / "alpha").exists()


def test_a18_quantiles_match_numpy(spark):
    import numpy as np

    from mmeds_meta_spark.operators.stats import _QUANTILES, a18_quantile_profile

    got = {r.grp: r for r in a18_quantile_profile(spark, SF_SMOKE).collect()}
    import duckdb

    rows = duckdb.sql(
        f"SELECT l_returnflag, l_quantity FROM '{SF_SMOKE}/lineitem.parquet'"
    ).fetchall()
    by_grp = {}
    for g, v in rows:
        by_grp.setdefault(g, []).append(v)
    assert set(got) == set(by_grp)
    for g, vals in by_grp.items():
        assert got[g].n == len(vals)
        for p in _QUANTILES:
            exp = float(np.percentile(np.array(vals), p, method="linear"))
            assert abs(got[g][f"q{p}"] - exp) < 1e-9, (g, p, got[g][f"q{p}"], exp)


def test_a20_corr_matches_numpy(spark):
    import numpy as np

    from mmeds_meta_spark.operators.stats import a20_corr_profile

    got = {r.grp: r for r in a20_corr_profile(spark, SF_SMOKE).collect()}
    import duckdb

    rows = duckdb.sql(
        f"SELECT l_returnflag, l_quantity, l_extendedprice FROM '{SF_SMOKE}/lineitem.parquet'"
    ).fetchall()
    by_grp = {}
    for g, x, y in rows:
        by_grp.setdefault(g, ([], []))
        by_grp[g][0].append(x)
        by_grp[g][1].append(y)
    for g, (xs, ys) in by_grp.items():
        r_np = float(np.corrcoef(xs, ys)[0, 1])
        slope_np = float(np.polyfit(xs, ys, 1)[0])
        assert abs(got[g].corr - r_np) < 1e-9, (g, got[g].corr, r_np)
        assert abs(got[g].slope - slope_np) / max(abs(slope_np), 1) < 1e-6
