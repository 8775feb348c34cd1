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


def test_lefse_lda_planted_and_handcomputed(spark, planted):
    """The planted feature gets the top LDA score; values match a NumPy
    hand-computation of the closed-form two-class Fisher criterion."""
    import math

    from decimal import Decimal

    from mmeds_meta_spark.functions.diff_abundance import lefse_lda

    ft, sm = planted
    res = lefse_lda(ft, sm, class_col="condition").collect()
    rows = {r.feature_id: r for r in res}
    assert len(rows) == 5  # one pair (case, control) per feature
    assert all(r.class_lo == "case" and r.class_hi == "control" for r in res)
    # planted OTU_0 dominates the ranking and is enriched in cases
    assert rows["OTU_0"].lda_score > max(
        rows[f"OTU_{i}"].lda_score for i in range(1, 5)
    )
    assert rows["OTU_0"].top_class == "case"

    # hand-compute with the engine's exact quantization convention
    data = ft.collect()
    meta = dict(sm.collect())
    q = lambda x, s: Decimal(x).quantize(Decimal(1).scaleb(-s))  # noqa: E731
    y = {
        (r.sample_id, r.feature_id): Decimal(repr(math.log(r["count"] + 1))).quantize(
            Decimal("1.000000000")
        )
        for r in data
    }
    samples = sorted({s for s, _ in y})
    mlg = {
        s: Decimal(
            repr(float(sum(v for (ss, _), v in y.items() if ss == s)) / 5)
        ).quantize(Decimal("1.000000000"))
        for s in samples
    }
    clr = {(s, f): y[(s, f)] - mlg[s] for (s, f) in y}
    for f in ("OTU_0", "OTU_3"):
        by_cls = {}
        for s in samples:
            by_cls.setdefault(meta[s], []).append(clr[(s, f)])
        lo, hi = by_cls["case"], by_cls["control"]
        m_lo, m_hi = float(sum(lo)) / len(lo), float(sum(hi)) / len(hi)
        ss = (
            float(sum(v * v for v in lo)) - float(sum(lo)) * float(sum(lo)) / len(lo)
            + float(sum(v * v for v in hi)) - float(sum(hi)) * float(sum(hi)) / len(hi)
        )
        s_w2 = ss / (len(lo) + len(hi) - 2)
        j = (m_hi - m_lo) ** 2 / s_w2
        got = rows[f]
        assert got.delta_clr == pytest.approx(m_hi - m_lo, abs=2e-6)
        assert got.lda_j == pytest.approx(j, rel=1e-4)
        assert got.lda_score == pytest.approx(math.log10(1 + j), rel=1e-4)


def test_ancombc_em_centers_null_features(spark):
    """With NO differential features, the mixture's null component should
    absorb everything: delta_em ≈ the common LFC shift, and no feature is
    significant after centering."""
    from mmeds_meta_spark.functions.diff_abundance import ancombc, ancombc_em

    rows, meta = [], []
    for s in range(10):
        cls = "a" if s < 5 else "b"
        meta.append((f"S{s}", cls))
        for f in range(8):
            # class b counts uniformly doubled → a pure sampling-fraction
            # artifact, exactly what delta models
            base = 40 + (s * 3 + f * 5) % 7
            rows.append((f"OTU_{f}", f"S{s}", float(base * (2 if cls == "b" else 1))))
    ft = spark.createDataFrame(rows, "feature_id string, sample_id string, count double")
    sm = spark.createDataFrame(meta, "sample_id string, cls string")
    plain = {r.feature_id: r for r in ancombc(ft, sm, group_col="cls").collect()}
    em = {r.feature_id: r for r in ancombc_em(ft, sm, group_col="cls").collect()}
    assert len(em) == 8
    # the uniform doubling shows up as a shared positive LFC...
    mean_lfc = sum(r.lfc for r in plain.values()) / 8
    assert mean_lfc > 0.2
    # ...which the EM delta absorbs: centered LFCs hug zero
    d = next(iter(em.values())).delta_em
    assert d == pytest.approx(mean_lfc, abs=0.05)
    for r in em.values():
        assert abs(r.lfc_centered) < abs(plain[r.feature_id].lfc)
        assert not r.significant


def test_pipeline_diff_abundance_bundle(spark, duck):
    """The composed bundle: oracle parity at the smoke SF plus the
    report's structural invariants (agreement arithmetic, planned splits
    only, per-method consistency with the standalone operators)."""
    from mmeds_meta_spark.operators import registry

    spec = registry()["pipeline_diff_abundance"]
    df = spec.spark(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows, "one row per feature expected"
    cols = [c.lower() for c in df.columns]
    rel = duck.sql(spec.oracle)
    assert sorted(cols) == sorted(c.lower() for c in rel.columns)
    order_s = sorted(range(len(cols)), key=lambda i: cols[i])
    d_cols = [c.lower() for c in rel.columns]
    order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    sn = sorted((tuple(r[i] for i in order_s) for r in (tuple(x) for x in rows)), key=repr)
    dn = sorted((tuple(r[i] for i in order_d) for r in rel.fetchall()), key=repr)
    assert sn == dn
    by = {c: i for i, c in enumerate(df.columns)}
    for r in rows:
        t = tuple(r)
        # agreement column is exactly the sum of the three verdicts
        assert t[by["methods_significant"]] == (
            int(t[by["kw_significant"]])
            + int(t[by["lda_significant"]])
            + int(t[by["ancombc_significant"]])
        )
        # best split comes from the planned all-against-all pairs of g3
        if t[by["lda_split_lo"]] is not None:
            assert 0 <= t[by["lda_split_lo"]] < t[by["lda_split_hi"]] <= 2
        # KW df = k-1 with k <= 3 classes
        assert 0 <= t[by["kw_df"]] <= 2


def test_pipeline_diff_abundance_matches_singles(spark):
    """Each method's numbers inside the bundle equal the standalone
    operator family's values computed over the same feature table."""
    from mmeds_meta_spark.functions.diff_abundance import ancombc
    from mmeds_meta_spark.operators import registry

    sf = "/root/testdata/sf0.001"
    bundle = {
        r.feature_id: r
        for r in registry()["pipeline_diff_abundance"].spark(spark, sf).collect()
    }
    ev = spark.read.parquet(f"{sf}/events.parquet")
    cnts = ev.groupBy(
        F.col("user_id").alias("sample_id"), F.col("event_type").alias("feature_id")
    ).agg(F.count("*").alias("count"))
    smeta = (
        cnts.select("sample_id").distinct().withColumn("g2", F.expr("sample_id % 2"))
    )
    anc = {r.feature_id: r for r in ancombc(cnts, smeta, group_col="g2").collect()}
    for f, r in bundle.items():
        assert r.ancombc_lfc == anc[f].lfc
        assert r.ancombc_w == anc[f].w_stat
