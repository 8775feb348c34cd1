"""D5/D6 — native differential abundance (the reference shells out to
ANCOM-BC / LEfSe; rules/differential_abundance.smk:1-72).

Two estimators:

* :func:`differential_abundance` — the v1 fallback (SURVEY §2.10 D5):
  CLR transform per sample, per-feature Kruskal-Wallis across classes,
  LEfSe-flavored effect size.
* :func:`ancombc` — the ANCOM-BC bias-corrected estimator (Lin &
  Peddada 2020, the model behind ``qiime composition ancombc``,
  rules/differential_abundance.smk:1-14): per-feature log-linear model
  with a per-sample sampling-fraction offset δ_j, estimated by the
  alternating iteration  β_ig = mean_{j∈g}(y_ij − δ_j),
  δ_j = mean_i(y_ij − β_{i,g(j)}), followed by a Wald test on the
  log-fold-change between groups.  (The reference R package's final
  Gaussian-mixture refinement of the δ distribution is out of scope —
  the documented simplification.)

Scale + determinism: the iteration never densifies the feature×sample
matrix — absent cells (y = log(0+1) = 0) enter every mean through
closed-form totals, so each round is two skinny aggregations (features×
groups and samples).  All sums run on DECIMAL-quantized values (exact,
order-free) with divisions done once in DOUBLE on identical operands —
the engine's cross-engine determinism rule — which is what lets the
unrolled SQL oracle reproduce the estimator bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_ZCRIT_05 = 1.959963984540054  # two-sided normal critical value at α=0.05

# chi-square upper-tail critical values at α=0.05 by df (KW H ~ χ²_{k-1})
_CHI2_05 = {1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.070}


def clr_transform(long_df: DataFrame) -> DataFrame:
    """Centered log-ratio per sample: log(count+1) − mean_sample(log(count+1)).
    The +1 pseudo-count mirrors the standard zero-handling."""
    lg = long_df.withColumn("__lg", F.log(F.col("count") + 1))
    means = lg.groupBy("sample_id").agg(F.avg("__lg").alias("__mlg"))
    return (
        lg.join(means, "sample_id")
        .withColumn("clr", F.col("__lg") - F.col("__mlg"))
        .drop("__lg", "__mlg")
    )


def ancombc(
    long_df: DataFrame,
    sample_meta: DataFrame,
    *,
    group_col: str,
    iters: int = 3,
) -> DataFrame:
    """ANCOM-BC bias-corrected log-fold-change + Wald test, 2 groups.

    ``long_df``: (sample_id, feature_id, count) sparse — absent cells mean
    count 0.  ``sample_meta``: (sample_id, <group_col>) with exactly two
    group values (compared low vs high by their sort order).

    Model: y_ij = log(count_ij + 1) = δ_j + β_{i,g(j)} + ε.  The
    alternating estimator runs ``iters`` rounds; each round is two skinny
    aggregations (no feature×sample densification — zero cells enter the
    means via group totals).  Output per feature: ``lfc`` = β_high − β_low
    (bias-corrected log fold change), ``w_stat`` = lfc / se (Wald),
    ``significant`` at α=0.05.  Matches the unrolled SQL oracle exactly:
    every sum is DECIMAL-quantized, every division a single identical
    DOUBLE op.
    """
    groups = sample_meta.select("sample_id", F.col(group_col).alias("grp")).distinct()
    y = (
        long_df.join(groups, "sample_id")
        .select(
            "sample_id",
            "feature_id",
            "grp",
            F.expr("CAST(LN(count + 1) AS DECIMAL(18,9))").alias("y"),
        )
        .persist()
    )
    n_features = y.select("feature_id").distinct().count()
    # every frame the iteration re-reads is skinny — materialize each once
    # (localCheckpoint also truncates lineage, keeping the per-round plan
    # constant instead of tripling it every iteration)
    feats = y.select("feature_id").distinct().localCheckpoint()
    n_g = groups.groupBy("grp").agg(F.count("*").alias("n_g")).localCheckpoint()
    # sparse totals — computed once, reused every round
    fg = y.groupBy("feature_id", "grp").agg(F.sum("y").alias("fgs")).localCheckpoint()
    rowsum = (
        y.groupBy("sample_id", "grp").agg(F.sum("y").alias("rs")).localCheckpoint()
    )

    # δ ≡ 0 initially → per-group δ totals start at 0
    dsum = n_g.select("grp", F.expr("CAST(0 AS DECIMAL(28,9))").alias("dsum"))
    beta = None
    delta = None
    for _ in range(iters):
        # β_ig = (Σ_{j∈g, present} y_ij − Σ_{j∈g} δ_j) / n_g
        beta = (
            feats.crossJoin(n_g.join(dsum, "grp"))
            .join(fg, ["feature_id", "grp"], "left")
            .select(
                "feature_id",
                "grp",
                F.expr(
                    "CAST(CAST(COALESCE(fgs, CAST(0 AS DECIMAL(28,9))) - dsum AS DOUBLE)"
                    " / n_g AS DECIMAL(18,9))"
                ).alias("beta"),
            )
        )
        bsum = beta.groupBy("grp").agg(F.sum("beta").alias("bsum"))
        # δ_j = (Σ_{i present} y_ij − Σ_i β_{i,g(j)}) / n_features
        delta = (
            rowsum.join(bsum, "grp")
            .select(
                "sample_id",
                "grp",
                F.expr(
                    f"CAST(CAST(rs - bsum AS DOUBLE) / {n_features} AS DECIMAL(18,9))"
                ).alias("delta"),
            )
        )
        # truncate the per-round lineage: β_t would otherwise embed the
        # whole δ_{t-1} → β_{t-1} → … chain (plan size grows ~3× per round)
        beta = beta.localCheckpoint()
        delta = delta.localCheckpoint()
        dsum = delta.groupBy("grp").agg(F.sum("delta").alias("dsum"))

    # Wald variance: SS_ig = Σ_{j∈g}(y_ij − δ_j − β_ig)², absent cells via
    #   Σ_{j∈g}(δ_j+β)²  =  S2_g + (β·S1_g + β·S1_g) + n_g·β²
    # so SS = Σ_present[(y−δ−β)² − (δ+β)²] + that closed form.
    dmom = delta.groupBy("grp").agg(
        F.expr("CAST(SUM(CAST(delta AS DECIMAL(18,9))) AS DECIMAL(18,9))").alias("s1"),
        F.expr("CAST(SUM(delta * delta) AS DECIMAL(28,18))").alias("s2"),
    )
    present = (
        y.join(delta.select("sample_id", "delta"), "sample_id")
        .join(beta, ["feature_id", "grp"])
        .select(
            "feature_id",
            "grp",
            F.expr("CAST(y - delta - beta AS DECIMAL(18,9))").alias("r"),
            F.expr("CAST(delta + beta AS DECIMAL(18,9))").alias("z"),
        )
        .groupBy("feature_id", "grp")
        .agg(
            F.expr("CAST(SUM(r * r) AS DECIMAL(28,18))").alias("p_rr"),
            F.expr("CAST(SUM(z * z) AS DECIMAL(28,18))").alias("p_zz"),
        )
    )
    per_fg = (
        feats.crossJoin(n_g.join(dmom, "grp"))
        .join(beta, ["feature_id", "grp"])
        .join(present, ["feature_id", "grp"], "left")
        .select(
            "feature_id",
            "grp",
            "n_g",
            "beta",
            F.expr(
                "CAST(COALESCE(p_rr, CAST(0 AS DECIMAL(28,18)))"
                " - COALESCE(p_zz, CAST(0 AS DECIMAL(28,18))) AS DECIMAL(29,18))"
            ).alias("pdiff"),
            F.expr("CAST(beta * s1 AS DECIMAL(28,18))").alias("bs1"),
            "s2",
            F.expr("CAST(CAST(n_g AS DECIMAL(10,0)) * CAST(beta * beta AS DECIMAL(28,18)) AS DECIMAL(38,18))").alias("nb2"),
        )
        .select(
            "feature_id",
            "grp",
            "n_g",
            "beta",
            # se²·n_g(n_g−1) — still exact decimal
            F.expr(
                "CAST(pdiff AS DOUBLE) + CAST(s2 AS DOUBLE) + CAST(bs1 AS DOUBLE)"
                " + CAST(bs1 AS DOUBLE) + CAST(nb2 AS DOUBLE)"
            ).alias("ss"),
        )
        .select(
            "feature_id",
            "grp",
            "beta",
            F.expr("ss / (n_g * (n_g - 1))").alias("var_beta"),
        )
    )
    lo = per_fg.groupBy("feature_id").agg(
        F.min(F.struct("grp", "beta", "var_beta")).alias("lo"),
        F.max(F.struct("grp", "beta", "var_beta")).alias("hi"),
    )
    return lo.select(
        "feature_id",
        F.expr("CAST(hi.beta - lo.beta AS DOUBLE)").alias("lfc"),
        F.expr(
            "CASE WHEN lo.var_beta + hi.var_beta > 0 THEN "
            "ROUND(CAST(hi.beta - lo.beta AS DOUBLE)"
            " / SQRT(lo.var_beta + hi.var_beta), 6) END"
        ).alias("w_stat"),
        F.expr(
            "CASE WHEN lo.var_beta + hi.var_beta > 0 THEN "
            f"ABS(CAST(hi.beta - lo.beta AS DOUBLE)"
            f" / SQRT(lo.var_beta + hi.var_beta)) > {_ZCRIT_05} END"
        ).alias("significant"),
    )


def differential_abundance(
    long_df: DataFrame, sample_meta: DataFrame, *, class_col: str
) -> DataFrame:
    """Per-feature KW H over CLR values across classes + effect size.

    Output: (feature_id, h_stat, df, significant, effect_size,
    top_class) — `significant` at α=0.05 via the χ² critical value,
    `effect_size` = max−min per-class mean CLR, `top_class` = class with
    the highest mean CLR (LEfSe's "which group is it enriched in").
    """
    clr = clr_transform(long_df).join(
        sample_meta.select("sample_id", class_col), "sample_id"
    )
    # tie-averaged ranks within each feature (rank×2 integer-exact)
    wf = Window.partitionBy("feature_id").orderBy("clr")
    wt = Window.partitionBy("feature_id", "clr")
    ranked = clr.withColumn("rmin", F.rank().over(wf)).withColumn(
        "t", F.count("*").over(wt)
    ).withColumn("rank2", 2 * F.col("rmin") + F.col("t") - 1)
    g = ranked.groupBy("feature_id", class_col).agg(
        F.sum("rank2").alias("rg2"),
        F.count("*").alias("ng"),
        F.avg("clr").alias("mean_clr"),
    )
    ties = (
        ranked.groupBy("feature_id", "clr")
        .agg(F.count("*").alias("tt"))
        .groupBy("feature_id")
        .agg(F.sum(F.col("tt") * F.col("tt") * F.col("tt") - F.col("tt")).alias("tie_sum"))
    )
    per_feature = (
        g.groupBy("feature_id")
        .agg(
            F.sum(F.col("rg2") * F.col("rg2") / F.col("ng") / 4).alias("sum_r2n"),
            F.sum("ng").alias("n"),
            F.count("*").alias("k"),
            (F.max("mean_clr") - F.min("mean_clr")).alias("effect_size"),
            F.max(F.struct(F.col("mean_clr"), F.col(class_col).alias("cls"))).alias("__top"),
        )
        .join(ties, "feature_id")
    )
    h = (
        (12.0 / (F.col("n") * (F.col("n") + 1)) * F.col("sum_r2n") - 3.0 * (F.col("n") + 1))
        / (1.0 - F.col("tie_sum") / (F.col("n") * F.col("n") * F.col("n") - F.col("n")))
    )
    crit = F.coalesce(
        *[F.when(F.col("k") - 1 == df, F.lit(v)) for df, v in _CHI2_05.items()],
        F.lit(float("inf")),
    )
    return per_feature.select(
        "feature_id",
        F.round(h, 6).alias("h_stat"),
        (F.col("k") - 1).cast("long").alias("df"),
        (h > crit).alias("significant"),
        F.round("effect_size", 6).alias("effect_size"),
        F.col("__top.cls").alias("top_class"),
    )


def lefse_lda(
    long_df: DataFrame, sample_meta: DataFrame, *, class_col: str
) -> DataFrame:
    """D6 — LEfSe's LDA effect size, per pairwise class split.

    The reference's ``run_lefse`` (rules/differential_abundance.smk:16-72)
    ranks features by a class-discriminating LDA score.  For one feature
    at a time (LEfSe fits each feature's discriminant axis independently
    of the others when covariances are diagonal), the two-class LDA is
    closed-form: the discriminant direction is w = Δm / s_w² and the
    class separation along it is the Fisher criterion

        J = (m_hi − m_lo)² / s_w²,   s_w² = (SS_lo + SS_hi) / (n−2)

    — a ratio of per-(feature, class) moment aggregates (n, Σclr, Σclr²),
    the same exact-decimal moments the ANOVA/KW paths use.  The reported
    ``lda_score`` is LEfSe's log10 scaling of the separation,
    log10(1 + J); ``top_class`` is the enriched class (sign of Δm).

    CLR features use the engine's convention (``clr_transform``): present
    cells only, log(count+1) quantized to DECIMAL(18,9), per-sample mean
    via one DOUBLE division on exact decimal sums — which is what lets
    the DuckDB oracle reproduce every value bit-for-bit.

    One pair of skinny aggregations + a per-feature self-join on class
    pairs (k·(k−1)/2 rows per feature, k = #classes — tiny); no feature×
    sample densification, no global sort.  Scale-safe at 100 TB.
    """
    y = long_df.select(
        "sample_id",
        "feature_id",
        F.expr("CAST(LN(count + 1) AS DECIMAL(18,9))").alias("y"),
    )
    m = y.groupBy("sample_id").agg(
        F.sum("y").alias("ys"), F.count("*").alias("yn")
    ).select(
        "sample_id",
        F.expr("CAST(CAST(ys AS DOUBLE) / yn AS DECIMAL(18,9))").alias("mlg"),
    )
    cls = sample_meta.select("sample_id", F.col(class_col).alias("cls")).distinct()
    clr = (
        y.join(m, "sample_id")
        .join(cls, "sample_id")
        .select(
            "feature_id",
            "cls",
            F.expr("CAST(y - mlg AS DECIMAL(19,9))").alias("clr"),
        )
    )
    mom = clr.groupBy("feature_id", "cls").agg(
        F.count("*").alias("n"),
        F.expr("CAST(SUM(clr) AS DECIMAL(28,9))").alias("s1"),
        F.expr("CAST(SUM(clr * clr) AS DECIMAL(38,18))").alias("s2"),
    )
    a, b = mom.alias("a"), mom.alias("b")
    pair = a.join(
        b,
        (F.col("a.feature_id") == F.col("b.feature_id"))
        & (F.col("a.cls") < F.col("b.cls")),
    )
    return pair.select(
        F.col("a.feature_id").alias("feature_id"),
        F.col("a.cls").alias("class_lo"),
        F.col("b.cls").alias("class_hi"),
        F.col("a.n").alias("n_lo"),
        F.col("b.n").alias("n_hi"),
        F.expr(
            "ROUND(CAST(b.s1 AS DOUBLE) / b.n - CAST(a.s1 AS DOUBLE) / a.n, 6)"
        ).alias("delta_clr"),
        F.expr(
            "ROUND(CASE WHEN a.n + b.n > 2 AND "
            " (CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * CAST(a.s1 AS DOUBLE) / a.n"
            "  + CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * CAST(b.s1 AS DOUBLE) / b.n)"
            " / (a.n + b.n - 2) > 0 THEN"
            " POW(CAST(b.s1 AS DOUBLE) / b.n - CAST(a.s1 AS DOUBLE) / a.n, 2)"
            " / ((CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * CAST(a.s1 AS DOUBLE) / a.n"
            "     + CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * CAST(b.s1 AS DOUBLE) / b.n)"
            "    / (a.n + b.n - 2)) END, 6)"
        ).alias("lda_j"),
        F.expr(
            "ROUND(LOG10(1 + CASE WHEN a.n + b.n > 2 AND "
            " (CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * CAST(a.s1 AS DOUBLE) / a.n"
            "  + CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * CAST(b.s1 AS DOUBLE) / b.n)"
            " / (a.n + b.n - 2) > 0 THEN"
            " POW(CAST(b.s1 AS DOUBLE) / b.n - CAST(a.s1 AS DOUBLE) / a.n, 2)"
            " / ((CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * CAST(a.s1 AS DOUBLE) / a.n"
            "     + CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * CAST(b.s1 AS DOUBLE) / b.n)"
            "    / (a.n + b.n - 2)) ELSE 0 END), 6)"
        ).alias("lda_score"),
        F.expr(
            "CASE WHEN CAST(b.s1 AS DOUBLE) / b.n >= CAST(a.s1 AS DOUBLE) / a.n"
            " THEN b.cls ELSE a.cls END"
        ).alias("top_class"),
    )
