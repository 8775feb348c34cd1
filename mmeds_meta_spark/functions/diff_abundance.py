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


def _ancombc_lfc_frame(
    long_df: DataFrame,
    sample_meta: DataFrame,
    *,
    group_col: str,
    iters: int = 3,
) -> DataFrame:
    """ANCOM-BC bias-corrected log-fold-change + Wald test, 2 groups —
    internal: returns the per-feature (feature_id, x = lfc as exact
    DECIMAL(18,9), var_sum = var_lo + var_hi) frame shared by the plain
    and the E-M-refined public variants.

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
    # every frame the iteration re-reads is skinny — materialize each once
    # (localCheckpoint also truncates lineage, keeping the per-round plan
    # constant instead of tripling it every iteration)
    n_g = groups.groupBy("grp").agg(F.count("*").alias("n_g")).localCheckpoint()
    # sparse totals — computed once, reused every round
    fg = y.groupBy("feature_id", "grp").agg(F.sum("y").alias("fgs")).localCheckpoint()
    # the feature dimension and its cardinality both ride the (already
    # materialized, |features|×2-row) fg checkpoint — no second pass over y
    feats = fg.select("feature_id").distinct().localCheckpoint()
    n_features = feats.count()
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
        # truncate the per-round lineage: ONE barrier per round, on δ only.
        # β's subtree is shallow once feats/n_g/fg are checkpointed (a
        # crossJoin of tiny checkpointed relations + one left join), so
        # checkpointing δ — whose plan embeds β_t over the PREVIOUS round's
        # checkpointed δ — keeps the per-round plan constant-depth by
        # itself.  The former per-round β checkpoint both added a second
        # blocking job per round AND made δ's checkpoint re-execute the β
        # subtree it had already materialized (δ was built from the
        # pre-checkpoint β plan).  Values are expression-identical.
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
        F.expr("CAST(hi.beta - lo.beta AS DECIMAL(18,9))").alias("x"),
        F.expr("lo.var_beta + hi.var_beta").alias("var_sum"),
    )


def ancombc(
    long_df: DataFrame,
    sample_meta: DataFrame,
    *,
    group_col: str,
    iters: int = 3,
) -> DataFrame:
    """ANCOM-BC bias-corrected LFC + Wald test (see module docstring and
    :func:`_ancombc_lfc_frame` for the estimator)."""
    fr = _ancombc_lfc_frame(long_df, sample_meta, group_col=group_col, iters=iters)
    return fr.select(
        "feature_id",
        F.expr("CAST(x AS DOUBLE)").alias("lfc"),
        F.expr(
            "CASE WHEN var_sum > 0 THEN "
            "ROUND(CAST(x AS DOUBLE) / SQRT(var_sum), 6) END"
        ).alias("w_stat"),
        F.expr(
            f"CASE WHEN var_sum > 0 THEN "
            f"ABS(CAST(x AS DOUBLE) / SQRT(var_sum)) > {_ZCRIT_05} END"
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


def ancombc_em(
    long_df: DataFrame,
    sample_meta: DataFrame,
    *,
    group_col: str,
    iters: int = 3,
    em_iters: int = 3,
) -> DataFrame:
    """ANCOM-BC with the Gaussian-mixture δ refinement (Lin & Peddada
    2020 §"bias correction", the step behind the R package's final
    E-M) — closes the documented simplification of :func:`ancombc`.

    Model: the per-feature LFC estimates x_i are a 3-component mixture —
    null features at N(δ, σ²) (δ = the residual shared sampling-fraction
    bias the alternating estimator cannot separate from a global shift),
    down-shifted at N(δ+μ₁, σ²) (μ₁<0) and up-shifted at N(δ+μ₂, σ²)
    (μ₂>0).  ``em_iters`` fixed E-M rounds estimate δ; the corrected
    LFC is x−δ and the Wald test runs on it.

    Cross-engine exactness: responsibilities and moment contributions
    are DECIMAL-quantized after each transcendental (EXP is the one
    libm-dependent op; quantizing at 9 dp absorbs sub-ulp divergence),
    every sum is exact decimal, every division a single identical DOUBLE
    op — the same discipline as the base estimator, so the unrolled
    DuckDB oracle reproduces the E-M bit-for-bit.  Per round the work is
    one skinny aggregation over the per-feature frame (n_features rows);
    the mixture parameters are scalars re-embedded as literals.
    """
    fr = _ancombc_lfc_frame(
        long_df, sample_meta, group_col=group_col, iters=iters
    ).localCheckpoint()
    st = fr.agg(
        F.expr("CAST(SUM(x) AS DECIMAL(28,9))").alias("sx"),
        F.expr("CAST(SUM(x * x) AS DECIMAL(38,18))").alias("sxx"),
        F.count("*").alias("n"),
        F.expr("CAST(MIN(x) AS DOUBLE)").alias("mn"),
        F.expr("CAST(MAX(x) AS DOUBLE)").alias("mx"),
    ).first()
    n = st["n"]
    delta = float(st["sx"]) / n
    s2m = max((float(st["sxx"]) - float(st["sx"]) * float(st["sx"]) / n) / n, 1e-8)
    mu1 = min(float(st["mn"]) - delta, -0.001)
    mu2 = max(float(st["mx"]) - delta, 0.001)
    pi0 = pi1 = pi2 = 1.0 / 3.0

    for _ in range(em_iters):
        means = (delta, delta + mu1, delta + mu2)
        w_cols = [
            F.expr(
                f"CAST(({pi!r}) * EXP(-((CAST(x AS DOUBLE) - ({m!r}))"
                f" * (CAST(x AS DOUBLE) - ({m!r}))) / (2.0 * ({s2m!r})))"
                " AS DECIMAL(18,9))"
            ).alias(f"w{k}")
            for k, (pi, m) in enumerate(zip((pi0, pi1, pi2), means))
        ]
        w = fr.select("x", *w_cols).withColumn(
            "tot",
            F.expr("CAST(w0 AS DOUBLE) + CAST(w1 AS DOUBLE) + CAST(w2 AS DOUBLE)"),
        )
        r_cols = [
            F.expr(
                f"CASE WHEN tot > 0 THEN CAST(CAST(w{k} AS DOUBLE) / tot AS DECIMAL(18,9))"
                f" ELSE CAST({1 if k == 0 else 0} AS DECIMAL(18,9)) END"
            ).alias(f"r{k}")
            for k in range(3)
        ]
        r = w.select("x", *r_cols)
        q_cols = [
            F.expr(
                f"CAST(CAST(r{k} AS DOUBLE) * ((CAST(x AS DOUBLE) - ({m!r}))"
                f" * (CAST(x AS DOUBLE) - ({m!r}))) AS DECIMAL(28,15))"
            ).alias(f"q{k}")
            for k, m in enumerate(means)
        ]
        rq = r.select("x", "r0", "r1", "r2", *q_cols)
        agg = rq.agg(
            *[F.expr(f"CAST(SUM(r{k}) AS DECIMAL(28,9))").alias(f"sr{k}") for k in range(3)],
            *[
                F.expr(f"CAST(SUM(r{k} * x) AS DECIMAL(38,18))").alias(f"srx{k}")
                for k in range(3)
            ],
            F.expr("CAST(SUM(q0 + q1 + q2) AS DECIMAL(38,15))").alias("sq"),
        ).first()
        sr = [float(agg[f"sr{k}"]) for k in range(3)]
        srx = [float(agg[f"srx{k}"]) for k in range(3)]
        delta_new = srx[0] / sr[0] if sr[0] > 0 else delta
        mu1 = min(srx[1] / sr[1] - delta_new, -0.001) if sr[1] > 0 else mu1
        mu2 = max(srx[2] / sr[2] - delta_new, 0.001) if sr[2] > 0 else mu2
        delta = delta_new
        s2m = max(float(agg["sq"]) / n, 1e-8)
        pi0, pi1, pi2 = sr[0] / n, sr[1] / n, sr[2] / n

    return fr.select(
        "feature_id",
        F.expr("CAST(x AS DOUBLE)").alias("lfc"),
        F.expr(f"ROUND(CAST({delta!r} AS DOUBLE), 6)").alias("delta_em"),
        F.expr(f"ROUND(CAST(x AS DOUBLE) - ({delta!r}), 6)").alias("lfc_centered"),
        F.expr(
            f"CASE WHEN var_sum > 0 THEN "
            f"ROUND((CAST(x AS DOUBLE) - ({delta!r})) / SQRT(var_sum), 6) END"
        ).alias("w_stat_centered"),
        F.expr(
            f"CASE WHEN var_sum > 0 THEN "
            f"ABS((CAST(x AS DOUBLE) - ({delta!r})) / SQRT(var_sum)) > {_ZCRIT_05} END"
        ).alias("significant"),
    )
