"""Diversity / differential-abundance analytics (SURVEY §2.10 D1/D2/D6).

The reference shells out to QIIME2/LEfSe; here the statistics are native
DataFrame plans over a long feature table.  The synthetic stand-in:
``events`` as (sample=user_id, feature=event_type, abundance=count).

Exactness strategy:
* Bray-Curtis uses integer abundances → the distance is an integer ratio,
  bit-identical across engines.
* Shannon entropy and Kruskal-Wallis involve ln(); libm vs JVM can differ
  in the last ulp, so the final statistic is rounded to 6dp (the only
  operators in the suite that need rounding beyond formula identity).
* Kruskal-Wallis tie-averaged ranks are half-integers → stored ×2 as
  exact integers; the H statistic's inputs are exact.

Scale: abundance matrices stay LONG (feature_id, sample_id, count) per
SURVEY §1.4; pairwise distances are generated per feature (inverted-index
style) then aggregated — never a dense sample×sample materialization.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..testdata import table as _t
from . import QuerySpec

# ---------------------------------------------------------------------------
# D1 — Shannon diversity per sample  (rules/diversity_analysis.smk:42-75)
# ---------------------------------------------------------------------------


def d1_shannon_diversity(
    spark: SparkSession, sf: str, *, counts: DataFrame | None = None
) -> DataFrame:
    """H = ln(N) − (1/N)·Σ c·ln(c) over feature counts per sample.
    Counts are exact ints; the two ln-terms use the identical formula both
    engines; result rounded to 6dp.  Pass a pre-computed ``counts``
    (user_id, event_type, c) to share ONE events scan across metrics
    (the core-metrics composition does)."""
    if counts is None:
        ev = _t(spark, sf, "events")
        counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    terms = counts.groupBy("user_id").agg(
        F.expr("SUM(c)").alias("n"),
        F.expr("SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE)))").alias("clnc"),
        F.expr("COUNT(*)").alias("n_features"),
    )
    return terms.select(
        "user_id",
        "n_features",
        F.expr("ROUND(LN(CAST(n AS DOUBLE)) - clnc / n, 6)").alias("shannon"),
    )


_D1_SQL = """
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY user_id, event_type
), terms AS (
  SELECT user_id, SUM(c) AS n,
         SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE))) AS clnc,
         COUNT(*) AS n_features
  FROM counts GROUP BY user_id
)
SELECT user_id, n_features,
       ROUND(LN(CAST(n AS DOUBLE)) - clnc / n, 6) AS shannon
FROM terms
"""


def d17_pielou_evenness(
    spark: SparkSession, sf: str, *, counts: DataFrame | None = None
) -> DataFrame:
    """Pielou's evenness J = H / ln(S) per sample — the remaining alpha
    metric of qiime's core-metrics bundle (``qiime diversity
    core-metrics-phylogenetic`` emits evenness alongside shannon /
    observed-features / faith_pd, rules/diversity_analysis.smk:5-40):
    richness-normalized diversity, 1.0 = perfectly even feature
    abundances.  Samples with a single feature have no defined evenness
    (ln(1) = 0) and report NULL on both engines.

    Same two-shuffle shape and exact-integer count base as d1_shannon;
    the closing expression is one identical double tree
    ((ln N − Σc·ln c / N) / ln S) rounded at 6dp."""
    if counts is None:
        ev = _t(spark, sf, "events")
        counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    terms = counts.groupBy("user_id").agg(
        F.expr("SUM(c)").alias("n"),
        F.expr("SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE)))").alias("clnc"),
        F.expr("COUNT(*)").alias("n_features"),
    )
    return terms.select(
        "user_id",
        F.col("n_features").cast("long").alias("n_features"),
        F.expr(
            "CASE WHEN n_features > 1 THEN"
            " ROUND((LN(CAST(n AS DOUBLE)) - clnc / n)"
            " / LN(CAST(n_features AS DOUBLE)), 6)"
            " ELSE NULL END"
        ).alias("pielou_evenness"),
    )


_D17_SQL = """
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY user_id, event_type
), terms AS (
  SELECT user_id, SUM(c) AS n,
         SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE))) AS clnc,
         COUNT(*) AS n_features
  FROM counts GROUP BY user_id
)
SELECT user_id, CAST(n_features AS BIGINT) AS n_features,
       CASE WHEN n_features > 1 THEN
         ROUND((LN(CAST(n AS DOUBLE)) - clnc / n)
               / LN(CAST(n_features AS DOUBLE)), 6)
       ELSE NULL END AS pielou_evenness
FROM terms
"""


def d15_chao1_coverage(
    spark: SparkSession, sf: str, *, counts: DataFrame | None = None
) -> DataFrame:
    """Chao1 richness + Good's coverage per sample — the two abundance-
    based alpha metrics of the reference's qiime runs beside shannon /
    faith_pd (`qiime diversity alpha`, rules/diversity_analysis.smk:5-40;
    skbio's bias-corrected chao1 = S_obs + F1·(F1−1)/(2·(F2+1)), Good's
    coverage = 1 − F1/N) — and, read through the LLM-pipeline lens, the
    corpus-planning diagnostic: F1/N is the unseen-vocabulary mass and
    chao1 the projected vocabulary size under more data.

    Everything is singleton/doubleton INTEGER arithmetic closed by one
    double division per metric — bit-exact cross-engine, no
    transcendentals.  One partial-agg shuffle to (sample, feature)
    counts, one to the per-sample F1/F2 profile."""
    if counts is None:
        ev = _t(spark, sf, "events")
        counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    prof = counts.groupBy("user_id").agg(
        F.count("*").cast("long").alias("s_obs"),
        F.sum("c").cast("long").alias("n_reads"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long").alias("f2"),
    )
    return prof.select(
        "user_id",
        "s_obs",
        "n_reads",
        "f1",
        "f2",
        F.expr(
            "CAST(s_obs AS DOUBLE) + CAST(f1 * (f1 - 1) AS DOUBLE)"
            " / CAST(2 * (f2 + 1) AS DOUBLE)"
        ).alias("chao1"),
        F.expr("1.0 - CAST(f1 AS DOUBLE) / CAST(n_reads AS DOUBLE)").alias(
            "goods_coverage"
        ),
    )


_D15_SQL = """
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY user_id, event_type
), prof AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS s_obs,
         CAST(SUM(c) AS BIGINT) AS n_reads,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM counts GROUP BY user_id
)
SELECT user_id, s_obs, n_reads, f1, f2,
       CAST(s_obs AS DOUBLE) + CAST(f1 * (f1 - 1) AS DOUBLE)
       / CAST(2 * (f2 + 1) AS DOUBLE) AS chao1,
       1.0 - CAST(f1 AS DOUBLE) / CAST(n_reads AS DOUBLE) AS goods_coverage
FROM prof
"""


# ---------------------------------------------------------------------------
# D2 — Bray-Curtis dissimilarity, pairwise over a sample block
# (rules/diversity_analysis.smk:5-40)
# ---------------------------------------------------------------------------

_BC_BLOCK = 40  # samples 0..39 → 780 pairs; blocking keeps pairs bounded


def d2_bray_curtis(
    spark: SparkSession,
    sf: str,
    *,
    block: int = _BC_BLOCK,
    counts: DataFrame | None = None,
) -> DataFrame:
    """BC(a,b) = Σ|xᵢ−yᵢ| / Σ(xᵢ+yᵢ).  Decomposed so only co-occurring
    features join:  Σ|x−y| = Σ_common|x−y| + (Sa−Σ_common x) + (Sb−Σ_common y),
    denominator Sa+Sb — all integers, hence exact.  At 100 TB the pair
    space is bucketed (here: the ``block`` sample-id prefix; the default
    matches the registered oracle) and features act as the inverted
    index; no dense matrix ever exists."""
    if counts is None:
        ev = _t(spark, sf, "events").filter(F.col("user_id") < block)
        # block-bounded; read by totals + both join sides (different
        # prunings).  localCheckpoint, not .cache(): a cached plan is
        # never unpersisted here, so repeated invocations in a
        # long-lived session (bench passes, pipeline_core_metrics with
        # counts=None) would accumulate orphaned storage blocks — the
        # sibling d2_jaccard_beta's checkpoint convention (round-8
        # ADVICE) sidesteps the leak and cuts the reuse subtree too.
        counts = (
            ev.groupBy("user_id", "event_type")
            .agg(F.count("*").alias("c"))
            .localCheckpoint(eager=True)
        )
    return bray_curtis_pairs(counts)


def bray_curtis_pairs(
    counts: DataFrame,
    *,
    id_col: str = "user_id",
    feat_col: str = "event_type",
    val_col: str = "c",
    out_col: str = "bray_curtis",
) -> DataFrame:
    """The shared Bray-Curtis pair kernel: given a (sample, feature,
    count) relation, emit (ua, ub, distance) via the inverted-index
    decomposition — only co-occurring features join, the pair space is
    bounded by the caller's sample block, and no dense matrix exists.
    Both :func:`d2_bray_curtis` (the gated registry entry) and the
    analysis pipeline's beta stage (plans/analysis.py) call this, so
    the pipeline inherits the blocked, shuffle-hash-hinted shape
    instead of restating an uncapped crossJoin (round-8 verdict)."""
    counts = counts.select(
        F.col(id_col).alias("user_id"),
        F.col(feat_col).alias("event_type"),
        F.col(val_col).alias("c"),
    )
    totals = counts.groupBy("user_id").agg(F.expr("SUM(c)").alias("s"))
    a = counts.select(F.col("user_id").alias("ua"), "event_type", F.col("c").alias("xa"))
    # shuffle-hash: event_type has 5 fat keys — SMJ sorts the full pair
    # expansion, SHJ streams it (same pattern as the dedup band joins)
    b = counts.select(
        F.col("user_id").alias("ub"), "event_type", F.col("c").alias("xb")
    ).hint("shuffle_hash")
    common = (
        a.join(b, "event_type")
        .filter(F.col("ua") < F.col("ub"))
        .groupBy("ua", "ub")
        .agg(
            F.expr("SUM(ABS(xa - xb))").alias("d_common"),
            F.expr("SUM(xa)").alias("ca"),
            F.expr("SUM(xb)").alias("cb"),
        )
    )
    ta = totals.select(F.col("user_id").alias("ua"), F.col("s").alias("sa"))
    tb = totals.select(F.col("user_id").alias("ub"), F.col("s").alias("sb"))
    pairs = (
        ta.crossJoin(tb)
        .filter(F.col("ua") < F.col("ub"))
        # common is bounded by block_size² rows — always broadcastable
        .join(F.broadcast(common), ["ua", "ub"], "left")
        .fillna(0, subset=["d_common", "ca", "cb"])
    )
    return pairs.select(
        "ua",
        "ub",
        F.expr(
            "CAST(d_common + (sa - ca) + (sb - cb) AS DOUBLE) / (sa + sb)"
        ).alias(out_col),
    )


_D2_SQL = f"""
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events
  WHERE user_id < {_BC_BLOCK} GROUP BY user_id, event_type
), totals AS (
  SELECT user_id, SUM(c) AS s FROM counts GROUP BY user_id
), common AS (
  SELECT a.user_id AS ua, b.user_id AS ub,
         SUM(ABS(a.c - b.c)) AS d_common, SUM(a.c) AS ca, SUM(b.c) AS cb
  FROM counts a JOIN counts b
    ON a.event_type = b.event_type AND a.user_id < b.user_id
  GROUP BY 1, 2
)
SELECT ta.user_id AS ua, tb.user_id AS ub,
       CAST(COALESCE(d_common, 0) + (ta.s - COALESCE(ca, 0))
            + (tb.s - COALESCE(cb, 0)) AS DOUBLE) / (ta.s + tb.s) AS bray_curtis
FROM totals ta
JOIN totals tb ON ta.user_id < tb.user_id
LEFT JOIN common ON ua = ta.user_id AND ub = tb.user_id
"""


def d2_jaccard_beta(
    spark: SparkSession,
    sf: str,
    *,
    block: int = _BC_BLOCK,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Jaccard beta diversity — the presence/absence distance matrix of
    qiime's core-metrics bundle (it emits FOUR matrices: jaccard,
    bray-curtis, and both UniFracs; rules/diversity_analysis.smk:5-40):
    J_dist(a,b) = 1 − |A∩B|/|A∪B| over each sample's feature SET.

    Same inverted-index pair shape as d2_bray_curtis (features are the
    join key, the pair space is block-bounded, no dense matrix), and
    exact by construction: dist = (n_a + n_b − 2·I)/(n_a + n_b − I) is
    an integer ratio."""
    if counts is None:
        ev = _t(spark, sf, "events").filter(F.col("user_id") < block)
        presence = ev.select("user_id", "event_type").distinct()
    else:
        # presence = the support of the shared counts relation
        presence = counts.filter(F.col("user_id") < block).select(
            "user_id", "event_type"
        )
    # localCheckpoint, not .cache(): a cached plan is never unpersisted
    # here, so repeated invocations in a long-lived session (bench
    # passes, pipeline_core_metrics) would accumulate orphaned storage
    # blocks — the sibling operators' checkpoint convention (round-8
    # ADVICE) sidesteps the leak and cuts the reuse subtree too.
    feats = presence.localCheckpoint(eager=True)
    nf = feats.groupBy("user_id").agg(F.count("*").alias("nf"))
    a = feats.select(F.col("user_id").alias("ua"), "event_type")
    b = feats.select(F.col("user_id").alias("ub"), "event_type").hint("shuffle_hash")
    common = (
        a.join(b, "event_type")
        .filter(F.col("ua") < F.col("ub"))
        .groupBy("ua", "ub")
        .agg(F.count("*").alias("inter"))
    )
    ta = nf.select(F.col("user_id").alias("ua"), F.col("nf").alias("na"))
    tb = nf.select(F.col("user_id").alias("ub"), F.col("nf").alias("nb"))
    return (
        ta.crossJoin(tb)
        .filter(F.col("ua") < F.col("ub"))
        .join(F.broadcast(common), ["ua", "ub"], "left")
        .fillna(0, subset=["inter"])
        .select(
            "ua",
            "ub",
            F.expr(
                "CAST(na + nb - 2 * inter AS DOUBLE) / (na + nb - inter)"
            ).alias("jaccard_dist"),
        )
    )


_D2J_SQL = f"""
WITH feats AS (
  SELECT DISTINCT user_id, event_type FROM events WHERE user_id < {_BC_BLOCK}
), nf AS (
  SELECT user_id, COUNT(*) AS nf FROM feats GROUP BY user_id
), common AS (
  SELECT a.user_id AS ua, b.user_id AS ub, COUNT(*) AS inter
  FROM feats a JOIN feats b
    ON a.event_type = b.event_type AND a.user_id < b.user_id
  GROUP BY 1, 2
)
SELECT ta.user_id AS ua, tb.user_id AS ub,
       CAST(ta.nf + tb.nf - 2 * COALESCE(inter, 0) AS DOUBLE)
         / (ta.nf + tb.nf - COALESCE(inter, 0)) AS jaccard_dist
FROM nf ta
JOIN nf tb ON ta.user_id < tb.user_id
LEFT JOIN common ON ua = ta.user_id AND ub = tb.user_id
"""


# ---------------------------------------------------------------------------
# D6 — Kruskal-Wallis H across groups (LEfSe's first stage)
# (rules/differential_abundance.smk:16-72)
# ---------------------------------------------------------------------------


_KW_BUCKETS = 1024  # range buckets for the two-level distributed CDF


_ANCOMBC_EM_ITERS = 3


def d5_ancombc_em(spark: SparkSession, sf: str) -> DataFrame:
    """ANCOM-BC with the Gaussian-mixture δ refinement
    (functions/diff_abundance.ancombc_em) on the events demo — closes the
    estimator's last documented simplification vs Lin & Peddada 2020."""
    from ..functions.diff_abundance import ancombc_em

    ev = _t(spark, sf, "events")
    long_df = ev.groupBy(
        F.col("user_id").alias("sample_id"), F.col("event_type").alias("feature_id")
    ).agg(F.count("*").alias("count"))
    smeta = (
        ev.select(F.col("user_id").alias("sample_id"))
        .distinct()
        .withColumn("g2", F.expr("sample_id % 2"))
    )
    return ancombc_em(long_df, smeta, group_col="g2", em_iters=_ANCOMBC_EM_ITERS)


def d6_kruskal_wallis(spark: SparkSession, sf: str) -> DataFrame:
    """H over events.value grouped by event_type, with tie-averaged ranks
    and tie correction — WITHOUT a global row sort.

    Tie-averaged rank ×2 for value v is the integer 2·C(v) + t(v) + 1,
    where t = per-value count and C = count of rows with smaller value
    (a cumulative sum over DISTINCT values).  Per group:
    Σ rank2 = Σ_v n(g,v)·(2C+t+1).

    The CDF C is a TWO-LEVEL cumulative sum: distinct values are range-
    bucketed (width_bucket over min..max, a 1-row broadcast), the cumsum
    runs per-bucket (partitioned window — parallel), and each bucket adds
    an exclusive prefix of per-bucket totals (a window over ≤ B rows).
    No global single-partition window ever sees the distinct values — the
    form that survives a CONTINUOUS measure (distincts ≈ rows) at 100 TB,
    where a global orderBy window funnels the whole CDF into one task."""
    ev = _t(spark, sf, "events").select("event_type", "value")
    # persist: bounds, the bucketed CDF, and the tie correction all read
    # vt with different prunings (no exchange reuse across them); sized
    # by DISTINCT values, and persist() spills to disk if that is large
    vt = ev.groupBy("value").agg(F.expr("COUNT(*)").alias("t")).persist()
    bounds = vt.agg(F.min("value").alias("vlo"), F.max("value").alias("vhi"))
    vb = vt.crossJoin(F.broadcast(bounds)).withColumn(
        "bkt",
        F.when(F.col("vlo") == F.col("vhi"), F.lit(1)).otherwise(
            F.least(
                F.lit(_KW_BUCKETS),
                F.expr(f"width_bucket(value, vlo, vhi, {_KW_BUCKETS})"),
            )
        ),
    )
    w_in = Window.partitionBy("bkt").orderBy("value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    within = vb.withColumn("cum_in", F.sum("t").over(w_in))
    bt = vb.groupBy("bkt").agg(F.sum("t").alias("bt"))
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, 0)
    prefix = bt.withColumn("pre", F.sum("bt").over(w_b) - F.col("bt")).select(
        "bkt", "pre"
    )
    vc = (
        within.join(F.broadcast(prefix), "bkt")
        .withColumn("c", (F.col("pre") + F.col("cum_in")).cast("decimal(38,0)") - F.col("t"))
        .select("value", "t", "c")
    )
    gv = ev.groupBy("event_type", "value").agg(F.expr("COUNT(*)").alias("ngv"))
    g = (
        gv.join(vc, "value")
        .groupBy("event_type")
        .agg(
            F.expr("SUM(CAST(ngv AS DECIMAL(38,0)) * (2 * c + t + 1))").alias("rg2"),
            F.expr("SUM(ngv)").alias("ng"),
        )
    )
    ties = vt.agg(F.expr("SUM(CAST(t AS DECIMAL(38,0)) * t * t - t)").alias("tie_sum"))
    tot = g.crossJoin(F.broadcast(ties)).agg(
        F.expr("SUM(CAST(rg2 AS DOUBLE) * CAST(rg2 AS DOUBLE) / ng / 4)").alias("sum_r2n"),
        F.expr("SUM(ng)").alias("n"),
        F.expr("COUNT(*)").alias("k"),
        F.expr("MIN(tie_sum)").alias("tie_sum"),
    )
    return tot.select(
        F.expr(
            "ROUND((12.0 / (CAST(n AS DOUBLE) * (n + 1)) * sum_r2n - 3.0 * (n + 1))"
            " / (1.0 - CAST(tie_sum AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n)), 6)"
        ).alias("h_stat"),
        F.expr("CAST(k - 1 AS BIGINT)").alias("df"),
    )


_D6_SQL = """
WITH vt AS (
  SELECT value, COUNT(*) AS t FROM events GROUP BY value
), vc AS (
  SELECT value, t,
         CAST(SUM(t) OVER (ORDER BY value
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) - t AS c
  FROM vt
), gv AS (
  SELECT event_type, value, COUNT(*) AS ngv FROM events GROUP BY event_type, value
), g AS (
  SELECT event_type,
         SUM(CAST(ngv AS HUGEINT) * (2 * c + t + 1)) AS rg2,
         SUM(ngv) AS ng
  FROM gv JOIN vc USING (value) GROUP BY event_type
), ties AS (
  SELECT SUM(CAST(t AS HUGEINT) * t * t - t) AS tie_sum FROM vt
), tot AS (
  SELECT SUM(CAST(rg2 AS DOUBLE) * CAST(rg2 AS DOUBLE) / ng / 4) AS sum_r2n,
         SUM(ng) AS n, COUNT(*) AS k, MIN(tie_sum) AS tie_sum
  FROM g, ties
)
SELECT ROUND((12.0 / (CAST(n AS DOUBLE) * (n + 1)) * sum_r2n - 3.0 * (n + 1))
             / (1.0 - CAST(tie_sum AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n)), 6) AS h_stat,
       CAST(k - 1 AS BIGINT) AS df
FROM tot
"""


# ---------------------------------------------------------------------------
# D5 — ANCOM-BC bias-corrected differential abundance
# (rules/differential_abundance.smk:1-14)
# ---------------------------------------------------------------------------

_ANCOMBC_ITERS = 3


def d5_ancombc(spark: SparkSession, sf: str) -> DataFrame:
    """ANCOM-BC (functions/diff_abundance.ancombc) on the events table:
    samples = user_id, features = event_type, two groups = user_id parity.
    The iterative bias correction runs as exact-decimal aggregations, so
    the unrolled SQL oracle reproduces it bit-for-bit."""
    from ..functions.diff_abundance import ancombc

    ev = _t(spark, sf, "events")
    long_df = ev.groupBy(
        F.col("user_id").alias("sample_id"), F.col("event_type").alias("feature_id")
    ).agg(F.count("*").alias("count"))
    smeta = (
        ev.select(F.col("user_id").alias("sample_id"))
        .distinct()
        .withColumn("g2", F.expr("sample_id % 2"))
    )
    return ancombc(long_df, smeta, group_col="g2", iters=_ANCOMBC_ITERS)


def _ancombc_sql(iters: int = _ANCOMBC_ITERS, em_iters: int = 0) -> str:
    """Unrolled transcription of functions/diff_abundance.ancombc for the
    events-table demo — same quantizations, same left-to-right double
    sums, same single divisions."""
    cte = [
        "counts AS (\n  SELECT user_id AS sample_id, event_type AS feature_id, COUNT(*) AS cnt\n"
        "  FROM events GROUP BY 1, 2\n)",
        "smeta AS (\n  SELECT DISTINCT user_id AS sample_id, user_id % 2 AS grp FROM events\n)",
        "y AS (\n  SELECT c.sample_id, c.feature_id, s.grp,\n"
        "         CAST(LN(c.cnt + 1) AS DECIMAL(18,9)) AS y\n"
        "  FROM counts c JOIN smeta s USING (sample_id)\n)",
        "feats AS (SELECT DISTINCT feature_id FROM y)",
        "nf AS (SELECT COUNT(*) AS f FROM feats)",
        "ng AS (SELECT grp, COUNT(*) AS n_g FROM smeta GROUP BY 1)",
        "fg AS (SELECT feature_id, grp, SUM(y) AS fgs FROM y GROUP BY 1, 2)",
        "rowsum AS (SELECT sample_id, grp, SUM(y) AS rs FROM y GROUP BY 1, 2)",
        "ds0 AS (SELECT grp, CAST(0 AS DECIMAL(28,9)) AS dsum FROM ng)",
    ]
    for t in range(1, iters + 1):
        cte.append(
            f"b{t} AS (\n"
            "  SELECT f.feature_id, g.grp,\n"
            "         CAST(CAST(COALESCE(fg.fgs, CAST(0 AS DECIMAL(28,9))) - g.dsum AS DOUBLE)\n"
            "              / g.n_g AS DECIMAL(18,9)) AS beta\n"
            f"  FROM feats f\n"
            f"  CROSS JOIN (SELECT ng.grp, ng.n_g, d.dsum FROM ng JOIN ds{t - 1} d USING (grp)) g\n"
            "  LEFT JOIN fg ON fg.feature_id = f.feature_id AND fg.grp = g.grp\n)"
        )
        cte.append(f"bs{t} AS (SELECT grp, SUM(beta) AS bsum FROM b{t} GROUP BY 1)")
        cte.append(
            f"d{t} AS (\n"
            "  SELECT r.sample_id, r.grp,\n"
            "         CAST(CAST(r.rs - b.bsum AS DOUBLE) / nf.f AS DECIMAL(18,9)) AS delta\n"
            f"  FROM rowsum r JOIN bs{t} b USING (grp) CROSS JOIN nf\n)"
        )
        cte.append(f"ds{t} AS (SELECT grp, SUM(delta) AS dsum FROM d{t} GROUP BY 1)")
    bf, df_ = f"b{iters}", f"d{iters}"
    cte.append(
        "dmom AS (\n"
        "  SELECT grp, CAST(SUM(CAST(delta AS DECIMAL(18,9))) AS DECIMAL(18,9)) AS s1,\n"
        "         CAST(SUM(delta * delta) AS DECIMAL(28,18)) AS s2\n"
        f"  FROM {df_} GROUP BY 1\n)"
    )
    cte.append(
        "present AS (\n"
        "  SELECT feature_id, grp,\n"
        "         CAST(SUM(r * r) AS DECIMAL(28,18)) AS p_rr,\n"
        "         CAST(SUM(z * z) AS DECIMAL(28,18)) AS p_zz\n"
        "  FROM (SELECT yy.feature_id, yy.grp,\n"
        "               CAST(yy.y - d.delta - b.beta AS DECIMAL(18,9)) AS r,\n"
        "               CAST(d.delta + b.beta AS DECIMAL(18,9)) AS z\n"
        "        FROM y yy\n"
        f"        JOIN {df_} d ON d.sample_id = yy.sample_id\n"
        f"        JOIN {bf} b ON b.feature_id = yy.feature_id AND b.grp = yy.grp)\n"
        "  GROUP BY 1, 2\n)"
    )
    cte.append(
        "varb AS (\n"
        "  SELECT f.feature_id, g.grp, b.beta,\n"
        "         (CAST(CAST(COALESCE(p.p_rr, CAST(0 AS DECIMAL(28,18)))\n"
        "                    - COALESCE(p.p_zz, CAST(0 AS DECIMAL(28,18))) AS DECIMAL(29,18)) AS DOUBLE)\n"
        "          + CAST(m.s2 AS DOUBLE)\n"
        "          + CAST(CAST(b.beta * m.s1 AS DECIMAL(28,18)) AS DOUBLE)\n"
        "          + CAST(CAST(b.beta * m.s1 AS DECIMAL(28,18)) AS DOUBLE)\n"
        "          + CAST(CAST(CAST(g.n_g AS DECIMAL(10,0)) * CAST(b.beta * b.beta AS DECIMAL(28,18)) AS DECIMAL(38,18)) AS DOUBLE))\n"
        "         / (g.n_g * (g.n_g - 1)) AS var_beta\n"
        "  FROM feats f\n"
        "  CROSS JOIN ng g\n"
        "  JOIN dmom m ON m.grp = g.grp\n"
        f"  JOIN {bf} b ON b.feature_id = f.feature_id AND b.grp = g.grp\n"
        "  LEFT JOIN present p ON p.feature_id = f.feature_id AND p.grp = g.grp\n)"
    )
    zcrit = "1.959963984540054"
    cte.append(
        "lfcx AS (\n"
        "  SELECT l.feature_id,\n"
        "         CAST(h.beta - l.beta AS DECIMAL(18,9)) AS x,\n"
        "         l.var_beta + h.var_beta AS var_sum\n"
        "  FROM varb l\n"
        "  JOIN varb h ON l.feature_id = h.feature_id AND l.grp < h.grp\n)"
    )
    if not em_iters:
        return (
            "WITH " + ",\n".join(cte) + """
SELECT feature_id,
       CAST(x AS DOUBLE) AS lfc,
       CASE WHEN var_sum > 0 THEN ROUND(CAST(x AS DOUBLE) / SQRT(var_sum), 6)
       END AS w_stat,
       CASE WHEN var_sum > 0 THEN ABS(CAST(x AS DOUBLE) / SQRT(var_sum)) > """
            + zcrit
            + """
       END AS significant
FROM lfcx
"""
        )
    # Gaussian-mixture δ refinement (functions/diff_abundance.ancombc_em):
    # 3-component E-M over the per-feature LFCs, quantized exactly as the
    # Spark side quantizes, unrolled one CTE pair (w/r + params) per round
    cte.append(
        "em0 AS (\n"
        "  SELECT CAST(SUM(x) AS DECIMAL(28,9)) AS sx,\n"
        "         CAST(SUM(x * x) AS DECIMAL(38,18)) AS sxx,\n"
        "         COUNT(*) AS n,\n"
        "         CAST(MIN(x) AS DOUBLE) AS mn, CAST(MAX(x) AS DOUBLE) AS mx\n"
        "  FROM lfcx\n)"
    )
    cte.append(
        "p0 AS (\n"
        "  SELECT CAST(sx AS DOUBLE) / n AS delta,\n"
        "         GREATEST((CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / n, 1e-8) AS s2m,\n"
        "         LEAST(mn - CAST(sx AS DOUBLE) / n, -0.001) AS mu1,\n"
        "         GREATEST(mx - CAST(sx AS DOUBLE) / n, 0.001) AS mu2,\n"
        "         1.0 / 3.0 AS pi0, 1.0 / 3.0 AS pi1, 1.0 / 3.0 AS pi2, n\n"
        "  FROM em0\n)"
    )
    for t in range(1, em_iters + 1):
        pm = f"p{t - 1}"
        means = ["p.delta", "p.delta + p.mu1", "p.delta + p.mu2"]
        w_exprs = ",\n".join(
            f"         CAST(p.pi{k} * EXP(-((CAST(x AS DOUBLE) - ({m}))"
            f" * (CAST(x AS DOUBLE) - ({m}))) / (2.0 * p.s2m)) AS DECIMAL(18,9)) AS w{k}"
            for k, m in enumerate(means)
        )
        cte.append(
            f"w{t} AS (\n  SELECT f.x, f.var_sum, p.delta, p.mu1, p.mu2, p.n,\n"
            + w_exprs
            + f"\n  FROM lfcx f CROSS JOIN {pm} p\n)"
        )
        r_exprs = ",\n".join(
            f"         CASE WHEN tot > 0 THEN CAST(CAST(w{k} AS DOUBLE) / tot AS DECIMAL(18,9))"
            f" ELSE CAST({1 if k == 0 else 0} AS DECIMAL(18,9)) END AS r{k}"
            for k in range(3)
        )
        cte.append(
            f"r{t} AS (\n  SELECT x, var_sum, delta, mu1, mu2, n,\n"
            + r_exprs
            + f"\n  FROM (SELECT *, CAST(w0 AS DOUBLE) + CAST(w1 AS DOUBLE)"
            f" + CAST(w2 AS DOUBLE) AS tot FROM w{t})\n)"
        )
        q_means = ["delta", "delta + mu1", "delta + mu2"]
        q_exprs = " + ".join(
            f"CAST(CAST(r{k} AS DOUBLE) * ((CAST(x AS DOUBLE) - ({m}))"
            f" * (CAST(x AS DOUBLE) - ({m}))) AS DECIMAL(28,15))"
            for k, m in enumerate(q_means)
        )
        sr_exprs = ",\n".join(
            f"         CAST(SUM(r{k}) AS DECIMAL(28,9)) AS sr{k},\n"
            f"         CAST(SUM(r{k} * x) AS DECIMAL(38,18)) AS srx{k}"
            for k in range(3)
        )
        cte.append(
            f"a{t} AS (\n  SELECT MIN(delta) AS delta, MIN(mu1) AS mu1,"
            " MIN(mu2) AS mu2, MIN(n) AS n,\n"
            + sr_exprs
            + f",\n         CAST(SUM({q_exprs}) AS DECIMAL(38,15)) AS sq\n"
            f"  FROM r{t}\n)"
        )
        cte.append(
            f"p{t} AS (\n"
            "  SELECT CASE WHEN CAST(sr0 AS DOUBLE) > 0"
            " THEN CAST(srx0 AS DOUBLE) / CAST(sr0 AS DOUBLE) ELSE delta END AS delta,\n"
            "         GREATEST(CAST(sq AS DOUBLE) / n, 1e-8) AS s2m,\n"
            "         CASE WHEN CAST(sr1 AS DOUBLE) > 0 THEN"
            " LEAST(CAST(srx1 AS DOUBLE) / CAST(sr1 AS DOUBLE)"
            " - (CASE WHEN CAST(sr0 AS DOUBLE) > 0"
            " THEN CAST(srx0 AS DOUBLE) / CAST(sr0 AS DOUBLE) ELSE delta END), -0.001)"
            " ELSE mu1 END AS mu1,\n"
            "         CASE WHEN CAST(sr2 AS DOUBLE) > 0 THEN"
            " GREATEST(CAST(srx2 AS DOUBLE) / CAST(sr2 AS DOUBLE)"
            " - (CASE WHEN CAST(sr0 AS DOUBLE) > 0"
            " THEN CAST(srx0 AS DOUBLE) / CAST(sr0 AS DOUBLE) ELSE delta END), 0.001)"
            " ELSE mu2 END AS mu2,\n"
            "         CAST(sr0 AS DOUBLE) / n AS pi0,\n"
            "         CAST(sr1 AS DOUBLE) / n AS pi1,\n"
            "         CAST(sr2 AS DOUBLE) / n AS pi2, n\n"
            f"  FROM a{t}\n)"
        )
    pf = f"p{em_iters}"
    return (
        "WITH " + ",\n".join(cte) + f"""
SELECT f.feature_id,
       CAST(f.x AS DOUBLE) AS lfc,
       ROUND(p.delta, 6) AS delta_em,
       ROUND(CAST(f.x AS DOUBLE) - p.delta, 6) AS lfc_centered,
       CASE WHEN f.var_sum > 0 THEN
         ROUND((CAST(f.x AS DOUBLE) - p.delta) / SQRT(f.var_sum), 6)
       END AS w_stat_centered,
       CASE WHEN f.var_sum > 0 THEN
         ABS((CAST(f.x AS DOUBLE) - p.delta) / SQRT(f.var_sum)) > {zcrit}
       END AS significant
FROM lfcx f CROSS JOIN {pf} p
"""
    )


# ---------------------------------------------------------------------------
# D6 — LEfSe's LDA effect size per pairwise class split
# (rules/differential_abundance.smk:16-72 run_lefse)
# ---------------------------------------------------------------------------


def d6_lefse_lda(spark: SparkSession, sf: str) -> DataFrame:
    """LEfSe LDA scores (functions/diff_abundance.lefse_lda) on the events
    table: samples = user_id, features = event_type, classes = user_id % 3
    → every pairwise split (a15's all-against-all convention) gets its
    closed-form two-class LDA score on CLR features."""
    from ..functions.diff_abundance import lefse_lda

    ev = _t(spark, sf, "events")
    # the aggregated feature table is the relation a real run
    # materializes anyway; checkpointing it here means the CLR / moment
    # / pairwise-split consumers inside lefse_lda never replay the
    # events scan (the pipeline_diff_abundance shared-scan convention),
    # and the sample metadata derives from the same materialization
    long_df = (
        ev.groupBy(
            F.col("user_id").alias("sample_id"),
            F.col("event_type").alias("feature_id"),
        )
        .agg(F.count("*").alias("count"))
        .localCheckpoint(eager=True)
    )
    smeta = (
        long_df.select("sample_id")
        .distinct()
        .withColumn("g3", F.expr("sample_id % 3"))
    )
    return lefse_lda(long_df, smeta, class_col="g3")


_LEFSE_LDA_SQL = """
WITH counts AS (
  SELECT user_id AS sample_id, event_type AS feature_id, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
), y AS (
  SELECT sample_id, feature_id, CAST(LN(cnt + 1) AS DECIMAL(18,9)) AS y
  FROM counts
), m AS (
  SELECT sample_id, CAST(CAST(SUM(y) AS DOUBLE) / COUNT(*) AS DECIMAL(18,9)) AS mlg
  FROM y GROUP BY 1
), clr AS (
  SELECT y.feature_id, y.sample_id % 3 AS cls,
         CAST(y.y - m.mlg AS DECIMAL(19,9)) AS clr
  FROM y JOIN m USING (sample_id)
), mom AS (
  SELECT feature_id, cls, COUNT(*) AS n,
         CAST(SUM(clr) AS DECIMAL(28,9)) AS s1,
         CAST(SUM(clr * clr) AS DECIMAL(38,18)) AS s2
  FROM clr GROUP BY 1, 2
)
SELECT a.feature_id,
       a.cls AS class_lo, b.cls AS class_hi,
       a.n AS n_lo, b.n AS n_hi,
       ROUND(CAST(b.s1 AS DOUBLE) / b.n - CAST(a.s1 AS DOUBLE) / a.n, 6) AS delta_clr,
       ROUND(CASE WHEN a.n + b.n > 2 AND
         (CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * CAST(a.s1 AS DOUBLE) / a.n
          + CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * CAST(b.s1 AS DOUBLE) / b.n)
         / (a.n + b.n - 2) > 0 THEN
         POW(CAST(b.s1 AS DOUBLE) / b.n - CAST(a.s1 AS DOUBLE) / a.n, 2)
         / ((CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * CAST(a.s1 AS DOUBLE) / a.n
             + CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * CAST(b.s1 AS DOUBLE) / b.n)
            / (a.n + b.n - 2)) END, 6) AS lda_j,
       ROUND(LOG10(1 + CASE WHEN a.n + b.n > 2 AND
         (CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * CAST(a.s1 AS DOUBLE) / a.n
          + CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * CAST(b.s1 AS DOUBLE) / b.n)
         / (a.n + b.n - 2) > 0 THEN
         POW(CAST(b.s1 AS DOUBLE) / b.n - CAST(a.s1 AS DOUBLE) / a.n, 2)
         / ((CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * CAST(a.s1 AS DOUBLE) / a.n
             + CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * CAST(b.s1 AS DOUBLE) / b.n)
            / (a.n + b.n - 2)) ELSE 0 END), 6) AS lda_score,
       CASE WHEN CAST(b.s1 AS DOUBLE) / b.n >= CAST(a.s1 AS DOUBLE) / a.n
            THEN b.cls ELSE a.cls END AS top_class
FROM mom a JOIN mom b
  ON a.feature_id = b.feature_id AND a.cls < b.cls
"""


# ---------------------------------------------------------------------------
# Composed differential-abundance bundle — the reference's SECOND
# end-to-end analysis chain (rules/differential_abundance.smk:1-72 driving
# rules/common.smk:13-77 class splits), as pipeline_core_metrics composed
# the diversity chain: split planning → per-feature KW → LDA effect sizes
# → ANCOM-BC verdicts over ONE shared feature-table scan.
# ---------------------------------------------------------------------------

_DA_LDA_SIG = 2.0  # LEfSe's published |LDA score| significance threshold


def pipeline_diff_abundance(spark: SparkSession, sf: str) -> DataFrame:
    """The differential-abundance bundle composed as ONE plan — the
    second end-to-end chain of the reference's analysis dataflow
    (rules/differential_abundance.smk:1-72: LEfSe + ANCOM-BC over the
    same feature table, with rules/common.smk:13-77 planning the class
    splits).  Four chained stages over a single eagerly-checkpointed
    (sample_id, feature_id, count) feature table (samples = user_id,
    features = event_type, classes = user_id % 3, ANCOM-BC's binary
    contrast = user_id % 2 — the d5/d6 demo conventions):

    1. **split planning** (a15's all-against-all convention): class
       pairs where both sides have ≥2 samples;
    2. **per-feature Kruskal-Wallis** across the 3 classes on quantized
       CLR features — mid-ranks via the d6/d11 two-phase bucketed CDF
       (windows partitioned by (feature, bucket); no global sort, and no
       per-feature single-task sort either — the shape that survives a
       continuous measure at 100 TB);
    3. **LDA effect sizes** (:func:`~..functions.diff_abundance.lefse_lda`
       verbatim) on the PLANNED splits only, reduced to each feature's
       best split by lexicographic struct-max;
    4. **ANCOM-BC verdicts**
       (:func:`~..functions.diff_abundance.ancombc` verbatim) on the
       binary contrast.

    Output: one row per feature joining the three methods' statistics
    and verdicts plus ``methods_significant`` (0-3 agreement count —
    the same defense-in-depth report shape as pipeline_decontam_report:
    a feature flagged by all three methods is a finding, a feature
    flagged by one is a hypothesis).

    CLR is the engine's quantized convention (ln(count+1) as
    DECIMAL(18,9), per-sample mean via one double division) so every
    rank tie-class and every moment is bit-identical cross-engine; all
    per-feature class folds are pinned in class order."""
    from ..functions.diff_abundance import _CHI2_05, ancombc, lefse_lda

    ev = _t(spark, sf, "events")
    cnts = (
        ev.groupBy(
            F.col("user_id").alias("sample_id"),
            F.col("event_type").alias("feature_id"),
        )
        .agg(F.count("*").alias("count"))
        .localCheckpoint(eager=True)  # the ONE shared feature-table scan
    )
    smeta = (
        cnts.select("sample_id")
        .distinct()
        .select(
            "sample_id",
            F.expr("sample_id % 3").alias("g3"),
            F.expr("sample_id % 2").alias("g2"),
        )
        .localCheckpoint(eager=True)  # sample-bounded; feeds 3 stages
    )

    # -- stage 1: split planning (a15_pairwise_splits' convention) --------
    ng3 = smeta.groupBy("g3").agg(F.count("*").alias("n"))
    sa = ng3.select(F.col("g3").alias("lo"), F.col("n").alias("n_lo"))
    sb = ng3.select(F.col("g3").alias("hi"), F.col("n").alias("n_hi"))
    splits = (
        sa.crossJoin(sb)
        .filter(
            (F.col("lo") < F.col("hi")) & (F.col("n_lo") >= 2) & (F.col("n_hi") >= 2)
        )
        .select("lo", "hi")
    )

    # -- shared quantized CLR (lefse_lda's exact convention) --------------
    y = cnts.select(
        "sample_id",
        "feature_id",
        F.expr("CAST(LN(count + 1) AS DECIMAL(18,9))").alias("y"),
    )
    m = (
        y.groupBy("sample_id")
        .agg(F.sum("y").alias("ys"), F.count("*").alias("yn"))
        .select(
            "sample_id",
            F.expr("CAST(CAST(ys AS DOUBLE) / yn AS DECIMAL(18,9))").alias("mlg"),
        )
    )
    clr = (
        y.join(m, "sample_id")
        .join(F.broadcast(smeta.select("sample_id", "g3")), "sample_id")
        .select(
            "feature_id", "g3", F.expr("CAST(y - mlg AS DECIMAL(19,9))").alias("clr")
        )
        # |samples|×|features|-bounded; read by the rank grid, the class
        # grid, and the moment branch — checkpoint so the plan states it
        .localCheckpoint(eager=True)
    )

    # -- stage 2: per-feature KW via the two-phase bucketed mid-rank CDF --
    vt = clr.groupBy("feature_id", "clr").agg(F.count("*").alias("t"))
    bounds = vt.groupBy("feature_id").agg(
        F.expr("MIN(CAST(clr AS DOUBLE))").alias("vlo"),
        F.expr("MAX(CAST(clr AS DOUBLE))").alias("vhi"),
    )
    vb = vt.join(F.broadcast(bounds), "feature_id").withColumn(
        "bkt",
        F.when(F.col("vlo") == F.col("vhi"), F.lit(1)).otherwise(
            F.least(
                F.lit(1024),
                F.expr("width_bucket(CAST(clr AS DOUBLE), vlo, vhi, 1024)"),
            )
        ),
    )
    w_in = Window.partitionBy("feature_id", "bkt").orderBy("clr").rowsBetween(
        Window.unboundedPreceding, 0
    )
    within = vb.withColumn("cum_in", F.sum("t").over(w_in))
    w_b = Window.partitionBy("feature_id").orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, 0
    )
    prefix = (
        vb.groupBy("feature_id", "bkt")
        .agg(F.sum("t").alias("bt"))
        .withColumn("pre", F.sum("bt").over(w_b) - F.col("bt"))
        .select("feature_id", "bkt", "pre")
    )
    vc = (
        within.join(prefix, ["feature_id", "bkt"])
        .withColumn(
            "c", (F.col("pre") + F.col("cum_in")).cast("decimal(38,0)") - F.col("t")
        )
        .select("feature_id", "clr", "t", "c")
    )
    gv = clr.groupBy("feature_id", "g3", "clr").agg(F.count("*").alias("ngv"))
    g = (
        gv.join(vc, ["feature_id", "clr"])
        .groupBy("feature_id", "g3")
        .agg(
            F.expr("SUM(CAST(ngv AS DECIMAL(38,0)) * (2 * c + t + 1))").alias("rg2"),
            F.expr("SUM(ngv)").alias("ng"),
        )
        .withColumn(
            "v", F.expr("CAST(rg2 AS DOUBLE) * CAST(rg2 AS DOUBLE) / ng / 4")
        )
    )
    kwf = g.groupBy("feature_id").agg(
        F.expr(_pinned("v", "g3")).alias("sum_r2n"),
        F.expr("SUM(ng)").alias("n"),
        F.expr("COUNT(*)").alias("k"),
    )
    ties = vt.groupBy("feature_id").agg(
        F.expr("SUM(CAST(t AS DECIMAL(38,0)) * t * t - t)").alias("tie_sum")
    )
    means = (
        clr.groupBy("feature_id", "g3")
        .agg(
            F.count("*").alias("nc"),
            F.expr("CAST(SUM(clr) AS DECIMAL(28,9))").alias("s1"),
        )
        .withColumn("mean_clr", F.expr("CAST(s1 AS DOUBLE) / nc"))
    )
    meanagg = means.groupBy("feature_id").agg(
        F.expr("ROUND(MAX(mean_clr) - MIN(mean_clr), 6)").alias("kw_effect_size"),
        F.expr("MAX(struct(mean_clr, g3)).g3").alias("kw_top_class"),
    )
    crit = "CASE " + " ".join(
        f"WHEN k - 1 = {df} THEN CAST({v} AS DOUBLE)" for df, v in _CHI2_05.items()
    ) + " ELSE CAST('inf' AS DOUBLE) END"
    kw = (
        kwf.join(ties, "feature_id")
        .join(meanagg, "feature_id")
        .withColumn(
            "kw_h",
            F.expr(
                "CASE WHEN n > 1 AND CAST(tie_sum AS DOUBLE)"
                " < CAST(n AS DOUBLE) * n * n - n THEN"
                " ROUND((12.0 / (CAST(n AS DOUBLE) * (n + 1)) * sum_r2n"
                " - 3.0 * (n + 1))"
                " / (1.0 - CAST(tie_sum AS DOUBLE)"
                " / (CAST(n AS DOUBLE) * n * n - n)), 6) END"
            ),
        )
        .select(
            "feature_id",
            "kw_h",
            F.expr("CAST(k - 1 AS BIGINT)").alias("kw_df"),
            F.expr(
                f"COALESCE(kw_h > ({crit}), FALSE)"
            ).alias("kw_significant"),
            "kw_effect_size",
            "kw_top_class",
        )
    )

    # -- stage 3: LDA effect sizes on the PLANNED splits, best per feature
    lda = lefse_lda(cnts, smeta.select("sample_id", "g3"), class_col="g3")
    planned = lda.join(
        F.broadcast(splits),
        (lda["class_lo"] == splits["lo"]) & (lda["class_hi"] == splits["hi"]),
    )
    best = (
        planned.groupBy("feature_id")
        .agg(
            F.max(
                F.struct(
                    F.col("lda_score"),
                    F.col("class_lo"),
                    F.col("class_hi"),
                    F.col("top_class"),
                )
            ).alias("b")
        )
        .select(
            "feature_id",
            F.col("b.lda_score").alias("lda_best_score"),
            F.col("b.class_lo").alias("lda_split_lo"),
            F.col("b.class_hi").alias("lda_split_hi"),
            F.col("b.top_class").alias("lda_top_class"),
        )
    )

    # -- stage 4: ANCOM-BC verdicts on the binary contrast ----------------
    anc = ancombc(
        cnts, smeta.select("sample_id", "g2"), group_col="g2", iters=_ANCOMBC_ITERS
    ).select(
        "feature_id",
        F.col("lfc").alias("ancombc_lfc"),
        F.col("w_stat").alias("ancombc_w"),
        F.col("significant").alias("ancombc_raw_sig"),
    )

    return (
        kw.join(best, "feature_id", "left")
        .join(anc, "feature_id", "left")
        .withColumn(
            "lda_significant",
            F.expr(f"COALESCE(lda_best_score > {_DA_LDA_SIG}, FALSE)"),
        )
        .withColumn(
            "ancombc_significant", F.expr("COALESCE(ancombc_raw_sig, FALSE)")
        )
        .select(
            "feature_id",
            "kw_h",
            "kw_df",
            "kw_significant",
            "kw_effect_size",
            "kw_top_class",
            "lda_best_score",
            "lda_split_lo",
            "lda_split_hi",
            "lda_top_class",
            "lda_significant",
            "ancombc_lfc",
            "ancombc_w",
            "ancombc_significant",
            F.expr(
                "CAST(CAST(kw_significant AS INT) + CAST(lda_significant AS INT)"
                " + CAST(ancombc_significant AS INT) AS BIGINT)"
            ).alias("methods_significant"),
        )
    )


def _diff_abundance_sql() -> str:
    """DuckDB transcription: same quantized CLR, same pinned class folds,
    mid-ranks by the per-feature cumulative window (value-identical to
    the engine's two-phase bucketed form by construction), lexicographic
    best-split selection, and the ANCOM-BC oracle embedded verbatim."""
    from ..functions.diff_abundance import _CHI2_05

    crit = "CASE " + " ".join(
        f"WHEN k - 1 = {df} THEN CAST({v} AS DOUBLE)"
        for df, v in _CHI2_05.items()
    ) + " ELSE CAST('inf' AS DOUBLE) END"
    return f"""
WITH counts AS (
  SELECT user_id AS sample_id, event_type AS feature_id, COUNT(*) AS count
  FROM events GROUP BY 1, 2
), smeta AS (
  SELECT DISTINCT user_id AS sample_id, user_id % 3 AS g3, user_id % 2 AS g2
  FROM events
), ng3 AS (
  SELECT g3, COUNT(*) AS n FROM smeta GROUP BY 1
), splits AS (
  SELECT a.g3 AS lo, b.g3 AS hi FROM ng3 a, ng3 b
  WHERE a.g3 < b.g3 AND a.n >= 2 AND b.n >= 2
), y AS (
  SELECT sample_id, feature_id, CAST(LN(count + 1) AS DECIMAL(18,9)) AS y
  FROM counts
), m AS (
  SELECT sample_id, CAST(CAST(SUM(y) AS DOUBLE) / COUNT(*) AS DECIMAL(18,9)) AS mlg
  FROM y GROUP BY 1
), clr AS (
  SELECT y.feature_id, s.g3, CAST(y.y - m.mlg AS DECIMAL(19,9)) AS clr
  FROM y JOIN m USING (sample_id) JOIN smeta s USING (sample_id)
), vt AS (
  SELECT feature_id, clr, COUNT(*) AS t FROM clr GROUP BY 1, 2
), vc AS (
  SELECT feature_id, clr, t,
         CAST(SUM(t) OVER (PARTITION BY feature_id ORDER BY clr
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
           - t AS c
  FROM vt
), gv AS (
  SELECT feature_id, g3, clr, COUNT(*) AS ngv FROM clr GROUP BY 1, 2, 3
), g AS (
  SELECT gv.feature_id, gv.g3,
         SUM(CAST(ngv AS HUGEINT) * (2 * c + t + 1)) AS rg2,
         SUM(ngv) AS ng
  FROM gv JOIN vc USING (feature_id, clr) GROUP BY 1, 2
), gval AS (
  SELECT feature_id, g3,
         CAST(rg2 AS DOUBLE) * CAST(rg2 AS DOUBLE) / ng / 4 AS v, ng
  FROM g
), kwf AS (
  SELECT feature_id,
         list_reduce(list(v ORDER BY g3), (acc, x) -> acc + x) AS sum_r2n,
         SUM(ng) AS n, COUNT(*) AS k
  FROM gval GROUP BY feature_id
), ties AS (
  SELECT feature_id, SUM(CAST(t AS HUGEINT) * t * t - t) AS tie_sum
  FROM vt GROUP BY feature_id
), means AS (
  SELECT feature_id, g3,
         CAST(CAST(SUM(clr) AS DECIMAL(28,9)) AS DOUBLE) / COUNT(*) AS mean_clr
  FROM clr GROUP BY 1, 2
), meanr AS (
  SELECT feature_id, g3, mean_clr,
         ROW_NUMBER() OVER (PARTITION BY feature_id
                            ORDER BY mean_clr DESC, g3 DESC) AS rn
  FROM means
), meanagg AS (
  SELECT feature_id,
         ROUND(MAX(mean_clr) - MIN(mean_clr), 6) AS kw_effect_size,
         MAX(CASE WHEN rn = 1 THEN g3 END) AS kw_top_class
  FROM meanr GROUP BY feature_id
), kwh AS (
  SELECT kwf.feature_id, n, k, tie_sum, kw_effect_size, kw_top_class,
         CASE WHEN n > 1 AND CAST(tie_sum AS DOUBLE)
                  < CAST(n AS DOUBLE) * n * n - n THEN
           ROUND((12.0 / (CAST(n AS DOUBLE) * (n + 1)) * sum_r2n
                  - 3.0 * (n + 1))
                 / (1.0 - CAST(tie_sum AS DOUBLE)
                    / (CAST(n AS DOUBLE) * n * n - n)), 6) END AS kw_h
  FROM kwf JOIN ties USING (feature_id) JOIN meanagg USING (feature_id)
), kw AS (
  SELECT feature_id, kw_h, CAST(k - 1 AS BIGINT) AS kw_df,
         COALESCE(kw_h > ({crit}), FALSE) AS kw_significant,
         kw_effect_size, kw_top_class
  FROM kwh
), lda AS ({_LEFSE_LDA_SQL}
), planned AS (
  SELECT l.* FROM lda l JOIN splits s
    ON l.class_lo = s.lo AND l.class_hi = s.hi
), bestr AS (
  SELECT feature_id, lda_score, class_lo, class_hi, top_class,
         ROW_NUMBER() OVER (PARTITION BY feature_id
                            ORDER BY lda_score DESC, class_lo DESC,
                                     class_hi DESC, top_class DESC) AS rn
  FROM planned
), best AS (
  SELECT feature_id, lda_score AS lda_best_score, class_lo AS lda_split_lo,
         class_hi AS lda_split_hi, top_class AS lda_top_class
  FROM bestr WHERE rn = 1
), anc AS (
  SELECT feature_id, lfc AS ancombc_lfc, w_stat AS ancombc_w,
         significant AS ancombc_raw_sig
  FROM ({_ancombc_sql()})
)
SELECT kw.feature_id, kw_h, kw_df, kw_significant, kw_effect_size,
       kw_top_class,
       lda_best_score, lda_split_lo, lda_split_hi, lda_top_class,
       COALESCE(lda_best_score > {_DA_LDA_SIG}, FALSE) AS lda_significant,
       ancombc_lfc, ancombc_w,
       COALESCE(ancombc_raw_sig, FALSE) AS ancombc_significant,
       CAST(CAST(kw_significant AS INT)
            + CAST(COALESCE(lda_best_score > {_DA_LDA_SIG}, FALSE) AS INT)
            + CAST(COALESCE(ancombc_raw_sig, FALSE) AS INT) AS BIGINT)
         AS methods_significant
FROM kw
LEFT JOIN best USING (feature_id)
LEFT JOIN anc USING (feature_id)
"""


# ---------------------------------------------------------------------------
# D2 (ordination half) — PCoA fully in-plan via power iteration
# ---------------------------------------------------------------------------

_PCOA_ITERS = 24  # fixed iteration count: both engines run the IDENTICAL
# arithmetic sequence, so results are bit-equal regardless of convergence
import itertools as _itertools

_PCOA_SEQ = _itertools.count()  # unique temp-view namespace per _pcoa_core call
_PCOA_NORM_EVERY = 6  # normalize every 6th step (+ the last): direction is
# scale-invariant, λ^6 segment growth stays far inside double range, and
# the per-step norm aggregation job drops 6×.  Round-6 measurement: 12-step
# segments were tried (halves the checkpoint boundaries; λ^12 still safe)
# and were SLOWER (d2_pcoa_power 10.4 → 14.6 s, d13_procrustes 24.3 →
# 29.9 s at sf0.1): one 12-matvec chained-aggregation plan costs more in
# analysis + stage depth than the two eager n-row checkpoint jobs it saves.
# 6 is the measured sweet spot, not a guess.


def _pinned(col: str, by: str) -> str:
    """Order-pinned double fold: Σ col in strict `by` order."""
    return (
        f"aggregate(array_sort(collect_list(struct({by}, {col}))),"
        f" CAST(0 AS DOUBLE), (acc, q) -> acc + q.{col})"
    )


def d2_pcoa_power(
    spark: SparkSession, sf: str, *, n_iter: int = _PCOA_ITERS
) -> DataFrame:
    """D2 ordination — classical PCoA (Gower-centered MDS) computed
    ENTIRELY in-plan: no n×n matrix ever leaves the executors
    (functions/pcoa.py keeps the collected-matrix variant for API
    parity; reference: ``qiime diversity pcoa`` inside core-metrics,
    rules/diversity_analysis.smk:5-40, consumed by summary.py:156-167).

    B = −½·J·D²·J is held as the pair RELATION b(i,j) =
    −½·(d²ᵢⱼ − rowmeanᵢ − rowmeanⱼ + grandmean); the top-2 axes come
    from ``n_iter`` fixed power-iteration steps (matvec = one join +
    one pinned-order fold per step, norm = one pinned fold), with the
    second axis on the deflated B − λ₁v₁v₁ᵀ.  Signs are fixed by making
    the smallest sample's loading non-negative.  Every fold is pinned,
    every step count fixed, so the DuckDB oracle — the SAME iteration
    UNROLLED as a CTE chain — reproduces the doubles bit-for-bit.

    Scale shape: the matvec joins shuffle on the sample key and
    distribute over the n² pair relation — the form that survives large
    n; lineage is truncated each step with a lazy localCheckpoint so
    Catalyst plans stay O(1) per iteration."""
    p = (
        d2_bray_curtis(spark, sf)
        .select("ua", "ub", F.expr("bray_curtis * bray_curtis").alias("dd"))
        .localCheckpoint(eager=False)
    )
    core = _pcoa_core(p, n_iter)
    return core.select(
        F.col("i").alias("sample"),
        F.expr("ROUND(SQRT(GREATEST(lam, 0.0)) * u1, 6)").alias("pc1"),
        F.expr("ROUND(SQRT(GREATEST(lam2, 0.0)) * u2, 6)").alias("pc2"),
        F.expr("ROUND(lam, 6)").alias("eig1"),
        F.expr("ROUND(lam2, 6)").alias("eig2"),
    )


def _pcoa_core(p: DataFrame, n_iter: int, *, block: bool = True) -> DataFrame:
    """The generic in-plan PCoA engine over a squared-distance pair
    relation ``p`` (ua, ub, dd): Gower centering + two power-iteration
    axes with deflation.  Returns one row per sample —
    (i, u1, u2, lam, lam2): unit sign-fixed eigenvectors and Rayleigh
    eigenvalues — consumed by d2_pcoa_power (formatted ordination) and
    d13_procrustes (ordination comparison).

    Two physical strategies, ONE arithmetic sequence (bit-equal results,
    asserted by tests/test_pcoa_block.py; the DuckDB oracle is unchanged):

    * ``block=True`` (default — both current consumers run over the
      bounded _BC_BLOCK sample block): the whole n×n centered matrix is
      ONE ROW of array<struct> and every matvec/norm/deflation is narrow
      array arithmetic — zero joins, zero shuffles, zero broadcasts.
      The join form spent ~1.2 s of job/broadcast overhead per 6-step
      segment on a 40-row block (measured round 7: d13 22 s → see
      SCALE_NOTES); the array form runs the same folds in microseconds.
      Bounded by design: n ≤ a few thousand samples keeps the n² struct
      array inside one task comfortably.
    * ``block=False``: the distributed matvec-join form — shuffles on
      the sample key over the n² pair relation — for ordinations over
      sample counts beyond a single task's memory."""
    if block:
        return _pcoa_core_block(p, n_iter)
    return _pcoa_core_distributed(p, n_iter)


def _pcoa_core_block(p: DataFrame, n_iter: int) -> DataFrame:
    """Dense bounded-block PCoA: the matrix as one array-valued row.

    Every fold replays the join form's pinned order exactly: the pair
    array is sort_array'd by (i, j), so each row's adjacency list folds
    in ascending j (the _pinned('...', 'j') order); vectors live in
    ascending-idx order (the _pinned('...', 'i') order); every closing
    double expression is the identical tree.  IEEE ops on identical
    inputs in identical order give identical bits -- the cross-engine
    contract, reused cross-PLAN (asserted against the distributed form
    by tests/test_pcoa_block.py).

    Execution design: the WHOLE power chain is one
    ``aggregate(sequence(1, n_iter), seed, step)`` fold whose
    accumulator is the vector -- a runtime VALUE, so step t's vector is
    never re-evaluated as an expression by step t+1 (chaining the steps
    as columns lets CollapseProject inline each step into the next
    lambda, where the inner vector re-evaluates per element --
    exponential blow-up, measured as a >2 min hang at n=40).  The
    matrix is pre-shaped once into ``bmg``: per-row adjacency lists
    carrying the POSITION of j in idx, so the matvec inner loop is
    element_at(v, jp) -- O(1), no per-call map builds.  A few bounded
    1-row checkpoint jobs separate the value phases (adjacency build /
    axis 1 / deflation + axis 2) so no phase's result is re-evaluated
    inside a later phase's lambdas."""
    zero = "CAST(0 AS DOUBLE)"
    samples = p.select(F.col("ua").alias("s")).union(p.select("ub")).distinct()
    m = (
        p.select(F.col("ua").alias("i"), F.col("ub").alias("j"), "dd")
        .union(p.select(F.col("ub").alias("i"), F.col("ua").alias("j"), "dd"))
        .union(
            samples.select(
                F.col("s").alias("i"), F.col("s").alias("j"), F.lit(0.0).alias("dd")
            )
        )
    )
    # phase 0: (idx, md, rm) -- row means folded per i in ascending-j order
    st = (
        m.agg(F.expr("sort_array(collect_list(struct(i, j, dd)))").alias("md"))
        .crossJoin(samples.agg(F.expr("sort_array(collect_list(s))").alias("idx")))
        .withColumn(
            "rm",
            F.expr(
                f"transform(idx, vi -> aggregate(filter(md, e0 -> e0.i = vi),"
                f" {zero}, (ac0, e0) -> ac0 + e0.dd) / size(idx))"
            ),
        )
        .localCheckpoint(eager=True)
    )
    # phase 1: centered matrix as position-indexed adjacency lists; the
    # g / rmm subexpressions inline over the MATERIALIZED rm (cheap)
    st = (
        st.withColumn(
            "g", F.expr(f"aggregate(rm, {zero}, (ac9, x9) -> ac9 + x9) / size(idx)")
        )
        .withColumn("rmm", F.expr("map_from_arrays(idx, rm)"))
        .withColumn(
            "bmg",
            F.expr(
                "transform(idx, vi2 -> transform(filter(md, e2 -> e2.i = vi2),"
                " e2 -> struct(CAST(array_position(idx, e2.j) AS INT) AS jp,"
                " -0.5 * (e2.dd - rmm[e2.i] - rmm[e2.j] + g) AS b)))"
            ),
        )
        .select("idx", "bmg")
        .localCheckpoint(eager=True)
    )

    def mv(mat: str, v: str) -> str:
        return (
            f"transform({mat}, rw -> aggregate(rw, {zero},"
            f" (ac1, e1) -> ac1 + e1.b * element_at({v}, e1.jp)))"
        )

    def norm(x: str) -> str:
        return (
            f"transform({x}, xx -> xx / SQRT(aggregate({x}, {zero},"
            " (ac2, zz) -> ac2 + zz * zz)))"
        )

    def chain(mat: str, start_mod: int) -> str:
        seed = norm(f"transform(idx, s -> CAST(1 + s % {start_mod} AS DOUBLE))")
        step_v = mv(mat, "vv")
        return (
            f"aggregate(sequence(1, {n_iter}), {seed}, (vv, tt) ->"
            f" CASE WHEN tt % {_PCOA_NORM_EVERY} = 0 OR tt = {n_iter}"
            f" THEN {norm(step_v)} ELSE {step_v} END)"
        )

    # idx is sorted ascending, so element 1 IS the min-i loading
    signfix = "CASE WHEN element_at({v}, 1) < 0.0 THEN -1.0 ELSE 1.0 END"

    def rayleigh(mat: str, v: str) -> str:
        return (
            f"aggregate(zip_with({v}, {mv(mat, v)}, (a3, b3) -> a3 * b3),"
            f" {zero}, (ac3, x3) -> ac3 + x3)"
        )

    # phase 2: axis 1 -- the raw chain materializes before signfix /
    # rayleigh read it per-element inside their lambdas
    st = st.withColumn("v1r", F.expr(chain("bmg", 7))).localCheckpoint(eager=True)
    st = (
        st.withColumn(
            "v1", F.expr(f"transform(v1r, x4 -> x4 * ({signfix.format(v='v1r')}))")
        )
        .withColumn("lam", F.expr(rayleigh("bmg", "v1")))
        .localCheckpoint(eager=True)
    )
    # phase 3: deflation (identical formula order: b - lam*v1i*v1j) + axis 2
    st = (
        st.withColumn(
            "bmg2",
            F.expr(
                "zip_with(bmg, sequence(1, size(idx)), (rw2, k2) ->"
                " transform(rw2, e5 -> struct(e5.jp AS jp,"
                " e5.b - lam * element_at(v1, k2) * element_at(v1, e5.jp) AS b)))"
            ),
        )
        .withColumn("v2r", F.expr(chain("bmg2", 5)))
        .localCheckpoint(eager=True)
    )
    st = st.withColumn(
        "v2", F.expr(f"transform(v2r, x6 -> x6 * ({signfix.format(v='v2r')}))")
    ).withColumn("lam2", F.expr(rayleigh("bmg2", "v2")))
    return st.select(
        F.expr("explode(sequence(1, size(idx)))").alias("k"),
        "idx",
        "v1",
        "v2",
        "lam",
        "lam2",
    ).select(
        F.expr("element_at(idx, k)").alias("i"),
        F.expr("element_at(v1, k)").alias("u1"),
        F.expr("element_at(v2, k)").alias("u2"),
        "lam",
        "lam2",
    )



def _pcoa_core_distributed(p: DataFrame, n_iter: int) -> DataFrame:
    """The distributed matvec-join PCoA (the ``block=False`` strategy)."""
    samples = (
        p.select(F.col("ua").alias("s")).union(p.select("ub")).distinct()
    )
    # full symmetric matrix incl. the zero diagonal
    m = (
        p.select(F.col("ua").alias("i"), F.col("ub").alias("j"), "dd")
        .union(p.select(F.col("ub").alias("i"), F.col("ua").alias("j"), "dd"))
        .union(samples.select(F.col("s").alias("i"), F.col("s").alias("j"), F.lit(0.0).alias("dd")))
    )
    nrel = samples.agg(F.count("*").cast("long").alias("n"))
    rm = (
        m.groupBy("i")
        .agg(F.expr(_pinned("dd", "j")).alias("rs"))
        .crossJoin(F.broadcast(nrel))
        .select("i", (F.col("rs") / F.col("n")).alias("rm"))
    )
    gm = (
        rm.agg(F.expr(_pinned("rm", "i")).alias("srm"))
        .crossJoin(F.broadcast(nrel))
        .select((F.col("srm") / F.col("n")).alias("g"))
    )
    b = (
        m.join(F.broadcast(rm.withColumnRenamed("i", "ri").withColumnRenamed("rm", "rmi")), F.col("i") == F.col("ri"))
        .join(F.broadcast(rm.withColumnRenamed("i", "rj").withColumnRenamed("rm", "rmj")), F.col("j") == F.col("rj"))
        .crossJoin(F.broadcast(gm))
        .select("i", "j", F.expr("-0.5 * (dd - rmi - rmj + g)").alias("b"))
        .localCheckpoint(eager=False)  # reused 2 * n_iter times
    )

    def normalize(v: DataFrame) -> DataFrame:
        nrm = v.agg(
            F.expr(
                "SQRT(aggregate(array_sort(collect_list(struct(i, x))),"
                " CAST(0 AS DOUBLE), (acc, q) -> acc + q.x * q.x))"
            ).alias("nrm")
        )
        return v.crossJoin(F.broadcast(nrm)).select(
            "i", (F.col("x") / F.col("nrm")).alias("x")
        )

    def matvec(mat: DataFrame, v: DataFrame) -> DataFrame:
        # v is n rows (the sample vector) — BROADCAST it so the n² pair
        # relation joins in place instead of shuffling every step; the
        # only per-step shuffle is the groupBy(i) partial agg
        return (
            mat.join(F.broadcast(v.select(F.col("i").alias("j"), F.col("x").alias("vj"))), "j")
            .select("i", "j", F.expr("b * vj").alias("bv"))
            .groupBy("i")
            .agg(F.expr(_pinned("bv", "j")).alias("x"))
        )

    spark = p.sparkSession
    tag = next(_PCOA_SEQ)

    def power(mat: DataFrame, start_mod: int, chain: str) -> DataFrame:
        # The iteration runs in SEGMENTS of _PCOA_NORM_EVERY matvec steps,
        # each segment emitted as ONE spark.sql() over temp views: for an
        # iterative in-plan operator, per-step DataFrame construction
        # (py4j + Catalyst analysis, ~100 round-trips for 2×24 steps) is
        # real wall-time — batching it into 4 SQL calls per chain cuts
        # driver-side build cost ~5×.  Arithmetic is IDENTICAL: each CTE
        # is the same broadcast matvec + pinned fold, and normalization
        # happens at every segment boundary (= every _PCOA_NORM_EVERY-th
        # step + the last, the schedule the oracle mirrors); direction is
        # invariant to positive scaling and λ^6 segment growth stays far
        # inside double range.
        mat_view = f"pcoa{tag}_{chain}_mat"
        mat.createOrReplaceTempView(mat_view)
        v = normalize(
            samples.select(
                F.col("s").alias("i"),
                F.expr(f"CAST(1 + s % {start_mod} AS DOUBLE)").alias("x"),
            )
        )
        done = 0
        while done < n_iter:
            seg = min(_PCOA_NORM_EVERY, n_iter - done)
            v_view = f"pcoa{tag}_{chain}_v{done}"
            v.createOrReplaceTempView(v_view)
            prev, ctes = v_view, []
            for s in range(seg):
                cur = f"w{s}"
                ctes.append(
                    f"{cur} AS (SELECT /*+ BROADCAST(v) */ m.i,"
                    " aggregate(array_sort(collect_list(named_struct('j', m.j, 'bv', m.b * v.x))),"
                    " CAST(0 AS DOUBLE), (acc, q) -> acc + q.bv) AS x"
                    f" FROM {mat_view} m JOIN {prev} v ON m.j = v.i GROUP BY m.i)"
                )
                prev = cur
            q = "WITH " + ",\n".join(ctes) + f" SELECT i, x FROM {prev}"
            # EAGER checkpoint at the boundary: normalize consumes its
            # input twice, and — decisively — a lazy checkpoint does NOT
            # truncate the plan Catalyst re-analyzes, so segment N+1's
            # analysis would still walk segment N's full lineage (measured:
            # ~11 s of pure analysis per warm call at 2x24 steps).  The
            # eager materialization is a bounded n-row vector job; it
            # flattens every later analysis to a LogicalRDD scan
            v = normalize(spark.sql(q).localCheckpoint())
            done += seg
        return v

    def rayleigh(mat: DataFrame, v: DataFrame) -> DataFrame:
        w = matvec(mat, v).withColumnRenamed("x", "wx")
        return (
            v.join(w, "i")
            .select("i", F.expr("x * wx").alias("vw"))
            .agg(F.expr(_pinned("vw", "i")).alias("lam"))
        )

    def signfix(v: DataFrame) -> DataFrame:
        smin = v.agg(F.min("i").alias("imin"))
        sgn = (
            v.join(F.broadcast(smin), F.col("i") == F.col("imin"))
            .select(F.expr("CASE WHEN x < 0 THEN -1.0 ELSE 1.0 END").alias("sg"))
        )
        return v.crossJoin(F.broadcast(sgn)).select("i", F.expr("x * sg").alias("x"))

    v1 = signfix(power(b, 7, "a"))
    l1 = rayleigh(b, v1)
    b2 = (
        b.join(F.broadcast(v1.select(F.col("i").alias("di"), F.col("x").alias("v1i"))), F.col("i") == F.col("di"))
        .join(F.broadcast(v1.select(F.col("i").alias("dj"), F.col("x").alias("v1j"))), F.col("j") == F.col("dj"))
        .crossJoin(F.broadcast(l1))
        .select("i", "j", F.expr("b - lam * v1i * v1j").alias("b"))
        .localCheckpoint(eager=False)
    )
    v2 = signfix(power(b2, 5, "b"))
    l2 = rayleigh(b2, v2)
    return (
        v1.withColumnRenamed("x", "u1")
        .join(v2.withColumnRenamed("x", "u2"), "i")
        .crossJoin(F.broadcast(l1))
        .crossJoin(F.broadcast(l2.withColumnRenamed("lam", "lam2")))
        .select("i", "u1", "u2", "lam", "lam2")
    )


def _fold_sql(col: str, by: str) -> str:
    return f"list_reduce(list({col} ORDER BY {by}), (acc, x) -> acc + x)"


def _pcoa_ctes(n_iter: int, pre: str) -> str:
    """The in-plan PCoA engine as a reusable CTE block: expects a CTE
    named ``{pre}dist`` with (ua, ub, dist) and emits the Gower
    centering + two unrolled power-iteration axes, every name prefixed
    with ``pre``.  Consumers read ``{pre}v1``/``{pre}v2`` (unit
    sign-fixed eigenvectors) and ``{pre}l1``/``{pre}l2`` (lam / lam2).
    Matvec every step, normalize every _PCOA_NORM_EVERY-th + the last —
    the identical schedule the Spark loop runs."""
    fold = _fold_sql

    def chain(mat: str, vec0: str, prefix: str) -> tuple[str, str]:
        ctes = []
        prev = vec0
        for t in range(n_iter):
            w = f"{prefix}w{t}"
            ctes.append(
                f"{w} AS MATERIALIZED (SELECT m.i, {fold('m.b * v.x', 'm.j')} AS x"
                f" FROM {mat} m JOIN {prev} v ON m.j = v.i GROUP BY m.i)"
            )
            prev = w
            if (t + 1) % _PCOA_NORM_EVERY == 0 or t == n_iter - 1:
                v = f"{prefix}v{t}"
                ctes.append(
                    f"{v} AS MATERIALIZED (SELECT i, x / (SELECT SQRT({fold('x * x', 'i')})"
                    f" FROM {w}) AS x FROM {w})"
                )
                prev = v
        return ",\n".join(ctes), prev

    c1, last1 = chain(f"{pre}bmat", f"{pre}v1seed", f"{pre}a")
    c2, last2 = chain(f"{pre}bdef", f"{pre}v2seed", f"{pre}b")
    return f"""{pre}p AS MATERIALIZED (
  SELECT ua, ub, dist * dist AS dd FROM {pre}dist
), {pre}samples AS MATERIALIZED (
  SELECT ua AS s FROM {pre}p UNION SELECT ub FROM {pre}p
), {pre}m AS MATERIALIZED (
  SELECT ua AS i, ub AS j, dd FROM {pre}p
  UNION ALL SELECT ub, ua, dd FROM {pre}p
  UNION ALL SELECT s, s, 0.0 FROM {pre}samples
), {pre}nrel AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {pre}samples
), {pre}rm AS (
  SELECT i, {fold('dd', 'j')} / (SELECT n FROM {pre}nrel) AS rm FROM {pre}m GROUP BY i
), {pre}gm AS (
  SELECT {fold('rm', 'i')} / (SELECT n FROM {pre}nrel) AS g FROM {pre}rm
), {pre}bmat AS MATERIALIZED (
  SELECT m.i, m.j, -0.5 * (m.dd - ri.rm - rj.rm + (SELECT g FROM {pre}gm)) AS b
  FROM {pre}m m JOIN {pre}rm ri ON m.i = ri.i JOIN {pre}rm rj ON m.j = rj.i
), {pre}v1seed0 AS (
  SELECT s AS i, CAST(1 + s % 7 AS DOUBLE) AS x FROM {pre}samples
), {pre}v1seed AS (
  SELECT i, x / (SELECT SQRT({fold('x * x', 'i')}) FROM {pre}v1seed0) AS x
  FROM {pre}v1seed0
),
{c1},
{pre}sg1 AS (
  SELECT CASE WHEN (SELECT x FROM {last1}
                    WHERE i = (SELECT MIN(i) FROM {last1})) < 0
              THEN -1.0 ELSE 1.0 END AS sg
), {pre}v1 AS MATERIALIZED (
  SELECT i, x * (SELECT sg FROM {pre}sg1) AS x FROM {last1}
), {pre}w1r AS (
  SELECT m.i, {fold('m.b * v.x', 'm.j')} AS wx
  FROM {pre}bmat m JOIN {pre}v1 v ON m.j = v.i GROUP BY m.i
), {pre}l1 AS (
  SELECT {fold('v1.x * w1r.wx', 'v1.i')} AS lam
  FROM {pre}v1 v1 JOIN {pre}w1r w1r ON v1.i = w1r.i
), {pre}bdef AS MATERIALIZED (
  SELECT b.i, b.j, b.b - (SELECT lam FROM {pre}l1) * vi.x * vj.x AS b
  FROM {pre}bmat b JOIN {pre}v1 vi ON b.i = vi.i JOIN {pre}v1 vj ON b.j = vj.i
), {pre}v2seed0 AS (
  SELECT s AS i, CAST(1 + s % 5 AS DOUBLE) AS x FROM {pre}samples
), {pre}v2seed AS (
  SELECT i, x / (SELECT SQRT({fold('x * x', 'i')}) FROM {pre}v2seed0) AS x
  FROM {pre}v2seed0
),
{c2},
{pre}sg2 AS (
  SELECT CASE WHEN (SELECT x FROM {last2}
                    WHERE i = (SELECT MIN(i) FROM {last2})) < 0
              THEN -1.0 ELSE 1.0 END AS sg
), {pre}v2 AS MATERIALIZED (
  SELECT i, x * (SELECT sg FROM {pre}sg2) AS x FROM {last2}
), {pre}w2r AS (
  SELECT m.i, {fold('m.b * v.x', 'm.j')} AS wx
  FROM {pre}bdef m JOIN {pre}v2 v ON m.j = v.i GROUP BY m.i
), {pre}l2 AS (
  SELECT {fold('v2.x * w2r.wx', 'v2.i')} AS lam2
  FROM {pre}v2 v2 JOIN {pre}w2r w2r ON v2.i = w2r.i
)"""


def _pcoa_power_sql(n_iter: int = _PCOA_ITERS) -> str:
    """The SAME power iteration UNROLLED: one CTE per matvec step (with
    the sparse normalize schedule), pinned list_reduce folds, identical
    expressions."""
    return f"""
WITH dist AS MATERIALIZED (
  SELECT ua, ub, bray_curtis AS dist FROM ({_D2_SQL})
),
{_pcoa_ctes(n_iter, "")}
SELECT v1.i AS sample,
       ROUND(SQRT(GREATEST((SELECT lam FROM l1), 0.0)) * v1.x, 6) AS pc1,
       ROUND(SQRT(GREATEST((SELECT lam2 FROM l2), 0.0)) * v2.x, 6) AS pc2,
       ROUND((SELECT lam FROM l1), 6) AS eig1,
       ROUND((SELECT lam2 FROM l2), 6) AS eig2
FROM v1 JOIN v2 ON v1.i = v2.i
"""


# ---------------------------------------------------------------------------
# feature-table summarize — qiime's table-overview surface
# ---------------------------------------------------------------------------

_FTS_QUANTILES = (25, 50, 75)


def _fts_branch(counts: DataFrame, entity: str) -> DataFrame:
    """Frequency summary for one entity axis.  ``counts``: one ``fv``
    (BIGINT total frequency) row per sample or per feature.  Quantiles
    use the a18 CDF construction — one groupBy on the frequency VALUE
    (cardinality-bounded, never row-bounded), a cumulative window over
    the distinct values, and interpolated order statistics as exact
    integer arithmetic with one final /100.0."""
    vc = counts.groupBy("fv").agg(F.count("*").alias("c"))
    w = Window.orderBy("fv").rowsBetween(Window.unboundedPreceding, 0)
    cdf = vc.withColumn("cum", F.sum("c").over(w))
    tot = vc.agg(
        F.expr("CAST(SUM(c) AS BIGINT)").alias("n"),
        F.expr("CAST(SUM(fv * c) AS BIGINT)").alias("tf"),
    )
    j = cdf.crossJoin(F.broadcast(tot))
    aggs, outs = [], []
    for p in _FTS_QUANTILES:
        t = f"({p} * (n - 1))"
        lo, fr = f"({t} div 100)", f"({t} % 100)"
        aggs += [
            F.expr(f"MIN(CASE WHEN cum >= {lo} + 1 THEN fv END)").alias(f"vlo{p}"),
            F.expr(f"MIN(CASE WHEN cum >= {lo} + 2 THEN fv END)").alias(f"vhi{p}"),
            F.expr(f"MIN({fr})").alias(f"f{p}"),
        ]
        outs.append(
            F.expr(
                f"CAST(CASE WHEN f{p} = 0 THEN 100 * vlo{p} "
                f"ELSE 100 * vlo{p} + f{p} * (vhi{p} - vlo{p}) END AS DOUBLE) / 100.0"
            ).alias(f"f_q{p}")
        )
    stats = j.groupBy("n", "tf").agg(
        F.expr("CAST(MIN(fv) AS BIGINT)").alias("f_min"),
        F.expr("CAST(MAX(fv) AS BIGINT)").alias("f_max"),
        *aggs,
    )
    return stats.select(
        F.lit(entity).alias("entity"),
        F.col("n").cast("long").alias("n"),
        F.col("tf").cast("long").alias("total_freq"),
        "f_min",
        *outs,
        "f_max",
        F.expr("CAST(tf AS DOUBLE) / n").alias("f_mean"),
    )


def d12_feature_table_summarize(spark: SparkSession, sf: str) -> DataFrame:
    """``qiime feature-table summarize`` as a relation: table totals plus
    per-sample AND per-feature frequency distributions (min / q1 /
    median / q3 / max / mean) — the overview artifact the reference
    generates for every feature table
    (mmeds/snakemake/rules/process_sequencing_data.smk
    build_phylogenetic_tree: ``qiime feature-table summarize``).

    Two frequency branches over ONE events scan (sample axis = user_id,
    feature axis = event_type — the repo's demo feature-table mapping),
    each contracting to distinct-frequency cardinality before the
    quantile window; output is two rows.  All interpolation is exact
    integer arithmetic (a18's construction) with a single final /100.0,
    and the mean is one exact-integer ratio — identical doubles on both
    engines."""
    ev = _t(spark, sf, "events")
    samples = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("fv"))
    features = ev.groupBy("event_type").agg(F.count("*").cast("long").alias("fv"))
    return _fts_branch(samples.select("fv"), "sample").unionByName(
        _fts_branch(features.select("fv"), "feature")
    )


def _fts_sql() -> str:
    branches = []
    for entity, key in (("sample", "user_id"), ("feature", "event_type")):
        per_p, sel = [], []
        for p in _FTS_QUANTILES:
            t = f"({p} * (n - 1))"
            lo, fr = f"({t} // 100)", f"({t} % 100)"
            per_p += [
                f"MIN(CASE WHEN cum >= {lo} + 1 THEN fv END) AS vlo{p}",
                f"MIN(CASE WHEN cum >= {lo} + 2 THEN fv END) AS vhi{p}",
                f"MIN({fr}) AS f{p}",
            ]
            sel.append(
                f"CAST(CASE WHEN f{p} = 0 THEN 100 * vlo{p} "
                f"ELSE 100 * vlo{p} + f{p} * (vhi{p} - vlo{p}) END AS DOUBLE) / 100.0 AS f_q{p}"
            )
        branches.append(
            f"""
SELECT '{entity}' AS entity, CAST(n AS BIGINT) AS n, CAST(tf AS BIGINT) AS total_freq,
       f_min, {', '.join(sel)}, f_max, CAST(tf AS DOUBLE) / n AS f_mean
FROM (
  SELECT n, tf, CAST(MIN(fv) AS BIGINT) AS f_min, CAST(MAX(fv) AS BIGINT) AS f_max,
         {', '.join(per_p)}
  FROM (
    SELECT vc.fv, vc.c,
           SUM(vc.c) OVER (ORDER BY vc.fv
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           tot.n, tot.tf
    FROM (SELECT fv, COUNT(*) AS c FROM (
            SELECT CAST(COUNT(*) AS BIGINT) AS fv FROM events GROUP BY {key}
          ) GROUP BY fv) vc
    CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(cnt) AS BIGINT) AS tf
                FROM (SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY {key})) tot
  )
  GROUP BY n, tf
)"""
        )
    return " UNION ALL ".join(branches)


# ---------------------------------------------------------------------------
# D1 — deterministic rarefaction (the oracle-checkable draw)
# ---------------------------------------------------------------------------

_RD_BLOCK = 40
_RD_DEPTH = 50
_RD_ITERS = 3
_RD_SEED = 42


def d1_rarefaction_det(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic rarefaction over the demo feature table
    (rules/diversity_analysis.smk:42-75 rarefies before every alpha
    metric): integer proportional quotas + md5-greedy remainder — the
    one D1 stage that was previously outside the oracle gate (the
    multinomial pandas_udf draw; round-8 verdict #2).  Exact integer
    arithmetic end to end, so the emitted counts are bit-identical
    cross-engine.  Output: (sample_id, iteration, feature_id, count)."""
    from ..sources.feature_table import rarefy_deterministic

    counts = (
        _t(spark, sf, "events")
        .filter(F.col("user_id") < _RD_BLOCK)
        .groupBy(
            F.col("user_id").alias("sample_id"),
            F.col("event_type").alias("feature_id"),
        )
        .agg(F.count("*").alias("count"))
    )
    return rarefy_deterministic(
        counts, depth=_RD_DEPTH, iterations=_RD_ITERS, seed=_RD_SEED
    )


_D1RD_SQL = f"""
WITH counts AS (
  SELECT user_id AS sample_id, event_type AS feature_id,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE user_id < {_RD_BLOCK} GROUP BY 1, 2
), tot AS (
  SELECT sample_id, CAST(SUM(c) AS BIGINT) AS t FROM counts GROUP BY 1
), base AS (
  SELECT c.sample_id, c.feature_id, c.c, t.t, i.iteration
  FROM counts c JOIN tot t USING (sample_id),
       (SELECT unnest(range(0, {_RD_ITERS})) AS iteration) i
  WHERE t.t >= {_RD_DEPTH}
), q AS (
  SELECT sample_id, feature_id, CAST(iteration AS BIGINT) AS iteration,
         ({_RD_DEPTH} * c) // t AS quota,
         md5(CAST(sample_id AS VARCHAR) || '|' || CAST(iteration AS VARCHAR)
             || '|' || CAST(feature_id AS VARCHAR) || '|' || '{_RD_SEED}') AS k
  FROM base
), ranked AS (
  SELECT sample_id, feature_id, iteration, quota,
         ROW_NUMBER() OVER (PARTITION BY sample_id, iteration
                            ORDER BY k, feature_id) AS rk,
         {_RD_DEPTH} - SUM(quota) OVER (PARTITION BY sample_id, iteration) AS r
  FROM q
)
SELECT sample_id, iteration, feature_id,
       CAST(quota + CASE WHEN rk <= r THEN 1 ELSE 0 END AS BIGINT) AS count
FROM ranked
WHERE quota + CASE WHEN rk <= r THEN 1 ELSE 0 END > 0
"""


QUERIES: dict[str, QuerySpec] = {
    "d1_rarefaction_det": QuerySpec(
        d1_rarefaction_det,
        _D1RD_SQL,
        "D1 rules/diversity_analysis.smk:42-75 (rarefaction draw): integer "
        "quotas + md5-greedy remainder (sample_epoch_plan's allocation "
        "technique) — the deterministic, oracle-checkable twin of the "
        "multinomial pandas_udf in sources/feature_table.py",
    ),
    "d12_feature_table_summarize": QuerySpec(
        d12_feature_table_summarize,
        _fts_sql(),
        "process_sequencing_data.smk build_phylogenetic_tree (qiime feature-table "
        "summarize): per-sample + per-feature frequency distributions via the "
        "cardinality-bounded CDF quantile construction",
    ),
    "d2_pcoa_power": QuerySpec(
        d2_pcoa_power,
        _pcoa_power_sql(),
        "D2 rules/diversity_analysis.smk:5-40 (qiime diversity pcoa): "
        "Gower-centered top-2 axes via fixed-step in-plan power iteration; "
        "oracle = the same iteration unrolled as a CTE chain",
    ),
    "d1_shannon_diversity": QuerySpec(d1_shannon_diversity, _D1_SQL, "D1 rules/diversity_analysis.smk:42-75"),
    "d2_jaccard_beta": QuerySpec(
        d2_jaccard_beta,
        _D2J_SQL,
        "D2 rules/diversity_analysis.smk:5-40 (core-metrics jaccard matrix): "
        "presence/absence distance, inverted-index pairs, integer-ratio exact",
    ),
    "d17_pielou_evenness": QuerySpec(
        d17_pielou_evenness,
        _D17_SQL,
        "D17 rules/diversity_analysis.smk:5-40 (core-metrics evenness): "
        "Pielou J = H/ln(S), d1_shannon's two-shuffle shape, NULL at S=1",
    ),
    "d15_chao1_coverage": QuerySpec(
        d15_chao1_coverage,
        _D15_SQL,
        "D1 companion: chao1 + goods_coverage (qiime diversity alpha, "
        "rules/diversity_analysis.smk:5-40) — singleton/doubleton integer "
        "arithmetic, one double division per metric",
    ),
    "d2_bray_curtis": QuerySpec(d2_bray_curtis, _D2_SQL, "D2 rules/diversity_analysis.smk:5-40"),
    "d5_ancombc": QuerySpec(
        d5_ancombc,
        _ancombc_sql(),
        "D5 rules/differential_abundance.smk:1-14 (ANCOM-BC bias-corrected estimator)",
    ),
    "d5_ancombc_em": QuerySpec(
        d5_ancombc_em,
        _ancombc_sql(em_iters=_ANCOMBC_EM_ITERS),
        "D5 rules/differential_abundance.smk:1-14 (ANCOM-BC + Gaussian-mixture delta refinement)",
    ),
    "d6_kruskal_wallis": QuerySpec(d6_kruskal_wallis, _D6_SQL, "D6 rules/differential_abundance.smk:16-72"),
    "d6_lefse_lda": QuerySpec(
        d6_lefse_lda,
        _LEFSE_LDA_SQL,
        "D6 rules/differential_abundance.smk:16-72 (run_lefse LDA effect size, closed-form two-class)",
    ),
    "pipeline_diff_abundance": QuerySpec(
        pipeline_diff_abundance,
        _diff_abundance_sql(),
        "rules/differential_abundance.smk:1-72 + rules/common.smk:13-77 composed: "
        "split planning -> per-feature KW (two-phase bucketed mid-ranks) -> "
        "planned-split LDA effect sizes -> ANCOM-BC verdicts over ONE shared "
        "checkpointed feature-table scan, with a 0-3 method-agreement column",
    ),
}
