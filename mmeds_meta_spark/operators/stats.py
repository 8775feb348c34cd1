"""Statistical operators (SURVEY §2.4 A5/A6/A10/A11, §2.10 D3).

Cross-engine float determinism: every mean/std/SEM/z-score is computed from
*integer-scaled exact moments* — ``S = Σ round(x·scale)``, ``Q = Σ h²``,
``n`` — accumulated as ``DECIMAL(38,0)`` (Spark) / ``HUGEINT`` (DuckDB),
which are exact regardless of partitioning, then finished with the
*textually identical* double-precision formula on both engines.  Identical
integer inputs + identical IEEE op order ⇒ identical doubles ⇒ identical
value hashes.  The 1e-6 input rounding this implies is documented per query.

At scale these are single-pass partial aggregations (map-side combine), no
different from any sum/count — the pattern costs nothing extra.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.prefix_fold import prefix_fold_sql as _pfold_sql
from ..testdata import table as _t
from . import QuerySpec

# ---------------------------------------------------------------------------
# A6 — z-score outlier detection  (validate.py:137-151 check_number_column)
# ---------------------------------------------------------------------------
# numpy population σ (ddof=0).  |x−μ| > 2σ  ⇔  (n·h − S)² > 4·(n·Q − S²)
# with h = round(100·x) — fully integer, hence EXACT in both engines.


def a6_zscore_outliers(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "events").withColumn(
        "hx", F.expr("CAST(ROUND(value * 1e6) AS DECIMAL(38,0))")
    )
    stats = o.agg(
        F.expr("SUM(hx)").alias("s"),
        F.expr("SUM(hx * hx)").alias("q"),
        F.expr("CAST(COUNT(*) AS DECIMAL(38,0))").alias("n"),
    )
    return (
        o.crossJoin(F.broadcast(stats))
        .filter(F.expr("(n * hx - s) * (n * hx - s) > 4 * (n * q - s * s)"))
        .select("event_id", "value")
    )


_A6_SQL = """
WITH h AS (
  SELECT event_id, value, CAST(ROUND(value * 1e6) AS HUGEINT) AS hx FROM events
), st AS (
  SELECT SUM(hx) AS s, SUM(hx * hx) AS q, CAST(COUNT(*) AS HUGEINT) AS n FROM h
)
SELECT event_id, value
FROM h, st
WHERE (n * hx - s) * (n * hx - s) > 4 * (n * q - s * s)
"""


# ---------------------------------------------------------------------------
# A5 — rare-category detection  (validate.py:153-166 check_string_column)
# ---------------------------------------------------------------------------
# pandas .std() ⇒ sample std (ddof=1) over the category counts.


def a5_rare_category_profile(spark: SparkSession, sf: str) -> DataFrame:
    counts = _t(spark, sf, "events").groupBy("event_type").agg(F.count("*").alias("cnt"))
    st = counts.agg(
        F.expr("SUM(cnt)").alias("sc"),
        F.expr("SUM(cnt * cnt)").alias("qc"),
        F.expr("COUNT(*)").alias("k"),
    )
    return (
        counts.crossJoin(F.broadcast(st))
        .select(
            "event_type",
            "cnt",
            F.expr("CAST(sc AS DOUBLE) / k").alias("mean_cnt"),
            F.expr("SQRT(CAST(k * qc - sc * sc AS DOUBLE) / (k * (k - 1)))").alias("std_cnt"),
            F.expr(
                "CAST(cnt AS DOUBLE) < CAST(sc AS DOUBLE) / k"
                " - SQRT(CAST(k * qc - sc * sc AS DOUBLE) / (k * (k - 1))) AND cnt < 3"
            ).alias("is_rare"),
        )
    )


_A5_SQL = """
WITH counts AS (
  SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type
), st AS (
  SELECT SUM(cnt) AS sc, SUM(cnt * cnt) AS qc, COUNT(*) AS k FROM counts
)
SELECT event_type, cnt,
       CAST(sc AS DOUBLE) / k AS mean_cnt,
       SQRT(CAST(k * qc - sc * sc AS DOUBLE) / (k * (k - 1))) AS std_cnt,
       (CAST(cnt AS DOUBLE) < CAST(sc AS DOUBLE) / k
        - SQRT(CAST(k * qc - sc * sc AS DOUBLE) / (k * (k - 1))) AND cnt < 3) AS is_rare
FROM counts, st
"""


# ---------------------------------------------------------------------------
# A10/A11 — grouped mean + SEM  (summary_code.txt alpha blocks; SEM = σ/√n,
# pandas ddof=1).  Values rounded to 1e-6 before aggregation (documented).
# ---------------------------------------------------------------------------

def _moments():
    # built lazily: pyspark Columns need an active session
    return [
        F.expr("SUM(hv)").alias("s"),
        F.expr("SUM(hv * hv)").alias("q"),
        F.expr("COUNT(*)").alias("n"),
    ]

_MEAN_EXPR = "CAST(s AS DOUBLE) / 1e6 / n"
_SEM_EXPR = (
    "SQRT(CAST(n * CAST(q AS DECIMAL(38,0)) - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE)"
    " / (n * (n - 1)) / 1e12) / SQRT(CAST(n AS DOUBLE))"
)


def a11_grouped_mean_sem(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events").withColumn(
        "hv", F.expr("CAST(ROUND(value * 1e6) AS DECIMAL(38,0))")
    )
    g = ev.groupBy("event_type").agg(*_moments())
    return g.select(
        "event_type",
        F.col("n").alias("n_events"),
        F.expr(_MEAN_EXPR).alias("mean_value"),
        F.expr(_SEM_EXPR).alias("sem_value"),
    )


_A11_SQL = """
WITH h AS (
  SELECT event_type, CAST(ROUND(value * 1e6) AS HUGEINT) AS hv FROM events
), g AS (
  SELECT event_type, SUM(hv) AS s, SUM(hv * hv) AS q, COUNT(*) AS n
  FROM h GROUP BY event_type
)
SELECT event_type, n AS n_events,
       CAST(s AS DOUBLE) / 1e6 / n AS mean_value,
       SQRT(CAST(n * q - s * s AS DOUBLE) / (n * (n - 1)) / 1e12)
         / SQRT(CAST(n AS DOUBLE)) AS sem_value
FROM g
"""


# ---------------------------------------------------------------------------
# A10 — two-stage grouped mean (rarefaction-iteration mean analog):
# mean over (user, event_type), then per-type mean-of-means.
# ---------------------------------------------------------------------------


def a10_grouped_mean_of_means(spark: SparkSession, sf: str) -> DataFrame:
    """summary alpha: groupby(sample,depth).mean → groupby(group).mean.
    Stage-1 means are n-dependent rationals, so stage 2 re-derives exact
    integers: Σ_users (S_u/n_u) is computed with per-user rounding to 1e-6
    (documented determinism contract), then stage-2 mean over rounded means
    uses the exact-moment pattern again."""
    ev = _t(spark, sf, "events").withColumn(
        "hv", F.expr("CAST(ROUND(value * 1e6) AS DECIMAL(38,0))")
    )
    stage1 = (
        ev.groupBy("user_id", "event_type")
        .agg(F.expr("SUM(hv)").alias("s1"), F.expr("COUNT(*)").alias("n1"))
        # per-(user,type) mean, re-rounded to 1e-6 → exact int again
        .withColumn("hm", F.expr("CAST(ROUND(CAST(s1 AS DOUBLE) / n1) AS DECIMAL(38,0))"))
    )
    return (
        stage1.groupBy("event_type")
        .agg(F.expr("SUM(hm)").alias("s2"), F.expr("COUNT(*)").alias("n2"))
        .select(
            "event_type",
            F.col("n2").alias("n_users"),
            F.expr("CAST(s2 AS DOUBLE) / 1e6 / n2").alias("mean_of_user_means"),
        )
    )


_A10_SQL = """
WITH h AS (
  SELECT user_id, event_type, CAST(ROUND(value * 1e6) AS HUGEINT) AS hv FROM events
), s1 AS (
  SELECT user_id, event_type,
         CAST(ROUND(CAST(SUM(hv) AS DOUBLE) / COUNT(*)) AS HUGEINT) AS hm
  FROM h GROUP BY user_id, event_type
)
SELECT event_type, COUNT(*) AS n_users,
       CAST(SUM(hm) AS DOUBLE) / 1e6 / COUNT(*) AS mean_of_user_means
FROM s1 GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# D3 — one-way ANOVA F statistic  (rules/diversity_analysis.smk:77-88
# alpha-group-significance).  F rounded to 6dp (sum-over-groups of doubles
# is the one place exactness can't be preserved portably).
# ---------------------------------------------------------------------------


def d3_anova_f(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events").withColumn(
        "hv", F.expr("CAST(ROUND(value * 1e6) AS DECIMAL(38,0))")
    )
    g = ev.groupBy("event_type").agg(*_moments())
    # per-group term S_g²/n_g in double; Σ over the (few) groups
    terms = g.select(
        F.expr("CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n").alias("term"),
        "s",
        "q",
        F.col("n").alias("ng"),
    )
    tot = terms.agg(
        F.expr("SUM(term)").alias("sum_terms"),
        F.expr("SUM(s)").alias("st"),
        F.expr("SUM(q)").alias("qt"),
        F.expr("SUM(ng)").alias("nt"),
        F.expr("COUNT(*)").alias("k"),
    )
    return tot.select(
        F.expr(
            "ROUND(((sum_terms - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nt) / (k - 1))"
            " / ((CAST(qt AS DOUBLE) - sum_terms) / (nt - k)), 6)"
        ).alias("f_stat"),
        F.expr("CAST(k - 1 AS BIGINT)").alias("df_between"),
        F.expr("CAST(nt - k AS BIGINT)").alias("df_within"),
    )


_D3_SQL = """
WITH h AS (
  SELECT event_type, CAST(ROUND(value * 1e6) AS HUGEINT) AS hv FROM events
), g AS (
  SELECT event_type, SUM(hv) AS s, SUM(hv * hv) AS q, COUNT(*) AS n
  FROM h GROUP BY event_type
), t AS (
  SELECT SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS sum_terms,
         SUM(s) AS st, SUM(q) AS qt, SUM(n) AS nt, COUNT(*) AS k
  FROM g
)
SELECT ROUND(((sum_terms - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nt) / (k - 1))
             / ((CAST(qt AS DOUBLE) - sum_terms) / (nt - k)), 6) AS f_stat,
       CAST(k - 1 AS BIGINT) AS df_between,
       CAST(nt - k AS BIGINT) AS df_within
FROM t
"""


# ---------------------------------------------------------------------------
# a18 — exact interpolated quantiles via the distinct-value CDF
# ---------------------------------------------------------------------------

_QUANTILES = (25, 50, 75, 95)  # percent, quantile_cont/percentile semantics


def a18_quantile_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated quantiles (``quantile_cont`` semantics: 0-based
    position p·(n−1), linear interpolation) of ``l_quantity`` per return
    flag — WITHOUT a per-row sort: the same pre-aggregated CDF used for
    Kruskal-Wallis ranks.  One groupBy(grp, v) count, one cumulative
    window over the DISTINCT values of each group (bounded by value
    cardinality, not row count), then the order statistic v_i = min{v :
    cum(v) ≥ i+1} falls out of a conditional aggregation.

    Exactness: values quantize to DECIMAL(12,2); the interpolated value
    is the exact decimal (100·v_lo + f·(v_hi − v_lo)) with f = (p·(n−1))
    mod 100, converted to DOUBLE once with a single /100.0 — identical
    IEEE ops on identical exact decimals on both engines."""
    li = _t(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.expr("CAST(l_quantity AS DECIMAL(12,2))").alias("v"),
    )
    counts = li.groupBy("grp", "v").agg(F.count("*").alias("c"))
    w = Window.partitionBy("grp").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cdf = counts.withColumn("cum", F.sum("c").over(w))
    n = counts.groupBy("grp").agg(F.sum("c").alias("n"))
    j = cdf.join(F.broadcast(n), "grp")
    aggs, outs = [], []
    for p in _QUANTILES:
        t = f"({p} * (n - 1))"
        lo, fr = f"({t} div 100)", f"({t} % 100)"
        aggs += [
            F.expr(f"MIN(CASE WHEN cum >= {lo} + 1 THEN v END)").alias(f"vlo{p}"),
            F.expr(f"MIN(CASE WHEN cum >= {lo} + 2 THEN v END)").alias(f"vhi{p}"),
            F.expr(f"MIN({fr})").alias(f"f{p}"),  # constant per group
        ]
        outs.append(
            F.expr(
                f"CAST(CASE WHEN f{p} = 0 THEN 100 * vlo{p} "
                f"ELSE 100 * vlo{p} + f{p} * (vhi{p} - vlo{p}) END AS DOUBLE) / 100.0"
            ).alias(f"q{p}")
        )
    stats = j.groupBy("grp", "n").agg(*aggs)
    return stats.select("grp", F.col("n").cast("long").alias("n"), *outs)


def _a18_sql() -> str:
    per_p = []
    sel = []
    for p in _QUANTILES:
        t = f"({p} * (n - 1))"
        lo, fr = f"({t} // 100)", f"({t} % 100)"
        per_p += [
            f"MIN(CASE WHEN cum >= {lo} + 1 THEN v END) AS vlo{p}",
            f"MIN(CASE WHEN cum >= {lo} + 2 THEN v END) AS vhi{p}",
            f"MIN({fr}) AS f{p}",
        ]
        sel.append(
            f"CAST(CASE WHEN f{p} = 0 THEN 100 * vlo{p} "
            f"ELSE 100 * vlo{p} + f{p} * (vhi{p} - vlo{p}) END AS DOUBLE) / 100.0 AS q{p}"
        )
    return f"""
WITH li AS (
  SELECT l_returnflag AS grp, CAST(l_quantity AS DECIMAL(12,2)) AS v FROM lineitem
), counts AS (
  SELECT grp, v, COUNT(*) AS c FROM li GROUP BY 1, 2
), cdf AS (
  SELECT grp, v, SUM(c) OVER (PARTITION BY grp ORDER BY v
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM counts
), n AS (
  SELECT grp, SUM(c) AS n FROM counts GROUP BY 1
), stats AS (
  SELECT cdf.grp, n.n, {', '.join(per_p)}
  FROM cdf JOIN n ON cdf.grp = n.grp
  GROUP BY 1, 2
)
SELECT grp, CAST(n AS BIGINT) AS n, {', '.join(sel)} FROM stats
"""


# ---------------------------------------------------------------------------
# a20 — exact-moment Pearson correlation / OLS slope per group
# ---------------------------------------------------------------------------


def a20_corr_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Pearson r and OLS slope of extendedprice on quantity per return
    flag — entirely from integer-scaled EXACT moments (Σx, Σy, Σx²,
    Σy², Σxy as DECIMAL(38,0); both columns are 2dp currency/quantity so
    ×100 scaling is lossless), with the closed-form double expression
    applied identically on both engines.  The ×100 scale cancels
    algebraically in both r and the slope, so no unscaling step exists
    to disagree on.  One partial-agg shuffle; moments fit DECIMAL(38,0)
    beyond 10¹² rows."""
    li = _t(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.expr("CAST(ROUND(l_quantity * 100) AS DECIMAL(38,0))").alias("hx"),
        F.expr("CAST(ROUND(l_extendedprice * 100) AS DECIMAL(38,0))").alias("hy"),
    )
    g = li.groupBy("grp").agg(
        F.expr("COUNT(*)").alias("n"),
        F.expr("SUM(hx)").alias("sx"),
        F.expr("SUM(hy)").alias("sy"),
        F.expr("SUM(hx * hx)").alias("sxx"),
        F.expr("SUM(hy * hy)").alias("syy"),
        F.expr("SUM(hx * hy)").alias("sxy"),
    )
    num = "CAST(n * CAST(sxy AS DECIMAL(38,0)) - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)"
    vx = "CAST(n * CAST(sxx AS DECIMAL(38,0)) - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)"
    vy = "CAST(n * CAST(syy AS DECIMAL(38,0)) - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE)"
    return g.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        F.expr(f"{num} / (SQRT({vx}) * SQRT({vy}))").alias("corr"),
        F.expr(f"{num} / {vx}").alias("slope"),
    )


_A20_SQL = """
WITH li AS (
  SELECT l_returnflag AS grp,
         CAST(ROUND(l_quantity * 100) AS DECIMAL(38,0)) AS hx,
         CAST(ROUND(l_extendedprice * 100) AS DECIMAL(38,0)) AS hy
  FROM lineitem
), g AS (
  SELECT grp, COUNT(*) AS n, SUM(hx) AS sx, SUM(hy) AS sy,
         SUM(hx * hx) AS sxx, SUM(hy * hy) AS syy, SUM(hx * hy) AS sxy
  FROM li GROUP BY 1
)
SELECT grp, CAST(n AS BIGINT) AS n,
       CAST(n * CAST(sxy AS DECIMAL(38,0)) - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
         / (SQRT(CAST(n * CAST(sxx AS DECIMAL(38,0)) - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE))
            * SQRT(CAST(n * CAST(syy AS DECIMAL(38,0)) - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE))) AS corr,
       CAST(n * CAST(sxy AS DECIMAL(38,0)) - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
         / CAST(n * CAST(sxx AS DECIMAL(38,0)) - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE) AS slope
FROM g
"""


# ---------------------------------------------------------------------------
# d8 — chi-square test of independence (event_type × value-band)
# ---------------------------------------------------------------------------


def d8_chisq_independence(spark: SparkSession, sf: str) -> DataFrame:
    """χ² test of independence between event_type and the sign-band of
    ``value`` — the categorical-association screen run before any
    stratified analysis (the categorical cousin of the suite's ANOVA F).

    Exactness: with integer observed counts, χ² = N·Σ O²/(r·c) − N is
    computed as Σ over cells of O²·N/(row_total·col_total) − N — every
    term an integer ratio evaluated in the same order on both engines →
    bit-identical doubles.  Physical shape at 100 TB: ONE partial-agg
    shuffle to the |types|×|bands| contingency table; marginals and the
    statistic come from window sums over that tiny table, never a second
    scan."""
    ev = _t(spark, sf, "events").select(
        "event_type",
        F.when(F.col("value") < 0, "neg")
        .when(F.col("value") < 1, "small")
        .otherwise("large")
        .alias("band"),
    )
    cells = ev.groupBy("event_type", "band").agg(F.count("*").alias("o"))
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("band")
    wall = Window.partitionBy()
    per_cell = cells.select(
        "event_type",
        "band",
        "o",
        F.sum("o").over(wr).alias("row_tot"),
        F.sum("o").over(wc).alias("col_tot"),
        F.sum("o").over(wall).alias("n"),
    )
    # The cell terms are doubles, and float addition is order-sensitive —
    # so the fold order is PINNED (cells sorted by key, sequential
    # aggregate) on BOTH engines instead of trusting either engine's
    # parallel SUM order.  ≤ |types|×|bands| elements: driver-trivial.
    terms = per_cell.select(
        "n",
        "event_type",
        "band",
        F.concat_ws("|", "event_type", "band").alias("k"),
        (
            F.col("o").cast("double")
            * F.col("o")
            * F.col("n")
            / (F.col("row_tot") * F.col("col_tot"))
        ).alias("t"),
    )
    return terms.agg(
        F.max("n").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_cells"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(k, t))),"
            " CAST(0 AS DOUBLE), (acc, x) -> acc + x.t) - MAX(n)"
        ).alias("chisq"),
        ((F.countDistinct("event_type") - 1) * (F.countDistinct("band") - 1))
        .cast("long")
        .alias("dof"),
    )


_D8_SQL = """
WITH ev AS (
  SELECT event_type,
         CASE WHEN value < 0 THEN 'neg'
              WHEN value < 1 THEN 'small'
              ELSE 'large' END AS band
  FROM events
), cells AS (
  SELECT event_type, band, COUNT(*) AS o FROM ev GROUP BY 1, 2
), per_cell AS (
  SELECT event_type, band, o,
         SUM(o) OVER (PARTITION BY event_type) AS row_tot,
         SUM(o) OVER (PARTITION BY band) AS col_tot,
         SUM(o) OVER () AS n
  FROM cells
)
SELECT CAST(MAX(n) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       list_reduce(
         list(CAST(o AS DOUBLE) * o * n / (row_tot * col_tot)
              ORDER BY event_type || '|' || band),
         (acc, x) -> acc + x) - MAX(n) AS chisq,
       CAST((COUNT(DISTINCT event_type) - 1) * (COUNT(DISTINCT band) - 1) AS BIGINT) AS dof
FROM per_cell
"""


# ---------------------------------------------------------------------------
# A22 — robust MAD outliers (the robust twin of A6's z-score)
# ---------------------------------------------------------------------------


def _median100(vals: DataFrame) -> DataFrame:
    """1-row (m BIGINT) = 100 × the interpolated median of a BIGINT
    column ``v`` — the a18 CDF construction at p = 50, where the
    interpolation fraction is always 0 or 50, so 100·median is exact
    integer arithmetic end to end."""
    return _median100_counts(vals.groupBy("v").agg(F.count("*").alias("c")))


def _median100_counts(vc: DataFrame) -> DataFrame:
    """:func:`_median100` over a pre-aggregated (v, c) counts relation —
    the value-cardinality-bounded form a caller reuses when several
    medians derive from one counted distribution."""
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cdf = vc.withColumn("cum", F.sum("c").over(w))
    n = vc.agg(F.expr("CAST(SUM(c) AS BIGINT)").alias("n"))
    t = "(50 * (n - 1))"
    return (
        cdf.crossJoin(F.broadcast(n))
        .agg(
            F.expr(f"MIN(CASE WHEN cum >= ({t} div 100) + 1 THEN v END)").alias("vlo"),
            F.expr(f"MIN(CASE WHEN cum >= ({t} div 100) + 2 THEN v END)").alias("vhi"),
            F.expr(f"MIN({t} % 100)").alias("f"),
        )
        .select(
            F.expr(
                "CAST(CASE WHEN f = 0 THEN 100 * vlo"
                " ELSE 100 * vlo + f * (vhi - vlo) END AS BIGINT)"
            ).alias("m")
        )
    )


def a22_mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Robust outlier detection on the event value stream: the
    Iglewicz-Hoaglin modified z-score 0.6745·(x − median)/MAD with the
    |z| > 3.5 rule — the robust sibling of A6's moment z-score over the
    SAME column (reference validate.py:137-151), and the filter that
    survives heavy-tailed distributions where mean/std explode on the
    very tail they're supposed to detect (events.value flags ~0.4% here;
    the moment z is dragged by those same points).

    EXACT decision rule: values enter in a6's micro-unit integers
    (ROUND(value·10⁶)); both medians come from the cardinality-bounded
    CDF construction in hundredfold units (p = 50 ⇒ the interpolation
    fraction is 0 or 50, so 100·median is an integer), giving
    X2 = 100x − 100·med and D100 = 10⁴·MAD as integers; the flag is the
    pure-integer comparison 1349·|X2| > 70·D100 — no double ever decides
    membership — and the reported z is ONE identical double expression
    67.45·X2/D100 on both engines.

    Scale shape: two value-cardinality-bounded CDF windows + two 1-row
    broadcasts over narrow maps; no row-scale sort, no shuffle beyond
    the two distinct-value groupBys."""
    ev = _t(spark, sf, "events").select(
        "event_id", "value", F.expr("CAST(ROUND(value * 1e6) AS BIGINT)").alias("v")
    )
    # ONE corpus pass: the value-bounded counts checkpoint feeds BOTH
    # medians — the deviation distribution is derivable from the value
    # distribution (|100v − m| with summed counts), so the second median
    # never re-reads events; the final plan scans events exactly once
    vc = (
        ev.groupBy("v")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    m1 = _median100_counts(vc)
    dv_counts = (
        vc.crossJoin(F.broadcast(m1))
        .select(F.expr("ABS(100 * v - m)").alias("v"), "c")
        .groupBy("v")
        .agg(F.expr("CAST(SUM(c) AS BIGINT)").alias("c"))
    )
    m2 = _median100_counts(dv_counts).select(F.col("m").alias("m4"))
    return (
        ev.crossJoin(F.broadcast(m1))
        .crossJoin(F.broadcast(m2))
        .filter(F.expr("m4 > 0 AND 1349 * ABS(100 * v - m) > 70 * m4"))
        .select(
            "event_id",
            "value",
            F.expr(
                "ROUND(67.45 * CAST(100 * v - m AS DOUBLE) / m4, 6)"
            ).alias("robust_z"),
        )
    )


def _a22_sql() -> str:
    def med(src: str, out: str) -> str:
        t = "(50 * (n - 1))"
        return f"""{out} AS (
  SELECT CAST(CASE WHEN f = 0 THEN 100 * vlo
              ELSE 100 * vlo + f * (vhi - vlo) END AS BIGINT) AS m
  FROM (
    SELECT MIN(CASE WHEN cum >= ({t} // 100) + 1 THEN v END) AS vlo,
           MIN(CASE WHEN cum >= ({t} // 100) + 2 THEN v END) AS vhi,
           MIN({t} % 100) AS f
    FROM (
      SELECT v, SUM(c) OVER (ORDER BY v
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, n
      FROM (SELECT v, COUNT(*) AS c FROM {src} GROUP BY v)
      CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {src})
    )
  )
)"""

    return f"""
WITH d AS (
  SELECT event_id, value, CAST(ROUND(value * 1e6) AS BIGINT) AS v FROM events
), {med("d", "m1")},
dev AS (
  SELECT event_id, value, 100 * v - m AS x2, ABS(100 * v - m) AS dv
  FROM d CROSS JOIN m1
), dvv AS (
  SELECT dv AS v FROM dev
), {med("dvv", "m2")}
SELECT event_id, value,
       ROUND(67.45 * CAST(x2 AS DOUBLE) / m, 6) AS robust_z
FROM dev CROSS JOIN m2
WHERE m > 0 AND 1349 * ABS(x2) > 70 * m
"""


# ---------------------------------------------------------------------------
# join-key skew profile — the pre-flight check for every big shuffle
# ---------------------------------------------------------------------------

_SKEW_HOT_X = 10  # a key is "hot" when its count exceeds 10× the mean


def a24_skew_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Shuffle-key skew diagnostics for ``events.user_id`` — the
    pre-flight a 100-TB pipeline runs BEFORE committing to a groupBy /
    join / self-join on a key: per-key count distribution (p50/p99/max
    via the count-of-counts CDF), mean load, max/mean skew ratio, the
    number of hot keys (count > 10× mean, decided in exact integer
    arithmetic: cnt·n_keys > 10·n_rows), the top key's share, and the
    exact self-join output size Σ cnt² — the explosion estimate for a
    pair-generating self-join (sessionization, dedup blocking) on this
    key.  These numbers directly size AQE skew thresholds and salting
    factors.

    Physical shape at 100 TB: ONE data-scale shuffle (groupBy key); the
    count-of-counts table that everything else derives from is bounded
    by the number of DISTINCT LOAD LEVELS (≪ keys), so the CDF window
    and final aggregate are driver-trivial.  Σcnt² is exact DECIMAL —
    no overflow at any skew.  Doubles are single-division ratios of
    exact integers → bit-identical cross-engine."""
    ev = _t(spark, sf, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    # EVERYTHING below derives from count-of-counts (bounded by distinct
    # load levels, ≪ keys) — including the hot-key census, so the
    # data-scale key shuffle runs exactly once; the checkpoint stops the
    # three consumers from re-running it
    coc = counts.groupBy("cnt").agg(F.count("*").alias("keys")).localCheckpoint()
    w = Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, 0)
    cdf = coc.withColumn("cum", F.sum("keys").over(w))
    stats = cdf.agg(
        F.expr("CAST(SUM(cnt * keys) AS BIGINT)").alias("n_rows"),
        F.expr("CAST(SUM(keys) AS BIGINT)").alias("n_keys"),
        F.expr("CAST(MAX(cnt) AS BIGINT)").alias("max_cnt"),
        F.expr("CAST(SUM(CAST(cnt AS DECIMAL(38,0)) * cnt * keys) AS DECIMAL(38,0))").alias(
            "selfjoin_rows_dec"
        ),
    )
    pcts = cdf.join(F.broadcast(stats.select("n_keys")), how="cross").agg(
        F.expr("CAST(MIN(CASE WHEN cum * 100 >= 50 * n_keys THEN cnt END) AS BIGINT)").alias(
            "p50_cnt"
        ),
        F.expr("CAST(MIN(CASE WHEN cum * 100 >= 99 * n_keys THEN cnt END) AS BIGINT)").alias(
            "p99_cnt"
        ),
    )
    hot = coc.join(F.broadcast(stats.select("n_rows", "n_keys")), how="cross").agg(
        F.expr(
            f"CAST(SUM(CASE WHEN cnt * n_keys > {_SKEW_HOT_X} * n_rows THEN keys ELSE 0 END)"
            " AS BIGINT)"
        ).alias("hot_keys")
    )
    return (
        stats.crossJoin(pcts)
        .crossJoin(hot)
        .select(
            "n_rows",
            "n_keys",
            "max_cnt",
            "p50_cnt",
            "p99_cnt",
            F.expr("CAST(n_rows AS DOUBLE) / n_keys").alias("mean_cnt"),
            F.expr("CAST(max_cnt * n_keys AS DOUBLE) / n_rows").alias("skew_ratio"),
            "hot_keys",
            F.expr("CAST(max_cnt AS DOUBLE) / n_rows").alias("top_key_share"),
            F.expr("CAST(selfjoin_rows_dec AS BIGINT)").alias("selfjoin_rows"),
        )
    )


_A24_SQL = f"""
WITH counts AS (
  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1
), coc AS (
  SELECT cnt, COUNT(*) AS keys FROM counts GROUP BY 1
), cdf AS (
  SELECT cnt, keys,
         SUM(keys) OVER (ORDER BY cnt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM coc
), stats AS (
  SELECT CAST(SUM(cnt * keys) AS BIGINT) AS n_rows,
         CAST(SUM(keys) AS BIGINT) AS n_keys,
         CAST(MAX(cnt) AS BIGINT) AS max_cnt,
         SUM(CAST(cnt AS HUGEINT) * cnt * keys) AS selfjoin_rows_dec
  FROM cdf
), pcts AS (
  SELECT CAST(MIN(CASE WHEN cum * 100 >= 50 * n_keys THEN cnt END) AS BIGINT) AS p50_cnt,
         CAST(MIN(CASE WHEN cum * 100 >= 99 * n_keys THEN cnt END) AS BIGINT) AS p99_cnt
  FROM cdf, stats
), hot AS (
  SELECT CAST(SUM(CASE WHEN cnt * n_keys > {_SKEW_HOT_X} * n_rows THEN keys ELSE 0 END) AS BIGINT)
           AS hot_keys
  FROM coc, stats
)
SELECT n_rows, n_keys, max_cnt, p50_cnt, p99_cnt,
       CAST(n_rows AS DOUBLE) / n_keys AS mean_cnt,
       CAST(max_cnt * n_keys AS DOUBLE) / n_rows AS skew_ratio,
       hot_keys,
       CAST(max_cnt AS DOUBLE) / n_rows AS top_key_share,
       CAST(selfjoin_rows_dec AS BIGINT) AS selfjoin_rows
FROM stats, pcts, hot
"""


# ---------------------------------------------------------------------------
# d18 — Kaplan-Meier survival estimator
# ---------------------------------------------------------------------------

_KM_EVENT = "purchase"  # the terminal event; other users are right-censored
_KM_HOUR_US = 3_600_000_000


def d18_kaplan_meier(spark: SparkSession, sf: str) -> DataFrame:
    """Kaplan-Meier survival curve over user event histories — the
    survival statistic a clinical metadata system (the reference's
    domain) reports beside its diversity ANOVAs.  Beyond-reference.

    Subjects = users; time zero = a user's first event; the terminal
    event is their first '{ev}' (users without one are right-censored
    at their last observation).  Durations land on integer HOURS
    (integer division — exact on both engines), the risk table counts
    are BIGINTs, and the survival product Π(1 − dᵢ/nᵢ) is a
    PINNED-ORDER blocked fold over the ascending-time risk table
    (functions/prefix_fold.py: both engines multiply in the identical
    association order, so the doubles agree bit-for-bit — and the fold
    is LINEAR in distinct durations, so a years×hourly observation
    window costs T·B ops, not T²).

    Scale shape: ONE per-user shuffle builds the lifetimes; the risk
    table is bounded by distinct durations (hours over the observation
    window — a calendar-bounded vocabulary, not a corpus axis), so the
    cumulative windows and the product fold run on a bounded relation."""
    return km_from_lifetimes(km_lifetimes(spark, sf))


def km_lifetimes(spark: SparkSession, sf: str) -> DataFrame:
    """The per-user (user_id, t0, tn, tp) lifetimes relation — the ONE
    corpus-scale stage of the survival family, shared by d18/d19 and
    re-foldable from streamed partials (t0/tn/tp are MIN/MAX/MIN
    monoids; streaming/survival.py)."""
    from ..functions.event_time import event_time_us

    ev = _t(spark, sf, "events")
    us = event_time_us(ev.schema)
    return ev.groupBy("user_id").agg(
        F.min(us).alias("t0"),
        F.max(us).alias("tn"),
        F.min(F.when(F.col("event_type") == _KM_EVENT, us)).alias("tp"),
    )


def km_from_lifetimes(per_user: DataFrame) -> DataFrame:
    """d18's duration-bounded tail over an arbitrary lifetimes relation."""
    life = per_user.select(
        F.expr(
            f"CASE WHEN tp IS NOT NULL THEN (tp - t0) ELSE (tn - t0) END"
            f" div {_KM_HOUR_US}"
        ).alias("t"),
        F.expr("tp IS NOT NULL").alias("observed"),
    )
    risk = life.groupBy("t").agg(
        F.sum(F.when(F.col("observed"), 1).otherwise(0)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("observed"), 0).otherwise(1)).cast("long").alias("n_censored"),
    )
    # bounded relation from here on: cumulative windows + the pinned
    # product fold run over |distinct durations| rows
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    tot = risk.agg(F.expr("CAST(SUM(n_events + n_censored) AS BIGINT)").alias("n_all"))
    km = (
        risk.crossJoin(F.broadcast(tot))
        .withColumn("cum", F.sum(F.expr("n_events + n_censored")).over(w))
        .withColumn(
            "n_risk",
            F.expr("CAST(n_all - cum + (n_events + n_censored) AS BIGINT)"),
        )
        .withColumn(
            "term",
            F.expr("1.0 - CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE)"),
        )
    )
    # LINEAR pinned-order product (round-9 verdict #4): the blocked
    # prefix fold replaces the O(T²) per-row collect_list re-fold; the
    # association tree is fixed by (BLOCK, ascending t) and transcribed
    # identically in _KM_SQL, so the doubles stay bit-identical
    # cross-engine with only IEEE *,+ ops (functions/prefix_fold.py).
    from ..functions.prefix_fold import prefix_fold

    return prefix_fold(
        km.select("t", "n_risk", "n_events", "n_censored", "term"),
        "t",
        [("term", "survival", "*", "1.0")],
    ).select("t", "n_risk", "n_events", "n_censored", "survival")


d18_kaplan_meier.__doc__ = d18_kaplan_meier.__doc__.format(ev=_KM_EVENT)


_KM_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS tn,
         MIN(CASE WHEN event_type = '{_KM_EVENT}' THEN epoch_us(ts) END) AS tp
  FROM events GROUP BY 1
), life AS (
  SELECT CASE WHEN tp IS NOT NULL THEN (tp - t0) ELSE (tn - t0) END
           // {_KM_HOUR_US} AS t,
         tp IS NOT NULL AS observed
  FROM per_user
), risk AS (
  SELECT t,
         CAST(SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN observed THEN 0 ELSE 1 END) AS BIGINT) AS n_censored
  FROM life GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_events + n_censored) AS BIGINT) AS n_all FROM risk
), km AS (
  SELECT t, n_events, n_censored,
         n_all - SUM(n_events + n_censored) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           + (n_events + n_censored) AS n_risk
  FROM risk CROSS JOIN tot
), terms AS (
  SELECT t, n_risk, n_events, n_censored,
         1.0 - CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE) AS term
  FROM km
), {_pfold_sql("terms", "t", ["t", "n_risk", "n_events", "n_censored"],
               [("term", "survival", "*", "1.0")])}
SELECT t, CAST(n_risk AS BIGINT) AS n_risk, n_events, n_censored, survival
FROM __folded
"""


# ---------------------------------------------------------------------------
# d20 — Nelson-Aalen cumulative hazard
# ---------------------------------------------------------------------------


def d20_nelson_aalen(spark: SparkSession, sf: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator over the d18 lifetimes —
    ``H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ`` with the Poisson variance
    ``Σ dᵢ/nᵢ²`` — the third member of the survival trio every package
    ships (KM curve, NA hazard, log-rank comparison).  Same risk-table
    construction as d18 (BIGINT counts on the duration-bounded
    relation); both cumulative sums are rule-3 pinned ascending-order
    folds, so the DuckDB oracle matches bit-for-bit."""
    return nelson_aalen_from_lifetimes(km_lifetimes(spark, sf))


def nelson_aalen_from_lifetimes(per_user: DataFrame) -> DataFrame:
    """d20's duration-bounded tail over an arbitrary lifetimes relation."""
    life = per_user.select(
        F.expr(
            f"CASE WHEN tp IS NOT NULL THEN (tp - t0) ELSE (tn - t0) END"
            f" div {_KM_HOUR_US}"
        ).alias("t"),
        F.expr("tp IS NOT NULL").alias("observed"),
    )
    risk = life.groupBy("t").agg(
        F.sum(F.when(F.col("observed"), 1).otherwise(0)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("observed"), 0).otherwise(1)).cast("long").alias("n_censored"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    tot = risk.agg(F.expr("CAST(SUM(n_events + n_censored) AS BIGINT)").alias("n_all"))
    km = (
        risk.crossJoin(F.broadcast(tot))
        .withColumn("cum", F.sum(F.expr("n_events + n_censored")).over(w))
        .withColumn(
            "n_risk",
            F.expr("CAST(n_all - cum + (n_events + n_censored) AS BIGINT)"),
        )
        .withColumn(
            "h", F.expr("CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE)")
        )
        .withColumn(
            "vh",
            F.expr(
                "CAST(n_events AS DOUBLE)"
                " / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE))"
            ),
        )
    )
    # same linear blocked fold as d18 (functions/prefix_fold.py) — two
    # pinned cumulative SUMS ride one fold pass
    from ..functions.prefix_fold import prefix_fold

    return prefix_fold(
        km.select("t", "n_risk", "n_events", "n_censored", "h", "vh"),
        "t",
        [("h", "cum_hazard", "+", "0.0"), ("vh", "hazard_var", "+", "0.0")],
    ).select(
        "t", "n_risk", "n_events", "n_censored", "cum_hazard", "hazard_var"
    )


_NA_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS tn,
         MIN(CASE WHEN event_type = '{_KM_EVENT}' THEN epoch_us(ts) END) AS tp
  FROM events GROUP BY 1
), life AS (
  SELECT CASE WHEN tp IS NOT NULL THEN (tp - t0) ELSE (tn - t0) END
           // {_KM_HOUR_US} AS t,
         tp IS NOT NULL AS observed
  FROM per_user
), risk AS (
  SELECT t,
         CAST(SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN observed THEN 0 ELSE 1 END) AS BIGINT) AS n_censored
  FROM life GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_events + n_censored) AS BIGINT) AS n_all FROM risk
), km AS (
  SELECT t, n_events, n_censored,
         n_all - SUM(n_events + n_censored) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           + (n_events + n_censored) AS n_risk
  FROM risk CROSS JOIN tot
), terms AS (
  SELECT t, n_risk, n_events, n_censored,
         CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE) AS h,
         CAST(n_events AS DOUBLE)
           / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE)) AS vh
  FROM km
), {_pfold_sql("terms", "t", ["t", "n_risk", "n_events", "n_censored"],
               [("h", "cum_hazard", "+", "0.0"),
                ("vh", "hazard_var", "+", "0.0")])}
SELECT t, CAST(n_risk AS BIGINT) AS n_risk, n_events, n_censored,
       cum_hazard, hazard_var
FROM __folded
"""


# ---------------------------------------------------------------------------
# d19 — log-rank test (two-group survival comparison)
# ---------------------------------------------------------------------------


def d19_logrank_test(spark: SparkSession, sf: str) -> DataFrame:
    """Two-group log-rank test over the d18 lifetimes (groups =
    ``user_id % 2``) — the statistic a clinician reads next to the
    Kaplan-Meier curves: at each event time the observed group-1 events
    are compared with their hypergeometric expectation
    ``E₁ = d·n₁/n``, and ``χ² = (Σ(O₁−E₁))² / ΣV`` with the
    hypergeometric variance ``V = d·(n₁/n)·(1−n₁/n)·(n−d)/(n−1)``.

    Exactness: every count entering E and V is a BIGINT from the
    duration-bounded risk table; E and V are identical closed-form
    double expressions; the two sums over event times are rule-3
    PINNED-ORDER folds (ascending t), and the significance cut shares
    the `_CHI2_05` table with the χ²/diff-abundance family (one source
    of truth).  Scale shape: one per-user shuffle, then everything runs
    on the |distinct durations|-bounded relation."""
    return logrank_from_lifetimes(km_lifetimes(spark, sf))


def logrank_from_lifetimes(per_user: DataFrame) -> DataFrame:
    """d19's duration-bounded tail over an arbitrary lifetimes relation."""
    from ..functions.diff_abundance import _CHI2_05

    life = per_user.select(
        F.expr(
            f"CASE WHEN tp IS NOT NULL THEN (tp - t0) ELSE (tn - t0) END"
            f" div {_KM_HOUR_US}"
        ).alias("t"),
        F.expr("tp IS NOT NULL").alias("observed"),
        F.expr("user_id % 2 = 1").alias("g1"),
    )
    # duration-bounded by contract; checkpointed because BOTH the totals
    # agg and the risk-table join read it — without a materialization
    # each branch re-executes the per-user lifetimes upstream (the same
    # one-pass discipline as functions/prefix_fold.py)
    byt = life.groupBy("t").agg(
        F.sum(F.when(F.col("observed"), 1).otherwise(0)).cast("long").alias("d"),
        F.sum(F.when(F.col("observed") & F.col("g1"), 1).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.count("*").cast("long").alias("a"),
        F.sum(F.when(F.col("g1"), 1).otherwise(0)).cast("long").alias("a1"),
    ).localCheckpoint(eager=True)
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    tot = byt.agg(
        F.expr("CAST(SUM(a) AS BIGINT)").alias("n_all"),
        F.expr("CAST(SUM(a1) AS BIGINT)").alias("n1_all"),
    )
    km = (
        byt.crossJoin(F.broadcast(tot))
        .withColumn("cum", F.sum("a").over(w))
        .withColumn("cum1", F.sum("a1").over(w))
        .withColumn("n_risk", F.expr("CAST(n_all - cum + a AS BIGINT)"))
        .withColumn("n1", F.expr("CAST(n1_all - cum1 + a1 AS BIGINT)"))
        .filter("d > 0")
        .select(
            "t",
            F.expr(
                "CAST(d1 AS DOUBLE) - CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE)"
                " / CAST(n_risk AS DOUBLE)"
            ).alias("de"),
            F.expr(
                "CASE WHEN n_risk > 1 THEN"
                " CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n_risk AS DOUBLE))"
                " * (1.0 - CAST(n1 AS DOUBLE) / CAST(n_risk AS DOUBLE))"
                " * (CAST(n_risk - d AS DOUBLE) / CAST(n_risk - 1 AS DOUBLE))"
                " ELSE 0.0 END"
            ).alias("v"),
        )
    )
    crit = _CHI2_05[1]
    sums = km.agg(
        F.expr("sort_array(collect_list(struct(t, de, v)))").alias("terms"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_times"),
    ).select(
        F.expr(
            "aggregate(terms, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.de)"
        ).alias("sde"),
        F.expr(
            "aggregate(terms, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.v)"
        ).alias("sv"),
        "n_times",
    )
    # x² by MULTIPLICATION, never POWER — pow's bit-portability is not
    # guaranteed across libm implementations (rule 2).  sv = 0 guard
    # (degenerate cohorts: every event time has n_risk <= 1, or no
    # events at all): Spark's non-ANSI double 0/0 yields NULL where
    # DuckDB's IEEE ops yield NaN/inf, so BOTH engines pin the
    # degenerate case to (chi2 NULL, reject_h0 false) explicitly.
    return sums.select(
        F.expr("CASE WHEN sv > 0 THEN ROUND(sde * sde / sv, 6) END").alias("chi2"),
        F.lit(1).cast("long").alias("df"),
        "n_times",
        F.expr(
            f"CASE WHEN sv > 0 THEN sde * sde / sv > CAST({crit} AS DOUBLE)"
            f" ELSE false END"
        ).alias("reject_h0"),
    )


def _logrank_sql() -> str:
    from ..functions.diff_abundance import _CHI2_05

    crit = _CHI2_05[1]
    fold = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        " list_transform(list_sort(list(struct_pack(t := t, de := de, v := v))),"
        " x -> x.{f})), (acc, x) -> acc + x)"
    )
    sde = fold.format(f="de")
    sv = fold.format(f="v")
    return f"""
WITH per_user AS (
  SELECT user_id,
         MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS tn,
         MIN(CASE WHEN event_type = '{_KM_EVENT}' THEN epoch_us(ts) END) AS tp
  FROM events GROUP BY 1
), life AS (
  SELECT CASE WHEN tp IS NOT NULL THEN (tp - t0) ELSE (tn - t0) END
           // {_KM_HOUR_US} AS t,
         tp IS NOT NULL AS observed,
         user_id % 2 = 1 AS g1
  FROM per_user
), byt AS (
  SELECT t,
         CAST(SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN observed AND g1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
         CAST(COUNT(*) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS a1
  FROM life GROUP BY 1
), tot AS (
  SELECT CAST(SUM(a) AS BIGINT) AS n_all, CAST(SUM(a1) AS BIGINT) AS n1_all
  FROM byt
), km AS (
  SELECT t, d, d1,
         n_all - SUM(a) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) + a AS n_risk,
         n1_all - SUM(a1) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) + a1 AS n1
  FROM byt CROSS JOIN tot
), terms AS (
  SELECT t,
         CAST(d1 AS DOUBLE) - CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE)
           / CAST(n_risk AS DOUBLE) AS de,
         CASE WHEN n_risk > 1 THEN
           CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n_risk AS DOUBLE))
           * (1.0 - CAST(n1 AS DOUBLE) / CAST(n_risk AS DOUBLE))
           * (CAST(n_risk - d AS DOUBLE) / CAST(n_risk - 1 AS DOUBLE))
         ELSE 0.0 END AS v
  FROM km WHERE d > 0
), sums AS (
  SELECT {sde} AS sde, {sv} AS sv, CAST(COUNT(*) AS BIGINT) AS n_times
  FROM terms
)
SELECT CASE WHEN sv > 0 THEN ROUND(sde * sde / sv, 6) END AS chi2,
       CAST(1 AS BIGINT) AS df,
       n_times,
       CASE WHEN sv > 0 THEN sde * sde / sv > CAST({crit} AS DOUBLE)
            ELSE false END AS reject_h0
FROM sums
"""


QUERIES: dict[str, QuerySpec] = {
    "d19_logrank_test": QuerySpec(
        d19_logrank_test,
        _logrank_sql(),
        "beyond-reference: two-group log-rank test over the d18 lifetimes "
        "(hypergeometric E and V per event time, pinned-order sums, shared "
        "_CHI2_05 cut) — one per-user shuffle, then a duration-bounded "
        "relation end to end",
    ),
    "d20_nelson_aalen": QuerySpec(
        d20_nelson_aalen,
        _NA_SQL,
        "beyond-reference: Nelson-Aalen cumulative hazard + Poisson "
        "variance over the d18 lifetimes — same one-shuffle risk-table "
        "construction, two pinned-order cumulative folds",
    ),
    "d18_kaplan_meier": QuerySpec(
        d18_kaplan_meier,
        _KM_SQL,
        "beyond-reference: Kaplan-Meier survival curve over user event "
        "histories (first event → first terminal event, right-censored at "
        "last observation) — one per-user shuffle, then cumulative windows "
        "+ the pinned-order survival product on the duration-bounded risk "
        "table",
    ),
    "a24_skew_profile": QuerySpec(
        a24_skew_profile,
        _A24_SQL,
        "beyond-reference: shuffle-key skew pre-flight (AQE-era skew diagnosis, cf. Spark SQL 2015) — count-of-counts CDF "
        "percentiles, hot-key census in exact integer arithmetic, exact "
        "Σcnt² self-join explosion size",
    ),
    "a22_mad_outliers": QuerySpec(
        a22_mad_outliers,
        _a22_sql(),
        "beyond-reference: robust MAD outliers (Iglewicz & Hoaglin 1993 modified z; "
        "pure-integer decision rule, CDF medians)",
    ),
    "d8_chisq_independence": QuerySpec(
        d8_chisq_independence,
        _D8_SQL,
        "beyond-reference: exact Pearson 1900 χ² independence test (one contingency-table shuffle)",
    ),
    "a18_quantile_profile": QuerySpec(
        a18_quantile_profile,
        _a18_sql(),
        "beyond-reference: exact SQL:2008 quantile_cont profile via pre-aggregated CDF (no row sort)",
    ),
    "a20_corr_profile": QuerySpec(
        a20_corr_profile,
        _A20_SQL,
        "beyond-reference: exact-moment Pearson 1895 r + OLS slope per group",
    ),
    "a6_zscore_outliers": QuerySpec(a6_zscore_outliers, _A6_SQL, "A6 validate.py:137-151"),
    "a5_rare_category_profile": QuerySpec(a5_rare_category_profile, _A5_SQL, "A5 validate.py:153-166"),
    "a11_grouped_mean_sem": QuerySpec(a11_grouped_mean_sem, _A11_SQL, "A10/A11 summary_code.txt:259-435 alpha blocks"),
    "a10_grouped_mean_of_means": QuerySpec(a10_grouped_mean_of_means, _A10_SQL, "A10 summary_code.txt qiime1 alpha"),
    "d3_anova_f": QuerySpec(d3_anova_f, _D3_SQL, "D3 rules/diversity_analysis.smk:77-88"),
}
