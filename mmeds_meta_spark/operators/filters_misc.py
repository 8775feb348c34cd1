"""Remaining filter / reshape / inference operators from SURVEY §2:
P8/P9 sample filters, A12 stepwise retention, A15 pairwise splits,
A16 ordered distinct, F5/F6 type inference, F10 alphabet check.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..testdata import table as _t
from . import QuerySpec
from .relational import dsum, money

# ---------------------------------------------------------------------------
# P8 — two-class filter (rules/table_filtering.smk:17-31)
# ---------------------------------------------------------------------------


def p8_two_class_filter(spark: SparkSession, sf: str) -> DataFrame:
    """qiime filter-samples --p-where "[cat]=='a' OR [cat]=='b'": keep two
    classes, count per (sample, class)."""
    ev = _t(spark, sf, "events")
    return (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_events"))
    )


_P8_SQL = """
SELECT user_id, event_type, COUNT(*) AS n_events
FROM events WHERE event_type IN ('click', 'purchase')
GROUP BY user_id, event_type
"""


# ---------------------------------------------------------------------------
# P9 — min-frequency sample filter (rules/table_filtering.smk:1-15)
# ---------------------------------------------------------------------------

_MIN_FREQ = 100.0


def p9_min_frequency_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Drop samples whose total reads < sampling depth: aggregate totals →
    semi-join the long table back (exactly the qiime min-frequency
    semantics; one shuffle + broadcast-able keep-list)."""
    li = _t(spark, sf, "lineitem")
    keep = (
        li.groupBy("l_orderkey")
        .agg(F.sum(money("l_quantity")).alias("tot"))
        .filter(F.col("tot") >= F.lit(_MIN_FREQ).cast("decimal(18,2)"))
        .select("l_orderkey")
    )
    return (
        li.join(keep, "l_orderkey", "left_semi")
        .groupBy("l_orderkey")
        .agg(dsum(money("l_quantity"), "total_qty"), F.count("*").alias("n_items"))
    )


_P9_SQL = f"""
WITH keep AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(ROUND(l_quantity, 2) AS DECIMAL(18,2))) >= {_MIN_FREQ}
)
SELECT l_orderkey,
       CAST(SUM(CAST(ROUND(l_quantity, 2) AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
       COUNT(*) AS n_items
FROM lineitem WHERE l_orderkey IN (SELECT l_orderkey FROM keep)
GROUP BY l_orderkey
"""


# ---------------------------------------------------------------------------
# A12 — stepwise read-retention decomposition (summary_code.txt table_py)
# ---------------------------------------------------------------------------


def a12_stepwise_retention(spark: SparkSession, sf: str) -> DataFrame:
    """input→filtered→denoised retention analog: per order, the gross,
    post-discount, and post-tax revenue as stage rows (decimal-exact),
    long via the stack generator."""
    li = _t(spark, sf, "lineitem")
    # computed money values round AFTER ×100 scaling (ROUND(x·100) is the
    # only per-row rounding both engines agree on for computed doubles —
    # ROUND(x, 2) diverges at cent boundaries, see module docstring of
    # operators/__init__.py); exact integer-cent sums, /100 at the end.
    cents = "CAST(ROUND({expr} * 100) AS DECIMAL(38,0))"
    stages = li.groupBy("l_orderkey").agg(
        F.expr("SUM(" + cents.format(expr="l_extendedprice") + ")").alias("gross_c"),
        F.expr(
            "SUM(" + cents.format(expr="l_extendedprice * (1 - l_discount)") + ")"
        ).alias("disc_c"),
        F.expr(
            "SUM("
            + cents.format(expr="l_extendedprice * (1 - l_discount) * (1 + l_tax)")
            + ")"
        ).alias("tax_c"),
    )
    return stages.selectExpr(
        "l_orderkey",
        "stack(3, 'gross', CAST(gross_c AS DOUBLE) / 100,"
        " 'discounted', CAST(disc_c AS DOUBLE) / 100,"
        " 'taxed', CAST(tax_c AS DOUBLE) / 100) AS (stage, revenue)",
    )


_A12_SQL = """
WITH stages AS (
  SELECT l_orderkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS gross_c,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS HUGEINT)) AS disc_c,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS HUGEINT)) AS tax_c
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey, 'gross' AS stage, CAST(gross_c AS DOUBLE) / 100 AS revenue FROM stages
UNION ALL SELECT l_orderkey, 'discounted', CAST(disc_c AS DOUBLE) / 100 FROM stages
UNION ALL SELECT l_orderkey, 'taxed', CAST(tax_c AS DOUBLE) / 100 FROM stages
"""


# ---------------------------------------------------------------------------
# A15 — pairwise class-split planning (rules/common.smk:13-77 lefse_splits)
# ---------------------------------------------------------------------------


def a15_pairwise_splits(spark: SparkSession, sf: str) -> DataFrame:
    """Enumerate category pairs (c1 < c2) where both have ≥2 members —
    the LEfSe pairwise-comparison planner as a self-join, not a driver
    loop."""
    counts = (
        _t(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
    )
    a = counts.select(F.col("event_type").alias("class_a"), F.col("cnt").alias("n_a"))
    b = counts.select(F.col("event_type").alias("class_b"), F.col("cnt").alias("n_b"))
    return a.crossJoin(b).filter(F.col("class_a") < F.col("class_b"))


_A15_SQL = """
WITH counts AS (
  SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type HAVING COUNT(*) >= 2
)
SELECT a.event_type AS class_a, a.cnt AS n_a, b.event_type AS class_b, b.cnt AS n_b
FROM counts a, counts b WHERE a.event_type < b.event_type
"""


# ---------------------------------------------------------------------------
# A16 — first-seen ordered distinct (util.py:1114-1123 grouped mapping file)
# ---------------------------------------------------------------------------


def a16_ordered_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered distinct of a metadata column: order = first appearance
    (min event_id), made explicit instead of relying on scan order."""
    ev = _t(spark, sf, "events")
    firsts = ev.groupBy("event_type").agg(F.min("event_id").alias("first_seen"))
    return firsts.select(
        "event_type",
        F.row_number().over(Window.orderBy("first_seen")).cast("long").alias("appearance_order"),
    )


_A16_SQL = """
WITH firsts AS (
  SELECT event_type, MIN(event_id) AS first_seen FROM events GROUP BY event_type
)
SELECT event_type,
       CAST(ROW_NUMBER() OVER (ORDER BY first_seen) AS BIGINT) AS appearance_order
FROM firsts
"""


# ---------------------------------------------------------------------------
# A9 — sequencing-run name dedup (util.py:409-411 get_sequencing_run_names)
# ---------------------------------------------------------------------------


def a9_distinct_runs(spark: SparkSession, sf: str) -> DataFrame:
    """`df[col].unique()` as a distributed distinct: the run-name analog is
    the documents `source` column.  One partial-agg shuffle over a
    bounded-cardinality key."""
    return _t(spark, sf, "documents").select("source").distinct()


_A9_SQL = "SELECT DISTINCT source FROM documents"


# ---------------------------------------------------------------------------
# A17 — stats counters (config.py:174-177; spawn.py:239-259 update_stats)
# ---------------------------------------------------------------------------


def a17_stats_counters(spark: SparkSession, sf: str) -> DataFrame:
    """The homepage study/user/doc counters as one row of global counts —
    three partial-agg scans cross-joined (each side is a single row)."""
    users = _t(spark, sf, "events").agg(
        F.expr("COUNT(DISTINCT user_id)").alias("user_count")
    )
    docs = _t(spark, sf, "documents").agg(F.expr("COUNT(*)").alias("doc_count"))
    studies = _t(spark, sf, "embeddings").agg(
        F.expr("COUNT(DISTINCT label)").alias("study_count")
    )
    return users.crossJoin(docs).crossJoin(studies)


_A17_SQL = """
SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS user_count,
       (SELECT COUNT(*) FROM documents) AS doc_count,
       (SELECT COUNT(DISTINCT label) FROM embeddings) AS study_count
"""


# ---------------------------------------------------------------------------
# F5/F6 — is_numeric + majority-type inference (util.py:505-550, 613-624)
# ---------------------------------------------------------------------------


def f6_type_inference(spark: SparkSession, sf: str) -> DataFrame:
    """get_col_type over a mixed string column (half numeric strings, half
    words): count int/float/string castability, majority wins."""
    p = _t(spark, sf, "part")
    mixed = p.select(
        F.when(F.col("p_partkey") % 2 == 0, F.col("p_size").cast("string"))
        .otherwise(F.col("p_type"))
        .alias("cell")
    )
    counts = mixed.agg(
        F.expr("SUM(CASE WHEN TRY_CAST(cell AS BIGINT) IS NOT NULL THEN 1 ELSE 0 END)").alias("n_int"),
        F.expr("SUM(CASE WHEN TRY_CAST(cell AS DOUBLE) IS NOT NULL THEN 1 ELSE 0 END)").alias("n_float"),
        F.expr("COUNT(cell)").alias("n_total"),
    )
    return counts.select(
        F.expr("CAST(n_int AS BIGINT)").alias("n_int"),
        F.expr("CAST(n_float AS BIGINT)").alias("n_float"),
        F.expr("CAST(n_total AS BIGINT)").alias("n_total"),
        F.expr(
            "CASE WHEN n_int * 2 > n_total THEN 'Integer'"
            " WHEN n_float * 2 > n_total THEN 'Number' ELSE 'Text' END"
        ).alias("inferred_type"),
    )


_F6_SQL = """
WITH mixed AS (
  SELECT CASE WHEN p_partkey % 2 = 0 THEN CAST(p_size AS VARCHAR) ELSE p_type END AS cell
  FROM part
), counts AS (
  SELECT SUM(CASE WHEN TRY_CAST(cell AS BIGINT) IS NOT NULL THEN 1 ELSE 0 END) AS n_int,
         SUM(CASE WHEN TRY_CAST(cell AS DOUBLE) IS NOT NULL THEN 1 ELSE 0 END) AS n_float,
         COUNT(cell) AS n_total
  FROM mixed
)
SELECT CAST(n_int AS BIGINT) AS n_int, CAST(n_float AS BIGINT) AS n_float,
       CAST(n_total AS BIGINT) AS n_total,
       CASE WHEN n_int * 2 > n_total THEN 'Integer'
            WHEN n_float * 2 > n_total THEN 'Number' ELSE 'Text' END AS inferred_type
FROM counts
"""


# ---------------------------------------------------------------------------
# F10 — restricted-alphabet check (validate.py:187-197 DNA GATC)
# ---------------------------------------------------------------------------


def f10_alphabet_check(spark: SparkSession, sf: str) -> DataFrame:
    """set(cell) − allowed_alphabet ≠ ∅ → violation rows with the illegal
    residue, exactly the DNA-alphabet check shape (letters allowed, digits
    and '#' are the violations here)."""
    s = _t(spark, sf, "supplier")
    return s.select(
        "s_suppkey",
        "s_name",
        F.regexp_replace("s_name", "[A-Za-z]", "").alias("residue"),
    ).filter(F.col("residue") != "")


_F10_SQL = """
SELECT s_suppkey, s_name, regexp_replace(s_name, '[A-Za-z]', '', 'g') AS residue
FROM supplier WHERE regexp_replace(s_name, '[A-Za-z]', '', 'g') != ''
"""


# ---------------------------------------------------------------------------
# W4 — event sessionization (gap-based), the training-pipeline windowing op
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def w4_sessionization(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap to
    the previous event exceeds 30 min.  Pure integer µs arithmetic — the
    ``ts`` column is normalized to long µs by the dtype-dispatched
    ``event_time_us`` helper (works for both the long-ns and timestamp[us]
    parquet encodings the driver has shipped), and DuckDB truncates to µs
    natively (`epoch_us`), so both engines see identical microsecond
    values.  lag + running-sum window, one shuffle on user_id."""
    from ..functions.event_time import event_time_us

    raw = _t(spark, sf, "events")
    ev = raw.withColumn("ts_us", event_time_us(raw.schema))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > _SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_ord", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sessions.groupBy("user_id", "session_ord")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
        )
        .withColumn(
            "duration_us", F.col("session_end_us") - F.col("session_start_us")
        )
        .withColumn("session_ord", F.col("session_ord").cast("long"))
    )


_W4_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
), flagged AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN LAG(ts_us) OVER w IS NULL
                OR ts_us - LAG(ts_us) OVER w > {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), sessions AS (
  SELECT user_id, ts_us,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_ord
  FROM flagged
)
SELECT user_id, session_ord, COUNT(*) AS n_events,
       MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
       MAX(ts_us) - MIN(ts_us) AS duration_us
FROM sessions GROUP BY user_id, session_ord
"""


def asof_join_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join — each purchase matched to the LATEST click at or before
    it for the same user (the attribution join; the canonical time-series
    operator Spark has no built-in for).

    Implemented as the single-shuffle union-and-carry plan, not a range
    join: tag clicks (build) and purchases (probe), union, ONE window per
    user ordered by (ts, side, event_id) carrying the last non-null click
    attributes forward.  Cost is one shuffle on user_id + a running
    window — identical shape to w4's sessionization; a range/inequality
    join would be O(clicks × purchases) per user.  Ties at the same µs
    resolve build-before-probe (a same-instant click is visible) and
    highest click event_id last — total order, engine-independent.
    Purchases before any click keep NULL click columns (outer as-of)."""
    from ..functions.event_time import event_time_us

    raw = _t(spark, sf, "events")
    ev = raw.withColumn("ts_us", event_time_us(raw.schema))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts_us", "event_id", "value", F.lit(0).alias("is_probe")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", "event_id", "value", F.lit(1).alias("is_probe")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carry = lambda c: F.last(  # noqa: E731
        F.when(F.col("is_probe") == 0, F.col(c)), ignorenulls=True
    ).over(w)
    return (
        clicks.unionByName(purchases)
        .withColumn("click_id", carry("event_id"))
        .withColumn("click_ts_us", carry("ts_us"))
        .withColumn("click_value", carry("value"))
        .filter(F.col("is_probe") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts_us").alias("purchase_ts_us"),
            "click_id",
            "click_ts_us",
            (F.col("ts_us") - F.col("click_ts_us")).alias("latency_us"),
            "click_value",
        )
    )


_ASOF_SQL = """
WITH ev AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us FROM events
), tagged AS (
  SELECT user_id, ts_us, event_id, value, 0 AS is_probe FROM ev WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts_us, event_id, value, 1 AS is_probe FROM ev WHERE event_type = 'purchase'
), carried AS (
  SELECT user_id, ts_us, event_id, is_probe,
         LAST_VALUE(CASE WHEN is_probe = 0 THEN event_id END IGNORE NULLS) OVER w AS click_id,
         LAST_VALUE(CASE WHEN is_probe = 0 THEN ts_us END IGNORE NULLS) OVER w AS click_ts_us,
         LAST_VALUE(CASE WHEN is_probe = 0 THEN value END IGNORE NULLS) OVER w AS click_value
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, is_probe, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_id, user_id, ts_us AS purchase_ts_us,
       click_id, click_ts_us, ts_us - click_ts_us AS latency_us, click_value
FROM carried WHERE is_probe = 1
"""


def a19_rollup_daily(spark: SparkSession, sf: str) -> DataFrame:
    """Hierarchical ROLLUP aggregate: (day, event_type) → (day) → ()
    subtotals in ONE pass — the grouping-sets shape every reporting
    rollup needs, with the engine expanding the three grouping sets
    map-side instead of three separate scans.  Value sums follow the
    streaming rollup's decimal-exact convention; ``lvl`` is the grouping
    bitmask (0 = leaf, 1 = per-day subtotal, 3 = grand total)."""
    from ..functions.event_time import event_ts

    raw = _t(spark, sf, "events")
    ev = raw.withColumn("day", F.to_date(event_ts(raw.schema)))
    return (
        ev.rollup("day", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value"), 6).cast("decimal(28,6)"))
            .cast("double")
            .alias("total_value"),
            F.grouping_id().cast("int").alias("lvl"),
        )
        .select("day", "event_type", "lvl", "n_events", "total_value")
    )


_A19_SQL = """
SELECT CAST(ts AS DATE) AS day, event_type,
       CAST(GROUPING(CAST(ts AS DATE), event_type) AS INTEGER) AS lvl,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP (CAST(ts AS DATE), event_type)
"""


# ---------------------------------------------------------------------------
# w5 — bucketed range join: follow-up events within a window after a purchase
# ---------------------------------------------------------------------------

_RANGE_W_US = 10 * 60 * 1_000_000  # 10-minute follow-up window


def w5_range_join_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    """Range join: for each purchase, aggregate the same user's events in
    (t, t+W] — the attribution-window shape (ad-click → conversion,
    purchase → follow-on activity).

    A naive range join on ``user_id`` alone degenerates for hot users
    (per-user quadratic residual filtering, and Spark plans pure range
    predicates as BNLJ).  The scale design is TIME BUCKETING: both sides
    key on (user_id, floor(ts/W)); a probe matching events ≤ W ahead can
    only land in its own bucket or the next one, so each purchase is
    exploded into exactly 2 composite probe keys.  The join becomes a
    plain equi-join on (user_id, bucket) with a cheap residual range
    filter — comparisons are bounded by 2-bucket density, never per-user
    totals, and the composite key ALSO splits hot users across time
    (built-in skew mitigation).  Value sums use the decimal-exact
    convention; purchases with no follow-up events are not emitted
    (inner-join semantics, documented)."""
    from ..functions.event_time import event_time_us

    raw = _t(spark, sf, "events")
    ev = raw.withColumn("ts_us", event_time_us(raw.schema))
    build = ev.select(
        "user_id",
        F.expr(f"ts_us DIV {_RANGE_W_US}").alias("bucket"),
        F.col("ts_us").alias("e_ts_us"),
        F.round(F.col("value"), 6).cast("decimal(28,6)").alias("e_value"),
    )
    probes = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts_us").alias("p_ts_us"),
            F.explode(
                F.array(
                    F.expr(f"ts_us DIV {_RANGE_W_US}"),
                    F.expr(f"ts_us DIV {_RANGE_W_US} + 1"),
                )
            ).alias("bucket"),
        )
    )
    return (
        probes.join(build, ["user_id", "bucket"])
        .filter(
            (F.col("e_ts_us") > F.col("p_ts_us"))
            & (F.col("e_ts_us") <= F.col("p_ts_us") + _RANGE_W_US)
        )
        .groupBy("purchase_id", "user_id", "p_ts_us")
        .agg(
            F.count("*").alias("n_follow"),
            F.sum("e_value").cast("double").alias("follow_value"),
            F.max("e_ts_us").alias("last_follow_us"),
        )
    )


_W5_SQL = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us FROM events
), probes AS (
  SELECT event_id AS purchase_id, user_id, ts_us AS p_ts_us
  FROM ev WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id, p.p_ts_us,
       COUNT(*) AS n_follow,
       CAST(SUM(CAST(ROUND(e.value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS follow_value,
       MAX(e.ts_us) AS last_follow_us
FROM probes p JOIN ev e
  ON p.user_id = e.user_id
 AND e.ts_us > p.p_ts_us AND e.ts_us <= p.p_ts_us + {_RANGE_W_US}
GROUP BY p.purchase_id, p.user_id, p.p_ts_us
"""
# The oracle states the PLAIN range-join semantics; the Spark plan's
# bucketing is an equivalence-preserving physical rewrite (any event in
# (t, t+W] lies in bucket(t) or bucket(t)+1, and the residual filter
# removes everything else).


# ---------------------------------------------------------------------------
# w6 — ordered funnel conversion (view → click → purchase)
# ---------------------------------------------------------------------------

_FUNNEL = ("view", "click", "purchase")


def w6_funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel: a user converts through step k iff the earliest
    step-k event STRICTLY FOLLOWS their earliest step-(k−1) conversion —
    the standard product-analytics funnel, computed as one conditional
    aggregation per user (min event time per step), then one global
    roll-up of per-step conversion counts.

    Physical shape at 100 TB: a single partial-agg shuffle on user_id
    (the per-step MINs combine map-side — no window, no per-user sort,
    no self-join), then a 1-row final agg.  The step comparison is pure
    integer µs arithmetic → portable.  Output: one row per funnel step
    with n_reached and the integer-ratio conversion rate vs step 1."""
    from ..functions.event_time import event_time_us

    raw = _t(spark, sf, "events")
    ev = raw.withColumn("ts_us", event_time_us(raw.schema))
    mins = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts_us"))).alias(f"t{i}")
            for i, s in enumerate(_FUNNEL)
        ]
    )
    # c_k = earliest time the user has completed steps 0..k IN ORDER:
    # the first step-k event after c_{k-1}?  With only min-per-step
    # available, the standard simplification (strict funnel on earliest
    # events) is: converted_k ⟺ t0 < t1 < ... < tk.  Documented — both
    # engines state the same rule, so the oracle pins it.
    conv = mins.select(
        "user_id",
        *[
            F.when(
                F.expr(" AND ".join(f"t{j} IS NOT NULL" for j in range(i + 1))
                       + ("" if i == 0 else " AND " + " AND ".join(f"t{j-1} < t{j}" for j in range(1, i + 1)))),
                1,
            )
            .otherwise(0)
            .alias(f"c{i}")
            for i in range(len(_FUNNEL))
        ],
    )
    tall = conv.selectExpr(
        "stack("
        + str(len(_FUNNEL))
        + ", "
        + ", ".join(f"{i}, '{s}', c{i}" for i, s in enumerate(_FUNNEL))
        + ") AS (step, step_name, c)"
    )
    agg = tall.groupBy("step", "step_name").agg(F.sum("c").cast("long").alias("n_reached"))
    base = agg.filter(F.col("step") == 0).select(F.col("n_reached").alias("n_base"))
    return (
        agg.crossJoin(F.broadcast(base))
        .select(
            F.col("step").cast("long").alias("step"),
            "step_name",
            "n_reached",
            (F.col("n_reached").cast("double") / F.col("n_base")).alias("conv_rate"),
        )
    )


def _w6_sql() -> str:
    mins = ",\n         ".join(
        f"MIN(CASE WHEN event_type = '{s}' THEN ts_us END) AS t{i}"
        for i, s in enumerate(_FUNNEL)
    )
    convs = []
    for i in range(len(_FUNNEL)):
        cond = " AND ".join(f"t{j} IS NOT NULL" for j in range(i + 1))
        if i > 0:
            cond += " AND " + " AND ".join(f"t{j-1} < t{j}" for j in range(1, i + 1))
        convs.append(f"CASE WHEN {cond} THEN 1 ELSE 0 END AS c{i}")
    tall = " UNION ALL ".join(
        f"SELECT {i} AS step, '{s}' AS step_name, c{i} AS c FROM conv"
        for i, s in enumerate(_FUNNEL)
    )
    return f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
), mins AS (
  SELECT user_id, {mins}
  FROM ev GROUP BY user_id
), conv AS (
  SELECT user_id, {", ".join(convs)} FROM mins
), tall AS (
  {tall}
), agg AS (
  SELECT step, step_name, CAST(SUM(c) AS BIGINT) AS n_reached
  FROM tall GROUP BY step, step_name
), base AS (
  SELECT n_reached AS n_base FROM agg WHERE step = 0
)
SELECT CAST(step AS BIGINT) AS step, step_name, n_reached,
       CAST(n_reached AS DOUBLE) / n_base AS conv_rate
FROM agg, base
"""


# ---------------------------------------------------------------------------
# w7 — behavioral transition matrix (first-order Markov estimate)
# ---------------------------------------------------------------------------


def w7_transition_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition estimate over per-user event
    sequences: P(next = b | current = a) = n(a→b) / n(a→*) — the
    behavioral-model fit behind session prediction and anomaly scoring.

    Physical shape at 100 TB: ONE shuffle on user_id for the lag window
    (events per user are bounded; the frame is a single lag, no running
    state), then the transition counts collapse to ≤ |types|² rows —
    the matrix aggregation is map-side-combined into a trivially small
    result no matter the corpus.  Probabilities are integer ratios →
    bit-identical.  Ties in event order are broken by event_id (total,
    deterministic)."""
    from ..functions.event_time import event_time_us

    raw = _t(spark, sf, "events")
    ev = raw.withColumn("ts_us", event_time_us(raw.schema))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    steps = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("cur"), F.col("next_type").alias("nxt"))
        .agg(F.count("*").alias("n"))
    )
    totals = steps.groupBy("cur").agg(F.sum("n").alias("n_cur"))
    return (
        steps.join(F.broadcast(totals), "cur")
        .select(
            "cur",
            "nxt",
            "n",
            (F.col("n").cast("double") / F.col("n_cur")).alias("p"),
        )
    )


_W7_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
), step AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS nxt
  FROM ev
), cnt AS (
  SELECT cur, nxt, COUNT(*) AS n FROM step WHERE nxt IS NOT NULL GROUP BY cur, nxt
), tot AS (
  SELECT cur, SUM(n) AS n_cur FROM cnt GROUP BY cur
)
SELECT c.cur, c.nxt, c.n, CAST(c.n AS DOUBLE) / t.n_cur AS p
FROM cnt c JOIN tot t USING (cur)
"""


# ---------------------------------------------------------------------------
# w8 — cohort retention matrix (week-granular)
# ---------------------------------------------------------------------------


def w8_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention: users are grouped by the day of their FIRST
    event (the cohort); for each (cohort_day, day_offset) the matrix
    counts how many cohort members were active that many days later
    (the product-analytics D1/D7 retention matrix), plus the
    integer-ratio retention rate vs the cohort's size.

    Physical shape at 100 TB: ONE shuffle on user_id — the per-user agg
    collapses each user to (first day, distinct active days), both
    map-side combinable, and the set is bounded by the time horizon in
    days, never by event volume.  The exploded (user, offset) rows then
    collapse into a matrix of ≤ horizon² cells (second, trivially small
    shuffle); cohort sizes come off the matrix's own offset-0 diagonal
    with ONE window over the matrix-sized result — the events feed is
    scanned exactly once (a broadcast-join formulation re-executed the
    whole upstream agg for the sizes branch: 4 scans → 2).  Day indexing is pure integer
    µs//86400e6 arithmetic → engine-portable."""
    from ..functions.event_time import event_time_us

    raw = _t(spark, sf, "events")
    ev = raw.select("user_id", event_time_us(raw.schema).alias("ts_us"))
    per_user = (
        ev.select("user_id", F.expr("ts_us DIV 86400000000").alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("cohort_day"), F.collect_set("day").alias("days"))
    )
    cells = (
        per_user.select("user_id", "cohort_day", F.explode("days").alias("day"))
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count("*").alias("n_active"))
    )
    w = Window.partitionBy("cohort_day")
    return cells.select(
        "cohort_day",
        "day_offset",
        "n_active",
        (
            F.col("n_active").cast("double")
            / F.max(F.when(F.col("day_offset") == 0, F.col("n_active"))).over(w)
        ).alias("retention"),
    )


_W8_SQL = """
WITH ev AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), per_user AS (
  SELECT user_id, MIN(day) OVER (PARTITION BY user_id) AS cohort_day, day
  FROM ev
), cells AS (
  SELECT cohort_day, day - cohort_day AS day_offset, COUNT(*) AS n_active
  FROM per_user GROUP BY 1, 2
), sizes AS (
  SELECT cohort_day, n_active AS cohort_size FROM cells WHERE day_offset = 0
)
SELECT c.cohort_day, c.day_offset, c.n_active,
       CAST(c.n_active AS DOUBLE) / s.cohort_size AS retention
FROM cells c JOIN sizes s USING (cohort_day)
"""
# Every user's first day is by definition an active day, so the
# offset-0 diagonal IS the cohort size — no separate cohort scan needed.


# ---------------------------------------------------------------------------
# w14 — ordered funnel WITHIN sessions (w4 ∘ w6 composition)
# ---------------------------------------------------------------------------


def w14_session_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """The w6 ordered funnel evaluated per SESSION instead of per user
    lifetime: a session converts through step k iff its earliest step-k
    event strictly follows its earliest step-(k−1) event — the
    within-visit conversion metric (lifetime funnels overstate
    conversion by crediting a purchase weeks after the view).

    COMPOSITION: the w4 gap rule assigns the session id (same lag +
    running-sum window), then w6's per-step MIN aggregation runs with
    (user, session) as the funnel unit — one window + one partial-agg
    shuffle on user_id, then a #steps-row roll-up.  Same portable
    integer-µs arithmetic as both parents."""
    from ..functions.event_time import event_time_us

    raw = _t(spark, sf, "events")
    ev = raw.withColumn("ts_us", event_time_us(raw.schema))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    sess = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > _SESSION_GAP_US),
            1,
        ).otherwise(0),
    ).withColumn(
        "session_ord",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    mins = sess.groupBy("user_id", "session_ord").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts_us"))).alias(f"t{i}")
            for i, s in enumerate(_FUNNEL)
        ]
    )
    conv = mins.select(
        *[
            F.when(
                F.expr(
                    " AND ".join(f"t{j} IS NOT NULL" for j in range(i + 1))
                    + (
                        ""
                        if i == 0
                        else " AND "
                        + " AND ".join(f"t{j-1} < t{j}" for j in range(1, i + 1))
                    )
                ),
                1,
            )
            .otherwise(0)
            .alias(f"c{i}")
            for i in range(len(_FUNNEL))
        ]
    )
    tall = conv.selectExpr(
        "stack("
        + str(len(_FUNNEL))
        + ", "
        + ", ".join(f"{i}L, '{s}', c{i}" for i, s in enumerate(_FUNNEL))
        + ") AS (step, step_name, c)"
    )
    agg = tall.groupBy("step", "step_name").agg(
        F.sum("c").cast("long").alias("n_sessions_reached")
    )
    wbase = Window.orderBy(F.lit(1))
    return agg.select(
        "step",
        "step_name",
        "n_sessions_reached",
        (
            F.col("n_sessions_reached").cast("double")
            / F.max(F.when(F.col("step") == 0, F.col("n_sessions_reached"))).over(wbase)
        ).alias("conv_rate"),
    )


def _w14_sql() -> str:
    mins = ",\n         ".join(
        f"MIN(CASE WHEN event_type = '{s}' THEN ts_us END) AS t{i}"
        for i, s in enumerate(_FUNNEL)
    )
    convs = []
    for i in range(len(_FUNNEL)):
        cond = " AND ".join(f"t{j} IS NOT NULL" for j in range(i + 1))
        if i > 0:
            cond += " AND " + " AND ".join(f"t{j-1} < t{j}" for j in range(1, i + 1))
        convs.append(f"CASE WHEN {cond} THEN 1 ELSE 0 END AS c{i}")
    tall = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, '{s}' AS step_name, c{i} AS c FROM conv"
        for i, s in enumerate(_FUNNEL)
    )
    return f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
), flagged AS (
  SELECT user_id, event_id, event_type, ts_us,
         CASE WHEN LAG(ts_us) OVER w IS NULL
                OR ts_us - LAG(ts_us) OVER w > {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), sess AS (
  SELECT user_id, event_type, ts_us,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_ord
  FROM flagged
), mins AS (
  SELECT user_id, session_ord, {mins}
  FROM sess GROUP BY user_id, session_ord
), conv AS (
  SELECT {", ".join(convs)} FROM mins
), tall AS (
  {tall}
), agg AS (
  SELECT step, step_name, CAST(SUM(c) AS BIGINT) AS n_sessions_reached
  FROM tall GROUP BY step, step_name
)
SELECT step, step_name, n_sessions_reached,
       CAST(n_sessions_reached AS DOUBLE)
         / MAX(CASE WHEN step = 0 THEN n_sessions_reached END) OVER () AS conv_rate
FROM agg
"""


# ---------------------------------------------------------------------------
# f23 — semi-structured JSON property extraction + rollup
# ---------------------------------------------------------------------------


def f23_json_props_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Parse the events feed's JSON ``props`` payload (schema-on-read:
    ``from_json`` with an explicit struct, malformed rows → NULL) and
    roll the extracted property up per event type — the semi-structured
    column pattern every event pipeline hits (clients ship loose JSON;
    the warehouse types it at read).

    Physical shape at 100 TB: ``from_json`` is a JVM narrow map inside
    whole-stage codegen (never a Python UDF), the rollup is one
    partial-agg shuffle on event_type, and Catalyst prunes the parse to
    the single referenced field.  Sums are integers → exact."""
    ev = _t(spark, sf, "events")
    parsed = ev.select(
        "event_type",
        F.from_json(F.col("props"), "k BIGINT").getField("k").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).cast("long").alias("n_unparsed"),
        F.sum("k").cast("long").alias("k_sum"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
    )


_F23_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unparsed,
       CAST(SUM(k) AS BIGINT) AS k_sum,
       MIN(k) AS k_min, MAX(k) AS k_max
FROM (
  -- json_valid guard: DuckDB's json_extract RAISES on malformed JSON
  -- (Spark's from_json yields NULL), so malformed rows must be routed to
  -- NULL before extraction for both engines to count them as n_unparsed
  SELECT event_type,
         CASE WHEN json_valid(props)
              THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT) END AS k
  FROM events
)
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# w11 — time-weighted average value per user (TWAP)
# ---------------------------------------------------------------------------


_SPLIT = 34_359_738_368  # 2^35: quotient stays < 2^53, remainder exact


def _big_to_double(dialect: str, col: str) -> str:
    """Correctly-rounded DOUBLE of a wide exact integer (|x| < 2^88),
    portable: split at 2^35, convert both halves (each exact in double),
    recombine with ONE rounding addition.  Needed because DuckDB's
    DECIMAL(38,0)->DOUBLE cast on aggregate results is off by one ulp for
    some values (measured; its HUGEINT cast is correct), while Spark's
    BigDecimal cast rounds correctly — the split makes both engines take
    the same single-rounding path.  Sign is reapplied by an exact ±1.0
    multiply; ABS + nonnegative DIV sidesteps floor-vs-trunc divergence."""
    aw = f"CAST(ABS({col}) AS HUGEINT)" if dialect == "duck" else f"ABS({col})"
    div = "//" if dialect == "duck" else "DIV"
    return (
        f"((CASE WHEN {col} < 0 THEN -1.0 ELSE 1.0 END) * "
        f"(CAST({aw} {div} {_SPLIT} AS DOUBLE) * {_SPLIT}.0"
        f" + CAST({aw} % {_SPLIT} AS DOUBLE)))"
    )


def w11_time_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user time-weighted average of ``value``: each event's value
    holds until the user's next event (step-function semantics), so
    TWAP = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first) — the standard remedy
    when events arrive irregularly and a plain mean over-weights bursts
    (financial TWAP, sensor duty cycles).

    Exactness: weights are integer µs gaps, values decimal(28,6); the
    weighted sum accumulates as exact decimal and the single closing
    division runs on identical operands → bit-identical doubles.
    Physical shape at 100 TB: one lead window + one groupBy, both on
    user_id (the window's shuffle is reused by the agg).  Users with a
    single event have no holding period and are excluded (documented)."""
    from ..functions.event_time import event_time_us

    raw = _t(spark, sf, "events")
    ev = raw.select(
        "user_id",
        "event_id",
        event_time_us(raw.schema).alias("ts_us"),
        # micro-unit INTEGERS, not decimals: DuckDB's DECIMAL(38,6)->DOUBLE
        # cast applies the 10^-6 scale as a float multiply (measured
        # last-ulp divergence from Spark's correctly-rounded BigDecimal
        # cast), so the weighted sum stays a pure integer until the one
        # closing double expression both engines share
        F.expr("CAST(ROUND(value * 1000000) AS DECIMAL(18,0))").alias("v_micros"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    stepped = ev.withColumn("next_us", F.lead("ts_us").over(w)).filter(
        F.col("next_us").isNotNull()
    )
    return (
        stepped.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_holding_periods"),
            F.sum(
                F.col("v_micros") * (F.col("next_us") - F.col("ts_us")).cast("decimal(19,0)")
            ).alias("_wsum"),
            F.min("ts_us").alias("_t0"),
            F.max("next_us").alias("_t1"),
        )
        .select(
            "user_id",
            "n_holding_periods",
            (
                F.expr(_big_to_double("spark", "_wsum"))
                / (F.col("_t1") - F.col("_t0")).cast("double")
                / F.lit(1000000.0)
            ).alias("twap"),
        )
    )


# ---------------------------------------------------------------------------
# w13 — forward fill (last observation carried forward)
# ---------------------------------------------------------------------------


def w13_forward_fill(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user forward fill: only 'purchase' events carry an observed
    value; every other event inherits the user's most recent purchase
    value (LOCF — the time-series gap-fill every sensor/market pipeline
    runs before resampling).  Rows before a user's first purchase stay
    NULL (no lookahead).

    Physical shape at 100 TB: ONE window over user_id —
    ``last(ignorenulls)`` with an unbounded-preceding ROWS frame is
    Spark's running-state frame (O(1) per row, no per-row rescan);
    DuckDB's ``last_value(x IGNORE NULLS)`` states the identical
    semantics.  Values are round(6) decimals → exact; the output is the
    filled value, not a recomputation, so no float arithmetic at all."""
    from ..functions.event_time import event_time_us

    raw = _t(spark, sf, "events")
    ev = raw.select(
        "event_id",
        "user_id",
        "event_type",
        event_time_us(raw.schema).alias("ts_us"),
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value"), 6).cast("decimal(18,6)"),
        ).alias("obs"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        F.last("obs", ignorenulls=True).over(w).cast("double").alias("last_purchase_value"),
    )


_W13_SQL = """
SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
       CAST(last_value(
         CASE WHEN event_type = 'purchase'
              THEN CAST(ROUND(value, 6) AS DECIMAL(18,6)) END
         IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS last_purchase_value
FROM events
"""


_W11_SQL_TMPL = """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(ROUND(value * 1000000) AS DECIMAL(18,0)) AS v_micros
  FROM events
), stepped AS (
  SELECT user_id, ts_us, v_micros,
         LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS next_us
  FROM ev
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_holding_periods,
       {BIGTODOUBLE}
         / CAST(MAX(next_us) - MIN(ts_us) AS DOUBLE) / 1000000.0 AS twap
FROM stepped WHERE next_us IS NOT NULL
GROUP BY user_id
"""

_W11_SQL = _W11_SQL_TMPL.replace(
    "{BIGTODOUBLE}",
    _big_to_double("duck", "SUM(v_micros * CAST(next_us - ts_us AS DECIMAL(19,0)))"),
)


# ---------------------------------------------------------------------------
# w12 — interval-overlap join: concurrent sessions across users
# ---------------------------------------------------------------------------

_IV_BUCKET_US = 60 * 60 * 1_000_000  # 1-hour overlap buckets


def w12_interval_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Interval-interval overlap join over the w4 session relation: for
    each pair of users, how many of their session pairs overlapped in
    time — the concurrency/co-presence analysis (and the same join
    shape as genomic interval intersection).

    A naive interval join is a cross join with a range predicate (BNLJ).
    The scale plan BUCKETS time: each session explodes onto the 1-hour
    buckets it touches, pairs form by equi-join on the bucket, a
    residual predicate keeps true overlaps, and a distinct collapses
    pairs that share several buckets.  Work is bounded by per-bucket
    session density (concurrency), never total-sessions²; a session
    explodes into (duration/bucket + 1) keys, bounded because gap
    sessions are activity-bounded.  Pure integer µs arithmetic →
    portable."""
    s = w4_sessionization(spark, sf).select(
        "user_id",
        "session_ord",
        F.col("session_start_us").alias("s0"),
        F.col("session_end_us").alias("s1"),
    )
    exploded = s.select(
        "user_id",
        "session_ord",
        "s0",
        "s1",
        F.expr(
            f"explode(sequence(s0 DIV {_IV_BUCKET_US}, s1 DIV {_IV_BUCKET_US}))"
        ).alias("bucket"),
    )
    a = exploded.select(
        F.col("user_id").alias("ua"),
        F.col("session_ord").alias("oa"),
        F.col("s0").alias("a0"),
        F.col("s1").alias("a1"),
        "bucket",
    )
    b = exploded.select(
        F.col("user_id").alias("ub"),
        F.col("session_ord").alias("ob"),
        F.col("s0").alias("b0"),
        F.col("s1").alias("b1"),
        "bucket",
    )
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("ua") < F.col("ub"))
        .filter((F.col("a0") <= F.col("b1")) & (F.col("b0") <= F.col("a1")))
        .select("ua", "oa", "ub", "ob")
        .distinct()
    )
    return pairs.groupBy("ua", "ub").agg(
        F.count("*").cast("long").alias("n_overlapping_sessions")
    )


def _w12_sql() -> str:
    return f"""
WITH w4 AS ({_W4_SQL})
SELECT a.user_id AS ua, b.user_id AS ub,
       CAST(COUNT(*) AS BIGINT) AS n_overlapping_sessions
FROM w4 a JOIN w4 b
  ON a.user_id < b.user_id
 AND a.session_start_us <= b.session_end_us
 AND b.session_start_us <= a.session_end_us
GROUP BY a.user_id, b.user_id
"""
# The oracle states the PLAIN quadratic overlap join; the Spark plan's
# time bucketing is an equivalence-preserving rewrite (two intervals
# overlap iff they share at least one bucket AND pass the residual
# predicate; distinct removes multi-bucket double counts).


# ---------------------------------------------------------------------------
# w10 — per-user session-behavior profile (composition on w4)
# ---------------------------------------------------------------------------


def w10_session_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user session-behavior profile: number of sessions, exact mean
    events-per-session and mean session duration, and the longest
    session — the engagement features product analytics derives from
    sessionized events.

    COMPOSITION evidence: this consumes :func:`w4_sessionization`'s
    output relation directly — the session window, the per-session agg,
    and this per-user roll-up fuse into ONE Catalyst plan (the w4
    DataFrame is a logical view, nothing materializes in between), and
    the roll-up reuses the user_id partitioning the session window
    already established.  Means are integer ratios of exact µs/count
    sums → bit-identical cross-engine."""
    s = w4_sessionization(spark, sf)
    return s.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        (F.sum("n_events").cast("double") / F.count("*")).alias("mean_events_per_session"),
        (F.sum("duration_us").cast("double") / F.count("*")).alias("mean_duration_us"),
        F.max("duration_us").alias("max_duration_us"),
    )


# composed oracle: the w4 CTE chain is reused verbatim as a subquery
def _w10_sql() -> str:
    return f"""
WITH w4 AS ({_W4_SQL})
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS mean_events_per_session,
       CAST(SUM(duration_us) AS DOUBLE) / COUNT(*) AS mean_duration_us,
       MAX(duration_us) AS max_duration_us
FROM w4 GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# w9 — event-time RANGE-frame rolling window (burst detection)
# ---------------------------------------------------------------------------

_ROLL_W_US = 10 * 60 * 1_000_000  # 10-minute trailing window


def w9_rolling_window_range(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event trailing-window stats: for every event, the count and
    decimal-exact value sum of the SAME user's events in the preceding
    10 minutes (inclusive of now) — the burst/velocity feature behind
    rate limiting and fraud scoring.

    This is the one windowed shape the rest of the suite doesn't use: a
    RANGE frame over event time (``RANGE BETWEEN W PRECEDING AND
    CURRENT ROW`` on integer µs), which Spark evaluates with a sliding
    frame pointer over each user partition — one shuffle on user_id,
    per-row cost amortized O(1), state bounded by the window horizon.
    Equal-timestamp events share a frame by RANGE semantics (peer rows),
    which both engines implement identically; count/sum over the frame
    are peer-order-invariant, so ties cost nothing."""
    from ..functions.event_time import event_time_us

    raw = _t(spark, sf, "events")
    ev = raw.select(
        "event_id",
        "user_id",
        event_time_us(raw.schema).alias("ts_us"),
        F.round(F.col("value"), 6).cast("decimal(28,6)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-_ROLL_W_US, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count("*").over(w).cast("long").alias("n_trailing"),
        F.sum("v").over(w).cast("double").alias("trailing_value"),
    )


_W9_SQL = f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CAST(ROUND(value, 6) AS DECIMAL(28,6)) AS v
  FROM events
)
SELECT event_id, user_id, ts_us,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing,
       CAST(SUM(v) OVER w AS DOUBLE) AS trailing_value
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN {_ROLL_W_US} PRECEDING AND CURRENT ROW)
"""


# |x−μ| > 3σ as pure integer arithmetic on exact micro-unit moments —
# shared verbatim by the streaming monitor (streaming/anomaly.py)
SEASONAL_RULE = "(n * hx - s) * (n * hx - s) > 9 * (n * q - s * s)"


def seasonal_prep(raw: DataFrame) -> DataFrame:
    """events → (event_id, event_type, value, hour_of_day, hx): the
    micro-unit value and hour bucket both the batch operator and the
    streaming monitor score against."""
    from ..functions.event_time import event_time_us

    return raw.select(
        "event_id",
        "event_type",
        "value",
        ((event_time_us(raw.schema) / F.lit(3_600_000_000)).cast("long") % 24)
        .cast("int")
        .alias("hour_of_day"),
        F.expr("CAST(ROUND(value * 1e6) AS DECIMAL(38,0))").alias("hx"),
    )


def seasonal_moments(ev: DataFrame) -> DataFrame:
    """Exact per-(event_type, hour) moment table (s, q, n) — linear, so
    per-batch moments SUM to the full-feed moments bit-exactly."""
    return ev.groupBy("event_type", "hour_of_day").agg(
        F.expr("SUM(hx)").alias("s"),
        F.expr("SUM(hx * hx)").alias("q"),
        F.expr("CAST(COUNT(*) AS DECIMAL(38,0))").alias("n"),
    )


def w15_seasonal_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    """Seasonal anomaly detection on the events feed: flag events whose
    value deviates more than 3σ from their (event_type, hour-of-day)
    baseline — the ops-monitoring twin of a6's global z-score, with the
    seasonality dimension every production metric needs (a checkout
    spike at 3am is an anomaly; the same value at noon is Tuesday).

    The decision rule is pure integer arithmetic on micro-unit moments
    (the a6 discipline): |x−μ| > 3σ ⇔ (n·hx − s)² > 9·(n·q − s²) with
    s, q, n exact DECIMAL(38,0)/HUGEINT group moments — no doubles, no
    cross-engine epsilon.  At extreme group sizes (≳10¹⁰ rows/group)
    rescale the micro-units; the comparison is homogeneous so any
    common scale works.

    Physical shape at 100 TB: ONE partial-agg shuffle for the baseline
    (groups bounded by |event_type|·24 — broadcast back), then a narrow
    filter over the feed.  No window, no per-event shuffle."""
    ev = seasonal_prep(_t(spark, sf, "events"))
    stats = seasonal_moments(ev)
    return (
        ev.join(F.broadcast(stats), ["event_type", "hour_of_day"])
        .filter(F.expr(SEASONAL_RULE))
        .select("event_id", "event_type", "hour_of_day", "value")
    )


_W15_SQL = """
WITH ev AS (
  SELECT event_id, event_type, value,
         CAST((epoch_us(ts) // 3600000000) % 24 AS INTEGER) AS hour_of_day,
         CAST(ROUND(value * 1e6) AS HUGEINT) AS hx
  FROM events
), st AS (
  SELECT event_type, hour_of_day,
         SUM(hx) AS s, SUM(hx * hx) AS q, CAST(COUNT(*) AS HUGEINT) AS n
  FROM ev GROUP BY event_type, hour_of_day
)
SELECT ev.event_id, ev.event_type, ev.hour_of_day, ev.value
FROM ev JOIN st USING (event_type, hour_of_day)
WHERE (n * hx - s) * (n * hx - s) > 9 * (n * q - s * s)
"""


def a25_rollup_cube(spark: SparkSession, sf: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP(event_type, day): per-(type, day)
    rows, per-type subtotals, and the grand total in ONE pass — the
    grouping-sets surface every BI layer expects (and a distinct Catalyst
    operator: Expand feeding a single partial agg, NOT one shuffle per
    level the way a UNION of GROUP BYs would plan).

    GROUPING() flags disambiguate real NULLs from subtotal markers; the
    day key is an integer epoch-day index (no date-function parity
    surface); value sums are exact micro-unit DECIMAL(38,0)/HUGEINT
    closed to DOUBLE once (the repo's money discipline).  At 100 TB the
    Expand emits 3 rows per input row into the same partial-agg shuffle
    — map-side combine absorbs the level blow-up before the exchange."""
    from ..functions.event_time import event_time_us

    raw = _t(spark, sf, "events")
    ev = raw.select(
        "event_type",
        (event_time_us(raw.schema) / F.lit(86_400_000_000)).cast("long").alias("day_idx"),
        F.expr("CAST(ROUND(value * 1e6) AS DECIMAL(38,0))").alias("hx"),
    )
    return ev.rollup("event_type", "day_idx").agg(
        F.count("*").cast("long").alias("n_events"),
        F.expr("CAST(SUM(hx) AS DOUBLE) / 1e6").alias("total_value"),
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("day_idx").cast("int").alias("g_day"),
    )


_A25_SQL = """
WITH ev AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_idx,
         CAST(ROUND(value * 1e6) AS HUGEINT) AS hx
  FROM events
)
SELECT event_type, day_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(hx) AS DOUBLE) / 1e6 AS total_value,
       CAST(GROUPING(event_type) AS INTEGER) AS g_type,
       CAST(GROUPING(day_idx) AS INTEGER) AS g_day
FROM ev GROUP BY ROLLUP (event_type, day_idx)
"""


# ---------------------------------------------------------------------------
# w17 — Markov absorption probability (conversion modeling on w7's chain)
# ---------------------------------------------------------------------------

_ABS_STATE = "purchase"  # absorbing target
_ABS_STEPS = 24  # fixed horizon: deterministic, same convention as PCoA


def w17_markov_absorption(spark: SparkSession, sf: str) -> DataFrame:
    """Absorption probability on the w7 first-order Markov chain: from
    each starting event type, the probability of reaching
    ``{target}`` within {t} steps — the quantity behind Markov
    attribution and conversion modeling (w7 fits the chain; this SOLVES
    it).  The target is absorbing (its observed outgoing transitions
    are overridden — once converted, done); states with no outgoing
    transitions are sinks at 0.

    Numerics: transition probabilities are integer ratios (exact
    doubles); the {t}-step iteration runs as ONE
    ``aggregate(sequence(...))`` fold over a single array-valued row —
    the dense bounded-block machinery proven bit-identical for PCoA —
    with every per-state sum folded in next-state order, so the DuckDB
    oracle (the same iteration unrolled as {t} chained CTEs with
    ORDER-pinned list folds) reproduces the doubles exactly.

    Physical shape at 100 TB: ONE user_id shuffle for the lag pairs,
    a ≤|types|²-row matrix, then value-level array arithmetic — the
    solve costs the same at any corpus size."""
    from ..functions.event_time import event_time_us

    raw = _t(spark, sf, "events")
    ev = raw.withColumn("ts_us", event_time_us(raw.schema))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    steps = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("cur"), F.col("next_type").alias("nxt"))
        .agg(F.count("*").alias("n"))
    )
    totals = steps.groupBy("cur").agg(F.sum("n").alias("n_cur"))
    trans = steps.join(F.broadcast(totals), "cur").select(
        "cur", "nxt", (F.col("n").cast("double") / F.col("n_cur")).alias("p")
    )
    states = (
        trans.select(F.col("cur").alias("s"))
        .union(trans.select("nxt"))
        .distinct()
    )
    zero = "CAST(0 AS DOUBLE)"
    st = (
        trans.agg(
            F.expr("sort_array(collect_list(struct(cur, nxt, p)))").alias("tr")
        )
        .crossJoin(states.agg(F.expr("sort_array(collect_list(s))").alias("sts")))
        .withColumn(
            "adj",
            F.expr(
                "transform(sts, si -> transform(filter(tr, e0 -> e0.cur = si),"
                " e0 -> struct(CAST(array_position(sts, e0.nxt) AS INT) AS jp,"
                " e0.p AS p)))"
            ),
        )
        .select("sts", "adj")
        .localCheckpoint(eager=True)  # ONE bounded row
    )
    seed = (
        f"transform(sts, si -> CASE WHEN si = '{_ABS_STATE}'"
        f" THEN CAST(1 AS DOUBLE) ELSE {zero} END)"
    )
    step = (
        "zip_with(sts, adj, (si, rw) ->"
        f" CASE WHEN si = '{_ABS_STATE}' THEN CAST(1 AS DOUBLE)"
        f" ELSE aggregate(rw, {zero}, (ac1, e1) -> ac1 + e1.p * element_at(vv, e1.jp))"
        " END)"
    )
    st = st.withColumn(
        "x",
        F.expr(
            f"aggregate(sequence(1, {_ABS_STEPS}), {seed}, (vv, tt) -> {step})"
        ),
    )
    out_counts = trans.groupBy("cur").agg(F.count("*").cast("long").alias("n_out"))
    res = st.select(
        F.expr("explode(sequence(1, size(sts)))").alias("k"), "sts", "x"
    ).select(
        F.expr("element_at(sts, k)").alias("state"),
        F.expr("ROUND(element_at(x, k), 6)").alias("p_convert"),
    )
    return res.join(out_counts.withColumnRenamed("cur", "state"), "state", "left").select(
        "state", F.coalesce("n_out", F.lit(0)).cast("long").alias("n_out"), "p_convert"
    )


w17_markov_absorption.__doc__ = w17_markov_absorption.__doc__.format(
    target=_ABS_STATE, t=_ABS_STEPS
)


def _absorption_sql() -> str:
    steps = []
    prev = "x0"
    for t in range(1, _ABS_STEPS + 1):
        cur = f"x{t}"
        steps.append(
            f"""{cur} AS MATERIALIZED (
  SELECT s.state,
         CASE WHEN s.state = '{_ABS_STATE}' THEN CAST(1 AS DOUBLE)
              ELSE COALESCE((
                SELECT list_reduce(list(tr.p * xp.x ORDER BY tr.nxt),
                                   (acc, v) -> acc + v)
                FROM trans tr JOIN {prev} xp ON xp.state = tr.nxt
                WHERE tr.cur = s.state), CAST(0 AS DOUBLE))
         END AS x
  FROM states s
)"""
        )
        prev = cur
    chain = ",\n".join(steps)
    return f"""
WITH pairs AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
), lagged AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id) AS nxt
  FROM pairs
), steps AS (
  SELECT cur, nxt, COUNT(*) AS n FROM lagged WHERE nxt IS NOT NULL GROUP BY 1, 2
), totals AS (
  SELECT cur, SUM(n) AS n_cur FROM steps GROUP BY cur
), trans AS MATERIALIZED (
  SELECT s.cur, s.nxt, CAST(s.n AS DOUBLE) / t.n_cur AS p
  FROM steps s JOIN totals t USING (cur)
), states AS MATERIALIZED (
  SELECT DISTINCT cur AS state FROM trans
  UNION SELECT DISTINCT nxt FROM trans
), x0 AS MATERIALIZED (
  SELECT state, CASE WHEN state = '{_ABS_STATE}' THEN CAST(1 AS DOUBLE)
                     ELSE CAST(0 AS DOUBLE) END AS x
  FROM states
),
{chain},
outc AS (
  SELECT cur AS state, CAST(COUNT(*) AS BIGINT) AS n_out FROM trans GROUP BY cur
)
SELECT x.state, COALESCE(o.n_out, 0) AS n_out, ROUND(x.x, 6) AS p_convert
FROM {prev} x LEFT JOIN outc o USING (state)
"""


_REM_START = "view"  # journeys are evaluated from this entry state


def w18_markov_removal(spark: SparkSession, sf: str) -> DataFrame:
    """Markov REMOVAL EFFECTS — the attribution layer on top of
    w17_markov_absorption: for every non-target, non-start event type,
    re-solve the absorbing chain with that state DELETED (paths through
    it die — the classic removal-effect convention) and report how much
    of the ``{start}`` → ``{target}`` conversion probability disappears:
    effect(c) = 1 − p_removed / p_full.  The channel whose removal
    costs the most conversions gets the credit.

    Physical shape: the chain fit is w17's (one lag shuffle, a
    ≤|types|²-row matrix); each variant is the SAME one-row {t}-step
    fold over the adjacency array filtered of the removed state — K+1
    value-level folds in one plan, constant cost at any corpus size.
    The oracle unrolls every variant's iteration as MATERIALIZED CTE
    chains over the same integer-ratio matrix."""
    from ..functions.event_time import event_time_us

    raw = _t(spark, sf, "events")
    ev = raw.withColumn("ts_us", event_time_us(raw.schema))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    steps = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("cur"), F.col("next_type").alias("nxt"))
        .agg(F.count("*").alias("n"))
    )
    totals = steps.groupBy("cur").agg(F.sum("n").alias("n_cur"))
    trans = steps.join(F.broadcast(totals), "cur").select(
        "cur", "nxt", (F.col("n").cast("double") / F.col("n_cur")).alias("p")
    )
    states = (
        trans.select(F.col("cur").alias("s")).union(trans.select("nxt")).distinct()
    )
    zero = "CAST(0 AS DOUBLE)"
    st = (
        trans.agg(F.expr("sort_array(collect_list(struct(cur, nxt, p)))").alias("tr"))
        .crossJoin(states.agg(F.expr("sort_array(collect_list(s))").alias("sts")))
        .localCheckpoint(eager=True)
    )

    def solve(removed: str) -> str:
        """p(start→target, {t} steps) with ``removed`` deleted, as one
        value-level expression over (tr, sts)."""
        keep = (
            f"filter(tr, e9 -> e9.cur != '{removed}' AND e9.nxt != '{removed}')"
            if removed
            else "tr"
        )
        adj = (
            f"transform(sts, si -> transform(filter({keep}, e0 -> e0.cur = si),"
            " e0 -> struct(CAST(array_position(sts, e0.nxt) AS INT) AS jp,"
            " e0.p AS p)))"
        )
        seed = (
            f"transform(sts, si -> CASE WHEN si = '{_ABS_STATE}'"
            f" THEN CAST(1 AS DOUBLE) ELSE {zero} END)"
        )
        step = (
            "zip_with(sts, aj, (si, rw) ->"
            f" CASE WHEN si = '{_ABS_STATE}' THEN CAST(1 AS DOUBLE)"
            f" ELSE aggregate(rw, {zero}, (ac1, e1) -> ac1 + e1.p * element_at(vv, e1.jp))"
            " END)"
        )
        # bind the filtered adjacency once per fold step via a let-style
        # outer fold over a 1-element sequence (adj is loop-invariant but
        # inexpensive at |types| scale; recomputing per step keeps this a
        # single expression)
        body = step.replace("aj", adj)
        return (
            f"element_at(aggregate(sequence(1, {_ABS_STEPS}), {seed},"
            f" (vv, tt) -> {body}),"
            f" CAST(array_position(sts, '{_REM_START}') AS INT))"
        )

    # Engine-parity guard (round-8 ADVICE): if the start state never
    # appears in the observed transitions, array_position(sts, start)
    # is 0 and Spark's element_at(..., 0) would raise at runtime while
    # the DuckDB oracle's final `f.state = '<start>'` join simply yields
    # zero rows.  Filter the one-row matrix relation the same way so
    # both engines degrade to an empty result.
    st = st.filter(F.expr(f"array_position(sts, '{_REM_START}') > 0"))
    st = st.withColumn("p_full", F.expr(solve("")))
    exploded = st.select(
        "tr",
        "sts",
        "p_full",
        F.expr(
            f"explode(filter(sts, s9 -> s9 != '{_ABS_STATE}' AND s9 != '{_REM_START}'))"
        ).alias("removed_state"),
    ).localCheckpoint(eager=True)  # ≤|types| rows; each solves one variant
    out = exploded.withColumn(
        "p_removed",
        F.expr(
            solve("@R@").replace("'@R@'", "removed_state")
        ),
    )
    return out.select(
        "removed_state",
        F.expr("ROUND(p_full, 6)").alias("p_full"),
        F.expr("ROUND(p_removed, 6)").alias("p_removed"),
        F.expr(
            "CASE WHEN p_full > 0 THEN ROUND(1 - p_removed / p_full, 6)"
            " ELSE NULL END"
        ).alias("removal_effect"),
    )


w18_markov_removal.__doc__ = w18_markov_removal.__doc__.format(
    start=_REM_START, target=_ABS_STATE, t=_ABS_STEPS
)


def _removal_sql_build() -> str:
    head = f"""
WITH pairs AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
), lagged AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id) AS nxt
  FROM pairs
), steps AS (
  SELECT cur, nxt, COUNT(*) AS n FROM lagged WHERE nxt IS NOT NULL GROUP BY 1, 2
), totals AS (
  SELECT cur, SUM(n) AS n_cur FROM steps GROUP BY cur
), trans AS MATERIALIZED (
  SELECT s.cur, s.nxt, CAST(s.n AS DOUBLE) / t.n_cur AS p
  FROM steps s JOIN totals t USING (cur)
), allstates AS MATERIALIZED (
  SELECT DISTINCT cur AS state FROM trans
  UNION SELECT DISTINCT nxt FROM trans
), removable AS MATERIALIZED (
  SELECT state AS removed_state FROM allstates
  WHERE state NOT IN ('{_ABS_STATE}', '{_REM_START}')
), grid AS MATERIALIZED (
  SELECT r.removed_state, a.state FROM removable r CROSS JOIN allstates a
  WHERE a.state != r.removed_state
), gx0 AS MATERIALIZED (
  SELECT removed_state, state,
         CASE WHEN state = '{_ABS_STATE}' THEN CAST(1 AS DOUBLE)
              ELSE CAST(0 AS DOUBLE) END AS x
  FROM grid
), fx0 AS MATERIALIZED (
  SELECT state, CASE WHEN state = '{_ABS_STATE}' THEN CAST(1 AS DOUBLE)
                     ELSE CAST(0 AS DOUBLE) END AS x
  FROM allstates
)"""
    parts = []
    fprev, gprev = "fx0", "gx0"
    for t in range(1, _ABS_STEPS + 1):
        fcur, gcur = f"fx{t}", f"gx{t}"
        parts.append(
            f""",
{fcur} AS MATERIALIZED (
  SELECT s.state,
         CASE WHEN s.state = '{_ABS_STATE}' THEN CAST(1 AS DOUBLE)
              ELSE COALESCE((
                SELECT list_reduce(list(tr.p * xp.x ORDER BY tr.nxt),
                                   (acc, v) -> acc + v)
                FROM trans tr JOIN {fprev} xp ON xp.state = tr.nxt
                WHERE tr.cur = s.state), CAST(0 AS DOUBLE))
         END AS x
  FROM allstates s
),
{gcur} AS MATERIALIZED (
  SELECT g.removed_state, g.state,
         CASE WHEN g.state = '{_ABS_STATE}' THEN CAST(1 AS DOUBLE)
              ELSE COALESCE((
                SELECT list_reduce(list(tr.p * xp.x ORDER BY tr.nxt),
                                   (acc, v) -> acc + v)
                FROM trans tr
                JOIN {gprev} xp
                  ON xp.removed_state = g.removed_state AND xp.state = tr.nxt
                WHERE tr.cur = g.state AND tr.cur != g.removed_state
                  AND tr.nxt != g.removed_state), CAST(0 AS DOUBLE))
         END AS x
  FROM grid g
)"""
        )
        fprev, gprev = fcur, gcur
    tail = f"""
SELECT r.removed_state,
       ROUND(f.x, 6) AS p_full,
       ROUND(g.x, 6) AS p_removed,
       CASE WHEN f.x > 0 THEN ROUND(1 - g.x / f.x, 6) ELSE NULL END
         AS removal_effect
FROM removable r
JOIN {fprev} f ON f.state = '{_REM_START}'
JOIN {gprev} g ON g.removed_state = r.removed_state AND g.state = '{_REM_START}'
"""
    return head + "".join(parts) + tail


# ---------------------------------------------------------------------------
# p11 — k-anonymity / l-diversity privacy audit
# ---------------------------------------------------------------------------

_KANON_K = 5  # minimum equivalence-class size
_KANON_L = 3  # minimum distinct sensitive values per class


def p11_k_anonymity(spark: SparkSession, sf: str) -> DataFrame:
    """Privacy audit of the release-candidate view: k-anonymity and
    l-diversity over the quasi-identifier pair (nation, market segment)
    with the account-balance band as the sensitive attribute — the
    quantitative counterpart of the reference's PHI header blocklist
    (mmeds/validate.py check_header_format / config.py PHI column list
    bans DIRECT identifiers; k-anonymity measures whether the remaining
    QUASI-identifiers still isolate individuals).

    One row per equivalence class: size, distinct sensitive bands, and
    the k/l verdicts (class < {k} rows → re-identifiable; < {l} distinct
    bands → attribute-disclosable even when k holds).

    Physical shape at 100 TB: two-level agg — (quasi, band) partial
    counts, then the class rollup — so no COUNT(DISTINCT) expand and
    ONE corpus shuffle on the quasi key; the report is
    class-cardinality-bounded."""
    c = _t(spark, sf, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.expr("CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)").alias("band"),
    )
    per_band = c.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count("*").cast("long").alias("nb")
    )
    cls = per_band.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("nb").cast("long").alias("class_size"),
        F.count("*").cast("long").alias("n_sensitive_values"),
    )
    return cls.select(
        "c_nationkey",
        "c_mktsegment",
        "class_size",
        "n_sensitive_values",
        (F.col("class_size") < _KANON_K).alias("k_violation"),
        (F.col("n_sensitive_values") < _KANON_L).alias("l_violation"),
    )


p11_k_anonymity.__doc__ = p11_k_anonymity.__doc__.format(k=_KANON_K, l=_KANON_L)

_KANON_SQL = f"""
WITH b AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS band
  FROM customer
), per_band AS (
  SELECT c_nationkey, c_mktsegment, band, CAST(COUNT(*) AS BIGINT) AS nb
  FROM b GROUP BY 1, 2, 3
)
SELECT c_nationkey, c_mktsegment,
       CAST(SUM(nb) AS BIGINT) AS class_size,
       CAST(COUNT(*) AS BIGINT) AS n_sensitive_values,
       SUM(nb) < {_KANON_K} AS k_violation,
       COUNT(*) < {_KANON_L} AS l_violation
FROM per_band GROUP BY c_nationkey, c_mktsegment
"""


# ---------------------------------------------------------------------------
# w19 — U-shaped (position-based) attribution
# ---------------------------------------------------------------------------


def w19_position_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """U-SHAPED (position-based) attribution — the rule-based companion
    of the Markov pair (w17 solves the chain, w18 computes removal
    effects; this is the 40/20/40 convention ad platforms publish): for
    every user whose journey reaches '{target}', the touches BEFORE the
    first conversion are credited 40% to the first touch, 40% to the
    last, and 20% split across the middles; 1-touch journeys get 100%,
    2-touch journeys 50/50.

    EXACT-integer discipline: credits are micro-units (1e6 per
    journey), the middle split is ``200000 DIV (n−2)`` with the
    remainder assigned to the EARLIEST middle touch — so per-channel
    sums are BIGINT-exact on both engines, with no order-dependent
    double folds and no per-channel collect (the anti-pattern a
    floating 0.2/(n−2) would force at 100 TB).

    Physical shape: one lag-free pass — the first-conversion cutoff is
    a per-user MIN (partial agg), touch ranks are windows PARTITIONED
    BY user (bounded by journey length), and the report is one
    |channels|-row agg."""
    from ..functions.event_time import event_time_us

    raw = _t(spark, sf, "events")
    ev = raw.select(
        "user_id",
        "event_id",
        "event_type",
        event_time_us(raw.schema).alias("ts_us"),
    )
    conv = (
        ev.filter(F.col("event_type") == _ABS_STATE)
        .groupBy("user_id")
        .agg(F.min(F.struct("ts_us", "event_id")).alias("cut"))
    )
    touches = (
        # conv is one row per CONVERTING USER — unbounded at corpus
        # scale, so no broadcast hint; the join is user_id-keyed and
        # AQE broadcast-converts when the cutoff relation actually fits
        ev.join(conv, "user_id")
        .filter(F.struct("ts_us", "event_id") < F.col("cut"))
        .select("user_id", "event_id", "event_type", "ts_us")
    )
    wa = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wd = Window.partitionBy("user_id").orderBy(F.col("ts_us").desc(), F.col("event_id").desc())
    wn = Window.partitionBy("user_id")
    credited = (
        touches.withColumn("rn", F.row_number().over(wa))
        .withColumn("rd", F.row_number().over(wd))
        .withColumn("n", F.count("*").over(wn))
        .withColumn(
            "micro",
            F.expr(
                "CASE WHEN n = 1 THEN 1000000"
                " WHEN n = 2 THEN 500000"
                " WHEN rn = 1 THEN 400000"
                " WHEN rd = 1 THEN 400000"
                " ELSE 200000 DIV (n - 2)"
                " + CASE WHEN rn = 2 THEN 200000 % (n - 2) ELSE 0 END END"
            ).cast("long"),
        )
    )
    tot = credited.agg(F.expr("SUM(micro)").cast("long").alias("t_micro"))
    return (
        credited.groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.expr("CAST(SUM(micro) AS BIGINT)").alias("micro_credit"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "n_touches",
            F.expr("ROUND(micro_credit / 1e6, 6)").alias("credit"),
            F.expr(
                "ROUND(CAST(micro_credit AS DOUBLE) / t_micro, 6)"
            ).alias("credit_share"),
        )
    )


w19_position_attribution.__doc__ = w19_position_attribution.__doc__.format(
    target=_ABS_STATE
)

_W19_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
), conv AS (
  SELECT user_id, MIN(ROW(ts_us, event_id)) AS cut
  FROM ev WHERE event_type = '{_ABS_STATE}' GROUP BY user_id
), touches AS (
  SELECT e.user_id, e.event_id, e.event_type, e.ts_us
  FROM ev e JOIN conv c USING (user_id)
  WHERE ROW(e.ts_us, e.event_id) < c.cut
), ranked AS (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts_us, event_id) AS rn,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts_us DESC, event_id DESC) AS rd,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM touches
), credited AS (
  SELECT event_type,
         CAST(CASE WHEN n = 1 THEN 1000000
                   WHEN n = 2 THEN 500000
                   WHEN rn = 1 THEN 400000
                   WHEN rd = 1 THEN 400000
                   ELSE 200000 // (n - 2)
                        + CASE WHEN rn = 2 THEN 200000 % (n - 2)
                               ELSE 0 END END AS BIGINT) AS micro
  FROM ranked
), tot AS (
  SELECT CAST(SUM(micro) AS BIGINT) AS t_micro FROM credited
)
SELECT event_type AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       ROUND(CAST(SUM(micro) AS BIGINT) / 1e6, 6) AS credit,
       ROUND(CAST(CAST(SUM(micro) AS BIGINT) AS DOUBLE) / t_micro, 6)
         AS credit_share
FROM credited, tot
GROUP BY event_type, t_micro
"""


# ---------------------------------------------------------------------------
# w20 — time-decay attribution
# ---------------------------------------------------------------------------

_W20_HALFLIFE_US = 7 * 24 * 3_600_000_000  # 7-day half-life (the ad-platform default)


def w20_time_decay_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """TIME-DECAY attribution — the fourth and last published
    attribution convention (w7 chain fit, w17 absorption, w18 removal
    effects, w19 position credit): each pre-conversion touch is
    weighted 2^(−Δt/halflife) by its distance to the journey's first
    '{target}' (halflife = 7 days), normalized per journey.

    Exactness: the decayed weights are doubles (identical POW
    expression trees both engines), but per-channel sums of raw double
    shares would be ORDER-DEPENDENT — so each journey's shares are
    quantized to integer micro-units (ROUND at 1e6) with the LAST touch
    (the largest weight) taking the rounding remainder, making every
    journey total exactly 1e6 and every channel sum BIGINT-exact.

    Physical shape: the w19 plan with one extra per-user window (the
    journey weight total) — no collects, no order-dependent folds."""
    from ..functions.event_time import event_time_us

    raw = _t(spark, sf, "events")
    ev = raw.select(
        "user_id",
        "event_id",
        "event_type",
        event_time_us(raw.schema).alias("ts_us"),
    )
    conv = (
        ev.filter(F.col("event_type") == _ABS_STATE)
        .groupBy("user_id")
        .agg(F.min(F.struct("ts_us", "event_id")).alias("cut"))
    )
    touches = (
        # conv is one row per CONVERTING USER — unbounded at corpus
        # scale, so no broadcast hint; the join is user_id-keyed and
        # AQE broadcast-converts when the cutoff relation actually fits
        ev.join(conv, "user_id")
        .filter(F.struct("ts_us", "event_id") < F.col("cut"))
        .select(
            "user_id",
            "event_id",
            "event_type",
            "ts_us",
            (F.col("cut.ts_us") - F.col("ts_us")).alias("dt_us"),
        )
        .withColumn(
            "w",
            F.expr(
                f"POW(CAST(2 AS DOUBLE),"
                f" -(CAST(dt_us AS DOUBLE) / {_W20_HALFLIFE_US}))"
            ),
        )
    )
    wu = Window.partitionBy("user_id")
    wd = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    wrest = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    credited = (
        touches.withColumn("wsum", F.sum("w").over(wu))
        .withColumn("rd", F.row_number().over(wd))
        # micro share, rounded; the last touch is reconstructed as the
        # journey remainder so totals are exactly 1e6
        .withColumn(
            "m_raw", F.expr("CAST(ROUND(1e6 * w / wsum) AS BIGINT)")
        )
        .withColumn("m_cum", F.sum("m_raw").over(wrest))
        .withColumn(
            "micro",
            F.expr(
                # GREATEST(0, ...) (round-9 ADVICE): on journeys long
                # enough (~>1400 touches) the other touches' ROUND()
                # overshoot can exceed the last touch's share; clamp so
                # no channel ever reports a negative credit.
                "CASE WHEN rd = 1 THEN GREATEST(CAST(0 AS BIGINT),"
                " 1000000 - (m_cum - m_raw)) ELSE m_raw END"
            ).cast("long"),
        )
    )
    tot = credited.agg(F.expr("SUM(micro)").cast("long").alias("t_micro"))
    return (
        credited.groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.expr("CAST(SUM(micro) AS BIGINT)").alias("micro_credit"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "n_touches",
            F.expr("ROUND(micro_credit / 1e6, 6)").alias("credit"),
            F.expr(
                "ROUND(CAST(micro_credit AS DOUBLE) / t_micro, 6)"
            ).alias("credit_share"),
        )
    )


w20_time_decay_attribution.__doc__ = w20_time_decay_attribution.__doc__.format(
    target=_ABS_STATE
)

_W20_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
), conv AS (
  -- the min (ts_us, event_id) tuple's ts component IS min(ts_us)
  SELECT user_id, MIN(ROW(ts_us, event_id)) AS cut, MIN(ts_us) AS cut_ts
  FROM ev WHERE event_type = '{_ABS_STATE}' GROUP BY user_id
), touches AS (
  SELECT e.user_id, e.event_id, e.event_type, e.ts_us,
         POW(CAST(2 AS DOUBLE),
             -(CAST(c.cut_ts - e.ts_us AS DOUBLE) / {_W20_HALFLIFE_US})) AS w
  FROM ev e JOIN conv c USING (user_id)
  WHERE ROW(e.ts_us, e.event_id) < c.cut
), shared AS (
  SELECT user_id, event_id, event_type, ts_us, w,
         SUM(w) OVER (PARTITION BY user_id) AS wsum,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts_us DESC, event_id DESC) AS rd
  FROM touches
), quantized AS (
  SELECT user_id, event_id, event_type, rd,
         CAST(ROUND(1e6 * w / wsum) AS BIGINT) AS m_raw,
         SUM(CAST(ROUND(1e6 * w / wsum) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_cum
  FROM shared
), credited AS (
  SELECT event_type,
         CAST(CASE WHEN rd = 1 THEN GREATEST(CAST(0 AS BIGINT),
                                             1000000 - (m_cum - m_raw))
                   ELSE m_raw END AS BIGINT) AS micro
  FROM quantized
), tot AS (
  SELECT CAST(SUM(micro) AS BIGINT) AS t_micro FROM credited
)
SELECT event_type AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       ROUND(CAST(SUM(micro) AS BIGINT) / 1e6, 6) AS credit,
       ROUND(CAST(CAST(SUM(micro) AS BIGINT) AS DOUBLE) / t_micro, 6)
         AS credit_share
FROM credited, tot
GROUP BY event_type, t_micro
"""


QUERIES: dict[str, QuerySpec] = {
    "w20_time_decay_attribution": QuerySpec(
        w20_time_decay_attribution,
        _W20_SQL,
        "beyond-reference: exponential time-decay attribution (the standard adtech decay model, cf. Shao & Li 2011; 7-day half-life, "
        "per-journey micro-unit quantization with the remainder on the last "
        "touch — BIGINT-exact channel sums)",
    ),
    "w19_position_attribution": QuerySpec(
        w19_position_attribution,
        _W19_SQL,
        "beyond-reference: U-shaped position-based attribution (40/20/40, the standard adtech multi-touch model, cf. Shao & Li 2011) "
        "with exact integer micro-credits — completes the attribution suite "
        "(w7 chain fit, w17 absorption, w18 removal effects)",
    ),
    "w17_markov_absorption": QuerySpec(
        w17_markov_absorption,
        _absorption_sql(),
        "beyond-reference: absorption probability on the w7 Markov chain "
        "(conversion modeling — the chain SOLVED, dense one-row fold; "
        "oracle = the same iteration unrolled as chained CTEs)",
    ),
    "w18_markov_removal": QuerySpec(
        w18_markov_removal,
        _removal_sql_build(),
        "beyond-reference: Markov removal effects (attribution) — the "
        "absorbing chain re-solved per deleted channel, K+1 one-row folds "
        "in one plan",
    ),
    "p11_k_anonymity": QuerySpec(
        p11_k_anonymity,
        _KANON_SQL,
        "beyond-reference privacy audit (the quantitative sibling of F13's "
        "PHI blocklist): k-anonymity + l-diversity per quasi-identifier "
        "class, two-level agg, no COUNT(DISTINCT) expand",
    ),
    "w4_sessionization": QuerySpec(w4_sessionization, _W4_SQL, "W-family extension: gap sessionization (training-pipeline event windowing)"),
    "w9_rolling_window_range": QuerySpec(
        w9_rolling_window_range,
        _W9_SQL,
        "W-family extension: event-time RANGE-frame rolling stats (burst/velocity features; SQL:2003 window frames)",
    ),
    "w10_session_stats": QuerySpec(
        w10_session_stats,
        _w10_sql(),
        "W-family composition: per-user behavior profile on top of the w4 sessionization relation "
        "(windows compose with aggs in one plan)",
    ),
    "w11_time_weighted_avg": QuerySpec(
        w11_time_weighted_avg,
        _W11_SQL,
        "W-family extension: time-weighted average (decimal-exact step-function TWAP)",
    ),
    "w12_interval_overlap": QuerySpec(
        w12_interval_overlap,
        _w12_sql(),
        "W-family extension: interval-overlap join (Allen 1983 interval algebra) via time bucketing "
        "(concurrency analysis; genomic-interval join shape)",
    ),
    "f23_json_props_rollup": QuerySpec(
        f23_json_props_rollup,
        _F23_SQL,
        "beyond-reference: semi-structured JSON property extraction (schema-on-read, cf. Melnik et al. 2010 Dremel) "
        "(schema-on-read from_json, codegen narrow map) + typed rollup",
    ),
    "w13_forward_fill": QuerySpec(
        w13_forward_fill,
        _W13_SQL,
        "W-family extension: forward fill / LOCF (last-observation-carried-forward, the longitudinal-study imputation standard, cf. Little & Rubin 1987; ignore-nulls running frame)",
    ),
    "w14_session_funnel": QuerySpec(
        w14_session_funnel,
        _w14_sql(),
        "W-family composition: ordered funnel per sessionization window (w4 gap rule ∘ w6 "
        "step MINs — within-visit conversion)",
    ),
    "w8_retention_cohorts": QuerySpec(
        w8_retention_cohorts,
        _W8_SQL,
        "W-family extension: cohort retention matrix (the standard product-analytics cohort table, cf. Kohavi et al. 2009 controlled experiments; one user_id shuffle, horizon-bounded state)",
    ),
    "w7_transition_matrix": QuerySpec(
        w7_transition_matrix,
        _W7_SQL,
        "W-family extension: first-order Markov transition matrix (one lag window, matrix-sized agg)",
    ),
    "w6_funnel_conversion": QuerySpec(
        w6_funnel_conversion,
        _w6_sql(),
        "W-family extension: ordered funnel conversion (the standard web-analytics funnel, MATCH_RECOGNIZE-class pattern in SQL 2016; per-step MIN agg, no window/self-join)",
    ),
    "w5_range_join_bucketed": QuerySpec(
        w5_range_join_bucketed,
        _W5_SQL,
        "W-family extension: bucketed range join (attribution window, composite-key skew split; the bucketed band-join idiom, cf. Koutris et al. 2018)",
    ),
    "a19_rollup_daily": QuerySpec(
        a19_rollup_daily,
        _A19_SQL,
        "beyond-reference: one-pass ROLLUP grouping sets (Gray et al. 1997; day × event_type subtotals)",
    ),
    "asof_join_attribution": QuerySpec(
        asof_join_attribution,
        _ASOF_SQL,
        "beyond-reference: as-of join (latest prior build row per probe; union+carry, one shuffle)",
    ),
    "p8_two_class_filter": QuerySpec(p8_two_class_filter, _P8_SQL, "P8 rules/table_filtering.smk:17-31"),
    "p9_min_frequency_filter": QuerySpec(p9_min_frequency_filter, _P9_SQL, "P9 rules/table_filtering.smk:1-15"),
    "a12_stepwise_retention": QuerySpec(a12_stepwise_retention, _A12_SQL, "A12 summary_code.txt:94-150 table_py"),
    "a15_pairwise_splits": QuerySpec(a15_pairwise_splits, _A15_SQL, "A15 rules/common.smk:13-77"),
    "a16_ordered_distinct": QuerySpec(a16_ordered_distinct, _A16_SQL, "A16 util.py:1114-1123"),
    "a9_distinct_runs": QuerySpec(a9_distinct_runs, _A9_SQL, "A9 util.py:409-411"),
    "a25_rollup_cube": QuerySpec(
        a25_rollup_cube,
        _A25_SQL,
        "beyond-reference: ROLLUP grouping sets (Gray et al. 1997 data cube; one Expand + one partial-agg "
        "shuffle for all subtotal levels) with exact micro-unit sums",
    ),
    "w15_seasonal_anomaly": QuerySpec(
        w15_seasonal_anomaly,
        _W15_SQL,
        "beyond-reference: seasonal (event_type × hour) 3σ anomaly flags (Shewhart 1931 control rule) with "
        "integer-exact moment arithmetic; baseline broadcast, narrow filter",
    ),
    "a17_stats_counters": QuerySpec(a17_stats_counters, _A17_SQL, "A17 config.py:174-177, spawn.py:239-259"),
    "f6_type_inference": QuerySpec(f6_type_inference, _F6_SQL, "F5/F6 util.py:505-550, 613-624"),
    "f10_alphabet_check": QuerySpec(f10_alphabet_check, _F10_SQL, "F10 validate.py:187-197"),
}
