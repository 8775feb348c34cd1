"""Deterministic cardinality sketch — KMV (k minimum values).

Corpus-scale pipelines need cheap cardinality estimates (vocabulary
size, join-key explosion checks, dedup-rate forecasting) BEFORE running
the expensive exact aggregation.  Spark's native ``approx_count_distinct``
(HyperLogLog++) and DuckDB's sketch differ by implementation, so their
estimates can never cross-check; KMV over md5 is engine-portable: hash
every value to a 48-bit fraction, keep the k smallest, and estimate
|distinct| ≈ (k−1) / m_k  where m_k is the k-th smallest fraction
(the classic bottom-k estimator: m_k ≈ k/(n+1) for n uniform draws).

Physical shape: md5 + one ``orderBy().limit(k)`` — TakeOrderedAndProject
(per-partition partial bottom-k merged on the driver), never a global
sort.  Estimate error is O(1/√k); k=1024 → ~3%.  All arithmetic is a
single division on identical doubles → bit-identical across engines,
which is what makes an ESTIMATOR oracle-checkable exactly.

Reference parity: the reference has no sketches (MySQL/pandas exact
everywhere, SURVEY §2.4 "no approximate aggregates") — this is part of
the beyond-reference 100 TB toolkit, next to dedup and sampling.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..testdata import table as _t
from . import QuerySpec

_K = 1024
_HEX = "0123456789abcdef"


def _frac48_expr(dialect: str, key: str) -> str:
    """md5(key) → uniform fraction in [0,1): value of the first 12 hex
    nibbles / 2⁴⁸ (48 bits keeps birthday collisions negligible far past
    10^9 distincts; every term widened to BIGINT before multiplying)."""
    pos = "instr" if dialect == "spark" else "strpos"
    terms = [
        f"CAST({pos}('{_HEX}', substr(md5({key}), {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (11 - i)}"
        for i in range(12)
    ]
    return f"(CAST({' + '.join(terms)} AS DOUBLE) / {float(2 ** 48)!r})"


def sketch_kmv_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Estimate the number of distinct (doc, token) incidence pairs — the
    quantity behind document-frequency tables and inverted-index sizing.
    Canonical KMV: if fewer than k unique hashes exist the sketch has
    seen every value and the estimate IS the exact count.  Output: one
    row (k, n_kept, est_distinct)."""
    d = _t(spark, sf, "documents")
    pair = (
        d.select(F.col("doc_id"), F.explode(F.split("text", " ")).alias("tok"))
        .select(F.concat_ws("|", F.col("doc_id").cast("string"), "tok").alias("pk"))
        .distinct()
    )
    frac = pair.select(F.expr(_frac48_expr("spark", "pk")).alias("f"))
    bottom = frac.orderBy("f").limit(_K)
    return bottom.agg(
        F.lit(_K).cast("long").alias("k"),
        F.count("*").alias("n_kept"),
        F.expr(
            f"ROUND(CASE WHEN COUNT(*) < {_K} THEN CAST(COUNT(*) AS DOUBLE)"
            f" ELSE ({_K} - 1) / MAX(f) END, 4)"
        ).alias("est_distinct"),
    )


_KMV_SQL = f"""
WITH pair AS (
  SELECT DISTINCT CAST(doc_id AS VARCHAR) || '|' || unnest(string_split(text, ' ')) AS pk
  FROM documents
), frac AS (
  SELECT {_frac48_expr('duck', 'pk')} AS f FROM pair
), bottom AS (
  SELECT f FROM frac ORDER BY f LIMIT {_K}
)
SELECT CAST({_K} AS BIGINT) AS k, COUNT(*) AS n_kept,
       ROUND(CASE WHEN COUNT(*) < {_K} THEN CAST(COUNT(*) AS DOUBLE)
             ELSE ({_K} - 1) / MAX(f) END, 4) AS est_distinct
FROM bottom
"""


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 64  # deliberately narrow so bucket collisions actually occur on
# the test vocabulary and the demo shows the sketch's one-sided error
# (est ≥ exact, overestimate bounded by ε·N with ε = e/width per row)
_CMS_TOPK = 20


def _cms_bucket(dialect: str, depth: str, key: str) -> str:
    """Row-``depth`` bucket of ``key``: first 8 hex nibbles of
    md5(depth:key) mod width — independent-enough rows from one digest
    family, portable across engines (md5 hex, never native hash())."""
    inner = (
        f"md5(concat(CAST({depth} AS STRING), ':', {key}))"
        if dialect == "spark"
        else f"md5(CAST({depth} AS VARCHAR) || ':' || {key})"
    )
    cast = (
        f"CAST(conv(substr({inner}, 1, 8), 16, 10) AS BIGINT)"
        if dialect == "spark"
        else f"CAST(('0x' || substr({inner}, 1, 8)) AS UBIGINT)::BIGINT"
    )
    return f"({cast} % {_CMS_WIDTH})"


def cms_counters(docs: DataFrame) -> DataFrame:
    """(row_id, bucket, c) count-min counter table over a documents
    relation — the mergeable sketch state: counter tables from DISJOINT
    document slices merge by per-cell SUM (linearity of counts).  Unlike
    the HLL registers' MAX merge, SUM is NOT idempotent, so a streaming
    store must key its writes by batch (see streaming/sketches.py).
    Shared by the batch operator's expressions and the streaming counter
    store."""
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    cnt = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    stacked = cnt.selectExpr(
        "cnt",
        "stack("
        + str(_CMS_DEPTH)
        + ", "
        + ", ".join(f"{r}, {_cms_bucket('spark', str(r), 'tok')}" for r in range(_CMS_DEPTH))
        + ") AS (row_id, bucket)",
    )
    return stacked.groupBy("row_id", "bucket").agg(F.sum("cnt").alias("c"))


def sketch_cms_heavy(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) frequency
    estimates for the exact top-k tokens, side-by-side with truth.

    Build: token counts → each token feeds ``depth`` (row, bucket)
    counters (sum of counts per bucket).  Estimate(tok) = MIN over rows
    of its bucket's counter — one-sided error (never underestimates).

    Physical shape at 100 TB: the counter table is depth×width rows
    (4×64 here — tiny at ANY corpus size; that fixed footprint is the
    whole point of the sketch) built by one partial-aggregated groupBy;
    the probe side joins the k query tokens against it BROADCAST.  The
    exact top-k used for comparison is itself a partial-agg count +
    TakeOrdered, never a global sort.  Output: (tok, exact_cnt,
    cms_est, overestimate)."""
    d = _t(spark, sf, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    cnt = toks.groupBy("tok").agg(F.count("*").alias("cnt")).localCheckpoint()
    # counter table: stack each token's count into its depth buckets
    stacked = cnt.selectExpr(
        "cnt",
        "stack("
        + str(_CMS_DEPTH)
        + ", "
        + ", ".join(f"{r}, {_cms_bucket('spark', str(r), 'tok')}" for r in range(_CMS_DEPTH))
        + ") AS (row_id, bucket)",
    )
    counters = stacked.groupBy("row_id", "bucket").agg(F.sum("cnt").alias("c"))
    top = (
        cnt.orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(_CMS_TOPK)
        .selectExpr(
            "tok",
            "cnt AS exact_cnt",
            "stack("
            + str(_CMS_DEPTH)
            + ", "
            + ", ".join(f"{r}, {_cms_bucket('spark', str(r), 'tok')}" for r in range(_CMS_DEPTH))
            + ") AS (row_id, bucket)",
        )
    )
    est = (
        top.join(F.broadcast(counters), ["row_id", "bucket"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.select(
        "tok",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overestimate"),
    )


def _cms_sql() -> str:
    buckets = lambda alias: " UNION ALL ".join(  # noqa: E731
        f"SELECT tok, {('exact_cnt' if alias == 'top' else 'cnt')} AS cnt, {r} AS row_id,"
        f" {_cms_bucket('duck', str(r), 'tok')} AS bucket FROM {alias}"
        for r in range(_CMS_DEPTH)
    )
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), cnt AS (
  SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
), stacked AS (
  {buckets('cnt')}
), counters AS (
  SELECT row_id, bucket, SUM(cnt) AS c FROM stacked GROUP BY row_id, bucket
), top AS (
  SELECT tok, cnt AS exact_cnt FROM cnt ORDER BY cnt DESC, tok ASC LIMIT {_CMS_TOPK}
), probe AS (
  {buckets('top')}
), est AS (
  SELECT p.tok, p.cnt AS exact_cnt, MIN(co.c) AS cms_est
  FROM probe p JOIN counters co ON p.row_id = co.row_id AND p.bucket = co.bucket
  GROUP BY p.tok, p.cnt
)
SELECT tok, exact_cnt, CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - exact_cnt AS BIGINT) AS overestimate
FROM est
"""


# ---------------------------------------------------------------------------
# HyperLogLog — portable registers, exact-decimal harmonic sum
# ---------------------------------------------------------------------------

_HLL_P = 8  # 2^8 = 256 registers; std error 1.04/√m ≈ 6.5%
_HLL_M = 1 << _HLL_P
_HLL_WBITS = 48  # rank source: the 48 bits after the bucket nibbles
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)  # Flajolet et al. 2007, m ≥ 128
# numerator folded once in Python: ×m² and ×2⁴⁹ are exact power-of-two
# scalings, and the single scientific-notation literal parses as DOUBLE in
# both engines (a chain of decimal literals would hit DuckDB's DECIMAL
# multiplication overflow)
_HLL_NUM = _HLL_ALPHA * _HLL_M * _HLL_M * float(2 ** 49)


def sketch_hll_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HyperLogLog cardinality of the (doc, token) incidence pairs —
    same quantity as :func:`sketch_kmv_distinct`, estimated from 256
    fixed registers instead of a bottom-k heap (HLL merges by register
    MAX, which is what makes it THE sketch for distributed/streaming
    distinct counts).

    Portability: native HLL implementations (Spark's HLL++ vs DuckDB's)
    can never cross-check, so registers are derived from md5 — bucket =
    first 2 hex nibbles, rank = leading zeros of the next 48 bits + 1
    (computed as 49 − length(bin(w)), identical in both engines).  The
    harmonic denominator Σ 2^(−M_j) is rescaled by 2^49 into an EXACT
    integer sum (DECIMAL(38,0)/HUGEINT — every term 2^(49−M) is an
    integer since M ≤ 49), so the one double division at the end is an
    exactly-rounded op on identical inputs → bit-identical estimate.
    The ln-based small-range (linear-counting) correction is a
    documented seam: ln() is only 1-ulp portable, and at every test SF
    the true count ≫ 2.5 m, where raw HLL needs no correction; n_zero
    is emitted so a caller can apply their own LC.

    Physical shape at 100 TB: one partial-agg shuffle to 256 register
    rows (MAX combines map-side), then a single-row final agg — the
    sketch state is 256 integers no matter the corpus size.
    """
    return hll_estimate_from_regs(hll_registers(_t(spark, sf, "documents")))


def hll_registers(docs: DataFrame) -> DataFrame:
    """(bucket, m_j) HLL registers over a documents relation — the
    mergeable sketch state: registers from disjoint (or overlapping!)
    slices combine by per-bucket MAX, which is idempotent and monotone,
    so replays and re-merges can never corrupt the estimate.  Shared by
    the batch operator and the streaming register store."""
    pair = (
        docs.select(F.col("doc_id"), F.explode(F.split("text", " ")).alias("tok"))
        .select(F.concat_ws("|", F.col("doc_id").cast("string"), "tok").alias("pk"))
    )
    hx = pair.selectExpr("md5(pk) AS h")
    br = hx.selectExpr(
        f"CAST(conv(substr(h, 1, 2), 16, 10) AS BIGINT) AS bucket",
        f"CAST(conv(substr(h, 3, {_HLL_WBITS // 4}), 16, 10) AS BIGINT) AS w",
    ).selectExpr(
        "bucket",
        f"CASE WHEN w = 0 THEN {_HLL_WBITS + 1} ELSE {_HLL_WBITS} - length(bin(w)) + 1 END AS rank",
    )
    return br.groupBy("bucket").agg(F.max("rank").alias("m_j"))


def hll_estimate_from_regs(regs: DataFrame) -> DataFrame:
    """One-row (m, n_nonzero, n_zero, est_distinct) from a register
    relation, by the exact-decimal harmonic sum."""
    return regs.agg(
        F.lit(_HLL_M).cast("long").alias("m"),
        F.count("*").alias("n_nonzero"),
        (F.lit(_HLL_M).cast("long") - F.count("*")).alias("n_zero"),
        F.expr(
            f"ROUND({_HLL_NUM!r}"
            f" / CAST(SUM(CAST(shiftleft(CAST(1 AS BIGINT), 49 - m_j) AS DECIMAL(38,0)))"
            f"   + CAST({_HLL_M} - COUNT(*) AS DECIMAL(38,0)) * {2 ** 49} AS DOUBLE), 4)"
        ).alias("est_distinct"),
    )


_HLL_SQL = f"""
WITH pair AS (
  SELECT CAST(doc_id AS VARCHAR) || '|' || unnest(string_split(text, ' ')) AS pk
  FROM documents
), hx AS (
  SELECT md5(pk) AS h FROM pair
), br AS (
  SELECT CAST(('0x' || substr(h, 1, 2)) AS UBIGINT)::BIGINT AS bucket,
         CAST(('0x' || substr(h, 3, {_HLL_WBITS // 4})) AS UBIGINT)::BIGINT AS w
  FROM hx
), ranked AS (
  SELECT bucket,
         CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
              ELSE {_HLL_WBITS} - length(bin(w)) + 1 END AS rank
  FROM br
), regs AS (
  SELECT bucket, MAX(rank) AS m_j FROM ranked GROUP BY bucket
)
SELECT CAST({_HLL_M} AS BIGINT) AS m,
       COUNT(*) AS n_nonzero,
       CAST({_HLL_M} AS BIGINT) - COUNT(*) AS n_zero,
       ROUND({_HLL_NUM!r}
             / CAST(SUM(CAST(1::BIGINT << (49 - m_j) AS HUGEINT))
               + CAST({_HLL_M} - COUNT(*) AS HUGEINT) * CAST({2 ** 49} AS HUGEINT) AS DOUBLE), 4) AS est_distinct
FROM regs
"""


# ---------------------------------------------------------------------------
# KMV set-operation estimates (theta-sketch style union/intersection/Jaccard)
# ---------------------------------------------------------------------------


def sketch_kmv_setops(spark: SparkSession, sf: str) -> DataFrame:
    """Set-operation estimates between two corpus halves WITHOUT the
    exact distinct-join: KMV sketches compose (Beyer et al. 2007 /
    theta-sketch): the bottom-k of A∪B is computable from each side's
    bottom-k, the k-th smallest union hash gives |A∪B| ≈ (k−1)/m_k, and
    the fraction of those k union-minima present in BOTH sides
    estimates Jaccard; intersection = Ĵ·|A∪B|.  This is the sketch
    behind "how much would merging these two crawls deduplicate?" —
    answered from two k-row sketch states instead of a corpus-scale
    distinct join.

    Elements are word-3-gram shingles; side A = even doc_ids, side B =
    odd.  Physical shape at 100 TB: per-side distinct (one shuffle on
    uniform (side, shingle) keys collapsed by the groupBy on shingle
    with per-side presence flags), then TakeOrderedAndProject keeps the
    k smallest hashes — per-partition partial bottom-k, never a global
    sort; the final agg runs on k rows.  The estimator arithmetic is
    two divisions on identical doubles → the ESTIMATE is oracle-exact.
    """
    d = _t(spark, sf, "documents").select(
        "doc_id", F.split("text", " ").alias("toks"), (F.col("doc_id") % 2 == 0).alias("in_a")
    )
    sh = d.filter(F.size("toks") >= 3).select(
        "in_a",
        F.expr(
            "explode(transform(sequence(1, size(toks) - 2),"
            " i -> concat(toks[i-1], ' ', toks[i], ' ', toks[i+1])))"
        ).alias("shingle"),
    )
    flags = sh.groupBy("shingle").agg(
        F.max(F.when(F.col("in_a"), 1).otherwise(0)).alias("a"),
        F.max(F.when(~F.col("in_a"), 1).otherwise(0)).alias("b"),
    )
    frac = flags.select("a", "b", F.expr(_frac48_expr("spark", "shingle")).alias("f"))
    bottom = frac.orderBy("f").limit(_K)
    return bottom.agg(
        F.lit(_K).cast("long").alias("k"),
        F.count("*").alias("n_kept"),
        F.sum(F.expr("a * b")).cast("long").alias("k_both"),
        F.expr(
            f"ROUND(CASE WHEN COUNT(*) < {_K} THEN CAST(COUNT(*) AS DOUBLE)"
            f" ELSE ({_K} - 1) / MAX(f) END, 4)"
        ).alias("est_union"),
        F.expr("ROUND(CAST(SUM(a * b) AS DOUBLE) / COUNT(*), 6)").alias("est_jaccard"),
        F.expr(
            f"ROUND((CAST(SUM(a * b) AS DOUBLE) / COUNT(*))"
            f" * (CASE WHEN COUNT(*) < {_K} THEN CAST(COUNT(*) AS DOUBLE)"
            f"     ELSE ({_K} - 1) / MAX(f) END), 4)"
        ).alias("est_intersection"),
    )


_KMV_SETOPS_SQL = f"""
WITH d AS (
  SELECT doc_id % 2 = 0 AS in_a, string_split(text, ' ') AS toks FROM documents
), sh AS (
  SELECT in_a, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM (SELECT in_a, toks, UNNEST(range(1, len(toks) - 1)) AS i FROM d
        WHERE len(toks) >= 3)
), flags AS (
  SELECT shingle,
         MAX(CASE WHEN in_a THEN 1 ELSE 0 END) AS a,
         MAX(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS b
  FROM sh GROUP BY shingle
), frac AS (
  SELECT a, b, {_frac48_expr('duck', 'shingle')} AS f FROM flags
), bottom AS (
  SELECT a, b, f FROM frac ORDER BY f LIMIT {_K}
)
SELECT CAST({_K} AS BIGINT) AS k, COUNT(*) AS n_kept,
       CAST(SUM(a * b) AS BIGINT) AS k_both,
       ROUND(CASE WHEN COUNT(*) < {_K} THEN CAST(COUNT(*) AS DOUBLE)
             ELSE ({_K} - 1) / MAX(f) END, 4) AS est_union,
       ROUND(CAST(SUM(a * b) AS DOUBLE) / COUNT(*), 6) AS est_jaccard,
       ROUND((CAST(SUM(a * b) AS DOUBLE) / COUNT(*))
             * (CASE WHEN COUNT(*) < {_K} THEN CAST(COUNT(*) AS DOUBLE)
                ELSE ({_K} - 1) / MAX(f) END), 4) AS est_intersection
FROM bottom
"""


def sketch_hll_by_group(spark: SparkSession, sf: str) -> DataFrame:
    """Per-SOURCE distinct-(doc,token) estimates from grouped HLL
    registers — the sketch as a GROUPED aggregate: per-group register
    sets merge by (group, bucket) MAX, so per-source sketches roll up
    to the global one (or any grouping-set level) without rescanning —
    the property that makes sketch columns cube-able in a warehouse.

    Physical shape at 100 TB: one partial-agg shuffle to
    |groups|×256 register rows, then a per-group single-row agg.  Same
    exact-decimal harmonic sum as the global operator → oracle-exact."""
    d = _t(spark, sf, "documents")
    pair = d.select(
        "source", "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).select(
        "source",
        F.concat_ws("|", F.col("doc_id").cast("string"), "tok").alias("pk"),
    )
    br = pair.selectExpr("source", "md5(pk) AS h").selectExpr(
        "source",
        "CAST(conv(substr(h, 1, 2), 16, 10) AS BIGINT) AS bucket",
        f"CAST(conv(substr(h, 3, {_HLL_WBITS // 4}), 16, 10) AS BIGINT) AS w",
    ).selectExpr(
        "source",
        "bucket",
        f"CASE WHEN w = 0 THEN {_HLL_WBITS + 1} ELSE {_HLL_WBITS} - length(bin(w)) + 1 END AS rank",
    )
    regs = br.groupBy("source", "bucket").agg(F.max("rank").alias("m_j"))
    return regs.groupBy("source").agg(
        F.count("*").alias("n_nonzero"),
        F.expr(
            f"ROUND({_HLL_NUM!r}"
            f" / CAST(SUM(CAST(shiftleft(CAST(1 AS BIGINT), 49 - m_j) AS DECIMAL(38,0)))"
            f"   + CAST({_HLL_M} - COUNT(*) AS DECIMAL(38,0)) * {2 ** 49} AS DOUBLE), 4)"
        ).alias("est_distinct"),
    )


_HLL_GROUP_SQL = f"""
WITH pair AS (
  SELECT source,
         CAST(doc_id AS VARCHAR) || '|' || unnest(string_split(text, ' ')) AS pk
  FROM documents
), br AS (
  SELECT source,
         CAST(('0x' || substr(md5(pk), 1, 2)) AS UBIGINT)::BIGINT AS bucket,
         CAST(('0x' || substr(md5(pk), 3, {_HLL_WBITS // 4})) AS UBIGINT)::BIGINT AS w
  FROM pair
), ranked AS (
  SELECT source, bucket,
         CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
              ELSE {_HLL_WBITS} - length(bin(w)) + 1 END AS rank
  FROM br
), regs AS (
  SELECT source, bucket, MAX(rank) AS m_j FROM ranked GROUP BY source, bucket
)
SELECT source, COUNT(*) AS n_nonzero,
       ROUND({_HLL_NUM!r}
             / CAST(SUM(CAST(1::BIGINT << (49 - m_j) AS HUGEINT))
               + CAST({_HLL_M} - COUNT(*) AS HUGEINT) * CAST({2 ** 49} AS HUGEINT) AS DOUBLE), 4)
         AS est_distinct
FROM regs GROUP BY source
"""

_HLL_WIN = 3  # sliding window width in hours


def w16_sliding_distinct_hll(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window distinct-USER estimates from hour-bucketed HLL
    registers: per absolute hour, build the 256-register sketch of
    md5(user_id); a {w}-hour window's sketch is then the register-wise
    MAX of its member hours — sketches MERGE, events are never
    rescanned per window.  This is the property that makes sketch
    columns the right representation for rolling dashboards at 100 TB:
    one event pass builds hours × 256 register rows, and any window
    (sliding, session-aligned, calendar) folds them associatively.

    Window w covers hours [w, w+{w0}]; every window with at least one
    member hour reports (n_hours, n_nonzero registers, estimate).
    Estimates use the exact-decimal harmonic sum shared with the gated
    HLL operators — oracle-exact, not approximately equal."""
    from ..functions.event_time import event_time_us

    raw = _t(spark, sf, "events")
    ev = raw.select(
        (event_time_us(raw.schema) / F.lit(3_600_000_000)).cast("long").alias("h"),
        F.expr("md5(CAST(user_id AS STRING))").alias("hh"),
    )
    br = ev.selectExpr(
        "h",
        "CAST(conv(substr(hh, 1, 2), 16, 10) AS BIGINT) AS bucket",
        f"CAST(conv(substr(hh, 3, {_HLL_WBITS // 4}), 16, 10) AS BIGINT) AS w",
    ).selectExpr(
        "h",
        "bucket",
        f"CASE WHEN w = 0 THEN {_HLL_WBITS + 1} ELSE {_HLL_WBITS} - length(bin(w)) + 1 END AS rank",
    )
    hour_regs = br.groupBy("h", "bucket").agg(F.max("rank").alias("m_j"))
    win = hour_regs.select(
        F.expr(f"explode(transform(sequence(0, {_HLL_WIN - 1}), k -> h - k))").alias(
            "win_start_hour"
        ),
        "h",
        "bucket",
        "m_j",
    )
    regs = win.groupBy("win_start_hour", "bucket").agg(F.max("m_j").alias("m_j"))
    hours = (
        win.select("win_start_hour", "h")
        .distinct()
        .groupBy("win_start_hour")
        .agg(F.count("*").cast("long").alias("n_hours"))
    )
    # small-range (linear-counting) correction — Flajolet et al. 2007:
    # the raw harmonic estimator saturates near ~0.7·m for tiny
    # cardinalities (a 2-user window reads ~185 with m=256); when the raw
    # estimate is ≤ 2.5·m and empty registers remain, m·ln(m/V) is the
    # published replacement.  The gated global/grouped HLL entries never
    # enter this regime at fixture scale; sliding windows do.
    raw = (
        f"{_HLL_NUM!r}"
        f" / CAST(SUM(CAST(shiftleft(CAST(1 AS BIGINT), 49 - m_j) AS DECIMAL(38,0)))"
        f"   + CAST({_HLL_M} - COUNT(*) AS DECIMAL(38,0)) * {2 ** 49} AS DOUBLE)"
    )
    est = regs.groupBy("win_start_hour").agg(
        F.count("*").cast("long").alias("n_nonzero"),
        F.expr(
            f"ROUND(CASE WHEN ({raw}) <= 2.5 * {_HLL_M} AND COUNT(*) < {_HLL_M}"
            f" THEN {_HLL_M} * LN(CAST({_HLL_M} AS DOUBLE)"
            f" / CAST({_HLL_M} - COUNT(*) AS DOUBLE))"
            f" ELSE ({raw}) END, 4)"
        ).alias("est_distinct"),
    )
    return est.join(hours, "win_start_hour")


w16_sliding_distinct_hll.__doc__ = w16_sliding_distinct_hll.__doc__.format(
    w=_HLL_WIN, w0=_HLL_WIN - 1
)

_HLL_SLIDE_SQL = f"""
WITH ev AS (
  SELECT epoch_us(ts) // 3600000000 AS h, md5(CAST(user_id AS VARCHAR)) AS hh
  FROM events
), br AS (
  SELECT h,
         CAST(('0x' || substr(hh, 1, 2)) AS UBIGINT)::BIGINT AS bucket,
         CAST(('0x' || substr(hh, 3, {_HLL_WBITS // 4})) AS UBIGINT)::BIGINT AS w
  FROM ev
), ranked AS (
  SELECT h, bucket,
         CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
              ELSE {_HLL_WBITS} - length(bin(w)) + 1 END AS rank
  FROM br
), hour_regs AS (
  SELECT h, bucket, MAX(rank) AS m_j FROM ranked GROUP BY h, bucket
), win AS (
  SELECT h - k AS win_start_hour, h, bucket, m_j
  FROM hour_regs, UNNEST(range(0, {_HLL_WIN})) AS t(k)
), regs AS (
  SELECT win_start_hour, bucket, MAX(m_j) AS m_j
  FROM win GROUP BY win_start_hour, bucket
), hours AS (
  SELECT win_start_hour, CAST(COUNT(*) AS BIGINT) AS n_hours
  FROM (SELECT DISTINCT win_start_hour, h FROM win) GROUP BY win_start_hour
)
SELECT r.win_start_hour, CAST(COUNT(*) AS BIGINT) AS n_nonzero,
       ROUND(CASE WHEN ({_HLL_NUM!r}
             / CAST(SUM(CAST(1::BIGINT << (49 - m_j) AS HUGEINT))
               + CAST({_HLL_M} - COUNT(*) AS HUGEINT) * CAST({2 ** 49} AS HUGEINT) AS DOUBLE))
             <= 2.5 * {_HLL_M} AND COUNT(*) < {_HLL_M}
         THEN {_HLL_M} * LN(CAST({_HLL_M} AS DOUBLE)
                            / CAST({_HLL_M} - COUNT(*) AS DOUBLE))
         ELSE ({_HLL_NUM!r}
             / CAST(SUM(CAST(1::BIGINT << (49 - m_j) AS HUGEINT))
               + CAST({_HLL_M} - COUNT(*) AS HUGEINT) * CAST({2 ** 49} AS HUGEINT) AS DOUBLE))
         END, 4) AS est_distinct,
       MAX(hrs.n_hours) AS n_hours
FROM regs r JOIN hours hrs USING (win_start_hour)
GROUP BY r.win_start_hour
"""


# ---------------------------------------------------------------------------
# KMV overlap matrix — all-pairs source overlap from ONE bottom-k sample
# ---------------------------------------------------------------------------


def sketch_kmv_overlap_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Pairwise shingle-overlap estimates for EVERY source pair — "which
    crawls duplicate each other, and by how much?" — from a single
    global bottom-k sample (theta-sketch subset estimation: within the
    k smallest hashes of the all-source union, θ = the k-th hash; any
    subset S of the universe is estimated |S| ≈ |S ∩ sample| / θ).
    Extends ``sketch_kmv_setops`` (one fixed A/B split) to the G×G
    matrix: each sampled shingle carries its sorted source-membership
    set, so ALL pairs read off the same k rows — no per-pair rescan, no
    corpus-scale distinct join, and adding a source never changes the
    sample, only the membership arrays.

    Physical shape at 100 TB: one shuffle on uniform shingle keys (the
    groupBy collapsing per-source presence into a sorted array), one
    TakeOrderedAndProject bottom-k (per-partition partials, no global
    sort), then a G²-row broadcast pair join against k rows.  Under
    saturation (fewer than k distinct shingles) the sample IS the
    universe and the estimates pin to exact set arithmetic — the same
    branch discipline as the KMV set-ops and CC savings operators."""
    d = _t(spark, sf, "documents").select(
        "source", F.split("text", " ").alias("toks")
    )
    sh = d.filter(F.size("toks") >= 3).select(
        "source",
        F.expr(
            "explode(transform(sequence(1, size(toks) - 2),"
            " i -> concat(toks[i-1], ' ', toks[i], ' ', toks[i+1])))"
        ).alias("shingle"),
    )
    members = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_set("source")).alias("srcs")
    )
    frac = members.select("srcs", F.expr(_frac48_expr("spark", "shingle")).alias("f"))
    bottom = frac.orderBy("f").limit(_K).localCheckpoint()
    # θ and saturation flag: 1 row, broadcast into the pair probe
    theta = bottom.agg(
        F.count("*").alias("n_kept"), F.max("f").alias("theta")
    )
    srcs = d.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("src_a"))
        .join(srcs.select(F.col("source").alias("src_b")), F.col("src_a") < F.col("src_b"))
    )
    probe = pairs.join(F.broadcast(bottom), how="cross").select(
        "src_a",
        "src_b",
        F.expr("CAST(array_contains(srcs, src_a) OR array_contains(srcs, src_b) AS INT)").alias("u"),
        F.expr("CAST(array_contains(srcs, src_a) AND array_contains(srcs, src_b) AS INT)").alias("i"),
    )
    agg = probe.groupBy("src_a", "src_b").agg(
        F.sum("u").cast("long").alias("n_pair_sample"),
        F.sum("i").cast("long").alias("n_both"),
    )
    return (
        agg.join(F.broadcast(theta), how="cross")
        .select(
            "src_a",
            "src_b",
            "n_pair_sample",
            "n_both",
            F.expr(
                "ROUND(CASE WHEN n_pair_sample = 0 THEN 0.0"
                " ELSE CAST(n_both AS DOUBLE) / n_pair_sample END, 6)"
            ).alias("est_jaccard"),
            F.expr(
                f"ROUND(CASE WHEN n_kept < {_K} THEN CAST(n_pair_sample AS DOUBLE)"
                " ELSE n_pair_sample / theta END, 4)"
            ).alias("est_union"),
            F.expr(
                f"ROUND(CASE WHEN n_kept < {_K} THEN CAST(n_both AS DOUBLE)"
                " ELSE n_both / theta END, 4)"
            ).alias("est_intersection"),
        )
        .orderBy("src_a", "src_b")
    )


_KMV_MATRIX_SQL = f"""
WITH d AS (
  SELECT source, string_split(text, ' ') AS toks FROM documents
), sh AS (
  SELECT source, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM (SELECT source, toks, UNNEST(range(1, len(toks) - 1)) AS i FROM d
        WHERE len(toks) >= 3)
), members AS (
  SELECT shingle, list_sort(list(DISTINCT source)) AS srcs FROM sh GROUP BY shingle
), frac AS (
  SELECT srcs, {_frac48_expr('duck', 'shingle')} AS f FROM members
), bottom AS (
  SELECT srcs, f FROM frac ORDER BY f LIMIT {_K}
), theta AS (
  SELECT COUNT(*) AS n_kept, MAX(f) AS theta FROM bottom
), srcs_t AS (
  SELECT DISTINCT source FROM d
), pairs AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM srcs_t a JOIN srcs_t b ON a.source < b.source
), probe AS (
  SELECT src_a, src_b,
         CAST(list_contains(srcs, src_a) OR list_contains(srcs, src_b) AS INT) AS u,
         CAST(list_contains(srcs, src_a) AND list_contains(srcs, src_b) AS INT) AS i
  FROM pairs, bottom
), agg AS (
  SELECT src_a, src_b, CAST(SUM(u) AS BIGINT) AS n_pair_sample,
         CAST(SUM(i) AS BIGINT) AS n_both
  FROM probe GROUP BY 1, 2
)
SELECT src_a, src_b, n_pair_sample, n_both,
       ROUND(CASE WHEN n_pair_sample = 0 THEN 0.0
             ELSE CAST(n_both AS DOUBLE) / n_pair_sample END, 6) AS est_jaccard,
       ROUND(CASE WHEN n_kept < {_K} THEN CAST(n_pair_sample AS DOUBLE)
             ELSE n_pair_sample / theta END, 4) AS est_union,
       ROUND(CASE WHEN n_kept < {_K} THEN CAST(n_both AS DOUBLE)
             ELSE n_both / theta END, 4) AS est_intersection
FROM agg, theta
ORDER BY src_a, src_b
"""


# ---------------------------------------------------------------------------
# histogram quantile sketch — fixed-bin mergeable quantile estimates
# ---------------------------------------------------------------------------

_HQ_BINS = 64
_HQ_PCTS = (50, 90, 99)


def sketch_hist_quantile(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable quantile estimates from a fixed-width histogram: per
    event type, p50/p90/p99 of ``value`` estimated by linear
    interpolation inside the covering bin, with the sketch's
    deterministic worst-case error bound (one bin width) as a column.

    This is the quantile member of the sketch quartet (KMV cardinality,
    HLL registers, CMS counters, histogram quantiles): where
    ``a18_quantile_profile`` computes EXACT interpolated quantiles via a
    cumulative window over the per-group DISTINCT VALUES — state bounded
    by value cardinality, which for continuous doubles approaches row
    count — the histogram's state is ``groups × 64`` counters at ANY
    corpus size, and two partial SUMs merge sketches built on disjoint
    shards (the streaming twin in ``streaming/quantile.py`` replays the
    same bins from a batch-keyed count store).

    Physical shape at 100 TB: one groupBy(grp) min/max/count (tiny,
    broadcast back), one groupBy(grp, bin) partial-agg count (the ONLY
    data-scale shuffle), then windows and joins over ≤64 rows per group.
    Determinism: values quantize to exact micro-units; bin index is pure
    integer arithmetic ((v−lo)·B div W, W = hi−lo+1, always in [0,B));
    the interpolated estimate applies ONE identical pinned-order double
    expression to exact integers on both engines.  Spark's own
    ``approx_percentile`` (KLL-style) is deliberately not used: its
    merge order is nondeterministic and no external oracle can
    reproduce it — this sketch is oracle-exact."""
    ev = hist_values(_t(spark, sf, "events"))
    # both intermediates are tiny (groups, groups×64 rows) but feed the
    # plan 2-3 times each — localCheckpoint truncates the lineage so the
    # events scan and the bin-count shuffle run ONCE, not per consumer
    bounds = (
        ev.groupBy("grp")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .localCheckpoint()
    )
    binned = hist_bin_counts(ev, bounds).localCheckpoint()
    return hist_quantiles_from_counts(binned, bounds)


def hist_values(events: DataFrame) -> DataFrame:
    """(grp, v): event values quantized to exact micro-unit BIGINTs."""
    return events.select(
        F.col("event_type").alias("grp"),
        F.expr("CAST(CAST(ROUND(value * 1000000) AS DECIMAL(18,0)) AS BIGINT)").alias("v"),
    )


def hist_bin_counts(ev: DataFrame, bounds: DataFrame) -> DataFrame:
    """(grp, bin, c) against the given per-group (lo, hi) micro-unit
    domain.  In-domain values land in [0, B) by pure integer arithmetic;
    out-of-domain values (possible when the domain is PINNED, as the
    streaming store requires) clamp into the edge bins, trading the
    one-bin error bound for boundedness — the batch operator derives the
    domain from the data, so nothing clamps there."""
    return (
        ev.join(F.broadcast(bounds.select("grp", "lo", "hi")), "grp")
        .select(
            "grp",
            F.expr(
                f"GREATEST(0L, LEAST({_HQ_BINS - 1}L, (v - lo) * {_HQ_BINS} div (hi - lo + 1)))"
            ).alias("bin"),
        )
        .groupBy("grp", "bin")
        .agg(F.count("*").alias("c"))
    )


def hist_quantiles_from_counts(binned: DataFrame, bounds: DataFrame) -> DataFrame:
    """Quantile estimates from a (grp, bin, c) counter table — the merge
    target shared by the batch operator and the streaming store (counts
    are linear, so shard/batch sums reproduce the global table exactly).
    n is derived from the counters, never trusted from the caller."""
    w = Window.partitionBy("grp").orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cdf = binned.withColumn("cum", F.sum("c").over(w)).withColumn(
        "cum_prev", F.col("cum") - F.col("c")
    )
    n = binned.groupBy("grp").agg(F.sum("c").alias("n"))
    targets = (
        bounds.join(n, "grp")
        .select(
            "grp",
            "lo",
            "hi",
            "n",
            F.explode(F.array(*[F.lit(p) for p in _HQ_PCTS])).alias("p"),
        )
        .withColumn("r", F.expr("(p * n + 99) div 100"))
    )
    cand = (
        cdf.join(F.broadcast(targets), "grp")
        .where(F.col("cum") >= F.col("r"))
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("grp", "p").orderBy("bin"))
        )
        .where(F.col("rn") == 1)
    )
    # pinned-order interpolation on exact integers; /1e6 restores units
    est = (
        "CAST(lo AS DOUBLE) / 1000000.0"
        " + (CAST(bin AS DOUBLE) + CAST(r - cum_prev AS DOUBLE) / CAST(c AS DOUBLE))"
        f" * (CAST(hi - lo + 1 AS DOUBLE) / 1000000.0) / {float(_HQ_BINS)!r}"
    )
    err = f"(CAST(hi - lo + 1 AS DOUBLE) / 1000000.0) / {float(_HQ_BINS)!r}"
    return (
        cand.select(
            "grp",
            F.col("n").cast("long").alias("n"),
            F.col("p").cast("long").alias("p"),
            F.expr(est).alias("est"),
            F.expr(err).alias("err_bound"),
        )
        .orderBy("grp", "p")
    )


_HQ_SQL = f"""
WITH ev AS (
  SELECT event_type AS grp,
         CAST(CAST(ROUND(value * 1000000) AS DECIMAL(18,0)) AS BIGINT) AS v
  FROM events
), bounds AS (
  SELECT grp, MIN(v) AS lo, MAX(v) AS hi, COUNT(*) AS n FROM ev GROUP BY grp
), binned AS (
  SELECT ev.grp, (v - lo) * {_HQ_BINS} // (hi - lo + 1) AS bin, COUNT(*) AS c
  FROM ev JOIN bounds ON ev.grp = bounds.grp
  GROUP BY 1, 2
), cdf AS (
  SELECT grp, bin, c,
         SUM(c) OVER (PARTITION BY grp ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM binned
), targets AS (
  SELECT grp, lo, hi, n, p, (p * n + 99) // 100 AS r
  FROM bounds, (SELECT unnest({list(_HQ_PCTS)!r}) AS p)
), cand AS (
  SELECT cdf.grp, t.n, t.p, cdf.bin, cdf.c, cdf.cum - cdf.c AS cum_prev, t.r, t.lo, t.hi,
         ROW_NUMBER() OVER (PARTITION BY cdf.grp, t.p ORDER BY cdf.bin) AS rn
  FROM cdf JOIN targets t ON cdf.grp = t.grp
  WHERE cdf.cum >= t.r
)
SELECT grp, CAST(n AS BIGINT) AS n, CAST(p AS BIGINT) AS p,
       CAST(lo AS DOUBLE) / 1000000.0
         + (CAST(bin AS DOUBLE) + CAST(r - cum_prev AS DOUBLE) / CAST(c AS DOUBLE))
           * (CAST(hi - lo + 1 AS DOUBLE) / 1000000.0) / {float(_HQ_BINS)!r} AS est,
       (CAST(hi - lo + 1 AS DOUBLE) / 1000000.0) / {float(_HQ_BINS)!r} AS err_bound
FROM cand WHERE rn = 1
ORDER BY grp, p
"""


QUERIES: dict[str, QuerySpec] = {
    "sketch_kmv_overlap_matrix": QuerySpec(
        sketch_kmv_overlap_matrix,
        _KMV_MATRIX_SQL,
        "beyond-reference: all-pairs source overlap matrix from ONE global "
        "bottom-k KMV sample (theta-sketch subset estimation, Dasgupta et al. 2016; exact-arithmetic "
        "branch under saturation)",
    ),
    "sketch_hist_quantile": QuerySpec(
        sketch_hist_quantile,
        _HQ_SQL,
        "beyond-reference: fixed-bin histogram quantile sketch (bounded-memory quantiles, cf. Greenwald-Khanna 2001) — groups×64 "
        "counter state at any corpus size, pinned-order interpolation, "
        "deterministic one-bin error bound (the mergeable counterpart of "
        "a18's exact CDF quantiles)",
    ),
    "w16_sliding_distinct_hll": QuerySpec(
        w16_sliding_distinct_hll,
        _HLL_SLIDE_SQL,
        "beyond-reference: sliding-window distinct-user estimates from "
        "hour-bucketed HLL registers — register MAX is associative, so "
        "windows MERGE sketches instead of rescanning events",
    ),
    "sketch_hll_by_group": QuerySpec(
        sketch_hll_by_group,
        _HLL_GROUP_SQL,
        "beyond-reference: GROUPED HyperLogLog — per-source register sets, "
        "mergeable to any rollup level without rescanning",
    ),
    "sketch_kmv_setops": QuerySpec(
        sketch_kmv_setops,
        _KMV_SETOPS_SQL,
        "beyond-reference: KMV/theta-sketch set operations — union/Jaccard/intersection "
        "estimates from bottom-k states, no corpus-scale distinct join",
    ),
    "sketch_kmv_distinct": QuerySpec(
        sketch_kmv_distinct,
        _KMV_SQL,
        "beyond-reference: portable KMV bottom-k cardinality sketch (Bar-Yossef et al. 2002; TakeOrdered, no global sort)",
    ),
    "sketch_hll_distinct": QuerySpec(
        sketch_hll_distinct,
        _HLL_SQL,
        "beyond-reference: portable HyperLogLog — md5 registers, exact-decimal harmonic sum, "
        "256-int sketch state at any corpus size",
    ),
    "sketch_cms_heavy": QuerySpec(
        sketch_cms_heavy,
        _cms_sql(),
        "beyond-reference: count-min sketch heavy hitters — fixed depth×width counter "
        "table (partial-agg groupBy) + broadcast probe; one-sided error surfaced as "
        "an `overestimate` column",
    ),
}
