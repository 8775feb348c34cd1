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
from pyspark.sql import DataFrame, SparkSession

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


QUERIES: dict[str, QuerySpec] = {
    "sketch_kmv_distinct": QuerySpec(
        sketch_kmv_distinct,
        _KMV_SQL,
        "beyond-reference: portable bottom-k cardinality sketch (TakeOrdered, no global sort)",
    ),
    "sketch_cms_heavy": QuerySpec(
        sketch_cms_heavy,
        _cms_sql(),
        "beyond-reference: count-min sketch heavy hitters — fixed depth×width counter "
        "table (partial-agg groupBy) + broadcast probe; one-sided error surfaced as "
        "an `overestimate` column",
    ),
}
