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


QUERIES: dict[str, QuerySpec] = {
    "sketch_kmv_distinct": QuerySpec(
        sketch_kmv_distinct,
        _KMV_SQL,
        "beyond-reference: portable bottom-k cardinality sketch (TakeOrdered, no global sort)",
    ),
}
