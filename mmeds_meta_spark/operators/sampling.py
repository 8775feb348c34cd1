"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus needs reproducible, data-independent sampling — never
``rand()`` (non-deterministic across retries/partitions) and never a
driver-side shuffle.  Both operators here are pure column expressions on
a stable key, so the same doc lands in the same split on every engine,
every retry, every partitioning:

* hash split       — md5(doc_id) buckets 0..99 → train/eval; rebalancing
                     or re-running never moves a document between splits.
* per-group cap    — top-k per group by an explicit total order
                     (quality DESC, id ASC tie-break): the class-balance /
                     per-source cap step, as a bounded window not a sort
                     of the corpus.

Portability: bucket = integer value of the first two md5 hex nibbles
(instr/strpos arithmetic, as the SimHash fingerprints) — no engine-native
hash().
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..testdata import table as _t
from . import QuerySpec

_EVAL_PCT = 10  # buckets 0..9 of 0..99 → eval
_HEX = "0123456789abcdef"
_TOPK = 20


def _bucket_expr(dialect: str, key: str) -> str:
    """Integer 0..255 from the first two hex nibbles of md5(key)."""
    pos = "instr" if dialect == "spark" else "strpos"
    n1 = f"({pos}('{_HEX}', substr(md5({key}), 1, 1)) - 1)"
    n2 = f"({pos}('{_HEX}', substr(md5({key}), 2, 1)) - 1)"
    return f"({n1} * 16 + {n2})"


def sample_hash_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/eval assignment: bucket = md5(doc_id) % 100;
    bucket < 10 → eval.  Narrow map, no shuffle, no state."""
    d = _t(spark, sf, "documents")
    bucket = F.expr(f"{_bucket_expr('spark', 'CAST(doc_id AS STRING)')} % 100")
    return d.select(
        "doc_id",
        bucket.cast("int").alias("bucket"),
        F.when(bucket < _EVAL_PCT, F.lit("eval")).otherwise(F.lit("train")).alias("split"),
    )


_SPLIT_SQL = f"""
SELECT doc_id,
       CAST({_bucket_expr('duck', 'CAST(doc_id AS VARCHAR)')} % 100 AS INTEGER) AS bucket,
       CASE WHEN {_bucket_expr('duck', 'CAST(doc_id AS VARCHAR)')} % 100 < {_EVAL_PCT}
            THEN 'eval' ELSE 'train' END AS split
FROM documents
"""


def sample_balanced_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language cap: keep the k longest docs per lang, total order
    (n_chars DESC, doc_id ASC) so the selection is unique.  The window
    partitions on the group key — each partition ranks independently; at
    100 TB this is a partial top-k per partition + one bounded shuffle,
    never a global sort."""
    d = _t(spark, sf, "documents")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOPK)
        .select("lang", "doc_id", "n_chars", F.col("rk").cast("int").alias("rk"))
    )


_TOPK_SQL = f"""
SELECT lang, doc_id, n_chars, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM documents
)
WHERE rk <= {_TOPK}
"""


QUERIES: dict[str, QuerySpec] = {
    "sample_hash_split": QuerySpec(
        sample_hash_split, _SPLIT_SQL, "deterministic train/eval hash split"
    ),
    "sample_balanced_topk": QuerySpec(
        sample_balanced_topk, _TOPK_SQL, "per-group cap / class-balanced top-k"
    ),
}
