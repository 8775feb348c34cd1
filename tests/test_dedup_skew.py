"""Hot-bucket salting in the SimHash band join must not change results.

A boilerplate-heavy corpus puts many documents in the SAME (band_id,
band_key) bucket; the salted plan splits that bucket across tasks.  Parity
contract: the salted banded join returns EXACTLY the pairs of the direct
O(n²) pairwise join (pigeonhole guarantee + salting is pair-preserving).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from mmeds_meta_spark.operators.dedup import (
    _HAMMING_TAU,
    _SH_BUCKET_TARGET,
    _simhash_banded_pairs,
)


def _direct_pairs(sigs):
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("fingerprint").alias("fa"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("fingerprint").alias("fb"))
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("CAST(bit_count(fa ^ fb) AS INT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= _HAMMING_TAU)
    )


def test_simhash_salted_band_parity_under_skew(spark):
    # 240 identical fingerprints (one giant bucket, >> _SH_BUCKET_TARGET),
    # a near-dup ring at hamming 1..4, and far-away fingerprints
    base = 0x5A5A5A5A
    rows = [(i, base) for i in range(240)]
    rows += [(1000 + k, base ^ ((1 << k) - 1)) for k in range(1, 6)]  # hamming 0..5 wrt base
    rows += [(2000 + i, 0x0F0F0F0F ^ i) for i in range(30)]
    sigs = spark.createDataFrame(rows, "doc_id LONG, fingerprint LONG")
    assert 240 > _SH_BUCKET_TARGET  # the scenario actually exercises salting

    got = {(r.doc_a, r.doc_b, r.hamming) for r in _simhash_banded_pairs(sigs).collect()}
    want = {(r.doc_a, r.doc_b, r.hamming) for r in _direct_pairs(sigs).collect()}
    assert got == want
    # the giant identical bucket contributes all its C(240,2) pairs
    assert sum(1 for a, b, h in want if a < 240 and b < 240 and h == 0) == 240 * 239 // 2


def test_simhash_salting_leaves_cold_buckets_alone(spark):
    # all-distinct fingerprints: no bucket exceeds the target; parity holds
    rows = [(i, (i * 2654435761) % (1 << 32)) for i in range(60)]
    sigs = spark.createDataFrame(rows, "doc_id LONG, fingerprint LONG")
    got = {(r.doc_a, r.doc_b, r.hamming) for r in _simhash_banded_pairs(sigs).collect()}
    want = {(r.doc_a, r.doc_b, r.hamming) for r in _direct_pairs(sigs).collect()}
    assert got == want


def test_incremental_simhash_equals_filtered_full(spark):
    """Incremental pairs = full-corpus pairs restricted to those touching
    the new-batch id range; no duplicates, normalized orientation."""
    import pyspark.sql.functions as F

    from conftest import SF_SMOKE
    from mmeds_meta_spark.operators.dedup import (
        _NEW_FRAC,
        dedup_simhash,
        dedup_simhash_incremental,
    )

    full = dedup_simhash(spark, SF_SMOKE)
    max_id = full.agg(F.max(F.greatest("doc_a", "doc_b"))).first()[0]
    import math

    # threshold from the documents table, as the operator computes it
    docs_max = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet").agg(F.max("doc_id")).first()[0]
    )
    t = math.floor(_NEW_FRAC * (docs_max + 1))
    expected = sorted(
        map(tuple, full.filter(F.greatest("doc_a", "doc_b") >= t).collect())
    )
    got = sorted(map(tuple, dedup_simhash_incremental(spark, SF_SMOKE).collect()))
    assert got == expected
    assert len(got) == len(set(got))
