"""Product-quantization ADC: code self-consistency + approximation sanity."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.similarity import (
    _PQ_K,
    _PQ_M,
    _QUERY_VEC_ID,
    _TOP_K,
    ann_cosine_topk,
    ann_pq_adc_topk,
)


def test_pq_output_shape_and_rank_order(spark):
    rows = ann_pq_adc_topk(spark, SF_SMOKE).collect()
    assert len(rows) == _TOP_K
    assert [r.rank for r in rows] == list(range(1, _TOP_K + 1))
    d = [r.approx_d2 for r in rows]
    assert d == sorted(d)
    assert all(x >= 0 for x in d)
    assert all(r.vec_id != _QUERY_VEC_ID for r in rows)


def test_pq_seed_vectors_encode_to_their_own_code(spark):
    """A codebook seed's sub-vector is distance 0 from its own codeword,
    so seed c must encode to code c in every subspace (exact decimals —
    no rounding can break the argmin)."""
    from mmeds_meta_spark.operators.similarity import _pq_codebook
    from mmeds_meta_spark.testdata import table as _t

    e = (
        _t(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "label", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .withColumn("qv", F.expr("transform(v, x -> CAST(x AS DECIMAL(9,4)))"))
    )
    sub, cb = _pq_codebook(e)
    assert len(cb) == _PQ_M and all(len(cm) == _PQ_K for cm in cb)
    # re-run the operator's own encode path and check the seed rows:
    # build codes via the public operator by reading its plan inputs
    import mmeds_meta_spark.operators.similarity as sim

    def code_expr(m):
        structs = []
        for c in range(_PQ_K):
            arr = ", ".join(f"CAST('{x}' AS DECIMAL(9,4))" for x in cb[m][c])
            d2 = F.expr(
                f"aggregate(zip_with(slice(qv, {m * sub + 1}, {sub}), array({arr}),"
                f" (a, b) -> (a - b) * (a - b)),"
                f" CAST(0 AS {sim._PQ_ACC}), (acc, z) -> CAST(acc + z AS {sim._PQ_ACC}))"
            )
            structs.append(F.struct(d2.alias("d2"), F.lit(c).alias("c")))
        return F.array_min(F.array(*structs))["c"]

    coded = e.filter(F.col("vec_id") < _PQ_K).select(
        "vec_id", *[code_expr(m).alias(f"code{m}") for m in range(_PQ_M)]
    )
    for r in coded.collect():
        # ties can only go to a LOWER code id (identical seed sub-vectors);
        # code must point at a codeword with the same sub-vector
        for m in range(_PQ_M):
            assert cb[m][r[f"code{m}"]] == cb[m][r.vec_id], (r.vec_id, m)


def test_pq_beats_random_on_recall(spark):
    """ADC with seed codebooks is approximate, but its top-k should
    overlap the exact cosine top-k far more than chance (10 of 499)."""
    exact = {r.vec_id for r in ann_cosine_topk(spark, SF_SMOKE).collect()}
    approx = {r.vec_id for r in ann_pq_adc_topk(spark, SF_SMOKE).collect()}
    assert len(exact & approx) >= 2  # chance overlap ≈ 0.2 ids


def test_ivf_pq_is_bucket_restricted_subset(spark):
    """IVF-PQ results must (a) all sit in the query's coarse bucket and
    (b) rank by the same ADC distance the unrestricted PQ search uses."""
    from mmeds_meta_spark.operators.similarity import ann_ivf_pq_topk, ann_pq_adc_topk

    ivf = ann_ivf_pq_topk(spark, SF_SMOKE).collect()
    assert len(ivf) > 0
    assert len({r.bucket for r in ivf}) == 1  # all from one bucket
    full = {r.vec_id: r.approx_d2 for r in ann_pq_adc_topk(spark, SF_SMOKE).collect()}
    # any ivf hit also present in the full PQ top-k must agree on distance
    for r in ivf:
        if r.vec_id in full:
            assert full[r.vec_id] == r.approx_d2
    d = [r.approx_d2 for r in ivf]
    assert d == sorted(d)
