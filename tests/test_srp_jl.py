"""SRP-LSH ANN + JL random projection: recall vs brute force, JL
distance preservation, and hyperplane-derivation determinism."""

from __future__ import annotations

import math

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.similarity import (
    _JL_OUT,
    _QUERY_VEC_ID,
    _SRP_BITS,
    _SRP_DIM,
    _TOP_K,
    _rademacher,
    ann_cosine_topk,
    ann_srp_lsh_topk,
    embed_random_projection,
)


def test_rademacher_is_deterministic_and_balanced():
    a = _rademacher("srp", _SRP_BITS, _SRP_DIM)
    b = _rademacher("srp", _SRP_BITS, _SRP_DIM)
    assert a == b  # pure function of (salt, j, d) — retries never drift
    assert all(v in (-1.0, 1.0) for row in a for v in row)
    # md5 nibbles are uniform: each hyperplane should be roughly balanced
    for row in a:
        pos = sum(1 for v in row if v > 0)
        assert 16 <= pos <= 48  # 64 dims; p < 1e-4 to fall outside
    # a different salt must give a different matrix
    assert _rademacher("jl", _SRP_BITS, _SRP_DIM) != a


def test_srp_output_shape_and_rank_order(spark):
    rows = ann_srp_lsh_topk(spark, SF_SMOKE).collect()
    assert 1 <= len(rows) <= _TOP_K
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    sims = [r.cos_sim for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(r.vec_id != _QUERY_VEC_ID for r in rows)


def test_srp_candidates_rank_exactly_as_brute_force(spark):
    """Every candidate SRP returns must appear in the brute-force ranking
    with the SAME exact cosine (the re-rank is exact — only recall is
    approximate)."""
    brute = {r.vec_id: r.cos_sim for r in ann_cosine_topk(spark, SF_SMOKE).collect()}
    srp = ann_srp_lsh_topk(spark, SF_SMOKE).collect()
    overlap = [r for r in srp if r.vec_id in brute]
    assert overlap, "SRP found none of the true top-k — banding is broken"
    for r in overlap:
        assert r.cos_sim == brute[r.vec_id]


def test_jl_preserves_norms_within_epsilon(spark):
    """JL with 8 Rademacher rows preserves squared norms in expectation;
    check the projected norm is within a loose multiplicative band of the
    original for most vectors (distributional sanity, not a proof)."""
    from pyspark.sql import functions as F

    from mmeds_meta_spark.testdata import table as _t

    proj = embed_random_projection(spark, SF_SMOKE)
    assert proj.columns == ["vec_id", "label"] + [f"y{j}" for j in range(_JL_OUT)]
    orig = (
        _t(spark, SF_SMOKE, "embeddings")
        .select(
            "vec_id",
            F.expr(
                "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
                " CAST(0 AS DOUBLE), (a, z) -> a + z)"
            ).alias("n2"),
        )
    )
    rows = (
        proj.join(orig, "vec_id")
        .select(
            "vec_id",
            "n2",
            sum((F.col(f"y{j}") * F.col(f"y{j}") for j in range(_JL_OUT)), F.lit(0.0)).alias(
                "p2"
            ),
        )
        .collect()
    )
    assert rows
    ok = sum(1 for r in rows if r.n2 > 0 and 0.2 <= r.p2 / r.n2 <= 5.0)
    assert ok / len(rows) > 0.8  # most norms within a 5× band


def test_jl_projection_matches_numpy(spark):
    """One vector checked against a NumPy-free Python reference fold —
    same left-to-right order as the Spark aggregate."""
    from pyspark.sql import functions as F

    from mmeds_meta_spark.testdata import table as _t

    signs = _rademacher("jl", _JL_OUT, _SRP_DIM)
    v = (
        _t(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") == 1)
        .select(F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .collect()[0]
        .v
    )
    got = embed_random_projection(spark, SF_SMOKE).filter("vec_id = 1").collect()[0]
    for j in range(_JL_OUT):
        acc = 0.0
        for x, s in zip(v, signs[j]):
            acc += x * s
        assert getattr(got, f"y{j}") == round(acc / math.sqrt(_JL_OUT), 6)
