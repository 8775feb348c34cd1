"""Stratified sampling allocation exactness + int8 quantization bounds."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.sampling import _STRAT_DEN, sample_stratified_exact
from mmeds_meta_spark.operators.similarity import (
    embed_quantize_int8,
    embed_quantize_int8_vec,
)


def test_stratified_counts_match_largest_remainder(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ng = {r.lang: r.cnt for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    n_total = sum(ng.values())
    target = n_total // _STRAT_DEN
    base = {g: n // _STRAT_DEN for g, n in ng.items()}
    seats = target - sum(base.values())
    order = sorted(ng, key=lambda g: (-(ng[g] % _STRAT_DEN), g))
    expected = {g: base[g] + (1 if order.index(g) < seats else 0) for g in ng}

    got = {
        r.lang: r.cnt
        for r in sample_stratified_exact(spark, SF_SMOKE)
        .groupBy("lang")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == {g: k for g, k in expected.items() if k > 0}
    assert sum(got.values()) == target


def test_stratified_deterministic(spark):
    a = sorted(map(tuple, sample_stratified_exact(spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, sample_stratified_exact(spark, SF_SMOKE).collect()))
    assert a == b


def test_quantize_bounds_and_zero_vector(spark):
    rows = embed_quantize_int8_vec(spark, SF_SMOKE).collect()
    assert len(rows) == 500
    for r in rows[:50]:
        assert all(-127 <= q <= 127 for q in r.q)
        assert max(abs(q) for q in r.q) == 127 or r.scale == 0
    # the gated variant stringifies positionally (driver canonicalization)
    gated = embed_quantize_int8(spark, SF_SMOKE)
    assert dict(gated.dtypes)["q"] == "string"
    g = {r.vec_id: r.q for r in gated.collect()}
    for r in rows[:20]:
        assert g[r.vec_id] == ",".join(str(q) for q in r.q)
    zero = spark.createDataFrame([(1, [0.0, 0.0])], "vec_id long, embedding array<float>")
    zero.createOrReplaceTempView("__zv")
    # reuse the expression path on a zero vector via a direct transform
    out = (
        zero.select(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"))
        .withColumn("scale", F.expr("array_max(transform(v, x -> abs(x)))"))
        .selectExpr(
            "CASE WHEN scale = 0 THEN transform(v, x -> 0)"
            " ELSE transform(v, x -> CAST(FLOOR(x * 127.0 / scale + 0.5) AS INT)) END AS q"
        )
        .first()
    )
    assert out.q == [0, 0]


def test_kmv_sketch_error_and_small_set_exactness(spark):
    import duckdb

    from mmeds_meta_spark.operators.sketches import sketch_kmv_distinct

    est = sketch_kmv_distinct(spark, SF_SMOKE).first()
    exact = duckdb.sql(
        "SELECT COUNT(*) FROM (SELECT DISTINCT CAST(doc_id AS VARCHAR) || '|' ||"
        f" unnest(string_split(text, ' ')) FROM '{SF_SMOKE}/documents.parquet')"
    ).fetchone()[0]
    assert abs(est.est_distinct - exact) / exact < 0.15  # bottom-k, k=1024
    # small-set regime: < k unique hashes → the sketch is EXACT
    tiny = spark.createDataFrame(
        [(i, f"tok{i} shared") for i in range(10)], "doc_id long, text string"
    )
    tiny.createOrReplaceTempView("documents_tiny")
    import pyspark.sql.functions as FF
    from mmeds_meta_spark.operators.sketches import _K, _frac48_expr

    pair = (
        tiny.select("doc_id", FF.explode(FF.split("text", " ")).alias("tok"))
        .select(FF.concat_ws("|", FF.col("doc_id").cast("string"), "tok").alias("pk"))
        .distinct()
    )
    frac = pair.select(FF.expr(_frac48_expr("spark", "pk")).alias("f"))
    got = (
        frac.orderBy("f").limit(_K)
        .agg(FF.expr(f"CASE WHEN COUNT(*) < {_K} THEN CAST(COUNT(*) AS DOUBLE)"
                     f" ELSE ({_K} - 1) / MAX(f) END").alias("est"))
        .first()
        .est
    )
    assert got == 20.0  # 10 doc-specific + 10 shared pairs, exactly


def test_pack_sequences_budget_property(spark):
    import collections

    from mmeds_meta_spark.operators.sampling import _PACK_BUDGET, pack_sequences

    rows = pack_sequences(spark, SF_SMOKE).collect()
    assert len(rows) == 500
    sums = collections.defaultdict(int)
    max_tok = max(r.n_tok for r in rows)
    batches = collections.defaultdict(set)
    for r in rows:
        sums[(r.bucket, r.batch_in_bucket)] += r.n_tok
        batches[r.bucket].add(r.batch_in_bucket)
    # streaming next-fit: a batch holds at most budget + one straddling doc
    for k, s in sums.items():
        assert s <= _PACK_BUDGET + max_tok, (k, s)
    # batch ids within a bucket are contiguous from 0
    for b, ids in batches.items():
        assert ids == set(range(len(ids))), (b, sorted(ids))


def test_mixture_weighted_quotas_and_determinism(spark):
    import math

    from mmeds_meta_spark.operators.sampling import _MIX_SCALE, sample_mixture_weighted

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ns = {r.source: r.cnt for r in docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    expected = {s: min(n, math.floor(_MIX_SCALE * math.sqrt(n))) for s, n in ns.items()}

    out = sample_mixture_weighted(spark, SF_SMOKE)
    got = {
        r.source: r.cnt
        for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == {s: k for s, k in expected.items() if k > 0}
    # quota column matches the allocation, rate is sublinear in source size
    quotas = {r.source: r.source_quota for r in out.select("source", "source_quota").distinct().collect()}
    assert quotas == {s: k for s, k in expected.items() if k > 0}
    # deterministic: identical picks across independent runs
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, sample_mixture_weighted(spark, SF_SMOKE).collect()))
    assert a == b


def test_quality_quota_exact_counts_and_best_first(spark):
    """sample_quality_quota: exactly max(1, floor(0.25 n_s)) docs per
    source, and no unselected doc outscores a selected one."""
    from mmeds_meta_spark.operators.sampling import _QQ_FRAC, sample_quality_quota

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    per_source = {r.source: r.cnt for r in d.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    sel = sample_quality_quota(spark, SF_SMOKE).collect()
    got = {}
    for r in sel:
        got.setdefault(r.source, []).append(r)
    for s, n in per_source.items():
        k = max(1, int(_QQ_FRAC * n))
        assert len(got[s]) == k, (s, n, k, len(got[s]))
        assert all(r.source_quota == k for r in got[s])
    # best-first: min selected score per source >= max unselected score
    # (strictly greater OR equal with the md5 tie-break at the boundary)
    scores = {
        (r.doc_id): (r.source, round(len(set(r.text.split(" "))) / len(r.text.split(" ")), 4))
        for r in d.select("doc_id", "source", "text").collect()
    }
    sel_ids = {r.doc_id for r in sel}
    for s in per_source:
        sel_min = min(r.qscore for r in got[s])
        out_max = max(
            (q for did, (src, q) in scores.items() if src == s and did not in sel_ids),
            default=-1.0,
        )
        assert out_max <= sel_min
