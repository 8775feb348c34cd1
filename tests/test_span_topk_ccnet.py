"""dedup_span_topk report invariants + CCNet bucket partition laws."""

from __future__ import annotations

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.dedup import _SPAN_TOPK, dedup_span_topk
from mmeds_meta_spark.operators.text import text_ccnet_buckets


def test_span_topk_report_invariants(spark):
    rows = dedup_span_topk(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= _SPAN_TOPK
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    occ = [r.n_occ for r in rows]
    assert occ == sorted(occ, reverse=True)
    for r in rows:
        assert r.n_occ > 1  # only duplicated spans make the report
        assert 1 <= r.n_docs <= r.n_occ  # a doc can repeat a span internally
        assert r.span_chars >= 0
        assert len(r.span_h) == 32  # md5 hex


def test_span_topk_example_doc_contains_span(spark):
    """The example doc must actually contain a span hashing to span_h."""
    import pyspark.sql.functions as F

    from mmeds_meta_spark.operators.dedup import _SPAN_K
    from mmeds_meta_spark.testdata import table as _t

    top = dedup_span_topk(spark, SF_SMOKE).limit(3).collect()
    d = _t(spark, SF_SMOKE, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    spans = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(toks) - 1, {_SPAN_K}),"
                f" s -> md5(array_join(slice(toks, s + 1, {_SPAN_K}), ' ')))"
            )
        ).alias("h"),
    )
    have = {
        (r.doc_id, r.h)
        for r in spans.filter(
            F.col("h").isin([t.span_h for t in top])
        ).collect()
    }
    for t in top:
        assert (t.example_doc_id, t.span_h) in have


def test_ccnet_buckets_partition_laws(spark):
    rows = text_ccnet_buckets(spark, SF_SMOKE).collect()
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        assert r.ccnet_bucket in ("head", "middle", "tail")
        by_lang.setdefault(r.lang, []).append(r)
    # every document is assigned exactly once
    assert len({r.doc_id for r in rows}) == len(rows)
    for lang, rs in by_lang.items():
        # bucket order respects perplexity: max(head) <= min(middle) <= ...
        ppl = {b: [r.ppl_proxy for r in rs if r.ccnet_bucket == b] for b in ("head", "middle", "tail")}
        if ppl["head"] and ppl["middle"]:
            assert max(ppl["head"]) <= min(ppl["middle"])
        if ppl["middle"] and ppl["tail"]:
            assert max(ppl["middle"]) <= min(ppl["tail"])
        # value-level assignment: same ppl value → same bucket
        seen: dict[float, str] = {}
        for r in rs:
            assert seen.setdefault(r.ppl_proxy, r.ccnet_bucket) == r.ccnet_bucket
        # head never exceeds a third of the language (cum_le*3 <= n rule);
        # ties can only SHRINK head, never grow it
        n = len(rs)
        assert len(ppl["head"]) * 3 <= n


def test_seasonal_anomaly_agrees_with_python(spark):
    """Flags match a NumPy-free Python recomputation of the 3σ rule on
    exact micro-unit moments per (event_type, hour)."""
    from collections import defaultdict

    from mmeds_meta_spark.functions.event_time import event_time_us
    from mmeds_meta_spark.operators.filters_misc import w15_seasonal_anomaly
    from mmeds_meta_spark.testdata import table as _t

    raw = _t(spark, SF_SMOKE, "events")
    ev = raw.select(
        "event_id", "event_type", "value", event_time_us(raw.schema).alias("ts_us")
    ).collect()
    groups = defaultdict(list)
    for r in ev:
        hx = round(r.value * 1e6)
        groups[(r.event_type, (r.ts_us // 3_600_000_000) % 24)].append((r.event_id, hx))
    expect = set()
    for (_, _), rows in groups.items():
        n = len(rows)
        s = sum(h for _, h in rows)
        q = sum(h * h for _, h in rows)
        for eid, h in rows:
            if (n * h - s) ** 2 > 9 * (n * q - s * s):
                expect.add(eid)
    got = {r.event_id for r in w15_seasonal_anomaly(spark, SF_SMOKE).collect()}
    assert got == expect
    assert got  # fixture corpus has at least one seasonal outlier


def test_lsh_tuning_curve_laws(spark):
    """More bands with fewer rows → laxer sieve → recall monotone in b
    for fixed b·r (the S-curve law); recall within [0, 1]; the
    multiplication-chain p agrees with Python's pow on a sample."""
    from mmeds_meta_spark.operators.dedup import (
        _LSH_CONFIGS,
        _pow_chain,
        dedup_lsh_tuning_curve,
    )

    rows = {(r.bands, r.rows_per_band): r for r in dedup_lsh_tuning_curve(spark, SF_SMOKE).collect()}
    assert set(rows) == set(_LSH_CONFIGS)
    n_pairs = {r.n_pairs for r in rows.values()}
    assert len(n_pairs) == 1 and n_pairs.pop() > 0  # same histogram under every config
    for r in rows.values():
        assert 0.0 <= r.expected_recall <= 1.0
    # for s in (0,1), 1-(1-s^r)^b is increasing in b when r decreases
    # along the fixed-budget family (32,1) ≥ (16,2) ≥ (8,4) ≥ (4,8)
    ordered = [rows[c].expected_recall for c in [(32, 1), (16, 2), (8, 4), (4, 8)]]
    assert ordered == sorted(ordered, reverse=True)
    # chain == pow semantics
    expr = _pow_chain("s", 8)
    s = 0.73
    assert abs(eval(expr, {"s": s}) - s**8) < 1e-12


def test_fuzzy_decon_catches_planted_paraphrase(spark, tmp_path):
    """A truncated copy of a benchmark doc (first 60% of its tokens) is
    flagged against that doc; an unrelated doc is not."""
    import pyspark.sql.functions as F

    from mmeds_meta_spark.operators.dedup import (
        _FUZZY_BENCH_MOD,
        _FUZZY_TAU,
        decon_fuzzy_minhash,
    )

    bench_text = " ".join(f"tok{i}" for i in range(40))
    leak = " ".join(f"tok{i}" for i in range(30))  # 75% prefix → J = 30/40
    clean = " ".join(f"other{i}" for i in range(40))
    rows = [
        (_FUZZY_BENCH_MOD * 3, bench_text),  # benchmark member
        (_FUZZY_BENCH_MOD * 3 + 1, leak),  # contaminated corpus doc
        (_FUZZY_BENCH_MOD * 3 + 2, clean),  # clean corpus doc
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    d = tmp_path / "fixture"
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    got = decon_fuzzy_minhash(spark, str(d)).collect()
    flagged = {(r.doc_id, r.bench_id) for r in got}
    assert (_FUZZY_BENCH_MOD * 3 + 1, _FUZZY_BENCH_MOD * 3) in flagged
    assert all(r.jaccard >= _FUZZY_TAU for r in got)
    assert all(r.doc_id != _FUZZY_BENCH_MOD * 3 + 2 for r in got)


def test_fuzzy_decon_corpus_laws(spark):
    from mmeds_meta_spark.operators.dedup import (
        _FUZZY_BENCH_MOD,
        _FUZZY_TAU,
        decon_fuzzy_minhash,
    )

    rows = decon_fuzzy_minhash(spark, SF_SMOKE).collect()
    assert rows  # the mod-7 split leaves cross-boundary near-dups
    for r in rows:
        assert r.bench_id % _FUZZY_BENCH_MOD == 0
        assert r.doc_id % _FUZZY_BENCH_MOD != 0
        assert _FUZZY_TAU <= r.jaccard <= 1.0


def test_normalized_dedup_collapses_format_variants(spark, tmp_path):
    """Casing, punctuation, and whitespace variants share one norm_fp
    with n_raw_variants counting the distinct raw forms."""
    from mmeds_meta_spark.operators.dedup import dedup_exact_normalized

    variants = [
        "Hello, World!  This is   fine.",
        "hello world this is fine",
        "HELLO WORLD — this is FINE?",
        "a genuinely different document",
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(variants)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    d = tmp_path / "norm"
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    rows = sorted(
        dedup_exact_normalized(spark, str(d)).collect(), key=lambda r: -r.n_docs
    )
    assert rows[0].n_docs == 3 and rows[0].n_raw_variants == 3
    assert rows[0].keeper_doc_id == 0
    assert len(rows) == 2 and rows[1].n_docs == 1


def test_kl_drift_laws(spark, tmp_path):
    """Gibbs: KL >= 0 with equality iff identical distributions; the
    matrix is complete over ordered pairs and generally asymmetric."""
    from mmeds_meta_spark.operators.text import _KL_VOCAB_K, text_vocab_kl_drift

    rows = text_vocab_kl_drift(spark, SF_SMOKE).collect()
    srcs = {r.src_a for r in rows} | {r.src_b for r in rows}
    assert len(rows) == len(srcs) * (len(srcs) - 1)
    for r in rows:
        assert r.kl >= 0.0
        assert r.n_classes <= _KL_VOCAB_K + 1
    # identical text in two sources → kl 0 both directions
    df = spark.createDataFrame(
        [(0, "alpha beta gamma", "en", "sA", 10), (1, "alpha beta gamma", "en", "sB", 10)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    d = tmp_path / "kl"
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    same = text_vocab_kl_drift(spark, str(d)).collect()
    assert {r.kl for r in same} == {0.0}


def test_rollup_cube_subtotal_laws(spark):
    """Grand total == sum of type subtotals == sum of leaf rows, for both
    the count and the exact-decimal value sum; GROUPING flags partition
    the output into the three levels."""
    from mmeds_meta_spark.operators.filters_misc import a25_rollup_cube

    rows = a25_rollup_cube(spark, SF_SMOKE).collect()
    leaves = [r for r in rows if (r.g_type, r.g_day) == (0, 0)]
    subtotals = [r for r in rows if (r.g_type, r.g_day) == (0, 1)]
    grand = [r for r in rows if (r.g_type, r.g_day) == (1, 1)]
    assert len(grand) == 1 and len(rows) == len(leaves) + len(subtotals) + 1
    g = grand[0]
    assert g.event_type is None and g.day_idx is None
    assert g.n_events == sum(r.n_events for r in leaves) == sum(r.n_events for r in subtotals)
    assert abs(g.total_value - sum(r.total_value for r in subtotals)) < 1e-6
    # every leaf's type appears among the subtotal rows
    assert {r.event_type for r in leaves} == {r.event_type for r in subtotals}


def test_chao1_coverage_agrees_with_python(spark):
    """chao1/coverage match a pure-Python recomputation (skbio's
    bias-corrected formula) and the formal laws: chao1 >= s_obs,
    coverage in [0, 1], equality chao1 == s_obs iff no singletons
    or exactly one."""
    from collections import Counter, defaultdict

    from mmeds_meta_spark.operators.diversity import d15_chao1_coverage
    from mmeds_meta_spark.testdata import table as _t

    ev = _t(spark, SF_SMOKE, "events").select("user_id", "event_type").collect()
    per = defaultdict(Counter)
    for r in ev:
        per[r.user_id][r.event_type] += 1
    got = {r.user_id: r for r in d15_chao1_coverage(spark, SF_SMOKE).collect()}
    assert set(got) == set(per)
    for uid, c in per.items():
        s_obs, n = len(c), sum(c.values())
        f1 = sum(1 for v in c.values() if v == 1)
        f2 = sum(1 for v in c.values() if v == 2)
        r = got[uid]
        assert (r.s_obs, r.n_reads, r.f1, r.f2) == (s_obs, n, f1, f2)
        assert r.chao1 == s_obs + (f1 * (f1 - 1)) / (2 * (f2 + 1))
        assert r.goods_coverage == 1.0 - f1 / n
        assert r.chao1 >= r.s_obs and 0.0 <= r.goods_coverage <= 1.0
