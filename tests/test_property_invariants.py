"""Property-based invariants for the scale-path rewrites.

Each operator below ships a physical rewrite whose CORRECTNESS argument
is a theorem (prefix filtering is lossless; 2-bucket explosion covers a
range window; span rebuild is positional).  The DuckDB oracles check one
fixture; these hypothesis properties check the theorem on randomized
corpora: the real registry operator runs against a pure-Python
reimplementation of the declared semantics.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st

from mmeds_meta_spark.operators import registry

REG = registry()

_VOCAB = ["aa", "bb", "cc", "dd", "ee"]

_doc_texts = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=12).map(" ".join),
    min_size=2,
    max_size=8,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _write_docs(spark, tmp_path, texts, name):
    rows = [
        (i, t, "en", f"src{i % 2}", len(t)) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path / name
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


@settings(**_SETTINGS)
@given(texts=_doc_texts)
def test_prefix_simjoin_is_lossless(spark, tmp_path_factory, texts):
    """simjoin_prefix_jaccard must return EXACTLY the brute-force pair
    set — prefix filtering guarantees no false negatives, verification
    removes false positives."""
    tmp = tmp_path_factory.mktemp("pj")
    sf = _write_docs(spark, tmp, texts, "c")
    got = {
        (r.doc_a, r.doc_b): r.inter
        for r in REG["simjoin_prefix_jaccard"].spark(spark, sf).collect()
    }
    bags = [Counter(t.split(" ")) for t in texts]
    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            inter = sum((bags[a] & bags[b]).values())
            na, nb = sum(bags[a].values()), sum(bags[b].values())
            if 5 * inter >= 4 * (na + nb - inter):
                want[(a, b)] = inter
    assert got == want


@settings(**_SETTINGS)
@given(texts=_doc_texts)
def test_span_dedup_rebuild_is_positional(spark, tmp_path_factory, texts):
    """dedup_span_exact's kept text must equal the in-order concat of the
    doc's corpus-unique 8-token spans."""
    tmp = tmp_path_factory.mktemp("sp")
    sf = _write_docs(spark, tmp, texts, "c")
    rows = {r.doc_id: r for r in REG["dedup_span_exact"].spark(spark, sf).collect()}
    K = 8
    spans_by_doc = []
    for t in texts:
        toks = t.split(" ")
        spans_by_doc.append(
            [" ".join(toks[s : s + K]) for s in range(0, len(toks), K)]
        )
    occ = Counter(s for spans in spans_by_doc for s in spans)
    import hashlib

    for i, spans in enumerate(spans_by_doc):
        kept = " ".join(s for s in spans if occ[s] == 1)
        r = rows[i]
        assert r.n_spans == len(spans)
        assert r.n_dup_spans == sum(1 for s in spans if occ[s] > 1)
        assert r.kept_n_chars == len(kept)
        assert r.kept_md5 == hashlib.md5(kept.encode()).hexdigest()


_events = st.lists(
    st.tuples(
        st.integers(0, 2),  # user
        st.integers(0, 40),  # minutes offset
        st.booleans(),  # is purchase
    ),
    min_size=2,
    max_size=20,
)


@settings(**_SETTINGS)
@given(events=_events)
def test_bucketed_range_join_covers_window(spark, tmp_path_factory, events):
    """w5's 2-bucket explosion must reproduce the plain range join: any
    event in (t, t+W] lies in bucket(t) or bucket(t)+1."""
    import datetime

    tmp = tmp_path_factory.mktemp("rj")
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + datetime.timedelta(minutes=m),
            u,
            "purchase" if p else "view",
            1.0,
            "{}",
        )
        for i, (u, m, p) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = tmp / "c"
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    got = {
        (r.purchase_id, r.n_follow)
        for r in REG["w5_range_join_bucketed"].spark(spark, str(d)).collect()
    }
    W = 10 * 60 * 1_000_000
    us = [int((r[1] - base).total_seconds() * 1e6) for r in rows]
    want = {}
    for i, (u, m, p) in enumerate(events):
        if not p:
            continue
        n = sum(
            1
            for j, (u2, m2, _) in enumerate(events)
            if u2 == u and us[i] < us[j] <= us[i] + W
        )
        if n:
            want[i] = n
    assert got == {(i, n) for i, n in want.items()}


@settings(**_SETTINGS)
@given(events=_events)
def test_interval_bucket_join_is_lossless(spark, tmp_path_factory, events):
    """w12's bucket explosion must reproduce the plain quadratic interval
    overlap join over the w4 sessions (two intervals overlap iff they
    share >= 1 bucket and pass the residual predicate)."""
    import datetime

    from mmeds_meta_spark.operators import registry as _reg

    tmp = tmp_path_factory.mktemp("iv")
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + datetime.timedelta(minutes=m * 13),  # spread to force gaps
            u,
            "view",
            1.0,
            "{}",
        )
        for i, (u, m, _p) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    d = tmp / "c"
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    got = {
        (r.ua, r.ub): r.n_overlapping_sessions
        for r in _reg()["w12_interval_overlap"].spark(spark, str(d)).collect()
    }
    sess = _reg()["w4_sessionization"].spark(spark, str(d)).collect()
    from collections import defaultdict

    want = defaultdict(int)
    for a in sess:
        for b in sess:
            if (
                a.user_id < b.user_id
                and a.session_start_us <= b.session_end_us
                and b.session_start_us <= a.session_end_us
            ):
                want[(a.user_id, b.user_id)] += 1
    assert got == dict(want)


def test_kmv_setops_saturation_is_exact(spark, tmp_path_factory):
    """With fewer distinct elements than k, the KMV estimates must
    COLLAPSE TO EXACT values (n_kept < k branch): union = true distinct
    count, jaccard/intersection = true set overlap."""
    tmp = tmp_path_factory.mktemp("kmv")
    # tiny vocab -> far fewer distinct 3-gram shingles than k=1024
    texts = [
        "aa bb cc dd ee aa bb cc",  # doc 0 (side A)
        "bb cc dd ee aa bb cc dd",  # doc 1 (side B)
        "aa bb cc dd ee aa bb cc",  # doc 2 (side A, duplicate of 0)
        "zz yy xx ww vv uu tt ss",  # doc 3 (side B, disjoint)
    ]
    sf = _write_docs(spark, tmp, texts, "c")
    row = REG["sketch_kmv_setops"].spark(spark, sf).collect()[0]

    def shingles(t):
        toks = t.split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    a = shingles(texts[0]) | shingles(texts[2])
    b = shingles(texts[1]) | shingles(texts[3])
    union, inter = a | b, a & b
    assert row.n_kept == len(union) < row.k
    assert row.est_union == float(len(union))
    assert row.k_both == len(inter)
    assert abs(row.est_intersection - len(inter)) < 1e-9


@settings(**_SETTINGS)
@given(texts=_doc_texts)
def test_simhash_banding_is_lossless(spark, tmp_path_factory, texts):
    """dedup_simhash's pigeonhole band join (+ hot-bucket salting) must
    return EXACTLY the direct pairwise Hamming-τ pairs: ≤ τ flipped
    bits leave at least one of the τ+1 bands untouched."""
    import hashlib

    tmp = tmp_path_factory.mktemp("sh")
    sf = _write_docs(spark, tmp, texts, "c")
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in REG["dedup_simhash"].spark(spark, sf).collect()
    }

    def fingerprint(text):
        s = [0] * 32
        for tok in text.split(" "):
            w = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
            for j in range(8):
                for r in range(4):
                    k = 4 * j + r
                    n = (7 - j) * 4 + r
                    s[k] += 2 * ((w >> n) & 1) - 1
        return sum((1 << k) for k in range(32) if s[k] > 0)

    fps = [fingerprint(t) for t in texts]
    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            h = bin(fps[a] ^ fps[b]).count("1")
            if h <= 4:
                want[(a, b)] = h
    assert got == want


@settings(**_SETTINGS)
@given(texts=_doc_texts)
def test_ks_drift_bounds_and_identity(spark, tmp_path_factory, texts):
    """text_length_ks_drift: 0 ≤ D ≤ 1 always, and two sources with the
    IDENTICAL length multiset have D = 0 and no rejection."""
    tmp = tmp_path_factory.mktemp("ks")
    # build srcA and srcB with the same texts -> identical length CDFs
    rows = [(i, t, "en", "srcA", len(t)) for i, t in enumerate(texts)] + [
        (1000 + i, t, "en", "srcB", len(t)) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp / "ks"
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = REG["text_length_ks_drift"].spark(spark, str(d)).collect()
    assert len(got) == 1
    r = got[0]
    assert r.ks_stat == 0.0 and not r.reject_05


@settings(**_SETTINGS)
@given(texts=_doc_texts)
def test_quality_quota_is_exact_and_best_first(spark, tmp_path_factory, texts):
    """sample_quality_quota on random corpora: per-source counts are
    exactly max(1, floor(frac·n_s)) and no rejected doc strictly
    outscores an accepted one."""
    from mmeds_meta_spark.operators.sampling import _QQ_FRAC

    tmp = tmp_path_factory.mktemp("qq")
    sf = _write_docs(spark, tmp, texts, "c")
    sel = REG["sample_quality_quota"].spark(spark, sf).collect()
    per_src = Counter(i % 2 for i in range(len(texts)))
    got = Counter()
    min_sel: dict[str, float] = {}
    for r in sel:
        got[r.source] += 1
        min_sel[r.source] = min(min_sel.get(r.source, 2.0), r.qscore)
    for s, n in per_src.items():
        src = f"src{s}"
        assert got[src] == max(1, int(_QQ_FRAC * n))
    # best-first: every unselected doc scores <= the weakest selected one
    sel_ids = {r.doc_id for r in sel}
    for i, t in enumerate(texts):
        if i in sel_ids:
            continue
        toks = t.split(" ")
        q = round(len(set(toks)) / len(toks), 4)
        assert q <= min_sel[f"src{i % 2}"] + 1e-12


@settings(**_SETTINGS)
@given(texts=_doc_texts)
def test_jaccard_beta_metric_axioms(spark, tmp_path_factory, texts):
    """d2_jaccard_beta over random event corpora: 0 ≤ d ≤ 1, d = 0 iff
    identical feature sets (checked via a pure-Python recomputation)."""
    tmp = tmp_path_factory.mktemp("jb")
    # synthesize events: user i emits its tokens as event types
    rows = []
    eid = 0
    for i, t in enumerate(texts):
        for tok in t.split(" "):
            rows.append((eid, i, tok, 1.0))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )
    d = tmp / "jb"
    ev.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    got = {(r.ua, r.ub): r.jaccard_dist for r in REG["d2_jaccard_beta"].spark(spark, str(d)).collect()}
    sets = {i: set(t.split(" ")) for i, t in enumerate(texts)}
    for (a, b), dist in got.items():
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        want = (union - inter) / union
        assert abs(dist - want) < 1e-12
        assert 0.0 <= dist <= 1.0
    # completeness: every pair present
    n = len(texts)
    assert len(got) == n * (n - 1) // 2
