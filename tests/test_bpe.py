"""BPE trainer: hand-computed fixture, greedy-overlap law, encode idempotence."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.bpe import (
    _EOW,
    _merge_fold,
    _pair_counts,
    bpe_encode,
    bpe_train,
    text_bpe_train,
)


def _syms_df(spark, rows):
    """rows: list of (word, freq) → (w, freq, syms) with char symbols + EOW."""
    df = spark.createDataFrame(rows, "w STRING, freq BIGINT")
    return df.withColumn(
        "syms", F.expr(f"concat(regexp_extract_all(w, '.', 0), array('{_EOW}'))")
    )


def test_merge_fold_is_greedy_left_to_right(spark):
    """[a,a,a] under merge (a,a) → [aa,a]; [a,b,a,b] under (a,b) → [ab,ab]."""
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b", "a", "b"],), (["x"],), ([],)],
        "syms ARRAY<STRING>",
    )
    got_aa = [r.m for r in df.select(_merge_fold("a", "a").alias("m")).collect()]
    assert got_aa[0] == ["aa", "a"]
    got_ab = [r.m for r in df.select(_merge_fold("a", "b").alias("m")).collect()]
    assert got_ab[1] == ["ab", "ab"]
    assert got_ab[2] == ["x"]  # single symbol untouched
    assert got_ab[3] == []  # empty array untouched


def test_bpe_train_hand_fixture(spark, tmp_path, monkeypatch):
    """Tiny corpus where the merge sequence is known by hand:
    'low' ×5, 'lower' ×2 — classic Sennrich example shape."""
    docs = spark.createDataFrame(
        [(0, " ".join(["low"] * 5 + ["lower"] * 2), "en", "s", 1)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    d = tmp_path / "fixture"
    docs.write.parquet(str(d / "documents.parquet"))
    merges = bpe_train(spark, str(d), n_merges=3).collect()
    # pair counts round 1: (l,o)=7, (o,w)=7, (w,</w>)=5, (w,e)=2, (e,r)=2,
    # (r,</w>)=2 → ties (l,o)/(o,w) at 7 break lexicographically → (l,o)
    assert (merges[0].lhs, merges[0].rhs, merges[0].pair_count) == ("l", "o", 7)
    # round 2: (lo,w)=7 wins
    assert (merges[1].lhs, merges[1].rhs, merges[1].pair_count) == ("lo", "w", 7)
    # round 3: (low,</w>)=5 wins over (low,e)=2
    assert (merges[2].lhs, merges[2].rhs, merges[2].pair_count) == ("low", _EOW, 5)


def test_bpe_encode_consumes_trained_pairs(spark):
    """After applying the trained merges, none of the merged pairs may
    remain adjacent in any word (each pair is fully consumed greedily)."""
    merges = [tuple(r) for r in text_bpe_train(spark, SF_SMOKE).collect()]
    assert len(merges) == 8
    assert len({(l, r) for _, l, r, _ in merges}) == 8  # no pair repeats
    from mmeds_meta_spark.operators.bpe import _word_symbols

    encoded = bpe_encode(_word_symbols(spark, SF_SMOKE), merges)
    remaining = {(r.lhs, r.rhs) for r in _pair_counts(encoded).collect()}
    for _, l, r, _ in merges:
        assert (l, r) not in remaining
    # every emitted symbol reassembles its word exactly
    bad = encoded.filter(
        F.expr(f"array_join(syms, '') != concat(w, '{_EOW}')")
    ).count()
    assert bad == 0


def test_bpe_counts_are_freq_weighted(spark):
    df = _syms_df(spark, [("ab", 10), ("ab", 0), ("ba", 1)])
    counts = {(r.lhs, r.rhs): r.cnt for r in _pair_counts(df).collect()}
    assert counts[("a", "b")] == 10  # weighted by freq, not row count
    assert counts[("b", "a")] == 1


def test_bpe_token_count_laws(spark):
    """BPE tokens ≤ char count + 1 per word, ≥ 1 per word; merging only
    ever shrinks counts, so n_bpe_tokens ≤ chars+words and ≥ n_words."""
    from mmeds_meta_spark.operators.bpe import text_bpe_token_count
    from mmeds_meta_spark.testdata import table as _t

    got = {r.doc_id: r for r in text_bpe_token_count(spark, SF_SMOKE).collect()}
    docs = _t(spark, SF_SMOKE, "documents").collect()
    assert len(got) == len(docs)
    for d in docs:
        words = [w for w in d.text.split(" ") if w]
        r = got[d.doc_id]
        assert r.n_words == len(words)
        assert len(words) <= r.n_bpe_tokens  # each word ≥ 1 token
        # upper bound: chars + EOW marker per word, merges only shrink
        assert r.n_bpe_tokens <= sum(len(w) + 1 for w in words)


def _py_greedy_merge(syms, lhs, rhs):
    """Pure-Python reference for the greedy left-to-right merge."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
            out.append(lhs + rhs)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_merge_fold_matches_python_reference_property(spark):
    """The Spark fold equals the canonical two-pointer implementation on
    randomized symbol arrays (hypothesis), including pathological runs."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    arrays = st.lists(
        st.lists(st.sampled_from(["a", "b", "ab", "</w>"]), min_size=0, max_size=10),
        min_size=1,
        max_size=12,
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=arrays, pair=st.tuples(st.sampled_from(["a", "b", "ab"]), st.sampled_from(["a", "b", "</w>"])))
    def _prop(rows, pair):
        lhs, rhs = pair
        df = spark.createDataFrame([(r,) for r in rows], "syms ARRAY<STRING>")
        got = [r.m for r in df.select(_merge_fold(lhs, rhs).alias("m")).collect()]
        # createDataFrame preserves row order for a local list
        assert got == [_py_greedy_merge(r, lhs, rhs) for r in rows]

    _prop()


def test_bpe_vocab_conservation(spark):
    """Subword occurrences (freq-weighted) conserve total symbol mass:
    Σ n_occ over ALL subwords == Σ freq·len(syms) over the vocab; and
    every merged unit in the vocab report must reassemble from the
    merge table's pairs."""
    import pyspark.sql.functions as F

    from mmeds_meta_spark.operators.bpe import (
        _N_MERGES,
        _train,
        text_bpe_vocab,
    )

    merges, syms_df = _train(spark, SF_SMOKE, _N_MERGES)
    merged_units = {l + r for _, l, r, _ in merges}
    rows = text_bpe_vocab(spark, SF_SMOKE).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    occ = [r.n_occ for r in rows]
    assert occ == sorted(occ, reverse=True)
    for r in rows:
        # every multi-char unit is either the EOW marker or a trained merge
        if len(r.subword) > 1 and r.subword != "</w>":
            assert r.subword in merged_units
    # conservation across the FULL counts relation (not just top-k)
    total_syms = syms_df.select(
        F.sum(F.col("freq") * F.size("syms")).alias("t")
    ).collect()[0].t
    full_counts = (
        syms_df.select("freq", F.explode("syms").alias("s"))
        .agg(F.sum("freq").alias("t"))
        .collect()[0]
        .t
    )
    assert total_syms == full_counts
