"""dedup_substring_islands: hand-computed island geometry + corpus laws."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.dedup import _ISL_W, dedup_substring_islands


def _run_on(spark, tmp_path, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    d = tmp_path / "docs"
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return {r.doc_id: r for r in dedup_substring_islands(spark, str(d)).collect()}


def test_islands_hand_fixture(spark, tmp_path):
    """Two docs share one 10-token passage; a third is clean.  W=8 →
    dup positions in the shared region form ONE island of exactly the
    shared length in both docs."""
    shared = " ".join(f"s{i}" for i in range(10))  # 10 shared tokens
    a = shared + " " + " ".join(f"a{i}" for i in range(12))
    b = " ".join(f"b{i}" for i in range(12)) + " " + shared
    c = " ".join(f"c{i}" for i in range(22))
    got = _run_on(spark, tmp_path, [a, b, c])
    assert got[2].n_dup_islands == 0
    assert got[2].dup_token_count == 0 and got[2].dup_ratio == 0.0
    for doc in (0, 1):
        r = got[doc]
        assert r.n_dup_islands == 1
        # windows fully inside the shared 10 tokens: positions give an
        # island of exactly 10 tokens (3 consecutive dup positions + W-1)
        assert r.longest_dup_tokens == 10
        assert r.dup_token_count == 10
        assert abs(r.dup_ratio - 10 / r.n_tokens) < 1e-12


def test_islands_interval_union_merges_overlapping_runs(spark, tmp_path):
    """Doc a's tokens 0..7 repeat in doc b and its tokens 5..12 repeat in
    doc c: the dup-position runs {0} and {5} are NOT consecutive, but
    their token intervals [0,7] and [5,12] overlap — the interval-union
    step must merge them into ONE 13-token island (run-grouping alone
    would double-count tokens 5..7)."""
    m = [f"m{i}" for i in range(16)]
    a = " ".join(m)
    b = " ".join(m[0:8] + [f"fb{i}" for i in range(10)])
    c = " ".join(m[5:13] + [f"fc{i}" for i in range(10)])
    got = _run_on(spark, tmp_path, [a, b, c])
    assert got[0].n_dup_islands == 1
    assert got[0].dup_token_count == 13  # union of [0,7] ∪ [5,12]
    assert got[0].longest_dup_tokens == 13
    for doc in (1, 2):  # each shares exactly its 8-token prefix window
        assert got[doc].n_dup_islands == 1
        assert got[doc].dup_token_count == 8


def test_islands_disjoint_runs_stay_separate(spark, tmp_path):
    """Two shared passages far enough apart (next dup interval starts
    after the previous one ends) remain TWO islands."""
    p1 = " ".join(f"x{i}" for i in range(8))
    p2 = " ".join(f"y{i}" for i in range(8))
    gap = " ".join(f"g{i}" for i in range(3))
    a = p1 + " " + gap + " " + p2  # intervals [0,7] and [11,18]
    b = p1 + " " + " ".join(f"u{i}" for i in range(15)) + " " + p2
    got = _run_on(spark, tmp_path, [a, b])
    for doc in (0, 1):
        assert got[doc].n_dup_islands == 2
        assert got[doc].dup_token_count == 16


def test_islands_short_docs_and_full_dup(spark, tmp_path):
    """A doc shorter than W has no windows → zeros; two identical docs
    are one full-length island each (dup_ratio 1.0)."""
    short = "only three tokens"
    dup = " ".join(f"d{i}" for i in range(12))
    got = _run_on(spark, tmp_path, [short, dup, dup])
    assert got[0].n_dup_islands == 0 and got[0].dup_token_count == 0
    for doc in (1, 2):
        assert got[doc].n_dup_islands == 1
        assert got[doc].dup_token_count == got[doc].n_tokens == 12
        assert got[doc].dup_ratio == 1.0


def test_islands_corpus_laws(spark):
    rows = dedup_substring_islands(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.dup_token_count <= r.n_tokens
        assert r.longest_dup_tokens <= r.dup_token_count
        assert (r.n_dup_islands == 0) == (r.dup_token_count == 0)
        if r.n_dup_islands:
            assert r.longest_dup_tokens >= _ISL_W
            # islands are disjoint, each ≥ W tokens
            assert r.dup_token_count >= r.n_dup_islands * _ISL_W


def test_span_decon_matches_pure_python_recomputation(spark):
    """decon_span_islands: exact pure-Python recomputation — leaked
    window positions, run grouping, interval union, and the interval
    strings must all match."""
    from mmeds_meta_spark.operators import registry
    from mmeds_meta_spark.operators.dedup import _FUZZY_BENCH_MOD, _ISL_W

    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    bench_windows = set()
    for did, toks in docs.items():
        if did % _FUZZY_BENCH_MOD == 0:
            for i in range(len(toks) - _ISL_W + 1):
                bench_windows.add(tuple(toks[i : i + _ISL_W]))

    expected = {}
    for did, toks in docs.items():
        if did % _FUZZY_BENCH_MOD == 0:
            continue
        pos = [
            i
            for i in range(len(toks) - _ISL_W + 1)
            if tuple(toks[i : i + _ISL_W]) in bench_windows
        ]
        if not pos:
            continue
        # runs of consecutive positions -> token intervals -> union
        runs = []
        start = prev = pos[0]
        for q in pos[1:]:
            if q == prev + 1:
                prev = q
            else:
                runs.append((start, prev + _ISL_W - 1))
                start = prev = q
        runs.append((start, prev + _ISL_W - 1))
        merged = [list(runs[0])]
        for a, e in runs[1:]:
            if a <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([a, e])
        expected[did] = merged

    rows = {
        r.doc_id: r
        for r in registry()["decon_span_islands"].spark(spark, SF_SMOKE).collect()
    }
    assert rows, "fixture should contain span leaks under the mod-7 bench"
    assert set(rows) == set(expected)
    for did, merged in expected.items():
        r = rows[did]
        want = ",".join(f"{a}-{e}" for a, e in merged)
        assert r.leak_intervals == want, (did, r.leak_intervals, want)
        assert r.n_leak_islands == len(merged)
        assert r.leak_token_count == sum(e - a + 1 for a, e in merged)
        assert r.n_tokens == len(docs[did])
