"""BM25 top-k: pure-Python recomputation of the full scoring surface."""

from __future__ import annotations

import math

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.text import (
    _BM25_B,
    _BM25_K1,
    _BM25_QUERY,
    _BM25_TOPK,
    text_bm25_topk,
)


def _expected(docs):
    toks = {i: t.split(" ") for i, t in docs}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {
        q: sum(1 for v in toks.values() if q in v) for q in _BM25_QUERY
    }
    out = []
    for i, v in toks.items():
        terms = sorted(q for q in _BM25_QUERY if q in v)
        if not terms:
            continue
        s = 0.0
        for q in terms:  # pinned term order
            c = v.count(q)
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * (c * (_BM25_K1 + 1)) / (
                c + _BM25_K1 * (1 - _BM25_B + _BM25_B * len(v) / avgdl)
            )
        out.append((i, len(terms), s))
    out.sort(key=lambda r: (-round(r[2], 6), r[0]))
    return out[:_BM25_TOPK]


def test_bm25_matches_pure_python(spark):
    docs = [
        (r.doc_id, r.text)
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    exp = _expected(docs)
    got = text_bm25_topk(spark, SF_SMOKE).collect()
    assert len(got) == len(exp) == _BM25_TOPK
    assert [r.doc_id for r in got] == [e[0] for e in exp]
    for r, (doc_id, nt, s) in zip(got, exp):
        assert r.n_terms == nt
        assert abs(r.bm25 - s) < 5.1e-7
