"""DSIR importance resampling: independent pure-Python recomputation.

Rebuilds the hashed-n-gram LM ratio and the Gumbel-top-k selection with
hashlib/math only (no Spark, no DuckDB) and checks the operator's full
output — ids, weights, and selection order — against it.
"""

from __future__ import annotations

import hashlib
import math

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.sampling import (
    _DSIR_B,
    _DSIR_K,
    _DSIR_TARGET,
    sample_dsir_importance,
)


def _bucket(f: str) -> int:
    return int(hashlib.md5(f.encode()).hexdigest()[:2], 16)


def _h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _expected(docs, k=_DSIR_K):
    per_doc: dict[int, dict[int, int]] = {}
    sources: dict[int, str] = {}
    for doc_id, source, text in docs:
        toks = text.split(" ")
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        cnt: dict[int, int] = {}
        for f in feats:
            b = _bucket(f)
            cnt[b] = cnt.get(b, 0) + 1
        per_doc[doc_id] = cnt
        sources[doc_id] = source
    tgt: dict[int, int] = {}
    raw: dict[int, int] = {}
    for doc_id, cnt in per_doc.items():
        for b, c in cnt.items():
            raw[b] = raw.get(b, 0) + c
            if sources[doc_id] == _DSIR_TARGET:
                tgt[b] = tgt.get(b, 0) + c
    tn, rn = sum(tgt.values()), sum(raw.values())
    lr = {
        b: math.log((tgt.get(b, 0) + 1) / (tn + _DSIR_B))
        - math.log((rc + 1) / (rn + _DSIR_B))
        for b, rc in raw.items()
    }
    out = []
    for doc_id, cnt in per_doc.items():
        if sources[doc_id] == _DSIR_TARGET:
            continue
        # pinned bucket order — matches both engines' folds
        lw = 0.0
        for b in sorted(cnt):
            lw += cnt[b] * lr[b]
        u = (_h8(f"gumbel:{doc_id}") + 1) / 4294967297
        out.append((doc_id, len(cnt), lw, lw - math.log(-math.log(u))))
    out.sort(key=lambda r: (-r[3], r[0]))
    return out if k is None else out[:k]


def test_dsir_matches_pure_python(spark):
    docs = [
        (r.doc_id, r.source, r.text)
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    ]
    exp = _expected(docs)
    got = sample_dsir_importance(spark, SF_SMOKE).collect()
    assert len(got) == _DSIR_K
    assert [r.doc_id for r in got] == [e[0] for e in exp]
    for r, (doc_id, nb, lw, key) in zip(got, exp):
        assert r.n_buckets == nb
        assert abs(r.log_w - lw) < 5.1e-7  # operator rounds to 6dp
        assert abs(r.sel_key - key) < 5.1e-7


def test_dsir_selection_favors_high_weight(spark):
    """Gumbel-top-k samples ∝ exp(log_w): the selected docs' mean
    log-weight must exceed the full candidate pool's mean (a statistical
    tendency that is deterministic here because the Gumbel draws are
    md5-fixed)."""
    docs = [
        (r.doc_id, r.source, r.text)
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    ]
    pool = _expected(docs, k=None)
    got = sample_dsir_importance(spark, SF_SMOKE).collect()
    sel = {r.doc_id for r in got}
    assert len(pool) > len(sel)  # k truncation is real at this SF
    mean_sel = sum(r.log_w for r in got) / len(got)
    mean_pool = sum(e[2] for e in pool) / len(pool)
    assert mean_sel > mean_pool
