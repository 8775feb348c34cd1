"""Naive-Bayes classifier: independent pure-Python recomputation of the
full train+apply surface (split, vocab cap, smoothing, priors, argmax).
"""

from __future__ import annotations

import hashlib
import math

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.text import (
    _NB_TRAIN_BYTE,
    _NB_VOCAB_K,
    text_nb_classifier,
)


def _is_train(doc_id: int) -> bool:
    # unbiased half of the hash space: first md5 byte < 128
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:2], 16) < _NB_TRAIN_BYTE


def _expected(docs):
    train = [(i, g, t.split(" ")) for i, g, t in docs if _is_train(i)]
    ev = [(i, g, t.split(" ")) for i, g, t in docs if not _is_train(i)]
    tc: dict[str, int] = {}
    for _, _, toks in train:
        for t in toks:
            tc[t] = tc.get(t, 0) + 1
    vocab = {t for t, _ in sorted(tc.items(), key=lambda kv: (-kv[1], kv[0]))[:_NB_VOCAB_K]}
    v = len(vocab) + 1  # + OOV symbol
    n_c: dict[str, int] = {}
    d_c: dict[str, int] = {}
    cnt: dict[tuple[str, str], int] = {}
    for _, g, toks in train:
        d_c[g] = d_c.get(g, 0) + 1
        for t in toks:
            s = t if t in vocab else ""
            n_c[g] = n_c.get(g, 0) + 1
            cnt[(g, s)] = cnt.get((g, s), 0) + 1
    d_tot, n_cls = sum(d_c.values()), len(d_c)
    out = {}
    for doc_id, g, toks in ev:
        best = None
        for cls in sorted(d_c):
            t = math.log((d_c[cls] + 1) / (d_tot + n_cls))
            for tok in toks:  # token order == pinned pos order
                s = tok if tok in vocab else ""
                t += math.log((cnt.get((cls, s), 0) + 1) / (n_c[cls] + v))
            if best is None or t > best[1]:
                best = (cls, t)
        out[doc_id] = (g, best[0], best[1])
    return out


def test_nb_matches_pure_python(spark):
    docs = [
        (r.doc_id, r.lang, r.text)
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "lang", "text")
        .collect()
    ]
    exp = _expected(docs)
    got = text_nb_classifier(spark, SF_SMOKE).collect()
    assert len(got) == len(exp)
    for r in got:
        lang, pred, lp = exp[r.doc_id]
        assert r.lang == lang
        assert r.pred_lang == pred
        assert abs(r.log_posterior - lp) < 5.1e-7  # operator rounds to 6dp
        assert r.correct == (lang == pred)


def test_nb_split_is_disjoint_and_deterministic(spark):
    a = {r.doc_id for r in text_nb_classifier(spark, SF_SMOKE).collect()}
    b = {r.doc_id for r in text_nb_classifier(spark, SF_SMOKE).collect()}
    assert a == b
    assert all(not _is_train(i) for i in a)  # only held-out docs are scored
