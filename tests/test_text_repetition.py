"""Gopher-style repetition signals: hand-computed fixtures + edge cases."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.text import (
    _REP_DUP3_MAX,
    _REP_TOP2_MAX,
    text_repetition_signals,
)


def _fixture_dir(spark, tmp_path):
    """documents.parquet with hand-computable repetition structure."""
    rows = [
        # "a b a b a b": 2-grams [ab, ba, ab, ba, ab] → top2 = 3/5;
        # 3-grams [aba, bab, aba, bab] → dup3 = (4-2)/4 = 0.5 → dropped
        (1, "src0", "en", "a b a b a b", 11),
        # all-distinct tokens: top2 = 1/4, dup3 = 0 → top2 > 0.20 → dropped
        (2, "src0", "en", "v w x y z", 9),
        # long distinct text: top2 = 1/7 ≤ 0.2, dup3 = 0 → kept
        (3, "src0", "en", "q r s t u v w x", 15),
        # single token: no grams at all → 0.0 / 0.0 → kept
        (4, "src0", "en", "solo", 4),
        # empty text: split → [''] → no grams → kept
        (5, "src0", "en", "", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string, n_chars long"
    )
    d = str(tmp_path / "sf_fixture")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def test_repetition_hand_computed(spark, tmp_path):
    out = {
        r.doc_id: r
        for r in text_repetition_signals(spark, _fixture_dir(spark, tmp_path)).collect()
    }
    assert len(out) == 5
    assert out[1].top_2gram_frac == 3 / 5
    assert out[1].dup_3gram_frac == 2 / 4
    assert not out[1].keep
    assert out[2].top_2gram_frac == 1 / 4
    assert out[2].dup_3gram_frac == 0.0
    assert not out[2].keep  # 0.25 > 0.20 top-2-gram cutoff
    assert out[3].top_2gram_frac == 1 / 7
    assert out[3].keep
    for doc in (4, 5):
        assert out[doc].top_2gram_frac == 0.0
        assert out[doc].dup_3gram_frac == 0.0
        assert out[doc].keep


def test_repetition_covers_every_doc_and_bounds(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = text_repetition_signals(spark, SF_SMOKE)
    assert out.count() == docs.count()
    bad = out.filter(
        (F.col("top_2gram_frac") < 0)
        | (F.col("top_2gram_frac") > 1)
        | (F.col("dup_3gram_frac") < 0)
        | (F.col("dup_3gram_frac") > 1)
        | (
            F.col("keep")
            != (
                (F.col("top_2gram_frac") <= _REP_TOP2_MAX)
                & (F.col("dup_3gram_frac") <= _REP_DUP3_MAX)
            )
        )
    )
    assert bad.count() == 0


def test_lm_score_matches_pandas_unigram(spark):
    """The in-plan unigram LM must agree with a pandas reimplementation:
    same capped vocab, same add-one smoothing, same mean log-prob."""
    import math

    import pandas as pd
    import pytest

    from mmeds_meta_spark.operators.text import text_lm_score

    pdf = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    toks = pdf["text"].str.split(" ")
    counts = pd.Series([t for ts in toks for t in ts]).value_counts()
    n_tot = int(counts.sum())
    v = len(counts)  # corpus vocab < 50k cap -> all kept
    expected = {
        row.doc_id: sum(
            math.log((counts.get(t, 0) + 1) / (n_tot + v + 1)) for t in ts
        )
        / len(ts)
        for row, ts in zip(pdf.itertuples(), toks)
    }

    out = {
        r.doc_id: r for r in text_lm_score(spark, SF_SMOKE).collect()
    }
    assert set(out) == set(expected)
    for doc_id, exp_mean in expected.items():
        r = out[doc_id]
        assert r.mean_logprob == pytest.approx(exp_mean, abs=5.1e-7)
        assert r.ppl_proxy == pytest.approx(
            math.exp(-r.mean_logprob), abs=5.1e-7
        )
        assert r.mean_logprob < 0 and r.ppl_proxy > 1
