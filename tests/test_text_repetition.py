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
