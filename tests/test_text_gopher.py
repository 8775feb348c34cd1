"""Gopher document-quality rules: hand-computed fixtures + corpus bounds."""

from __future__ import annotations

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.text import (
    _GOPHER_STOP_MIN,
    _GOPHER_WORDS_MAX,
    _GOPHER_WORDS_MIN,
    text_gopher_quality,
)


def _fixture_dir(spark, tmp_path):
    """documents.parquet with one doc per rule outcome."""
    long_ok = "the and " + " ".join(f"tok{i}" for i in range(30))  # 32 words
    too_short = "the and data"  # 3 words < min
    too_long = "the and " + " ".join(f"t{i}" for i in range(98))  # 100 words > max
    no_stop = " ".join(f"tok{i}" for i in range(30))  # 0 required stopwords
    symbols = "the and " + " ".join(["###"] * 30)  # symbol_ratio ≈ 0.94 > 0.1
    numeric = "the and " + " ".join(["111"] * 30)  # alpha ratio 2/32 < 0.8
    rows = [
        (1, "src0", "en", long_ok, len(long_ok)),
        (2, "src0", "en", too_short, len(too_short)),
        (3, "src0", "en", too_long, len(too_long)),
        (4, "src0", "en", no_stop, len(no_stop)),
        (5, "src0", "en", symbols, len(symbols)),
        (6, "src0", "en", numeric, len(numeric)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string, n_chars long"
    )
    d = str(tmp_path / "sf_fixture")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def test_gopher_hand_computed(spark, tmp_path):
    out = {
        r.doc_id: r
        for r in text_gopher_quality(spark, _fixture_dir(spark, tmp_path)).collect()
    }
    assert len(out) == 6
    ok = out[1]
    assert ok.n_words == 32
    assert ok.n_stopwords == 2
    assert ok.symbol_ratio == 0.0
    assert ok.alpha_word_ratio == 1.0
    assert ok.keep

    assert out[2].n_words == 3 and not out[2].keep  # below the word-count floor
    assert out[3].n_words == 100 and not out[3].keep  # above the ceiling
    assert out[4].n_stopwords == 0 and not out[4].keep  # stopword rule
    # '###' words: 30 of 32 words carry 3 '#' each → 90/32 > 0.1
    assert out[5].symbol_ratio == 90 / 32 and not out[5].keep
    # '111' words contain no alphabetic char → 2/32 alphabetic < 0.8
    assert out[6].alpha_word_ratio == 2 / 32 and not out[6].keep


def test_gopher_discriminates_on_corpus(spark):
    rows = text_gopher_quality(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(rows) == docs  # scoring is total: one verdict per document
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept < len(rows)  # thresholds split the corpus both ways
    for r in rows:
        assert _GOPHER_WORDS_MIN <= r.n_words <= _GOPHER_WORDS_MAX or not r.keep
        assert r.n_stopwords >= _GOPHER_STOP_MIN or not r.keep
        assert 0.0 <= r.alpha_word_ratio <= 1.0
