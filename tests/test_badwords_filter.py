"""text_badwords_filter (operators/text.py): the C4 blocklist stage —
whole-document drop on any blocklisted word, per-source report."""

from __future__ import annotations

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.text import _BADWORDS, text_badwords_filter


def test_custom_blocklist_drops_and_reports(spark):
    import mmeds_meta_spark.operators.text as tx

    docs = spark.createDataFrame(
        [
            (1, "clean words only", "en", "a", 16),
            (2, "contains badword here", "en", "a", 20),
            (3, "worse text badword again", "en", "b", 24),
            (4, "also fine", "en", "b", 9),
            (5, "two hits badword worse", "en", "b", 22),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = tx._t
    tx._t = lambda sp, sf, name: docs
    try:
        out = {
            r["source"]: r
            for r in text_badwords_filter(
                spark, "x", badwords=("badword", "worse", "absent")
            ).collect()
        }
    finally:
        tx._t = orig
    a, b = out["a"], out["b"]
    assert (a["n_docs"], a["n_dropped"]) == (2, 1)
    assert a["matched_words"] == "badword"
    assert (b["n_docs"], b["n_dropped"]) == (3, 2)
    assert b["matched_words"] == "badword,worse"  # sorted distinct union
    assert b["drop_ppm"] == 2 * 1_000_000 // 3


def test_gate_workload_hits_and_misses(spark):
    rows = text_badwords_filter(spark, SF_SMOKE).collect()
    # 'dup' occurs in a rare slice; the other blocklist entries never do
    assert sum(r["n_dropped"] for r in rows) > 0
    assert all(r["n_dropped"] < r["n_docs"] for r in rows)
    matched = {w for r in rows for w in r["matched_words"].split(",") if w}
    assert matched == {"dup"}
    assert set(_BADWORDS) >= matched
