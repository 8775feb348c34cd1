"""dedup_paragraphs_ccnet (operators/dedup.py): CCNet keep-first
paragraph dedup with normalization + document reassembly — semantics
pinned on hand-built corpora, plus the gate workload's invariants."""

from __future__ import annotations

import pyspark.sql.functions as F
from conftest import SF_SMOKE

from mmeds_meta_spark.operators.dedup import (
    _PARA_K,
    dedup_paragraphs_ccnet,
)


def _run_on(spark, texts, k=2, monkey=None):
    # build a tiny documents relation and run the operator through its
    # internal pieces by substituting the table loader
    import mmeds_meta_spark.operators.dedup as dd

    df = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = dd._t
    dd._t = lambda sp, sf, name: df
    try:
        return {r["doc_id"]: r for r in dedup_paragraphs_ccnet(spark, "x", k=k).collect()}
    finally:
        dd._t = orig


def test_keep_first_occurrence_and_reassembly(spark):
    # doc0: [a b][c d]; doc1: [c d][e f] -> doc1 loses 'c d' (first
    # occurrence is doc0 pos1), keeps 'e f'
    out = _run_on(spark, ["a b c d", "c d e f"], k=2)
    assert (out[0]["n_paras"], out[0]["n_removed"]) == (2, 0)
    assert (out[1]["n_paras"], out[1]["n_removed"]) == (2, 1)
    import hashlib

    assert out[0]["text_dedup_md5"] == hashlib.md5(b"a b c d").hexdigest()
    assert out[1]["text_dedup_md5"] == hashlib.md5(b"e f").hexdigest()


def test_within_document_duplicates_fold_too(spark):
    # the same paragraph twice INSIDE one document: second copy removed
    out = _run_on(spark, ["x y x y"], k=2)
    assert (out[0]["n_paras"], out[0]["n_removed"]) == (2, 1)


def test_normalization_folds_case_and_digits(spark):
    # 'Page 12 intro' vs 'page 99 intro' hash together after CCNet
    # normalization (lowercase + digits dropped); first occurrence wins
    out = _run_on(spark, ["Page 12 intro", "page 99 intro"], k=3)
    assert out[0]["n_removed"] == 0
    assert out[1]["n_removed"] == 1
    assert out[1]["n_chars_dedup"] == 0  # fully deduped doc -> empty


def test_gate_workload_invariants(spark):
    rows = dedup_paragraphs_ccnet(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert len(rows) == docs.count()
    # the synthetic corpus genuinely contains cross-document duplicate
    # paragraphs, and the kept text never exceeds the original
    assert sum(r["n_removed"] for r in rows) > 0
    n_by_doc = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.expr(f"size(split(text, ' ')) div {_PARA_K} + 1").alias("n")
        ).collect()
    }
    for r in rows:
        assert 0 <= r["n_removed"] <= r["n_paras"]
        assert r["n_paras"] <= n_by_doc[r["doc_id"]]
