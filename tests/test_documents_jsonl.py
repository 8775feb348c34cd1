"""JSONL corpus reader: schema enforcement, corrupt-line quarantine,
round-trip fidelity against the parquet documents table."""

from __future__ import annotations

import json

from conftest import SF_SMOKE


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    from mmeds_meta_spark.sources.documents_jsonl import (
        read_documents_jsonl,
        write_documents_jsonl,
    )

    pq = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = tmp_path / "corpus_jsonl"
    write_documents_jsonl(pq, str(out), partitions=3)

    docs, rejects = read_documents_jsonl(spark, str(out))
    assert rejects.count() == 0
    want = sorted(map(tuple, pq.collect()))
    got = sorted(map(tuple, docs.select(*pq.columns).collect()))
    assert got == want  # byte-faithful round trip


def test_jsonl_corrupt_and_partial_lines(spark, tmp_path):
    from mmeds_meta_spark.sources.documents_jsonl import read_documents_jsonl

    p = tmp_path / "feed.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "a b c", "lang": "en", "source": "s1", "n_chars": 5}),
        json.dumps({"doc_id": 2, "text": "dd ee", "lang": "en", "source": "s1"}),  # n_chars absent
        '{"doc_id": 3, "text": "unterminated',  # malformed JSON
        json.dumps({"doc_id": None, "text": "orphan"}),  # no id -> dropped
        json.dumps({"doc_id": 4, "text": None}),  # no text -> dropped
    ]
    p.write_text("\n".join(lines) + "\n")
    docs, rejects = read_documents_jsonl(spark, str(p))
    rows = {r.doc_id: r for r in docs.collect()}
    assert set(rows) == {1, 2}
    assert rows[2].n_chars == 5  # backfilled from len(text)
    assert rows[1].n_chars == 5  # explicit value preserved
    bad = [r.raw_line for r in rejects.collect()]
    assert bad == ['{"doc_id": 3, "text": "unterminated']
