"""Cross-engine conformance on a unicode-heavy corpus.

The fixture corpora are ASCII; this suite re-runs representative text /
dedup operators AND their DuckDB oracles on CJK, emoji, combining-mark,
and single-token documents — md5-over-UTF-8 and length semantics must
agree between engines for the portability contract to hold off the happy
path.
"""

from __future__ import annotations

import duckdb
import pytest

from mmeds_meta_spark.operators import registry

REG = registry()

_TEXTS = [
    "héllo wörld héllo wörld",            # latin + combining accents
    "日本語 テスト 日本語 テスト 日本語",       # CJK, repeated tokens
    "🌍 emoji 🌍 emoji test",               # astral-plane code points
    "x",                                    # single 1-char token
    "tab\tand space",                       # embedded tab inside a token
    "héllo wörld héllo wörld",            # exact duplicate of doc 0
]

OPS = [
    "dedup_span_exact",
    "text_novelty_ratio",
    "text_pii_scrub",
    "chunk_documents",
    "simjoin_prefix_jaccard",
    "text_fingerprint_bag",
]


@pytest.fixture(scope="module")
def uni_sf(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("uni")
    rows = [(i, t, "xx", "srcU", len(t)) for i, t in enumerate(_TEXTS)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def uni_duck(uni_sf):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{uni_sf}/documents.parquet/*.parquet'"
    )
    yield con


@pytest.mark.parametrize("name", OPS)
def test_unicode_matches_oracle(name, spark, uni_sf, uni_duck):
    spec = REG[name]
    df = spec.spark(spark, uni_sf)
    s_cols = [c.lower() for c in df.columns]
    s_rows = [tuple(r) for r in df.collect()]
    rel = uni_duck.sql(spec.oracle)
    d_cols = [c.lower() for c in rel.columns]
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    sn = sorted((tuple(r[i] for i in order_s) for r in s_rows), key=repr)
    dn = sorted((tuple(r[i] for i in order_d) for r in d_rows), key=repr)
    assert sn == dn, f"unicode value mismatch in {name}"
