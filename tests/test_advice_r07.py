"""Round-7 advice regressions: cross-engine parity off the happy path.

1. ``dedup_exact_normalized``'s DuckDB oracle must pass the ``'g'`` flag —
   DuckDB's regexp_replace replaces only the FIRST match by default while
   Spark replaces all, so any text with >1 punctuation char or whitespace
   run diverged before the fix (the synthetic corpus is punctuation-free,
   which is exactly why the sweep never caught it).
2. ``dedup_lsh_tuning_curve``'s oracle must not raise when the corpus
   produces ZERO LSH candidate pairs (DuckDB's list_reduce errors on an
   empty list; the Spark side returns null expected_recall).
"""

from __future__ import annotations

import duckdb
import pytest

from mmeds_meta_spark.operators import registry

REG = registry()

# punctuation-heavy: multiple punctuation chars AND multiple whitespace
# runs per text, plus pairs that collide only after canonicalization
_PUNCT_TEXTS = [
    "Hello, World!!  multiple   spaces...",
    "hello world multiple spaces",            # normalized twin of doc 0
    "A.B.C  d--e  f!!g",                      # interleaved punct + runs
    "a b c  D—E  F G",                        # em-dash, case variants
    "Tabs\tand\t\tcommas,, everywhere;; ok",
    "  leading and trailing  ",
]


def _make_sf(spark, tmp_path_factory, texts, name):
    d = tmp_path_factory.mktemp(name)
    rows = [(i, t, "xx", "srcP", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _duck_for(sf_dir):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    return con


def _compare(spark, con, spec, sf_dir):
    df = spec.spark(spark, sf_dir)
    s_cols = [c.lower() for c in df.columns]
    s_rows = [tuple(r) for r in df.collect()]
    rel = con.sql(spec.oracle)
    d_cols = [c.lower() for c in rel.columns]
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    sn = sorted((tuple(r[i] for i in order_s) for r in s_rows), key=repr)
    dn = sorted((tuple(r[i] for i in order_d) for r in d_rows), key=repr)
    assert sn == dn
    return s_rows, s_cols


def test_exact_normalized_parity_on_punctuated_text(spark, tmp_path_factory):
    sf = _make_sf(spark, tmp_path_factory, _PUNCT_TEXTS, "punct")
    con = _duck_for(sf)
    rows, cols = _compare(spark, con, REG["dedup_exact_normalized"], sf)
    # the canonicalized twin pair must actually merge (2 raw variants under
    # one normalized fingerprint) — proves the normalization did its job on
    # punctuated input, not just that both engines agree on a no-op
    by = {c: i for i, c in enumerate(cols)}
    assert any(r[by["n_raw_variants"]] == 2 and r[by["n_docs"]] == 2 for r in rows)


def test_norm_expr_squeezes_all_runs_in_duckdb():
    from mmeds_meta_spark.operators.dedup import _norm_expr

    con = duckdb.connect()
    lit = "'Hello, World!!  multiple   spaces...'"
    got = con.sql(f"SELECT {_norm_expr('duck', lit)} AS t").fetchone()[0]
    assert got == "hello world multiple spaces"


def test_lsh_tuning_curve_oracle_survives_zero_candidates(
    spark, tmp_path_factory
):
    # single-token docs produce no word-2-gram shingles -> no MinHash
    # signatures -> zero LSH candidate pairs
    sf = _make_sf(spark, tmp_path_factory, ["alpha", "beta", "gamma"], "nocand")
    con = _duck_for(sf)
    rows, cols = _compare(spark, con, REG["dedup_lsh_tuning_curve"], sf)
    by = {c: i for i, c in enumerate(cols)}
    assert rows, "one row per (bands, rows_per_band) config expected"
    assert all(r[by["expected_recall"]] is None for r in rows)
