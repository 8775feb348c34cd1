"""Round-9 advice regressions: filesystem-honest store probes, one
source of truth for shared constants, and engine parity off the happy
path.

1. ``read_store`` probed the store with LOCAL ``glob.glob`` — a store
   addressed by any URI scheme Spark itself supports (``file:``, and by
   extension HDFS/S3) silently read back as EMPTY.  The probe now goes
   through Spark's Hadoop FileSystem API, so scheme-qualified paths
   resolve against the filesystem they name.
2. ``_diff_abundance_sql`` hardcoded its chi-square critical values
   while the Spark side imports ``_CHI2_05`` — the SQL builder must
   interpolate the same table so an edit to either side cannot break
   cross-engine parity silently.
3. ``pipeline_mixture_plan`` on mirrored crawls (every source fully
   contained by a partner): effective tokens are all 0, w_tot is 0, and
   the old ``w_raw / w_tot`` emitted NaN on Spark vs NULL on DuckDB.
   Both engines must now emit NULL.
4. ``w20_time_decay_attribution`` on very long journeys: the other
   touches' ROUND() overshoot can exceed the last touch's share, so the
   reconstructed remainder went negative.  Both engines clamp at 0.
5. Session hygiene: no bare ``.cache()`` call sites under the package —
   every multi-consumer relation uses localCheckpoint (never leaks
   storage blocks across a long-lived session).
"""

from __future__ import annotations

import pathlib
import re

import duckdb

from mmeds_meta_spark.operators import registry

REG = registry()

PKG = pathlib.Path(__file__).resolve().parents[1] / "mmeds_meta_spark"


def test_read_store_resolves_uri_scheme_paths(spark, tmp_path):
    from mmeds_meta_spark.streaming._store import read_store

    store = tmp_path / "fed_uri"
    spark.createDataFrame([(1, 10), (2, 20)], "k INT, v INT").coalesce(
        1
    ).write.parquet(str(store / "batch_id=0"))
    # the old glob.glob probe treated 'file:/...' as a literal local path
    # (no such directory) and returned the empty identity for a FED store
    got = sorted(
        tuple(r)
        for r in read_store(spark, f"file:{store}", "k INT, v BIGINT").collect()
    )
    assert got == [(1, 10), (2, 20)]


def test_read_store_unfed_uri_scheme_is_empty(spark, tmp_path):
    from mmeds_meta_spark.streaming._store import read_store

    df = read_store(spark, f"file:{tmp_path}/nope", "pos BIGINT")
    assert df.columns == ["pos"] and df.collect() == []
    # present but without committed batch partitions
    (tmp_path / "unfed").mkdir()
    df2 = read_store(spark, f"file:{tmp_path}/unfed", "a STRING, b BIGINT")
    assert df2.columns == ["a", "b"] and df2.collect() == []


def test_diff_abundance_sql_shares_chi2_table():
    from mmeds_meta_spark.functions.diff_abundance import _CHI2_05
    from mmeds_meta_spark.operators.diversity import _diff_abundance_sql

    sql = _diff_abundance_sql()
    for df_, v in _CHI2_05.items():
        assert f"WHEN k - 1 = {df_} THEN CAST({v} AS DOUBLE)" in sql


def _docs_sf(spark, tmp_path, rows):
    d = tmp_path / "sfdocs"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_mixture_plan_mirrored_crawls_null_not_nan(spark, tmp_path):
    # two sources carrying IDENTICAL shingle vocabularies: containment is
    # 1.0 both ways -> effective_tokens 0 -> w_tot 0 -> the old 0/0 was
    # NaN on Spark vs NULL on DuckDB
    text = "alpha beta gamma delta epsilon zeta"
    sf = _docs_sf(
        spark,
        tmp_path,
        [
            (1, text, "en", "crawl_a", len(text)),
            (2, text, "en", "crawl_b", len(text)),
        ],
    )
    spec = REG["pipeline_mixture_plan"]
    s_rows = {r["source"]: r["mix_weight"] for r in spec.spark(spark, sf).collect()}
    assert s_rows == {"crawl_a": None, "crawl_b": None}
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    rel = con.sql(spec.oracle)
    cols = [c.lower() for c in rel.columns]
    d_rows = {r[cols.index("source")]: r[cols.index("mix_weight")] for r in rel.fetchall()}
    assert d_rows == s_rows


def _events_sf(spark, tmp_path, rows):
    d = tmp_path / "sfevents"
    spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def test_w20_long_journey_remainder_clamped(spark, tmp_path):
    # 1998 equal-weight touches: each micro share is 1e6/1998 = 500.5005
    # -> ROUND gives 501, so the other touches sum to 1997*501 = 1000497
    # > 1e6 and the pre-fix remainder for the last touch was -497
    n = 1998
    rows = [
        (i, "2024-01-01 00:00:00", 1, "click", 1.0, "{}") for i in range(n)
    ] + [(9999, "2024-01-02 00:00:00", 1, "purchase", 1.0, "{}")]
    sf = _events_sf(spark, tmp_path, rows)
    spec = REG["w20_time_decay_attribution"]
    df = spec.spark(spark, sf)
    s_rows = sorted(tuple(r) for r in df.collect())
    assert all(r[2] >= 0.0 for r in s_rows), "negative channel credit"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'"
    )
    rel = con.sql(spec.oracle)
    assert sorted(c.lower() for c in rel.columns) == sorted(
        c.lower() for c in df.columns
    )
    assert sorted(tuple(r) for r in rel.fetchall()) == s_rows


def test_no_bare_cache_call_sites_in_package():
    # call sites look like `<expr>.cache()`; prose mentions in comments
    # and docstrings put a space before the dot
    pat = re.compile(r"[\w\)\]\"']\.cache\(\)")
    hits = [
        f"{p.relative_to(PKG)}:{i}"
        for p in sorted(PKG.rglob("*.py"))
        for i, line in enumerate(p.read_text().splitlines(), 1)
        if pat.search(line)
    ]
    assert hits == []
