"""Regression tests for the three round-11 ADVICE items (plus the
round-10 verdict's PSL follow-ups that land in the same module).

1. demux_validate's reads-side join must be a BROADCAST hash join —
   the old ``reads ⟖ broadcast(mapping)`` RightOuter form silently
   degraded to a full shuffle of the reads corpus (Spark cannot build
   on the preserved side of a RightOuter join).  Zero-read samples
   still come back, via the bounded left join onto mapping.
2. urls._psl_pairs() dead code is deleted.
3. load_psl keeps exception priority ('2') when a ``*.x`` wildcard
   line collides with an earlier ``!x`` exception key (the upstream
   list never collides these, but the parser claims full-format
   support so it must honor PSL priority anyway).

Verdict follow-ups:

4. the shipped resource is the FULL upstream publicsuffix.org list
   (~9.5k rules incl. IDN + PRIVATE sections), not the 1,038-rule
   snapshot;
5. ``icann_only=`` groups platform subdomains under the platform's
   registrable domain, with Spark/DuckDB parity in BOTH settings.
"""

from __future__ import annotations

import duckdb
import pytest

from mmeds_meta_spark.operators.demux import demux_validate


def _demux_frames(spark):
    reads = spark.createDataFrame(
        [
            ("a", "CTCGACTT", "ATCGTACG"),
            ("a", "CTCGACTA", "ATCGTACG"),
            ("b", "GGAATTCC", "TTGGCCAA"),
        ],
        "sample_id string, fwd string, rev string",
    )
    mapping = spark.createDataFrame(
        [
            ("a", "CTCGACTT", "ATCGTACG"),
            ("b", "GGAATTCC", "TTGGCCAA"),
            ("ghost", "AAAAAAAA", "CCCCCCCC"),
        ],
        "sample_id string, fwd_bc string, rev_bc string",
    )
    return reads, mapping


def test_demux_validate_reads_join_is_broadcast(spark):
    reads, mapping = _demux_frames(spark)
    plan = demux_validate(reads, mapping)._jdf.queryExecution().executedPlan().toString()
    # both joins (reads⋈mapping, mapping⟕per-sample agg) build broadcast
    # hash tables; the reads corpus is never exchanged on sample_id
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_demux_validate_keeps_zero_read_samples(spark):
    reads, mapping = _demux_frames(spark)
    got = {r["sample_id"]: r for r in demux_validate(reads, mapping).collect()}
    assert set(got) == {"a", "b", "ghost"}
    g = got["ghost"]
    assert (g["n_reads"], g["n_exact"], g["n_kept"], g["n_stripped"]) == (0, 0, 0, 0)
    assert g["share_ppm"] == 0
    assert got["a"]["share_ppm"] == 2 * 1_000_000 // 3


def test_psl_pairs_dead_code_deleted():
    from mmeds_meta_spark.functions import urls

    assert not hasattr(urls, "_psl_pairs")


def test_load_psl_wildcard_never_demotes_exception(tmp_path):
    from mmeds_meta_spark.functions.urls import load_psl

    p = tmp_path / "psl.dat"
    # adversarial orderings: wildcard after exception, plain after
    # exception — exception priority ('2') must survive both
    p.write_text("!www.ck\n*.www.ck\nwww.ck\n*.ck\nck\n")
    rules = load_psl(path=str(p))
    assert rules["www.ck"] == "2"
    assert rules["ck"] == "3"  # plain + wildcard parent


def test_resource_is_full_upstream_list():
    from mmeds_meta_spark.functions.urls import load_psl

    full = load_psl()
    assert len(full) > 9000
    # long-tail rules absent from the old 1,038-rule snapshot: a ccTLD
    # second-level, an IDN rule, and a 4-label private-section rule
    assert full.get("gov.mo") == "0"
    assert "公司.cn" in full
    assert any(k.count(".") >= 3 for k in full)
    icann = load_psl(icann_only=True)
    assert len(icann) < len(full)
    assert "blogspot.com" in full and "blogspot.com" not in icann


@pytest.mark.parametrize("icann_only", [False, True])
def test_registrable_domain_icann_toggle_parity(spark, icann_only):
    from mmeds_meta_spark.functions.urls import (
        registrable_domain,
        registrable_domain_sql,
    )

    hosts = [
        "x.user.blogspot.com",  # private: user.blogspot.com; icann: blogspot.com
        "proj.github.io",
        "a.b.site.co.uk",  # ICANN rule — identical both settings
        "deep.sub.site.com",
        "localhost",
        "foo.bar.ck",
        "a.city.kobe.jp",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    s = [
        r[0]
        for r in df.select(
            registrable_domain("host", icann_only=icann_only)
        ).collect()
    ]
    d = [
        r[0]
        for r in duckdb.sql(
            "SELECT "
            + registrable_domain_sql("host", icann_only=icann_only)
            + " FROM (SELECT unnest(?) AS host)",
            params=[hosts],
        ).fetchall()
    ]
    assert s == d
    want_blog = "blogspot.com" if icann_only else "user.blogspot.com"
    assert s[0] == want_blog
    assert s[2] == "site.co.uk"  # ICANN rules unaffected by the toggle
