"""URL canonicalization + per-domain cap (operators/web.py) — the
WET-path domain stage.  Covers the canonicalization rules one by one on
hand-crafted URLs (the real API: ``urls=`` override), the registrable-
domain suffix walk, and the domain cap's two-phase routing on skewed
synthetic data (under-cap domains must pass through, over-cap domains
must keep exactly ``cap`` documents chosen by the md5 rank).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from mmeds_meta_spark.functions.urls import (
    canonical_sql,
    registrable_domain,
    url_canonical,
)
from mmeds_meta_spark.operators.web import dedup_url_canonical, sample_domain_cap

CASES = [
    # (raw, canonical)
    ("http://example.com/a", "http://example.com/a"),
    ("HTTP://EXAMPLE.COM/a", "http://example.com/a"),  # scheme+host case
    ("http://www.example.com/a", "http://example.com/a"),  # www.
    ("http://example.com:80/a", "http://example.com/a"),  # default port
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),  # kept
    ("http://example.com/a/", "http://example.com/a"),  # trailing slash
    ("http://example.com/", "http://example.com"),  # root path folds
    ("http://example.com", "http://example.com"),
    ("http://example.com/a#sec", "http://example.com/a"),  # fragment
    ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),  # sort
    (
        "http://example.com/a?utm_source=x&id=4&fbclid=zz",
        "http://example.com/a?id=4",
    ),  # tracking params
    ("http://example.com/a?utm_source=x", "http://example.com/a"),  # all dropped
    ("http://example.com/A", "http://example.com/A"),  # path case KEPT
]


def test_url_canonical_rules(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)], "i long, url string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", url_canonical("url").alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, raw


def test_canonical_sql_matches_spark(spark):
    import duckdb

    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    s = [r["c"] for r in df.select(url_canonical("url").alias("c")).collect()]
    d = [
        r[0]
        for r in duckdb.sql(
            "SELECT "
            + canonical_sql("url")
            + " FROM (SELECT unnest(?) AS url)",
            params=[[u for u, _ in CASES]],
        ).fetchall()
    ]
    assert s == d


def test_registrable_domain_suffix_walk(spark):
    # real-PSL semantics (resources/public_suffix_list.dat): longest
    # matching rule + one label; wildcards (*.ck, *.kobe.jp), exceptions
    # (!www.ck, !city.kobe.jp), private-section platform suffixes, and
    # the default rule '*' for unlisted TLDs
    hosts = [
        ("a.b.site.co.uk", "site.co.uk"),  # 2-label rule wins over 'uk'
        ("shop.vendas.com.br", "vendas.com.br"),
        ("news.kabu.co.jp", "kabu.co.jp"),
        ("deep.sub.site.com", "site.com"),
        ("site.org", "site.org"),
        ("localhost", "localhost"),  # single label -> host itself
        ("co.uk", "co.uk"),  # host IS a public suffix -> host itself
        ("a.b.frobnitz", "b.frobnitz"),  # unlisted TLD -> default rule '*'
        ("x.user.blogspot.com", "user.blogspot.com"),  # private section
        ("foo.bar.ck", "foo.bar.ck"),  # wildcard *.ck
        ("foo.www.ck", "www.ck"),  # exception !www.ck
        ("shop.example.kobe.jp", "shop.example.kobe.jp"),  # *.kobe.jp
        ("a.city.kobe.jp", "city.kobe.jp"),  # !city.kobe.jp
    ]
    df = spark.createDataFrame(hosts, "host string, want string")
    bad = df.select(
        "host", "want", registrable_domain("host").alias("got")
    ).filter(F.col("got") != F.col("want"))
    assert bad.collect() == []


def test_registrable_domain_sql_matches_spark(spark):
    # both engines derive the walk from the SAME load_psl() relation —
    # this pins the DuckDB transcription to the Spark expression on a
    # host set covering every rule kind
    import duckdb

    from mmeds_meta_spark.functions.urls import load_psl, registrable_domain_sql

    assert len(load_psl()) > 1000  # the resource relation, not a stub
    hosts = [
        "a.b.site.co.uk", "shop.vendas.com.br", "news.kabu.co.jp",
        "deep.sub.site.com", "site.org", "localhost", "co.uk",
        "a.b.frobnitz", "x.user.blogspot.com", "foo.bar.ck", "www.ck",
        "foo.www.ck", "shop.example.kobe.jp", "a.city.kobe.jp",
        "b.act.edu.au", "proj.github.io",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    s = [r[0] for r in df.select(registrable_domain("host")).collect()]
    d = [
        r[0]
        for r in duckdb.sql(
            "SELECT " + registrable_domain_sql("host")
            + " FROM (SELECT unnest(?) AS host)",
            params=[hosts],
        ).fetchall()
    ]
    assert s == d


def _urls_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string, n_chars long")


def test_dedup_url_canonical_real_api(spark):
    urls = _urls_df(
        spark,
        [
            (1, "http://www.example.com/a?utm_source=x", 10),
            (2, "HTTP://EXAMPLE.COM:80/a", 10),  # same canonical as 1
            (3, "https://example.com/a", 10),  # scheme differs -> distinct
            (4, "http://example.com/b", 10),
        ],
    )
    got = {
        r["url_canonical"]: (r["n_docs"], r["keeper_doc_id"])
        for r in dedup_url_canonical(spark, "unused", urls=urls).collect()
    }
    assert got == {"http://example.com/a": (2, 1)}


def test_domain_cap_two_phase_routing(spark):
    # mega.com: 8 docs (over cap 3); tail.org: 2 docs (under cap)
    rows = [(i, f"http://sub{i % 2}.mega.com/p/{i}", 5) for i in range(8)] + [
        (100, "http://tail.org/x", 5),
        (101, "http://tail.org/y", 5),
    ]
    out = sample_domain_cap(spark, "unused", cap=3, urls=_urls_df(spark, rows)).collect()
    by_domain: dict[str, list] = {}
    for r in out:
        by_domain.setdefault(r["domain"], []).append(r)
    assert sorted(by_domain) == ["mega.com", "tail.org"]
    assert len(by_domain["tail.org"]) == 2
    assert all(r["kept"] for r in by_domain["tail.org"])
    assert len(by_domain["mega.com"]) == 8
    assert sum(r["kept"] for r in by_domain["mega.com"]) == 3
    # deterministic: same inputs -> same kept set
    again = sample_domain_cap(spark, "unused", cap=3, urls=_urls_df(spark, rows))
    kept1 = sorted(r["doc_id"] for r in out if r["kept"])
    kept2 = sorted(r["doc_id"] for r in again.collect() if r["kept"])
    assert kept1 == kept2


def test_wet_target_uri_feeds_url_ops(spark, tmp_path):
    """The REAL producer path: WET records' target_uri drives the URL
    dedup and the domain cap directly (no synthetic workload)."""
    from mmeds_meta_spark.sources.wet import register_wet_source, write_wet

    d = tmp_path / "dump_url"
    d.mkdir()
    recs = [
        {"uri": "http://www.site-a.example.com/page?utm_source=x", "text": "one two"},
        {"uri": "HTTP://SITE-A.EXAMPLE.COM:80/page", "text": "three four"},  # dup of ^
        {"uri": "https://site-b.co.uk/p/1", "text": "five six"},
        {"uri": "https://site-b.co.uk/p/2", "text": "seven eight"},
        {"uri": "https://site-b.co.uk/p/3", "text": "nine ten"},
    ]
    write_wet(recs, str(d / "seg.wet.gz"))
    register_wet_source(spark)
    wet = spark.read.format("wet").load(str(d))
    urls = wet.selectExpr(
        "record_id AS doc_id", "target_uri AS url", "n_chars"
    )
    groups = dedup_url_canonical(spark, "unused", urls=urls).collect()
    assert len(groups) == 1
    assert groups[0]["url_canonical"] == "http://site-a.example.com/page"
    assert groups[0]["n_docs"] == 2

    capped = sample_domain_cap(spark, "unused", cap=2, urls=urls).collect()
    by_domain = {}
    for r in capped:
        by_domain.setdefault(r["domain"], []).append(r["kept"])
    # real-PSL grouping: site-a.example.com registers under 'com', so its
    # registrable domain is example.com; site-b.co.uk under the co.uk rule
    assert sorted(by_domain) == ["example.com", "site-b.co.uk"]
    assert sum(by_domain["site-b.co.uk"]) == 2  # capped at 2 of 3
    assert all(by_domain["example.com"])  # under cap -> all kept


# ---------------------------------------------------------------------------
# host-level PageRank
# ---------------------------------------------------------------------------


def _python_pagerank_twin(sf_dir: str):
    """Third-engine twin: rebuild the synthetic host graph and run the
    IDENTICAL integer micro-unit recurrence in pure Python ints."""
    import duckdb

    from mmeds_meta_spark.operators.web import (
        _HUB,
        _PR_DAMP,
        _PR_ITERS,
        _PR_SCALE,
        _PR_TELEPORT,
    )

    rows = duckdb.sql(
        f"SELECT doc_id, source FROM '{sf_dir}/documents.parquet'"
    ).fetchall()

    def host(k: int, s: str) -> str:
        suffix = {1: "co.uk", 2: "com.br", 3: "co.jp"}.get(
            (k % 20) % 4, "example.com"
        )
        return f"s{k % 3}.{s}.{suffix}"

    edges: dict[tuple[str, str], int] = {}
    for d, s in rows:
        src = host(d, s)  # == the canonicalized synthetic URL's host
        for dst in (
            host(d * 7 + 1, s),
            _HUB if d % 10 < 3 else host(d * 5 + 11, s),
        ):
            if dst != src:
                edges[(src, dst)] = edges.get((src, dst), 0) + 1
    w_out: dict[str, int] = {}
    n_out: dict[str, int] = {}
    for (src, _), w in edges.items():
        w_out[src] = w_out.get(src, 0) + w
        n_out[src] = n_out.get(src, 0) + 1
    p = {e: (w * _PR_SCALE) // w_out[e[0]] for e, w in edges.items()}
    nodes = {h for e in edges for h in e}
    rank = {h: _PR_SCALE for h in nodes}
    for _ in range(_PR_ITERS):
        contrib = {h: 0 for h in nodes}
        for (src, dst), pm in p.items():
            contrib[dst] += (rank[src] * pm) // _PR_SCALE
        rank = {
            h: _PR_TELEPORT + (_PR_DAMP * contrib[h]) // 1000 for h in nodes
        }
    return rank, w_out, n_out


def test_pagerank_matches_python_twin(spark):
    from tests.conftest import SF_SMOKE

    from mmeds_meta_spark.operators.web import web_host_pagerank

    got = {
        r["host"]: (r["rank_micro"], r["w_out"], r["n_out"])
        for r in web_host_pagerank(spark, SF_SMOKE).collect()
    }
    rank, w_out, n_out = _python_pagerank_twin(SF_SMOKE)
    want = {
        h: (rank[h], w_out.get(h, 0), n_out.get(h, 0)) for h in rank
    }
    assert got == want


def test_pagerank_hub_and_mass_properties(spark):
    from tests.conftest import SF_SMOKE

    from mmeds_meta_spark.operators.web import (
        _HUB,
        _PR_SCALE,
        _PR_TELEPORT,
        web_host_pagerank,
    )

    out = web_host_pagerank(spark, SF_SMOKE).collect()
    by_host = {r["host"]: r for r in out}
    hub = by_host[_HUB]
    # the hub is dangling: inlinks only
    assert hub["w_out"] == 0 and hub["n_out"] == 0
    # the hub's inlink skew puts it at the top of the ranking
    assert hub["rank_micro"] == max(r["rank_micro"] for r in out)
    # every rank >= teleport floor; floors + dangling leak keep total
    # mass at or below the initial |nodes| * SCALE
    assert all(r["rank_micro"] >= _PR_TELEPORT for r in out)
    assert sum(r["rank_micro"] for r in out) <= len(out) * _PR_SCALE


def test_harmonic_matches_python_bfs_twin(spark):
    from tests.conftest import SF_SMOKE

    from mmeds_meta_spark.operators.web import (
        _HC_HOPS,
        _PR_SCALE,
        web_host_harmonic,
    )

    # rebuild the edge set exactly as the pagerank twin does, then run a
    # hop-bounded BFS from every node in pure Python ints
    _, w_out, _ = _python_pagerank_twin(SF_SMOKE)
    import duckdb

    from mmeds_meta_spark.operators.web import _HUB

    rows = duckdb.sql(
        f"SELECT doc_id, source FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()

    def host(k: int, s: str) -> str:
        suffix = {1: "co.uk", 2: "com.br", 3: "co.jp"}.get(
            (k % 20) % 4, "example.com"
        )
        return f"s{k % 3}.{s}.{suffix}"

    adj: dict[str, set[str]] = {}
    nodes: set[str] = set()
    for d, s in rows:
        src = host(d, s)
        for dst in (
            host(d * 7 + 1, s),
            _HUB if d % 10 < 3 else host(d * 5 + 11, s),
        ):
            if dst != src:
                adj.setdefault(src, set()).add(dst)
                nodes.update((src, dst))
    harmonic = {v: 0 for v in nodes}
    n_reach = {v: 0 for v in nodes}
    for u in nodes:
        seen = {u: 0}
        frontier = [u]
        for depth in range(1, _HC_HOPS + 1):
            nxt = []
            for x in frontier:
                for y in adj.get(x, ()):
                    if y not in seen:
                        seen[y] = depth
                        nxt.append(y)
            frontier = nxt
        for v, d in seen.items():
            if v != u:
                harmonic[v] += _PR_SCALE // d
                n_reach[v] += 1

    got = {
        r["host"]: (r["harmonic_micro"], r["n_reach"])
        for r in web_host_harmonic(spark, SF_SMOKE).collect()
    }
    assert got == {v: (harmonic[v], n_reach[v]) for v in nodes}


def test_graph_ops_share_one_edges_relation(spark):
    # the CC-relation sharing convention: host_edges computed ONCE feeds
    # both rankings, and the passthrough output is identical to the
    # standalone path (same relation, same results)
    from tests.conftest import SF_SMOKE

    from mmeds_meta_spark.operators.web import (
        host_edges,
        web_host_harmonic,
        web_host_pagerank,
    )

    shared = host_edges(spark, SF_SMOKE)
    pr_shared = sorted(
        tuple(r) for r in web_host_pagerank(spark, SF_SMOKE, edges=shared).collect()
    )
    hc_shared = sorted(
        tuple(r) for r in web_host_harmonic(spark, SF_SMOKE, edges=shared).collect()
    )
    assert pr_shared == sorted(
        tuple(r) for r in web_host_pagerank(spark, SF_SMOKE).collect()
    )
    assert hc_shared == sorted(
        tuple(r) for r in web_host_harmonic(spark, SF_SMOKE).collect()
    )


def test_harmonic_hll_tracks_exact_within_sketch_error(spark):
    # HyperBall estimates vs the exact operator on the shared graph:
    # reach_est must track n_reach within the 256-register error regime
    # (6.5% std err; allow 4 sigma for small balls), and the estimator
    # must preserve the ranking signal (hub on top).
    from tests.conftest import SF_SMOKE

    from mmeds_meta_spark.operators.web import (
        _HUB,
        host_edges,
        web_host_harmonic,
        web_host_harmonic_hll,
    )

    edges = host_edges(spark, SF_SMOKE)
    exact = {r["host"]: r for r in web_host_harmonic(spark, SF_SMOKE, edges=edges).collect()}
    est = {r["host"]: r for r in web_host_harmonic_hll(spark, SF_SMOKE, edges=edges).collect()}
    assert set(est) == set(exact)
    worst = 0.0
    for h, r in exact.items():
        n, n_hat = r["n_reach"], est[h]["reach_est"]
        if n >= 20:  # sketch error regime needs a non-trivial ball
            rel = abs(n_hat - n) / n
            worst = max(worst, rel)
    assert worst < 0.26  # 4 x 6.5% std err
    # ranking signal: the hub's inlink skew dominates both forms
    assert max(est, key=lambda h: est[h]["harmonic_est"]) == _HUB
    assert exact[_HUB]["harmonic_micro"] == max(
        r["harmonic_micro"] for r in exact.values()
    )


def test_harmonic_hll_deterministic_across_runs(spark):
    # the estimator is a deterministic quantity (md5 registers, integer
    # MAX merges, pinned folds): two runs must agree bit-for-bit —
    # that's what makes an ESTIMATOR gate-able against a DuckDB oracle
    from tests.conftest import SF_SMOKE

    from mmeds_meta_spark.operators.web import web_host_harmonic_hll

    a = sorted(tuple(r) for r in web_host_harmonic_hll(spark, SF_SMOKE).collect())
    b = sorted(tuple(r) for r in web_host_harmonic_hll(spark, SF_SMOKE).collect())
    assert a == b and a


def test_registrable_domain_property_sweep(spark):
    # adversarial host shapes, both engines, one deterministic sweep:
    # empty labels, single chars, deep subdomains, suffix-as-host,
    # wildcard/exception families, hyphens, digits — the two
    # transcriptions must agree on every input (the property that makes
    # the walk gate-able), and known-family cases must group correctly.
    import duckdb

    from mmeds_meta_spark.functions.urls import registrable_domain_sql

    label_pool = ["a", "bb", "x-1", "9", "co", "uk", "com", "br", "kobe",
                  "jp", "www", "ck", "blogspot", "github", "io", "city"]
    hosts = []
    seed = 1
    for n_labels in (1, 2, 3, 4, 5, 6):
        for trial in range(40):
            seed = (seed * 1103515245 + 12345) % (1 << 31)
            labs = [label_pool[(seed >> (3 * j)) % len(label_pool)]
                    for j in range(n_labels)]
            hosts.append(".".join(labs))
    hosts += ["a..b", ".", "..", "a.", ".a"]  # empty-label degenerates
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    s = [r[0] for r in df.select(registrable_domain("host")).collect()]
    d = [
        r[0]
        for r in duckdb.sql(
            "SELECT " + registrable_domain_sql("host")
            + " FROM (SELECT unnest(?) AS host)",
            params=[hosts],
        ).fetchall()
    ]
    mismatches = [(h, a, b) for h, a, b in zip(hosts, s, d) if a != b]
    assert mismatches == []


def test_degree_profile_reconstructs_graph_totals(spark):
    # bucket counts must partition the host sets; per-direction host and
    # weight totals must reconstruct the edge relation exactly; the hub's
    # in-degree lands in the top in-bucket
    from tests.conftest import SF_SMOKE

    from mmeds_meta_spark.operators.web import (
        host_edges,
        web_host_degree_profile,
    )

    edges = host_edges(spark, SF_SMOKE)
    rows = web_host_degree_profile(spark, SF_SMOKE, edges=edges).collect()
    e = edges.collect()
    srcs = {r["src_host"] for r in e}
    dsts = {r["dst_host"] for r in e}
    w_sum = sum(r["w"] for r in e)
    by_dir = {}
    for r in rows:
        by_dir.setdefault(r["direction"], []).append(r)
    assert sum(r["n_hosts"] for r in by_dir["out"]) == len(srcs)
    assert sum(r["n_hosts"] for r in by_dir["in"]) == len(dsts)
    assert sum(r["w_total"] for r in by_dir["out"]) == w_sum
    assert sum(r["w_total"] for r in by_dir["in"]) == w_sum
    for r in rows:
        assert (1 << r["log2_bucket"]) <= r["min_degree"] <= r["max_degree"]
        assert r["max_degree"] < (1 << (r["log2_bucket"] + 1))
    # the hub is the unique max in-degree host: top in-bucket has it
    from collections import Counter

    indeg = Counter(r["dst_host"] for r in e)
    top_in = max(by_dir["in"], key=lambda r: r["log2_bucket"])
    assert top_in["max_degree"] == max(indeg.values())


def test_web_report_sections_consistent_with_components(spark):
    # the composed report's rows must equal each component operator's
    # own output over the same shared edges checkpoint
    from tests.conftest import SF_SMOKE

    from mmeds_meta_spark.operators.web import (
        host_edges,
        pipeline_web_report,
        web_host_degree_profile,
        web_host_pagerank,
    )

    edges = host_edges(spark, SF_SMOKE)
    rows = pipeline_web_report(spark, SF_SMOKE, edges=edges).collect()
    by_sec = {}
    for r in rows:
        by_sec.setdefault(r["section"], []).append(r)
    tot = {r["key"]: r["value"] for r in by_sec["totals"]}
    e = edges.collect()
    assert tot["n_edges"] == len(e)
    assert tot["w_total"] == sum(r["w"] for r in e)
    assert tot["n_hosts"] == len(
        {r["src_host"] for r in e} | {r["dst_host"] for r in e}
    )
    # degree sections mirror the degree operator
    deg = web_host_degree_profile(spark, SF_SMOKE, edges=edges).collect()
    want = {
        ("degree_" + d["direction"], d["log2_bucket"]): d["n_hosts"] for d in deg
    }
    got = {
        (r["section"], r["pos"]): r["value"]
        for r in rows
        if r["section"].startswith("degree_")
    }
    assert got == want
    # pagerank top-5 = the ranking's own deterministic head
    pr = sorted(
        web_host_pagerank(spark, SF_SMOKE, edges=edges).collect(),
        key=lambda r: (-r["rank_micro"], r["host"]),
    )[:5]
    top = sorted(by_sec["pagerank_top"], key=lambda r: r["pos"])
    assert [(r["key"], r["value"]) for r in top] == [
        (r["host"], r["rank_micro"]) for r in pr
    ]


def test_url_filter_rules_and_precedence(spark):
    from mmeds_meta_spark.operators.web import url_filter

    urls = [
        # (url, want_keep, want_reason)
        ("https://s0.src1.co.uk/page/3?id=1", True, "ok"),
        ("https://x.src0.co.jp/page/1", False, "banned_domain"),  # banned dom
        ("https://ok.example.com/casino/page/1", False, "bad_substring"),
        ("https://ok.example.com/p?q=" + "x" * 300, False, "too_long"),
        ("https://n555555555555.src1.example.com/p/1", False, "digit_host"),
        ("https://ok.example.com" + "/a" * 9 + "?id=1", False, "deep_path"),
        # precedence: banned domain wins over every later rule
        ("https://x.src0.co.jp/casino/" + "a" * 300, False, "banned_domain"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(urls)], "doc_id long, url string"
    )
    out = {r.doc_id: r for r in url_filter(df).collect()}
    for i, (u, want_keep, want_reason) in enumerate(urls):
        assert out[i].keep == want_keep, (u, out[i].reason)
        assert out[i].reason == want_reason, (u, out[i].reason)
    # pure narrow: no exchange anywhere in the plan
    plan = url_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_url_filter_gate_workload_exercises_every_rule(spark):
    from conftest import SF_SMOKE

    from mmeds_meta_spark.operators.web import web_url_filter

    reasons = {
        r.reason
        for r in web_url_filter(spark, SF_SMOKE).select("reason").distinct().collect()
    }
    assert {"ok", "banned_domain", "bad_substring", "too_long", "digit_host"} <= reasons
