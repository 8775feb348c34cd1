"""Web-corpus domain stage: URL canonicalization dedup + per-domain
document caps — the FIRST stage of every public web-corpus pipeline
(C4's exact-URL dedup, CCNet's per-domain grouping, the RefinedWeb /
Dolma per-registrable-domain caps), and the natural upstream of
``pipeline_curation_funnel``.

Beyond-reference extension (the reference at /root/reference has no web
corpus).  The WET source (sources/wet.py) is the real producer of the
``target_uri`` column; the registry entries synthesize a deterministic
URL workload from the ``documents`` table (doc_id-keyed scheme-case /
``www.`` / default-port / trailing-slash / tracking-param / param-order
/ fragment variation) so the DuckDB gate verifies the FULL
canonicalization semantics cross-engine on every document.

Scale shape at 100 TB:

* ``dedup_url_canonical`` — canonicalization is a pure narrow
  expression over the scan; the dedup is ONE shuffle keyed by the
  canonical URL (the same single-pass shape as ``dedup_exact_hash``).
* ``sample_domain_cap`` — two-phase, skew-aware: a per-domain count
  (one pre-aggregated shuffle) splits domains into under-cap (the long
  tail — passed through with NO per-row ranking) and over-cap (the few
  mega-domains — only THEIR documents enter the partitioned rank
  window).  A naive global ``row_number() over (partition by domain)``
  would sort the whole corpus; here the window input is bounded by
  |over-cap domains| × their docs, and the under/over routing is a
  broadcast of the |domains|-bounded count relation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.urls import (
    canonical_sql,
    registrable_domain,
    registrable_domain_sql,
    url_canonical,
)
from ..testdata import table as _t
from . import QuerySpec

_DOMAIN_CAP = 10  # per-registrable-domain document cap (RefinedWeb-style)


# ---------------------------------------------------------------------------
# deterministic URL workload over the documents table (both engines)
# ---------------------------------------------------------------------------

# The raw-URL synthesis exercises every canonicalization rule:
# scheme case + identity (d%2), subdomain (d%3), public suffix
# (source-keyed example.com vs co.uk), host case (d%5), www. prefix
# (d%7), default port (d%4), path id (d%25), trailing slash + query
# param order (d%2), tracking params (always), fragment (d%3).
# Canonical identity is therefore d mod lcm(2,3,20,25) = 300 within a
# source — duplicate groups exist at every SF by construction.


def _synth_url_expr(d: str, s: str) -> str:
    """One SQL expression (valid on BOTH engines) building the raw URL
    for doc_id ``d`` of source ``s``."""
    suffix = f"CASE WHEN ({d} % 20) % 3 = 1 THEN 'co.uk' ELSE 'example.com' END"
    host_core = f"concat('s', {d} % 3, '.', {s}, '.', {suffix})"
    host_www = f"CASE WHEN {d} % 7 = 0 THEN concat('www.', {host_core}) ELSE {host_core} END"
    host = f"CASE WHEN {d} % 5 = 0 THEN upper({host_www}) ELSE {host_www} END"
    scheme = f"CASE WHEN {d} % 2 = 0 THEN 'http' ELSE 'HTTPS' END"
    port = (
        f"CASE WHEN {d} % 4 = 0 THEN"
        f" (CASE WHEN {d} % 2 = 0 THEN ':80' ELSE ':443' END) ELSE '' END"
    )
    path = f"concat('/page/', {d} % 25, CASE WHEN {d} % 2 = 1 THEN '/' ELSE '' END)"
    query = (
        f"CASE WHEN {d} % 2 = 0"
        f" THEN concat('?id=', {d} % 5, '&utm_source=rss')"
        f" ELSE concat('?utm_campaign=x&id=', {d} % 5) END"
    )
    frag = f"CASE WHEN {d} % 3 = 0 THEN '#top' ELSE '' END"
    return f"concat({scheme}, '://', {host}, {port}, {path}, {query}, {frag})"


def synth_urls(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, url, n_chars): the deterministic URL workload."""
    return _t(spark, sf, "documents").select(
        "doc_id",
        F.expr(_synth_url_expr("doc_id", "source")).alias("url"),
        "n_chars",
    )


_SYNTH_SQL = (
    "SELECT doc_id, "
    + _synth_url_expr("doc_id", "source")
    + " AS url, n_chars FROM documents"
)


# ---------------------------------------------------------------------------
# exact dedup on the canonical URL
# ---------------------------------------------------------------------------


def dedup_url_canonical(
    spark: SparkSession, sf: str, *, urls: DataFrame | None = None
) -> DataFrame:
    """Canonical-URL duplicate groups: canonicalize (pure narrow
    expressions — functions/urls.py), group by the canonical form, and
    report every group with more than one document (canonical URL,
    group size, keeper = min doc_id — C4's exact-URL dedup policy).

    ``urls`` overrides the synthesized workload with a real
    (doc_id, url, ...) relation, e.g. the WET source's target_uri."""
    u = urls if urls is not None else synth_urls(spark, sf)
    canon = u.select("doc_id", url_canonical("url").alias("url_canonical"))
    return (
        canon.groupBy("url_canonical")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


_URL_DEDUP_SQL = f"""
WITH u AS ({_SYNTH_SQL}),
canon AS (
  SELECT doc_id, {canonical_sql("url")} AS url_canonical FROM u
)
SELECT url_canonical,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
FROM canon GROUP BY url_canonical HAVING COUNT(*) > 1
"""


# ---------------------------------------------------------------------------
# per-domain document cap
# ---------------------------------------------------------------------------


def sample_domain_cap(
    spark: SparkSession,
    sf: str,
    *,
    cap: int = _DOMAIN_CAP,
    urls: DataFrame | None = None,
) -> DataFrame:
    """Per-registrable-domain document cap: keep at most ``cap``
    documents per domain, selected by an unbiased deterministic hash
    rank (md5 of canonical URL + doc_id) — the RefinedWeb/Dolma-style
    guard against a single site dominating the corpus.

    Output: (doc_id, domain, kept).  Two-phase skew-aware plan — see
    the module docstring; the rank window runs ONLY over over-cap
    domains' documents."""
    u = urls if urls is not None else synth_urls(spark, sf)
    # one narrow (doc_id, canonical, domain) projection consumed by the
    # count, the pass-through branch, AND the capped branch — checkpoint
    # so the parse_url/regex canonicalization runs ONCE per document
    # (CCNet materializes the same per-doc URL metadata before its
    # domain grouping); without this the three consumers re-evaluate it
    # and the op measured 4× slower at sf0.1
    docs = (
        u.select(
            "doc_id",
            url_canonical("url").alias("url_canonical"),
        )
        .select(
            "doc_id",
            "url_canonical",
            registrable_domain(
                "split_part(split_part(url_canonical, '://', 2), '/', 1)"
            ).alias("domain"),
        )
        .localCheckpoint(eager=True)
    )
    counts = docs.groupBy("domain").agg(F.count("*").alias("n_docs"))
    small = counts.filter(F.col("n_docs") <= cap).select("domain")
    big = counts.filter(F.col("n_docs") > cap).select("domain")
    # long tail: every doc kept, NO ranking work
    pass_through = docs.join(F.broadcast(small), "domain", "left_semi").select(
        "doc_id", "domain", F.lit(True).alias("kept")
    )
    # mega-domains only: bounded rank-window input
    w = Window.partitionBy("domain").orderBy(
        F.expr("md5(concat(url_canonical, '|', CAST(doc_id AS STRING)))"),
        "doc_id",
    )
    capped = (
        docs.join(F.broadcast(big), "domain", "left_semi")
        .withColumn("rn", F.row_number().over(w))
        .select("doc_id", "domain", (F.col("rn") <= cap).alias("kept"))
    )
    return pass_through.unionByName(capped)


def _domain_cap_sql(cap: int = _DOMAIN_CAP) -> str:
    host = "split_part(split_part(url_canonical, '://', 2), '/', 1)"
    return f"""
WITH u AS ({_SYNTH_SQL}),
canon AS (
  SELECT doc_id, {canonical_sql("url")} AS url_canonical FROM u
), docs AS (
  SELECT doc_id, url_canonical,
         {registrable_domain_sql(host)} AS domain
  FROM canon
), ranked AS (
  SELECT doc_id, domain,
         ROW_NUMBER() OVER (
           PARTITION BY domain
           ORDER BY md5(url_canonical || '|' || CAST(doc_id AS VARCHAR)),
                    doc_id) AS rn
  FROM docs
)
SELECT doc_id, domain, rn <= {cap} AS kept FROM ranked
"""


QUERIES: dict[str, QuerySpec] = {
    "dedup_url_canonical": QuerySpec(
        dedup_url_canonical,
        _URL_DEDUP_SQL,
        "beyond-reference: C4-style exact dedup on the canonical URL — "
        "scheme/host case, www., default ports, trailing slash, tracking "
        "params, param order, fragments all folded by pure narrow "
        "expressions; one shuffle on the canonical key",
    ),
    "sample_domain_cap": QuerySpec(
        sample_domain_cap,
        _domain_cap_sql(),
        "beyond-reference: RefinedWeb/Dolma-style per-registrable-domain "
        "document cap (public-suffix+1 extraction, md5-rank selection) — "
        "two-phase skew-aware plan: the long tail passes through uncounted, "
        "only over-cap domains enter the rank window",
    ),
}
