"""URL canonicalization + registrable-domain extraction — the first
stage of every public web-corpus pipeline (C4 deduplicates on exact
URL; CCNet groups and re-weights per domain; RefinedWeb/Dolma cap
documents per registrable domain before any content-level dedup).

Beyond-reference extension (the reference at /root/reference has no web
corpus); the WET source (sources/wet.py) produces the ``target_uri``
column these functions consume.

Canonicalization rules (the common subset of the C4/CCNet-style
normalizers, all lossless for dedup purposes):

* fragment dropped (``#...`` never reaches the server);
* scheme and host lowercased; a leading ``www.`` stripped;
* the scheme's default port removed (``http:80`` / ``https:443``),
  non-default ports kept;
* a trailing ``/`` on the path removed (the root path folds into the
  bare authority);
* tracking query parameters dropped (any ``utm_*`` key plus the usual
  click-id set), remaining parameters sorted so parameter order never
  splits a duplicate group; the ``?`` disappears when nothing survives.

Engine parity: the Spark side parses with the JVM's ``parse_url``
(whole-stage-codegen'd); :func:`canonical_sql` transcribes the SAME
rules for DuckDB with portable string surgery.  Both live in this one
module so an edit to either cannot silently diverge (the shared-constant
lesson of round-9 ADVICE).

Scale shape: every function here is a pure narrow expression — no
shuffle, no UDF; canonicalization of 100 TB of URLs is a map over the
scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# click-identifier keys dropped alongside any utm_* key (public lists:
# Google gclid, Facebook fbclid, Mailchimp mc_*, generic ref)
TRACKING_KEYS = ("fbclid", "gclid", "ref", "mc_cid", "mc_eid")

# public-suffix table for registrable-domain extraction, longest suffix
# first (a real deployment broadcasts the full Mozilla PSL; the rule —
# longest matching suffix plus one label — is identical)
PUBLIC_SUFFIXES = ("co.uk", "com.au", "example.com", "com", "org", "net", "uk")


def _keep_param_pred(p: str) -> str:
    keys = ", ".join(f"'{k}'" for k in TRACKING_KEYS)
    return (
        f"{p} <> '' AND NOT startswith(lower(split_part({p}, '=', 1)), 'utm_')"
        f" AND NOT lower(split_part({p}, '=', 1)) IN ({keys})"
    )


def url_canonical(url: str | Column = "url") -> Column:
    """Canonical form of a URL column (pure Catalyst expressions)."""
    u = url if isinstance(url, str) else None
    if u is None:
        raise TypeError("pass the column NAME so the expression stays SQL")
    scheme = f"lower(parse_url({u}, 'PROTOCOL'))"
    host0 = f"lower(parse_url({u}, 'HOST'))"
    host = (
        f"CASE WHEN startswith({host0}, 'www.')"
        f" THEN substr({host0}, 5) ELSE {host0} END"
    )
    auth = f"parse_url({u}, 'AUTHORITY')"
    port = f"split_part({auth}, ':', 2)"
    port_part = (
        f"CASE WHEN {port} = '' OR ({scheme} = 'http' AND {port} = '80')"
        f" OR ({scheme} = 'https' AND {port} = '443')"
        f" THEN '' ELSE concat(':', {port}) END"
    )
    path0 = f"parse_url({u}, 'PATH')"
    path = (
        f"CASE WHEN {path0} IS NULL OR {path0} = '' OR {path0} = '/'"
        f" THEN '' ELSE regexp_replace({path0}, '/+$', '') END"
    )
    params = (
        f"array_sort(filter(split(coalesce(parse_url({u}, 'QUERY'), ''), '&'),"
        f" p -> {_keep_param_pred('p')}))"
    )
    query = (
        f"CASE WHEN size({params}) = 0 THEN ''"
        f" ELSE concat('?', array_join({params}, '&')) END"
    )
    return F.expr(
        f"concat({scheme}, '://', {host}, {port_part}, {path}, {query})"
    )


def canonical_sql(u: str) -> str:
    """DuckDB transcription of :func:`url_canonical` over the SQL
    expression ``u`` (same rules, portable string surgery — DuckDB has
    no parse_url)."""
    keys = ", ".join(f"'{k}'" for k in TRACKING_KEYS)
    u1 = f"split_part({u}, '#', 1)"
    scheme = f"lower(split_part({u1}, '://', 1))"
    rest = f"split_part({u1}, '://', 2)"
    authpath = f"split_part({rest}, '?', 1)"
    rawq = f"CASE WHEN contains({rest}, '?') THEN split_part({rest}, '?', 2) ELSE '' END"
    auth = f"split_part({authpath}, '/', 1)"
    path0 = f"substr({authpath}, length({auth}) + 1)"
    host0 = f"lower(split_part({auth}, ':', 1))"
    host = (
        f"CASE WHEN starts_with({host0}, 'www.')"
        f" THEN substr({host0}, 5) ELSE {host0} END"
    )
    port = f"split_part({auth}, ':', 2)"
    port_part = (
        f"CASE WHEN {port} = '' OR ({scheme} = 'http' AND {port} = '80')"
        f" OR ({scheme} = 'https' AND {port} = '443')"
        f" THEN '' ELSE ':' || {port} END"
    )
    path = (
        f"CASE WHEN {path0} = '' OR {path0} = '/'"
        f" THEN '' ELSE regexp_replace({path0}, '/+$', '') END"
    )
    params = (
        f"list_sort(list_filter(string_split({rawq}, '&'),"
        f" p -> p <> '' AND NOT starts_with(lower(split_part(p, '=', 1)), 'utm_')"
        f" AND NOT lower(split_part(p, '=', 1)) IN ({keys})))"
    )
    query = (
        f"CASE WHEN len({params}) = 0 THEN ''"
        f" ELSE '?' || array_to_string({params}, '&') END"
    )
    return f"{scheme} || '://' || {host} || {port_part} || {path} || {query}"


def _domain_cases(host: str, extract: str) -> list[tuple[str, str]]:
    """(regex, per-suffix extraction expr) pairs, longest suffix first —
    shared by both engine builders so the suffix walk is identical."""
    out = []
    for s in sorted(PUBLIC_SUFFIXES, key=lambda x: -x.count(".")):
        esc = s.replace(".", r"\.")
        out.append((s, extract.format(host=host, pat=f"([^.]+\\.{esc})$")))
    return out


def registrable_domain(host_col: str) -> Column:
    """Registrable domain (public suffix + one label) of a host column."""
    cases = _domain_cases(host_col, "regexp_extract({host}, '{pat}', 1)")
    # regexp_extract returns '' on no match in BOTH engines; nullif('')
    # folds misses so coalesce walks longest-suffix-first
    walk = ", ".join("nullif(" + e + ", '')" for _, e in cases)
    return F.expr(f"coalesce({walk}, {host_col})")


def registrable_domain_sql(host: str) -> str:
    """DuckDB transcription of :func:`registrable_domain`."""
    cases = _domain_cases(host, "regexp_extract({host}, '{pat}', 1)")
    walk = ", ".join("nullif(" + e + ", '')" for _, e in cases)
    return f"coalesce({walk}, {host})"
