"""End-to-end curation pipeline composed as ONE declarative plan.

Every real training-data pipeline is a funnel: raw corpus → exact dedup →
quality filters → repetition/boilerplate removal, with a report of how
many documents and tokens survive each stage.  The individual stages are
this repo's own operators (dedup_exact_hash, text_quality_score,
dedup_span_exact); this module composes their per-doc signals into a
single Catalyst plan and rolls them up into the stage report — the
operators are DataFrame → DataFrame, so composition is free (one
optimizer pass, shared scans) rather than a chain of materialized jobs.

Physical shape at 100 TB: three per-doc signal branches (fingerprint
keeper: one shuffle on md5(text); quality: one shuffle on doc_id;
span-dup ratio: one uniform-key shuffle on md5(span) + one on doc_id),
joined on doc_id, then a 4-row roll-up.  Nothing materializes between
stages; Catalyst prunes every branch to the columns it needs.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..testdata import table as _t
from . import QuerySpec

_MIN_TOK = 20  # stage-3 floor (Gopher-style minimum length)
_MIN_TTR = 0.40  # stage-3 type-token-ratio floor (Gopher-style richness)
_SPAN_K = 8  # stage-4 span width (matches dedup_span_exact)
_MAX_DUP = 0.5  # stage-4 ceiling on corpus-duplicated span fraction

_STAGES = (
    "raw",
    "url_dedup",
    "domain_cap",
    "exact_dedup",
    "quality",
    "span_dedup",
)


def pipeline_curation_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Cumulative curation funnel over the documents corpus:

    * stage 0 ``raw``        — every document
    * stage 1 ``url_dedup``  — canonical-URL keepers only (C4's FIRST
      stage: min doc_id per canonicalized URL; operators/web.py)
    * stage 2 ``domain_cap`` — + within the per-registrable-domain cap
      among URL keepers (RefinedWeb/Dolma guard; the shared
      ``domain_cap_kernel``'s two-phase md5-rank routing)
    * stage 3 ``exact_dedup``— + md5(text) keepers (min doc_id per group)
    * stage 4 ``quality``    — + ≥{mt} tokens and type-token ratio ≥ {ttr}
    * stage 5 ``span_dedup`` — + < {md:.0%} of {k}-token spans duplicated
      elsewhere in the corpus

    Output: one row per stage with surviving doc/token counts and the
    integer-ratio fraction of raw docs — the report every curation run
    ships.  Thresholds are deliberately simple published heuristics
    (Gopher/C4 family); the value here is the COMPOSITION: one Catalyst
    plan over shared scans, plus exactly ONE bounded materialization —
    the |URL-keepers|-row ``cap_docs`` localCheckpoint that feeds the
    domain-cap kernel's three consumers (a keeper relation, never the
    corpus)."""
    from ..functions.urls import registrable_domain, url_canonical
    from .web import _DOMAIN_CAP, _synth_url_expr, domain_cap_kernel

    d = _t(spark, sf, "documents").select(
        "doc_id", "text", F.split("text", " ").alias("toks")
    )

    # Every per-group flag below is a window aggregate, NOT a
    # groupBy-then-join-back: the window computes min/count inside the
    # one shuffle the grouping needs anyway, so each stage costs ONE
    # corpus scan and ONE exchange (the join-back form scans the corpus
    # twice per stage — the pipeline_core_metrics shared-scan lesson).

    # stage 1 — URL-level exact dedup (one shuffle on the canonical URL)
    cu = _t(spark, sf, "documents").select(
        "doc_id", F.expr(_synth_url_expr("doc_id", "source")).alias("url")
    ).select("doc_id", url_canonical("url").alias("cu"))
    w_cu = Window.partitionBy("cu")
    uk = cu.withColumn("ukeeper", F.min("doc_id").over(w_cu))
    url_keeper = uk.select(
        "doc_id", (F.col("doc_id") == F.col("ukeeper")).alias("is_url_keeper")
    )

    # stage 2 — per-domain cap AMONG the URL keepers (the real pipeline
    # order: caps apply after URL dedup).  One keeper per canonical URL
    # means the windowed keeper filter IS the keeper relation; the
    # kernel's three consumers read this |keepers|-bounded checkpoint,
    # never the corpus
    cap_docs = (
        uk.filter(F.col("doc_id") == F.col("ukeeper"))
        .select(
            "doc_id",
            F.col("cu").alias("url_canonical"),
            registrable_domain(
                "split_part(split_part(cu, '://', 2), '/', 1)"
            ).alias("domain"),
        )
        .localCheckpoint(eager=True)
    )
    cap_flag = domain_cap_kernel(cap_docs, _DOMAIN_CAP).select(
        "doc_id", F.col("kept").alias("in_cap")
    )

    # exact_dedup + quality share ONE text scan: the quality counters
    # are pure narrow expressions (size / array_distinct — no token
    # explosion, no shuffle), so they ride along on the md5 window's
    # projection instead of paying their own corpus-expanded groupBy.
    # The hash is projected FIRST so the window's exchange carries
    # (doc_id, n_tok, n_types, f) — partitioning by the md5 EXPRESSION
    # would drag the text itself through the shuffle
    kq = d.select(
        "doc_id",
        F.expr("size(toks)").alias("n_tok"),
        F.expr("size(array_distinct(toks))").alias("n_types"),
        F.md5("text").alias("f"),
    ).select(
        "doc_id",
        "n_tok",
        "n_types",
        (
            F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("f"))
        ).alias("is_keeper"),
    ).select(
        "doc_id",
        "n_tok",
        "is_keeper",
        (
            (F.col("n_tok") >= _MIN_TOK)
            & (F.col("n_types").cast("double") / F.col("n_tok") >= _MIN_TTR)
        ).alias("is_quality"),
    )

    spans = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(toks) - 1, {_SPAN_K}),"
                f" s -> md5(array_join(slice(toks, s + 1, {_SPAN_K}), ' ')))"
            )
        ).alias("h"),
    )
    span_ok = (
        spans.withColumn("n_occ", F.count("*").over(Window.partitionBy("h")))
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0)).cast("double")
                / F.count("*")
                < _MAX_DUP
            ).alias("span_ok")
        )
    )

    flags = (
        url_keeper.join(kq, "doc_id")
        .join(span_ok, "doc_id")
        .join(cap_flag, "doc_id", "left")
        .withColumn("in_cap", F.coalesce("in_cap", F.lit(False)))
    )
    tall = flags.selectExpr(
        "n_tok",
        "stack(6, "
        f"0L, '{_STAGES[0]}', true, "
        f"1L, '{_STAGES[1]}', is_url_keeper, "
        f"2L, '{_STAGES[2]}', is_url_keeper AND in_cap, "
        f"3L, '{_STAGES[3]}', is_url_keeper AND in_cap AND is_keeper, "
        f"4L, '{_STAGES[4]}', is_url_keeper AND in_cap AND is_keeper"
        " AND is_quality, "
        f"5L, '{_STAGES[5]}', is_url_keeper AND in_cap AND is_keeper"
        " AND is_quality AND span_ok"
        ") AS (stage, stage_name, alive)"
    )
    agg = tall.groupBy("stage", "stage_name").agg(
        F.sum(F.when(F.col("alive"), 1).otherwise(0)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("alive"), F.col("n_tok"))).cast("long").alias("n_tokens"),
    )
    w = Window.orderBy(F.lit(1))  # 4-row frame — a global window is fine here
    return agg.select(
        "stage",
        "stage_name",
        "n_docs",
        "n_tokens",
        (
            F.col("n_docs").cast("double")
            / F.max(F.when(F.col("stage") == 0, F.col("n_docs"))).over(w)
        ).alias("pct_of_raw"),
    )


pipeline_curation_funnel.__doc__ = pipeline_curation_funnel.__doc__.format(
    mt=_MIN_TOK, ttr=_MIN_TTR, md=_MAX_DUP, k=_SPAN_K
)

def _funnel_url_ctes() -> str:
    """The url_dedup + domain_cap stages' CTEs — built from the SAME
    synth / canonical / registrable-domain / cap builders the gated
    dedup_url_canonical and sample_domain_cap use (one source of
    truth).  The oracle ranks every keeper (DuckDB needs no skew
    routing); the Spark side's two-phase kernel computes the identical
    kept set because under-cap domains are kept unconditionally."""
    from ..functions.urls import canonical_sql, registrable_domain_sql
    from .web import _DOMAIN_CAP, _synth_url_expr

    url = _synth_url_expr("doc_id", "source")
    host = "split_part(split_part(cu, '://', 2), '/', 1)"
    return f"""cu AS (
  SELECT doc_id, {canonical_sql(url)} AS cu FROM documents
), ukeep AS (
  SELECT cu, MIN(doc_id) AS ukeeper FROM cu GROUP BY 1
), url_keeper AS (
  SELECT c.doc_id, c.doc_id = u.ukeeper AS is_url_keeper
  FROM cu c JOIN ukeep u USING (cu)
), dom AS (
  SELECT ukeeper AS doc_id, cu,
         {registrable_domain_sql(host)} AS domain
  FROM ukeep
), cap_flag AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY domain
           ORDER BY md5(cu || '|' || CAST(doc_id AS VARCHAR)), doc_id
         ) <= {_DOMAIN_CAP} AS in_cap
  FROM dom
)"""


_FUNNEL_SQL = f"""
WITH d AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
), {_funnel_url_ctes()}, keep AS (
  SELECT md5(text) AS f, MIN(doc_id) AS keeper FROM d GROUP BY 1
), keeper AS (
  SELECT d.doc_id, d.doc_id = k.keeper AS is_keeper
  FROM d JOIN keep k ON md5(d.text) = k.f
), qual AS (
  SELECT doc_id, COUNT(*) AS n_tok,
         COUNT(*) >= {_MIN_TOK}
           AND CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*) >= {_MIN_TTR}
           AS is_quality
  FROM (SELECT doc_id, UNNEST(toks) AS tok FROM d) GROUP BY doc_id
), spans AS (
  SELECT doc_id, md5(array_to_string(toks[s + 1 : s + {_SPAN_K}], ' ')) AS h
  FROM (SELECT doc_id, toks, UNNEST(range(0, len(toks), {_SPAN_K})) AS s FROM d)
), occ AS (
  SELECT h, COUNT(*) AS n_occ FROM spans GROUP BY h
), span_ok AS (
  SELECT s.doc_id,
         CAST(SUM(CASE WHEN o.n_occ > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
           < {_MAX_DUP} AS span_ok
  FROM spans s JOIN occ o USING (h) GROUP BY s.doc_id
), flags AS (
  SELECT k.doc_id, q.n_tok, u.is_url_keeper, k.is_keeper, q.is_quality, s.span_ok,
         COALESCE(c.in_cap, FALSE) AS in_cap
  FROM url_keeper u JOIN keeper k USING (doc_id)
       JOIN qual q USING (doc_id) JOIN span_ok s USING (doc_id)
       LEFT JOIN cap_flag c USING (doc_id)
), tall AS (
  SELECT 0 AS stage, '{_STAGES[0]}' AS stage_name, TRUE AS alive, n_tok FROM flags
  UNION ALL
  SELECT 1, '{_STAGES[1]}', is_url_keeper, n_tok FROM flags
  UNION ALL
  SELECT 2, '{_STAGES[2]}', is_url_keeper AND in_cap, n_tok FROM flags
  UNION ALL
  SELECT 3, '{_STAGES[3]}', is_url_keeper AND in_cap AND is_keeper, n_tok FROM flags
  UNION ALL
  SELECT 4, '{_STAGES[4]}', is_url_keeper AND in_cap AND is_keeper AND is_quality,
         n_tok FROM flags
  UNION ALL
  SELECT 5, '{_STAGES[5]}',
         is_url_keeper AND in_cap AND is_keeper AND is_quality AND span_ok,
         n_tok FROM flags
), agg AS (
  SELECT stage, stage_name,
         CAST(SUM(CASE WHEN alive THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN alive THEN n_tok END) AS BIGINT) AS n_tokens
  FROM tall GROUP BY stage, stage_name
)
SELECT CAST(stage AS BIGINT) AS stage, stage_name, n_docs, n_tokens,
       CAST(n_docs AS DOUBLE)
         / MAX(CASE WHEN stage = 0 THEN n_docs END) OVER () AS pct_of_raw
FROM agg
"""


# ---------------------------------------------------------------------------
# selection funnel — the SELECTION side of the pipeline, composed
# ---------------------------------------------------------------------------

_SEL_K = 100  # stage-3 DSIR selection size (matches sample_dsir_importance)
_SEL_STAGES = ("raw", "lang", "quality", "dsir_topk")


def pipeline_selection_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Cumulative data-SELECTION funnel — the complement of
    :func:`pipeline_curation_funnel` (which removes bad docs, this one
    picks the training set):

    * stage 0 ``raw``      — every document
    * stage 1 ``lang``     — English only
    * stage 2 ``quality``  — + ≥{mt} tokens and type-token ratio ≥ {ttr}
    * stage 3 ``dsir_topk``— + among the top-{k} DSIR importance
      resamples of the eligible pool (target-domain docs are the LM
      target, never candidates)

    One Catalyst plan: the language/quality flags, the DSIR score
    relation (sampling.dsir_scores — broadcast LM tables), and the
    selection cut share scans and optimize together.  The top-k cut is
    SCALE-SAFE: no global rank window — a TakeOrdered({k}) finds the
    k-th (weakest) selected key, which broadcasts back as a 1-row
    threshold; membership is then a narrow comparison
    (key, doc_id) ≥ threshold, exact under the rounded-key ties."""
    from .sampling import dsir_scores

    d = _t(spark, sf, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("toks")
    )
    # language/quality flags are pure NARROW expressions (size /
    # array_distinct — no token explosion, no shuffle, no join-back);
    # the whole per-doc flag relation is then checkpointed because TWO
    # consumers read it (the threshold probe and the report) — without
    # the checkpoint each consumer replays the scan AND the DSIR scoring
    # (the pipeline_core_metrics shared-relation lesson; this is also
    # the selection-candidate table a real run materializes anyway)
    base = d.select(
        "doc_id",
        F.expr("size(toks)").alias("n_tok"),
        F.expr("lang = 'en'").alias("is_en"),
        F.expr(
            f"size(toks) >= {_MIN_TOK} AND"
            f" CAST(size(array_distinct(toks)) AS DOUBLE) / size(toks)"
            f" >= {_MIN_TTR}"
        ).alias("is_quality"),
    )
    flags = base.join(
        dsir_scores(spark, sf).select("doc_id", "sel_key"), "doc_id", "left"
    ).localCheckpoint(eager=True)
    elig = flags.filter(F.expr("is_en AND is_quality AND sel_key IS NOT NULL"))
    thr = (
        elig.orderBy(F.col("sel_key").desc(), "doc_id")
        .limit(_SEL_K)
        .orderBy(F.col("sel_key").asc(), F.col("doc_id").desc())
        .limit(1)
        .select(F.col("sel_key").alias("t_key"), F.col("doc_id").alias("t_doc"))
    )
    full = flags.join(F.broadcast(thr), F.lit(True), "left")
    tall = full.selectExpr(
        "n_tok",
        "stack(4, "
        f"0L, '{_SEL_STAGES[0]}', true, "
        f"1L, '{_SEL_STAGES[1]}', is_en, "
        f"2L, '{_SEL_STAGES[2]}', is_en AND is_quality, "
        f"3L, '{_SEL_STAGES[3]}', is_en AND is_quality AND sel_key IS NOT NULL"
        " AND (sel_key > t_key OR (sel_key = t_key AND doc_id <= t_doc))"
        ") AS (stage, stage_name, alive)"
    )
    agg = tall.groupBy("stage", "stage_name").agg(
        F.sum(F.when(F.col("alive"), 1).otherwise(0)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("alive"), F.col("n_tok"))).cast("long").alias("n_tokens"),
    )
    w = Window.orderBy(F.lit(1))  # 4-row frame
    return agg.select(
        "stage",
        "stage_name",
        "n_docs",
        "n_tokens",
        (
            F.col("n_docs").cast("double")
            / F.max(F.when(F.col("stage") == 0, F.col("n_docs"))).over(w)
        ).alias("pct_of_raw"),
    )


pipeline_selection_funnel.__doc__ = pipeline_selection_funnel.__doc__.format(
    mt=_MIN_TOK, ttr=_MIN_TTR, k=_SEL_K
)


def _selection_sql() -> str:
    from .sampling import _DSIR_CTES

    return f"""
WITH {_DSIR_CTES},
q AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
         COUNT(*) >= {_MIN_TOK}
           AND CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*) >= {_MIN_TTR}
           AS is_quality
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id
), base AS (
  SELECT d.doc_id, q.n_tok, d.lang = 'en' AS is_en, q.is_quality
  FROM documents d JOIN q USING (doc_id)
), flags AS (
  SELECT b.*, k.sel_key FROM base b LEFT JOIN dsirkeyed k USING (doc_id)
), elig AS (
  SELECT doc_id, sel_key FROM flags
  WHERE is_en AND is_quality AND sel_key IS NOT NULL
), thr AS (
  SELECT sel_key AS t_key, doc_id AS t_doc FROM (
    SELECT * FROM elig ORDER BY sel_key DESC, doc_id LIMIT {_SEL_K}
  ) ORDER BY sel_key ASC, doc_id DESC LIMIT 1
), allf AS (
  SELECT f.*, t.t_key, t.t_doc FROM flags f LEFT JOIN thr t ON TRUE
), tall AS (
  SELECT 0 AS stage, '{_SEL_STAGES[0]}' AS stage_name, TRUE AS alive, n_tok FROM allf
  UNION ALL
  SELECT 1, '{_SEL_STAGES[1]}', is_en, n_tok FROM allf
  UNION ALL
  SELECT 2, '{_SEL_STAGES[2]}', is_en AND is_quality, n_tok FROM allf
  UNION ALL
  SELECT 3, '{_SEL_STAGES[3]}',
         is_en AND is_quality AND sel_key IS NOT NULL
           AND (sel_key > t_key OR (sel_key = t_key AND doc_id <= t_doc)),
         n_tok
  FROM allf
), agg AS (
  SELECT stage, stage_name,
         CAST(SUM(CASE WHEN alive THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN alive THEN n_tok END) AS BIGINT) AS n_tokens
  FROM tall GROUP BY stage, stage_name
)
SELECT CAST(stage AS BIGINT) AS stage, stage_name, n_docs, n_tokens,
       CAST(n_docs AS DOUBLE)
         / MAX(CASE WHEN stage = 0 THEN n_docs END) OVER () AS pct_of_raw
FROM agg
"""


# ---------------------------------------------------------------------------
# training-export funnel — tokenize → pack → shuffle/shard → manifest
# ---------------------------------------------------------------------------

_EXP_EPOCH = 0  # the gated report covers epoch 0; E epochs = E map streams
_EXP_STAGES = ("tokenize", "pack", "shuffle_shard", "manifest")
_FP_MOD = 1 << 60  # 60-bit order-independent content checksum (shard_export)


def _hex60(dialect: str, col: str) -> str:
    """First 15 hex digits of ``col`` as a BIGINT (< 2^60) — the identical
    nibble-polynomial expression on both engines (no conv(): DuckDB lacks
    it, and an explicit polynomial is portable bit-for-bit)."""
    pos = "instr" if dialect == "spark" else "strpos"
    # nibble cast to BIGINT first: INT * 16^7 overflows INT32 under ANSI
    terms = " + ".join(
        f"CAST({pos}('0123456789abcdef', substr({col}, {i}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (15 - i)}"
        for i in range(1, 16)
    )
    return f"CAST({terms} AS BIGINT)"


def pipeline_export_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """The training-EXPORT side of the pipeline composed as one plan —
    the last mile after curation/selection, mirroring the analysis
    dataflow composition the reference drives
    (mmeds/snakemake/rules/process_sequencing_data.smk chains
    filter → collapse → export exactly this way):

    * stage 0 ``tokenize``      — per-doc token counts under the trained
      BPE merge table (the REAL tokenizer, not the whitespace proxy)
    * stage 1 ``pack``          — fixed-budget training batches packed on
      those BPE counts (64 md5 streams × {budget}-token budget)
    * stage 2 ``shuffle_shard`` — epoch-deterministic shuffle at BATCH
      granularity: key = md5(epoch:bucket:batch), shard = first key
      byte mod {shards} — packed batches stay intact (the training
      units), so the shuffle moves batches, never splits them
    * stage 3 ``manifest``      — the verifiable hand-off record

    One row per stage: units at that stage (docs → batches → shards → 1
    manifest) plus the INVARIANT columns — doc count, BPE token total,
    and a 60-bit order-independent content checksum
    (Σ md5-fingerprints mod 2^60, the shard_export design) — which must
    be IDENTICAL on every row: packing, shuffling, and sharding must
    never lose, duplicate, or alter a document.  That invariance is the
    report an export run ships, and it is what the oracle checks.

    Physical shape at 100 TB: tokenize = one explode + vocab equi-join
    (AQE broadcasts the vocab) + per-doc partial agg; pack = one
    64-stream bucket window (never a global running sum); shard = narrow
    md5 arithmetic; every report agg is two levels (per-batch partial →
    global), so no COUNT(DISTINCT) expand and no driver loop beyond the
    trainer's bounded 1-row-per-merge collects."""
    from .bpe import _N_MERGES, _train
    from .sampling import _PACK_BUCKETS, _PACK_BUDGET, _bucket_expr
    from .sampling import _EPOCH_SHARDS as _N_SHARDS

    _, syms_df = _train(spark, sf, _N_MERGES)
    enc = syms_df.select("w", F.size("syms").alias("n_sym"))
    d = _t(spark, sf, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("w")).filter(
        F.col("w") != ""
    )
    tc = words.join(enc, "w").groupBy("doc_id").agg(
        F.sum("n_sym").cast("long").alias("n_tok")
    )
    dl = tc.join(d.select("doc_id", "text"), "doc_id").withColumn(
        "bucket",
        F.expr(
            f"CAST({_bucket_expr('spark', 'CAST(doc_id AS STRING)')}"
            f" % {_PACK_BUCKETS} AS INT)"
        ),
    )
    w = Window.partitionBy("bucket").orderBy(
        F.expr("md5(CAST(doc_id AS STRING))"), F.col("doc_id")
    )
    packed = dl.withColumn(
        "cum_before",
        F.coalesce(
            F.sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).withColumn("batch", F.expr(f"CAST(cum_before div {_PACK_BUDGET} AS BIGINT)"))
    keyed = packed.withColumn(
        "bk",
        F.expr(
            f"md5(concat(CAST({_EXP_EPOCH} AS STRING), ':',"
            " CAST(bucket AS STRING), ':', CAST(batch AS STRING)))"
        ),
    ).withColumn(
        "shard",
        F.expr(
            "CAST(((instr('0123456789abcdef', substr(bk, 1, 1)) - 1) * 16"
            " + (instr('0123456789abcdef', substr(bk, 2, 1)) - 1))"
            f" % {_N_SHARDS} AS INT)"
        ),
    ).withColumn(
        "fp",
        F.expr(
            _hex60(
                "spark",
                "substr(md5(concat(CAST(doc_id AS STRING), ':', md5(text), ':',"
                " CAST(n_tok AS STRING))), 1, 15)",
            )
        ),
    )
    per_batch = keyed.groupBy("bucket", "batch", "shard").agg(
        F.count("*").cast("long").alias("nd"),
        F.sum("n_tok").cast("long").alias("nt"),
        (F.sum(F.col("fp").cast("decimal(38,0)")) % F.lit(_FP_MOD)).alias("fs"),
    )
    total = per_batch.agg(
        F.sum("nd").cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_bpe_tokens"),
        (F.sum("fs") % F.lit(_FP_MOD)).cast("long").alias("checksum"),
        F.count("*").cast("long").alias("n_batches"),
        F.countDistinct("shard").cast("long").alias("n_shards"),
    )
    return total.selectExpr(
        "stack(4, "
        f"0L, '{_EXP_STAGES[0]}', n_docs, "
        f"1L, '{_EXP_STAGES[1]}', n_batches, "
        f"2L, '{_EXP_STAGES[2]}', n_shards, "
        f"3L, '{_EXP_STAGES[3]}', 1L"
        ") AS (stage, stage_name, n_units)",
        "n_docs",
        "n_bpe_tokens",
        "checksum",
    )


def _fmt_export_doc() -> None:
    from .sampling import _EPOCH_SHARDS, _PACK_BUDGET

    pipeline_export_funnel.__doc__ = pipeline_export_funnel.__doc__.format(
        budget=_PACK_BUDGET, shards=_EPOCH_SHARDS
    )


_fmt_export_doc()


def _export_sql() -> str:
    from .bpe import _N_MERGES, _bpe_chain
    from .sampling import _PACK_BUCKETS, _PACK_BUDGET, _bucket_expr
    from .sampling import _EPOCH_SHARDS as _N_SHARDS

    s = f"s{_N_MERGES}"
    return f"""
{_bpe_chain(_N_MERGES)}
, enc AS (SELECT w, len(syms) AS n_sym FROM {s})
, tokw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), tc AS (
  SELECT doc_id, CAST(SUM(n_sym) AS BIGINT) AS n_tok
  FROM tokw JOIN enc USING (w) WHERE w != '' GROUP BY doc_id
), dl AS (
  SELECT t.doc_id, t.n_tok, d.text,
         CAST({_bucket_expr('duck', 'CAST(t.doc_id AS VARCHAR)')}
              % {_PACK_BUCKETS} AS INTEGER) AS bucket
  FROM tc t JOIN documents d USING (doc_id)
), packed AS (
  SELECT doc_id, n_tok, text, bucket,
         CAST(COALESCE(SUM(n_tok) OVER (
           PARTITION BY bucket
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // {_PACK_BUDGET} AS BIGINT) AS batch
  FROM dl
), keyed AS (
  SELECT doc_id, n_tok, text, bucket, batch,
         md5(CAST({_EXP_EPOCH} AS VARCHAR) || ':' || CAST(bucket AS VARCHAR)
             || ':' || CAST(batch AS VARCHAR)) AS bk
  FROM packed
), fpd AS (
  SELECT bucket, batch, n_tok,
         CAST(((strpos('0123456789abcdef', substr(bk, 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(bk, 2, 1)) - 1))
              % {_N_SHARDS} AS INTEGER) AS shard,
         substr(md5(CAST(doc_id AS VARCHAR) || ':' || md5(text) || ':'
                    || CAST(n_tok AS VARCHAR)), 1, 15) AS fph
  FROM keyed
), per_batch AS (
  SELECT bucket, batch, shard, COUNT(*) AS nd, SUM(n_tok) AS nt,
         SUM({_hex60('duck', 'fph')}) % {_FP_MOD} AS fs
  FROM fpd GROUP BY 1, 2, 3
), total AS (
  SELECT CAST(SUM(nd) AS BIGINT) AS n_docs,
         CAST(SUM(nt) AS BIGINT) AS n_bpe_tokens,
         CAST(SUM(fs) % {_FP_MOD} AS BIGINT) AS checksum,
         CAST(COUNT(*) AS BIGINT) AS n_batches,
         CAST(COUNT(DISTINCT shard) AS BIGINT) AS n_shards
  FROM per_batch
)
SELECT CAST(0 AS BIGINT) AS stage, '{_EXP_STAGES[0]}' AS stage_name,
       n_docs AS n_units, n_docs, n_bpe_tokens, checksum FROM total
UNION ALL
SELECT 1, '{_EXP_STAGES[1]}', n_batches, n_docs, n_bpe_tokens, checksum FROM total
UNION ALL
SELECT 2, '{_EXP_STAGES[2]}', n_shards, n_docs, n_bpe_tokens, checksum FROM total
UNION ALL
SELECT 3, '{_EXP_STAGES[3]}', 1, n_docs, n_bpe_tokens, checksum FROM total
"""


# ---------------------------------------------------------------------------
# decontamination defense-in-depth report — three modalities, one verdict
# ---------------------------------------------------------------------------


def pipeline_decontam_report(spark: SparkSession, sf: str) -> DataFrame:
    """Defense-in-depth decontamination verdict: one row per corpus
    document flagged by ANY of the three document-level modalities —
    exact n-gram overlap (decon_ngram_overlap), the constant-size Bloom
    probe (decon_bloom_filter), and fuzzy MinHash-LSH
    (decon_fuzzy_minhash) — with per-modality booleans and the
    agreement count.  This is the report a release review reads: a doc
    flagged by all three is a verbatim leak; fuzzy-only is a paraphrase;
    bloom-only at low agreement is likely the filter's one-sided false
    positive (the column that makes the FP rate INSPECTABLE instead of
    assumed).

    One plan: the three flag relations reduce to doc_id sets, union with
    a modality tag, and roll up per doc — no full-outer join chain.  The
    modalities keep their own scale shapes (broadcast bench sides,
    narrow corpus maps); the report adds one doc_id partial agg."""
    from .dedup import (
        decon_bloom_filter,
        decon_fuzzy_minhash,
        decon_ngram_overlap,
    )

    parts = [
        decon_ngram_overlap(spark, sf).select("doc_id").distinct().withColumn(
            "m", F.lit("ngram")
        ),
        decon_bloom_filter(spark, sf).select("doc_id").distinct().withColumn(
            "m", F.lit("bloom")
        ),
        decon_fuzzy_minhash(spark, sf).select("doc_id").distinct().withColumn(
            "m", F.lit("fuzzy")
        ),
    ]
    u = parts[0].unionAll(parts[1]).unionAll(parts[2])
    return u.groupBy("doc_id").agg(
        F.expr("SUM(CASE WHEN m = 'ngram' THEN 1 ELSE 0 END) > 0").alias("ngram_hit"),
        F.expr("SUM(CASE WHEN m = 'bloom' THEN 1 ELSE 0 END) > 0").alias("bloom_hit"),
        F.expr("SUM(CASE WHEN m = 'fuzzy' THEN 1 ELSE 0 END) > 0").alias("fuzzy_hit"),
        F.count("*").cast("long").alias("n_modalities"),
    )


def _decontam_report_sql() -> str:
    from .dedup import _DECON_SQL, _bloom_sql, _fuzzy_decon_sql

    return f"""
WITH ng AS (SELECT DISTINCT doc_id FROM ({_DECON_SQL})),
bl AS (SELECT DISTINCT doc_id FROM ({_bloom_sql()})),
fz AS (SELECT DISTINCT doc_id FROM ({_fuzzy_decon_sql()})),
u AS (
  SELECT doc_id, 'ngram' AS m FROM ng
  UNION ALL SELECT doc_id, 'bloom' FROM bl
  UNION ALL SELECT doc_id, 'fuzzy' FROM fz
)
SELECT doc_id,
       SUM(CASE WHEN m = 'ngram' THEN 1 ELSE 0 END) > 0 AS ngram_hit,
       SUM(CASE WHEN m = 'bloom' THEN 1 ELSE 0 END) > 0 AS bloom_hit,
       SUM(CASE WHEN m = 'fuzzy' THEN 1 ELSE 0 END) > 0 AS fuzzy_hit,
       CAST(COUNT(*) AS BIGINT) AS n_modalities
FROM u GROUP BY doc_id
"""


_DD_STAGES = ("raw", "exact", "normalized", "semantic_cluster")


def pipeline_dedup_funnel(
    spark: SparkSession, sf: str, *, clusters: DataFrame | None = None
) -> DataFrame:
    """Dedup-ESCALATION funnel: how many documents (and tokens) survive
    each successively stronger dedup level —

    * stage 0 ``raw``              — every document
    * stage 1 ``exact``            — md5(text) keepers (min doc_id)
    * stage 2 ``normalized``       — + keepers under C4/RefinedWeb
      canonicalization (casing/punctuation/whitespace collapsed)
    * stage 3 ``semantic_cluster`` — + one canonical doc per SimHash
      near-dup connected component (docs in no pair are singletons)

    The report a dedup-planning review reads: each stage's MARGINAL
    removal is the measured value of escalating (exact → normalized →
    near-dup clustering), the number that decides whether the expensive
    level is worth running on the full corpus.  Mirrors the curation /
    selection / export / decontamination funnels — one plan, cumulative
    stages, pct_of_raw.

    Physical shape: two md5 groupBy keepers (uniform keys), the CC
    fixpoint on the contracted quotient graph (dedup_cluster_components'
    pointer jumping, bounded checkpoints), and one 4-row rollup.
    ``clusters=`` shares a precomputed (doc_id, cluster_id) relation
    across the CC consumers (the diversity family's counts= convention),
    so a session runs the SimHash pair generation + fixpoint once."""
    from .dedup import _norm_expr, dedup_cluster_components

    d = _t(spark, sf, "documents").select(
        "doc_id", "text", F.expr("size(split(text, ' '))").alias("n_tok")
    )
    # BOTH md5 keeper flags come from min-over-window on ONE corpus
    # scan (chained windows: two exchanges — the same two shuffles the
    # groupBys needed — but no join-backs and no re-scans).  The hashes
    # are projected FIRST so the exchanges carry (doc_id, n_tok, f, nf),
    # never the document text: partitioning by the md5 EXPRESSION would
    # drag text through both shuffles
    hashed = d.select(
        "doc_id",
        "n_tok",
        F.md5("text").alias("f"),
        F.expr("md5(" + _norm_expr("spark", "text") + ")").alias("nf"),
    )
    base = hashed.select(
        "doc_id",
        "n_tok",
        (
            F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("f"))
        ).alias("exact_keep"),
        (
            F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("nf"))
        ).alias("norm_keep"),
    )
    if clusters is not None:
        comp = clusters
    else:
        # The md5-keeper flag relation and the whole CC chain (SimHash
        # sigs → banded pairs → contraction → pointer-jump fixpoint) are
        # INDEPENDENT until the final doc_id join, and the CC chain is a
        # serial ladder of bounded barrier jobs that leaves executors
        # idle — so the flags relation materializes from a second driver
        # thread and back-fills those idle slots (the d13/mixture-plan
        # §2.6 overlap pattern).  ``base`` is NARROW (doc_id + 3 scalars,
        # never the text), so the checkpoint is a thin keeper table —
        # the same per-doc flag relation a real dedup-planning run
        # materializes — not a corpus-payload copy.  Plans and results
        # are unchanged up to the checkpoint boundary; only submission
        # order differs.
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_base = pool.submit(lambda: base.localCheckpoint(eager=True))
            f_comp = pool.submit(lambda: dedup_cluster_components(spark, sf))
            base = f_base.result()
            comp = f_comp.result()
    cmin = comp.select(
        "doc_id",
        (
            F.col("doc_id")
            == F.min("doc_id").over(Window.partitionBy("cluster_id"))
        ).alias("in_cluster_keep"),
    )
    flags = base.join(cmin, "doc_id", "left").select(
        "n_tok",
        "exact_keep",
        "norm_keep",
        F.coalesce("in_cluster_keep", F.lit(True)).alias("cluster_keep"),
    )
    tall = flags.selectExpr(
        "n_tok",
        "stack(4, "
        f"0L, '{_DD_STAGES[0]}', true, "
        f"1L, '{_DD_STAGES[1]}', exact_keep, "
        f"2L, '{_DD_STAGES[2]}', exact_keep AND norm_keep, "
        f"3L, '{_DD_STAGES[3]}', exact_keep AND norm_keep AND cluster_keep"
        ") AS (stage, stage_name, alive)"
    )
    agg = tall.groupBy("stage", "stage_name").agg(
        F.sum(F.when(F.col("alive"), 1).otherwise(0)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("alive"), F.col("n_tok"))).cast("long").alias("n_tokens"),
    )
    w = Window.orderBy(F.lit(1))  # 4-row frame
    return agg.select(
        "stage",
        "stage_name",
        "n_docs",
        "n_tokens",
        (
            F.col("n_docs").cast("double")
            / F.max(F.when(F.col("stage") == 0, F.col("n_docs"))).over(w)
        ).alias("pct_of_raw"),
    )


def _dedup_funnel_sql() -> str:
    from .dedup import _components_sql, _norm_expr

    return f"""
WITH d AS (
  SELECT doc_id, text, len(string_split(text, ' ')) AS n_tok FROM documents
), exact AS (
  SELECT d.doc_id, d.doc_id = k.k AS exact_keep
  FROM d JOIN (SELECT md5(text) AS f, MIN(doc_id) AS k FROM d GROUP BY 1) k
    ON md5(d.text) = k.f
), norm AS (
  SELECT d.doc_id, d.doc_id = k.k AS norm_keep
  FROM d JOIN (SELECT md5({_norm_expr('duck', 'text')}) AS nf, MIN(doc_id) AS k
               FROM d GROUP BY 1) k
    ON md5({_norm_expr('duck', 'd.text')}) = k.nf
), comp AS ({_components_sql()}),
cmin AS (
  SELECT c.doc_id, c.doc_id = m.k AS in_cluster_keep
  FROM comp c JOIN (SELECT cluster_id, MIN(doc_id) AS k FROM comp GROUP BY 1) m
    USING (cluster_id)
), flags AS (
  SELECT d.n_tok, e.exact_keep, n.norm_keep,
         COALESCE(cm.in_cluster_keep, TRUE) AS cluster_keep
  FROM d JOIN exact e USING (doc_id) JOIN norm n USING (doc_id)
  LEFT JOIN cmin cm USING (doc_id)
), tall AS (
  SELECT 0 AS stage, '{_DD_STAGES[0]}' AS stage_name, TRUE AS alive, n_tok FROM flags
  UNION ALL
  SELECT 1, '{_DD_STAGES[1]}', exact_keep, n_tok FROM flags
  UNION ALL
  SELECT 2, '{_DD_STAGES[2]}', exact_keep AND norm_keep, n_tok FROM flags
  UNION ALL
  SELECT 3, '{_DD_STAGES[3]}', exact_keep AND norm_keep AND cluster_keep, n_tok
  FROM flags
), agg AS (
  SELECT stage, stage_name,
         CAST(SUM(CASE WHEN alive THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN alive THEN n_tok END) AS BIGINT) AS n_tokens
  FROM tall GROUP BY stage, stage_name
)
SELECT CAST(stage AS BIGINT) AS stage, stage_name, n_docs, n_tokens,
       CAST(n_docs AS DOUBLE)
         / MAX(CASE WHEN stage = 0 THEN n_docs END) OVER () AS pct_of_raw
FROM agg
"""


# ---------------------------------------------------------------------------
# mixture plan — per-source weights from size, overlap, and temperature
# ---------------------------------------------------------------------------

_MIX_TAU = 0.7  # temperature (mC4/XLM-R convention: p_s ∝ n_s^0.7)


def pipeline_mixture_plan(spark: SparkSession, sf: str) -> DataFrame:
    """The composed MIXTURE PLAN: per-source sampling weights a training
    run would actually use, derived in three chained stages —

    1. raw per-source size (docs, whitespace tokens);
    2. overlap correction from the cross-source shingle-vocabulary
       matrix (:func:`~.dedup.dedup_cross_source_matrix` verbatim):
       each source's WORST-PARTNER containment
       max_t |V_s ∩ V_t| / |V_s| discounts its tokens —
       effective = ⌊tokens · (1 − containment)⌋ — so a crawl that is
       mostly a copy of another source stops double-counting;
    3. temperature weights over effective tokens
       (w_s ∝ effective^{tau}, the mC4/XLM-R τ={tau} convention),
       normalized with a pinned-order source fold so the shares are
       bit-identical cross-engine.

    Output per source: raw stats, vocabulary size, worst-overlap
    partner + containment, effective tokens, and the final mix weight
    (6dp, sums to 1).  Physical shape: everything after the two corpus
    passes (per-source stats; distinct (shingle, source)) is
    |sources|- or |sources|²-bounded."""
    from .dedup import dedup_cross_source_matrix

    d = _t(spark, sf, "documents").select(
        "doc_id", "source", F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("tk")
    )
    # The two checkpointed inputs are INDEPENDENT corpus passes (token
    # stats vs the distinct-shingle matrix), so their materialization
    # jobs submit from two driver threads and each back-fills the
    # other's barrier tail (the d13/core-metrics overlap pattern;
    # plans and results unchanged — only submission order differs).
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_stats = pool.submit(
            lambda: d.groupBy("source")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.expr("SUM(tk)").cast("long").alias("n_tokens"),
            )
            .localCheckpoint(eager=True)  # |sources| rows, read by 3 stages
        )
        # |sources|²-bounded; the directed view reads it TWICE (both pair
        # orientations) — checkpoint so the plan states the reuse instead
        # of restating the whole shingle machinery per union branch
        f_m = pool.submit(
            lambda: dedup_cross_source_matrix(spark, sf).localCheckpoint(eager=True)
        )
        stats = f_stats.result()
        m = f_m.result()
    directed = m.select(
        F.col("source_a").alias("source"),
        F.col("source_b").alias("partner"),
        F.col("n_a").alias("n_vocab"),
        F.expr("CAST(n_shared AS DOUBLE) / n_a").alias("containment"),
    ).unionAll(
        m.select(
            F.col("source_b").alias("source"),
            F.col("source_a").alias("partner"),
            F.col("n_b").alias("n_vocab"),
            F.expr("CAST(n_shared AS DOUBLE) / n_b").alias("containment"),
        )
    )
    worst = directed.groupBy("source").agg(
        F.max("n_vocab").cast("long").alias("n_vocab"),
        F.max(F.struct(F.col("containment"), F.col("partner"))).alias("w"),
    ).select(
        "source",
        "n_vocab",
        F.col("w.partner").alias("top_overlap_source"),
        F.expr("ROUND(w.containment, 6)").alias("top_overlap_containment"),
    )
    eff = (
        stats.join(F.broadcast(worst), "source", "left")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.coalesce("n_vocab", F.lit(0)).cast("long").alias("n_vocab"),
            "top_overlap_source",
            F.coalesce("top_overlap_containment", F.lit(0.0)).alias(
                "top_overlap_containment"
            ),
            F.expr(
                "CAST(FLOOR(n_tokens * (1 - COALESCE(top_overlap_containment, 0.0)))"
                " AS BIGINT)"
            ).alias("effective_tokens"),
        )
        .withColumn(
            "w_raw", F.expr(f"POW(CAST(effective_tokens AS DOUBLE), {_MIX_TAU})")
        )
    )
    tot = eff.agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(source, w_raw))),"
            " CAST(0 AS DOUBLE), (acc, q) -> acc + q.w_raw)"
        ).alias("w_tot")
    )
    return eff.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        "n_vocab",
        "top_overlap_source",
        "top_overlap_containment",
        "effective_tokens",
        # Degenerate guard (round-9 ADVICE): if every source is fully
        # contained by a partner (mirrored crawls), effective_tokens are
        # all 0 and w_tot is 0 — 0/0 is NaN on Spark vs NULL on DuckDB.
        # Emit NULL on both engines instead.
        F.expr(
            "CASE WHEN w_tot > 0 THEN ROUND(w_raw / w_tot, 6) END"
        ).alias("mix_weight"),
    )


pipeline_mixture_plan.__doc__ = pipeline_mixture_plan.__doc__.format(tau=_MIX_TAU)


def _mixture_plan_sql() -> str:
    from .dedup import _CROSS_SOURCE_SQL

    return f"""
WITH m AS ({_CROSS_SOURCE_SQL}
), d AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS tk
  FROM documents
), stats AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(tk) AS BIGINT) AS n_tokens
  FROM d GROUP BY source
), directed AS (
  SELECT source_a AS source, source_b AS partner, n_a AS n_vocab,
         CAST(n_shared AS DOUBLE) / n_a AS containment
  FROM m
  UNION ALL
  SELECT source_b, source_a, n_b,
         CAST(n_shared AS DOUBLE) / n_b
  FROM m
), ranked AS (
  SELECT source, partner, n_vocab, containment,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY containment DESC, partner DESC) AS rn
  FROM directed
), worst AS (
  SELECT source, CAST(MAX(n_vocab) AS BIGINT) AS n_vocab,
         MAX(CASE WHEN rn = 1 THEN partner END) AS top_overlap_source,
         ROUND(MAX(CASE WHEN rn = 1 THEN containment END), 6)
           AS top_overlap_containment
  FROM ranked GROUP BY source
), eff AS (
  SELECT s.source, s.n_docs, s.n_tokens,
         CAST(COALESCE(w.n_vocab, 0) AS BIGINT) AS n_vocab,
         w.top_overlap_source,
         COALESCE(w.top_overlap_containment, 0.0) AS top_overlap_containment,
         CAST(FLOOR(s.n_tokens
              * (1 - COALESCE(w.top_overlap_containment, 0.0))) AS BIGINT)
           AS effective_tokens,
         POW(CAST(CAST(FLOOR(s.n_tokens
              * (1 - COALESCE(w.top_overlap_containment, 0.0))) AS BIGINT)
              AS DOUBLE), {_MIX_TAU}) AS w_raw
  FROM stats s LEFT JOIN worst w USING (source)
), tot AS (
  SELECT list_reduce(list(w_raw ORDER BY source), (acc, v) -> acc + v)
    AS w_tot
  FROM eff
)
SELECT source, n_docs, n_tokens, n_vocab, top_overlap_source,
       top_overlap_containment, effective_tokens,
       CASE WHEN w_tot > 0 THEN ROUND(w_raw / w_tot, 6) END AS mix_weight
FROM eff, tot
"""


def pipeline_ccnet_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """The CCNet pipeline end-to-end (Wenzek et al. 2020, Fig. 1 order):
    paragraph-hash dedup with keep-first reassembly → language ID →
    Kneser-Ney perplexity of the DEDUPED text → per-language
    head/middle/tail buckets — one gated plan, reporting
    ``(lang, ccnet_bucket, n_docs, n_removed_paras)``.

    Composition notes (each stage is the proven kernel of its
    standalone entry — dedup: dedup.ccnet_paras + the keeper election
    of dedup_paragraphs_ccnet; langid: text_langid_heuristic's marker
    vote; LM: text.kn_bigram_scores; buckets:
    text.ccnet_bucket_assign):

    * the deduped (doc_id, text_dedup, n_removed) relation is
      eagerly checkpointed ONCE — five consumers follow (the langid
      pass, the KN kernel's vocab/bigram-train/apply branches, and the
      final report join); without it Catalyst re-runs the paragraph
      shuffle per consumer;
    * scoring runs on the DEDUPED text (the CCNet order: boilerplate
      paragraphs must not drag every host page into the tail bucket);
      a fully-deduplicated document ('' text) still scores — split('')
      yields one OOV token on both engines, so no rows are lost;
    * the (doc_id, lang, ppl) relation checkpoints before the bucket
      histogram (two consumers: histogram + assignment join) — the
      text_ccnet_buckets discipline.

    Physical shape at 100 TB: ONE paragraph-hash shuffle (uniform md5
    keys), the bounded broadcast LM relations, a value-histogram
    orders-of-magnitude smaller than the corpus, and a final
    |langs|x3-row report agg."""
    from .dedup import ccnet_paras
    from .text import _LANG_MARKERS, ccnet_bucket_assign, kn_bigram_scores

    paras = ccnet_paras(_t(spark, sf, "documents"))
    # keeper election as MIN(struct) OVER (PARTITION BY h) — one pass over
    # the paragraph explode, one exchange (same rework as
    # ccnet_paras_report: the groupBy + join-back form re-executed the
    # explode for the probe side)
    dedup = (
        paras.withColumn(
            "first",
            F.min(F.struct("doc_id", "pos")).over(Window.partitionBy("h")),
        )
        .withColumn(
            "kept",
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("pos") == F.col("first.pos")),
        )
        .groupBy("doc_id")
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)"
            ).alias("n_removed"),
            F.expr(
                "concat_ws(' ', transform(array_sort("
                "collect_list(CASE WHEN kept THEN struct(pos, para) END)),"
                " x -> x.para))"
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    tok = dedup.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    hits = tok.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("tok").isin(*m), 1).otherwise(0))
            .cast("long")
            .alias(f"hits_{lang}")
            for lang, m in sorted(_LANG_MARKERS.items())
        ]
    )
    lang = hits.select(
        "doc_id",
        F.expr(
            "CASE WHEN hits_de >= hits_en AND hits_de >= hits_es THEN 'de' "
            "WHEN hits_en >= hits_es THEN 'en' ELSE 'es' END"
        ).alias("lang"),
    )
    scores = kn_bigram_scores(dedup.select("doc_id", "text"))
    j = (
        scores.join(lang, "doc_id")
        .select("doc_id", "lang", "ppl_proxy")
        .localCheckpoint(eager=True)
    )
    assigned = ccnet_bucket_assign(j)
    return (
        assigned.join(dedup.select("doc_id", "n_removed"), "doc_id")
        .groupBy("lang", "ccnet_bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.expr("CAST(SUM(n_removed) AS BIGINT)").alias("n_removed_paras"),
        )
    )


def _ccnet_funnel_sql() -> str:
    from .dedup import _PARA_K, _para_norm
    from .text import _LANG_MARKERS, _kn_sql_over

    k = _PARA_K
    norm = _para_norm("para", spark_side=False)
    hit_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tok IN {m!r} THEN 1 ELSE 0 END) AS BIGINT) AS hits_{lang}"
        for lang, m in sorted(_LANG_MARKERS.items())
    )
    kn = _kn_sql_over("dd")
    return f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), paras AS (
  SELECT doc_id, s.i - 1 AS pos,
         array_to_string(list_slice(toks, (s.i - 1) * {k} + 1,
                                    (s.i - 1) * {k} + {k}), ' ') AS para
  FROM d, LATERAL (
    SELECT unnest(range(1, CAST(ceil(len(toks) / {k}.0) AS BIGINT) + 1)) AS i
  ) s
), hashed AS (
  SELECT doc_id, pos, para, md5({norm}) AS h FROM paras
), keeper AS (
  SELECT h, MIN(struct_pack(doc_id := doc_id, pos := pos)) AS first
  FROM hashed GROUP BY h
), flagged AS (
  SELECT p.doc_id, p.pos, p.para,
         p.doc_id = k.first.doc_id AND p.pos = k.first.pos AS kept
  FROM hashed p JOIN keeper k USING (h)
), dd AS MATERIALIZED (
  SELECT doc_id,
         CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
         COALESCE(string_agg(CASE WHEN kept THEN para END, ' ' ORDER BY pos), '')
           AS text
  FROM flagged GROUP BY doc_id
), ltok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM dd
), hits AS (
  SELECT doc_id, {hit_cols}
  FROM ltok GROUP BY doc_id
), lang AS (
  SELECT doc_id,
         CASE WHEN hits_de >= hits_en AND hits_de >= hits_es THEN 'de'
              WHEN hits_en >= hits_es THEN 'en' ELSE 'es' END AS lang
  FROM hits
), kn AS MATERIALIZED ({kn}
), j AS (
  SELECT kn.doc_id, lang.lang, kn.ppl_proxy
  FROM kn JOIN lang USING (doc_id)
), vals AS (
  SELECT lang, ppl_proxy, COUNT(*) AS cnt FROM j GROUP BY lang, ppl_proxy
), buckets AS (
  SELECT lang, ppl_proxy,
         CASE WHEN SUM(cnt) OVER (PARTITION BY lang ORDER BY ppl_proxy
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 3
                   <= SUM(cnt) OVER (PARTITION BY lang) THEN 'head'
              WHEN SUM(cnt) OVER (PARTITION BY lang ORDER BY ppl_proxy
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 3
                   <= SUM(cnt) OVER (PARTITION BY lang) * 2 THEN 'middle'
              ELSE 'tail' END AS ccnet_bucket
  FROM vals
), assigned AS (
  SELECT j.doc_id, j.lang, b.ccnet_bucket
  FROM j JOIN buckets b ON b.lang = j.lang AND b.ppl_proxy = j.ppl_proxy
)
SELECT a.lang, a.ccnet_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(dd.n_removed) AS BIGINT) AS n_removed_paras
FROM assigned a JOIN dd USING (doc_id)
GROUP BY a.lang, a.ccnet_bucket
"""


QUERIES: dict[str, QuerySpec] = {
    "pipeline_ccnet_funnel": QuerySpec(
        pipeline_ccnet_funnel,
        _ccnet_funnel_sql(),
        "beyond-reference: the CCNet pipeline composed end-to-end "
        "(Wenzek et al. 2020 Fig. 1 order — paragraph-hash dedup with "
        "keep-first reassembly, language ID, Kneser-Ney perplexity of "
        "the DEDUPED text, per-language head/middle/tail buckets) as "
        "ONE plan: one paragraph shuffle, one checkpointed deduped "
        "relation feeding five consumers, broadcast LM relations, "
        "bounded value-histogram cutoffs",
    ),
    "pipeline_mixture_plan": QuerySpec(
        pipeline_mixture_plan,
        _mixture_plan_sql(),
        "beyond-reference: Dolma-style composed mixture plan (per-source size -> "
        "worst-partner vocabulary-overlap discount -> temperature weights) "
        "— the per-source sampling weights a training run ships",
    ),
    "pipeline_dedup_funnel": QuerySpec(
        pipeline_dedup_funnel,
        _dedup_funnel_sql(),
        "beyond-reference: dedup-escalation funnel (exact → normalized → "
        "SimHash-cluster canonical) — the marginal-removal report that "
        "decides whether each stronger level is worth its cost",
    ),
    "pipeline_decontam_report": QuerySpec(
        pipeline_decontam_report,
        _decontam_report_sql(),
        "beyond-reference: composed decontamination defense-in-depth report "
        "(n-gram ∪ Bloom ∪ fuzzy-MinHash verdicts with per-modality agreement)",
    ),
    "pipeline_export_funnel": QuerySpec(
        pipeline_export_funnel,
        _export_sql(),
        "beyond-reference: composed training-export funnel (BPE tokenize → "
        "fixed-budget pack → epoch shuffle/shard at batch granularity → "
        "verifiable manifest) as ONE plan with stage-invariant checksums",
    ),
    "pipeline_selection_funnel": QuerySpec(
        pipeline_selection_funnel,
        _selection_sql(),
        "beyond-reference: composed data-selection funnel (lang → quality → "
        "DSIR top-k with a broadcast-threshold cut) as ONE Catalyst plan",
    ),
    "pipeline_curation_funnel": QuerySpec(
        pipeline_curation_funnel,
        _FUNNEL_SQL,
        "beyond-reference: composed curation funnel (url-dedup → domain-cap "
        "→ exact-dedup → quality → span-dedup) as ONE Catalyst plan plus one "
        "bounded keeper-relation checkpoint (the domain-cap stage), with a "
        "per-stage survivor report — the full C4/RefinedWeb-order chain",
    ),
}
