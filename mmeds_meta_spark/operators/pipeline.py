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

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..testdata import table as _t
from . import QuerySpec

_MIN_TOK = 20  # stage-2 floor (Gopher-style minimum length)
_MIN_TTR = 0.40  # stage-2 type-token-ratio floor (Gopher-style richness)
_SPAN_K = 8  # stage-3 span width (matches dedup_span_exact)
_MAX_DUP = 0.5  # stage-3 ceiling on corpus-duplicated span fraction

_STAGES = ("raw", "exact_dedup", "quality", "span_dedup")


def pipeline_curation_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Cumulative curation funnel over the documents corpus:

    * stage 0 ``raw``        — every document
    * stage 1 ``exact_dedup``— md5(text) keepers only (min doc_id per group)
    * stage 2 ``quality``    — + ≥{mt} tokens and type-token ratio ≥ {ttr}
    * stage 3 ``span_dedup`` — + < {md:.0%} of {k}-token spans duplicated
      elsewhere in the corpus

    Output: one row per stage with surviving doc/token counts and the
    integer-ratio fraction of raw docs — the report every curation run
    ships.  Thresholds are deliberately simple published heuristics
    (Gopher/C4 family); the value here is the COMPOSITION: one plan,
    shared scans, no inter-stage materialization."""
    d = _t(spark, sf, "documents").select(
        "doc_id", "text", F.split("text", " ").alias("toks")
    )

    fp = d.select("doc_id", F.md5("text").alias("f"))
    keep = fp.groupBy("f").agg(F.min("doc_id").alias("keeper"))
    keeper = fp.join(keep, "f").select(
        "doc_id", (F.col("doc_id") == F.col("keeper")).alias("is_keeper")
    )

    qual = (
        d.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tok"), F.countDistinct("tok").alias("n_types"))
        .select(
            "doc_id",
            "n_tok",
            (
                (F.col("n_tok") >= _MIN_TOK)
                & (F.col("n_types").cast("double") / F.col("n_tok") >= _MIN_TTR)
            ).alias("is_quality"),
        )
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
    occ = spans.groupBy("h").agg(F.count("*").alias("n_occ"))
    span_ok = (
        spans.join(occ, "h")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0)).cast("double")
                / F.count("*")
                < _MAX_DUP
            ).alias("span_ok")
        )
    )

    flags = keeper.join(qual, "doc_id").join(span_ok, "doc_id")
    tall = flags.selectExpr(
        "n_tok",
        "stack(4, "
        f"0L, '{_STAGES[0]}', true, "
        f"1L, '{_STAGES[1]}', is_keeper, "
        f"2L, '{_STAGES[2]}', is_keeper AND is_quality, "
        f"3L, '{_STAGES[3]}', is_keeper AND is_quality AND span_ok"
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

_FUNNEL_SQL = f"""
WITH d AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
), keep AS (
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
  SELECT k.doc_id, q.n_tok, k.is_keeper, q.is_quality, s.span_ok
  FROM keeper k JOIN qual q USING (doc_id) JOIN span_ok s USING (doc_id)
), tall AS (
  SELECT 0 AS stage, '{_STAGES[0]}' AS stage_name, TRUE AS alive, n_tok FROM flags
  UNION ALL
  SELECT 1, '{_STAGES[1]}', is_keeper, n_tok FROM flags
  UNION ALL
  SELECT 2, '{_STAGES[2]}', is_keeper AND is_quality, n_tok FROM flags
  UNION ALL
  SELECT 3, '{_STAGES[3]}', is_keeper AND is_quality AND span_ok, n_tok FROM flags
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
    qual = (
        d.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tok"), F.countDistinct("tok").alias("n_types"))
    )
    base = (
        d.select("doc_id", "lang")
        .join(qual, "doc_id")
        .select(
            "doc_id",
            "n_tok",
            F.expr("lang = 'en'").alias("is_en"),
            F.expr(
                f"n_tok >= {_MIN_TOK} AND CAST(n_types AS DOUBLE) / n_tok >= {_MIN_TTR}"
            ).alias("is_quality"),
        )
    )
    flags = base.join(
        dsir_scores(spark, sf).select("doc_id", "sel_key"), "doc_id", "left"
    )
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


QUERIES: dict[str, QuerySpec] = {
    "pipeline_selection_funnel": QuerySpec(
        pipeline_selection_funnel,
        _selection_sql(),
        "beyond-reference: composed data-selection funnel (lang → quality → "
        "DSIR top-k with a broadcast-threshold cut) as ONE Catalyst plan",
    ),
    "pipeline_curation_funnel": QuerySpec(
        pipeline_curation_funnel,
        _FUNNEL_SQL,
        "beyond-reference: composed curation funnel (exact-dedup → quality → "
        "span-dedup) as ONE Catalyst plan with a per-stage survivor report",
    ),
}
