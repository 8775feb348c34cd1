"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus needs reproducible, data-independent sampling — never
``rand()`` (non-deterministic across retries/partitions) and never a
driver-side shuffle.  Both operators here are pure column expressions on
a stable key, so the same doc lands in the same split on every engine,
every retry, every partitioning:

* hash split       — md5(doc_id) buckets 0..99 → train/eval; rebalancing
                     or re-running never moves a document between splits.
* per-group cap    — top-k per group by an explicit total order
                     (quality DESC, id ASC tie-break): the class-balance /
                     per-source cap step, as a bounded window not a sort
                     of the corpus.

Portability: bucket = integer value of the first two md5 hex nibbles
(instr/strpos arithmetic, as the SimHash fingerprints) — no engine-native
hash().
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..testdata import table as _t
from . import QuerySpec

_EVAL_PCT = 10  # buckets 0..9 of 0..99 → eval
_HEX = "0123456789abcdef"
_TOPK = 20


def _bucket_expr(dialect: str, key: str) -> str:
    """Integer 0..255 from the first two hex nibbles of md5(key)."""
    pos = "instr" if dialect == "spark" else "strpos"
    n1 = f"({pos}('{_HEX}', substr(md5({key}), 1, 1)) - 1)"
    n2 = f"({pos}('{_HEX}', substr(md5({key}), 2, 1)) - 1)"
    return f"({n1} * 16 + {n2})"


def sample_hash_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/eval assignment: bucket = md5(doc_id) % 100;
    bucket < 10 → eval.  Narrow map, no shuffle, no state."""
    d = _t(spark, sf, "documents")
    bucket = F.expr(f"{_bucket_expr('spark', 'CAST(doc_id AS STRING)')} % 100")
    return d.select(
        "doc_id",
        bucket.cast("int").alias("bucket"),
        F.when(bucket < _EVAL_PCT, F.lit("eval")).otherwise(F.lit("train")).alias("split"),
    )


_SPLIT_SQL = f"""
SELECT doc_id,
       CAST({_bucket_expr('duck', 'CAST(doc_id AS VARCHAR)')} % 100 AS INTEGER) AS bucket,
       CASE WHEN {_bucket_expr('duck', 'CAST(doc_id AS VARCHAR)')} % 100 < {_EVAL_PCT}
            THEN 'eval' ELSE 'train' END AS split
FROM documents
"""


def sample_balanced_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language cap: keep the k longest docs per lang, total order
    (n_chars DESC, doc_id ASC) so the selection is unique.  The window
    partitions on the group key — each partition ranks independently; at
    100 TB this is a partial top-k per partition + one bounded shuffle,
    never a global sort."""
    d = _t(spark, sf, "documents")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOPK)
        .select("lang", "doc_id", "n_chars", F.col("rk").cast("int").alias("rk"))
    )


_TOPK_SQL = f"""
SELECT lang, doc_id, n_chars, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM documents
)
WHERE rk <= {_TOPK}
"""


_QQ_FRAC = 0.25  # keep the best 25% of each source, exact count
_QQ_SCORE = "ROUND(CAST(size(array_distinct(split(text, ' '))) AS DOUBLE) / size(split(text, ' ')), 4)"
_QQ_SCORE_DUCK = "ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')), 4)"


def sample_quality_quota(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source quality-quota selection WITHOUT a per-group rank
    window: keep exactly k_s = max(1, ⌊{frac:.0%}·n_s⌋) docs per source,
    best-first by a 4dp type-token-ratio quality score.

    The scale problem this solves: ``row_number() OVER (PARTITION BY
    source ORDER BY score)`` funnels each source's ENTIRE membership
    through its rank window — when one source is 80% of a 100 TB corpus,
    that window is the job.  Instead the k-th-best score comes from a
    bounded (source × 4dp-score) HISTOGRAM: one corpus shuffle to the
    grid, a descending cumulative over ≤10⁴ rows per source, and the
    threshold broadcasts back — membership is then a narrow comparison.
    Only the BOUNDARY score class (docs tied exactly at the threshold)
    is ranked, by (md5(doc_id), doc_id), to fill the remaining quota
    exactly — the tie window touches one score class, not the source.

    Deterministic: 4dp score, FLOOR quota, md5 tie order — identical
    picks on both engines, retry-stable, layout-independent."""
    d = _t(spark, sf, "documents").select(
        "doc_id", "source", F.expr(_QQ_SCORE).alias("qscore")
    )
    hist = d.groupBy("source", "qscore").agg(F.count("*").cast("long").alias("c"))
    tot = hist.groupBy("source").agg(F.sum("c").cast("long").alias("n")).withColumn(
        "k",
        F.expr(f"GREATEST(CAST(1 AS BIGINT), CAST(FLOOR({_QQ_FRAC} * n) AS BIGINT))"),
    )
    wdesc = (
        Window.partitionBy("source")
        .orderBy(F.col("qscore").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(wdesc))
    thr = (
        cum.join(tot, "source")
        .filter(F.col("cum") >= F.col("k"))
        .groupBy("source", "k")
        .agg(F.max("qscore").alias("t"))
    )
    # strictly-above count at the threshold class = cum(t) − c(t)
    thrx = (
        thr.join(cum.select("source", F.col("qscore").alias("t"), "c", "cum"), ["source", "t"])
        .select("source", "k", "t", (F.col("cum") - F.col("c")).alias("n_above"))
        .localCheckpoint(eager=False)  # #sources rows, 2 consumers
    )
    flagged = d.join(F.broadcast(thrx), "source")
    sel_above = flagged.filter(F.col("qscore") > F.col("t"))
    wt = Window.partitionBy("source").orderBy(
        F.expr("md5(CAST(doc_id AS STRING))"), F.col("doc_id")
    )
    sel_tie = (
        flagged.filter(F.col("qscore") == F.col("t"))
        .withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= F.col("k") - F.col("n_above"))
        .drop("rn")
    )
    return sel_above.unionAll(sel_tie).select(
        "source", "doc_id", "qscore", F.col("k").alias("source_quota")
    )


sample_quality_quota.__doc__ = sample_quality_quota.__doc__.format(frac=_QQ_FRAC)

_QQ_SQL = f"""
WITH d AS (
  SELECT doc_id, source, {_QQ_SCORE_DUCK} AS qscore FROM documents
), hist AS (
  SELECT source, qscore, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY 1, 2
), tot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n,
         GREATEST(CAST(1 AS BIGINT), CAST(FLOOR({_QQ_FRAC} * SUM(c)) AS BIGINT)) AS k
  FROM hist GROUP BY source
), cum AS (
  SELECT source, qscore, c,
         SUM(c) OVER (PARTITION BY source ORDER BY qscore DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist
), thr AS (
  SELECT cum.source, k, MAX(qscore) AS t
  FROM cum JOIN tot USING (source)
  WHERE cum >= k GROUP BY cum.source, k
), thrx AS (
  SELECT thr.source, k, t, cum - c AS n_above
  FROM thr JOIN cum ON cum.source = thr.source AND cum.qscore = thr.t
), above AS (
  SELECT d.source, d.doc_id, d.qscore, k
  FROM d JOIN thrx USING (source) WHERE d.qscore > t
), tie AS (
  SELECT source, doc_id, qscore, k FROM (
    SELECT d.source, d.doc_id, d.qscore, k, n_above,
           ROW_NUMBER() OVER (PARTITION BY d.source
                              ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn
    FROM d JOIN thrx USING (source) WHERE d.qscore = t
  ) WHERE rn <= k - n_above
)
SELECT source, doc_id, qscore, k AS source_quota FROM above
UNION ALL
SELECT source, doc_id, qscore, k AS source_quota FROM tie
"""


# ---------------------------------------------------------------------------
# exact stratified sampling — largest-remainder allocation, md5 order
# ---------------------------------------------------------------------------

_STRAT_DEN = 5  # sample 1 in 5
_STRAT_MIN_PREFILTER = 1024  # strata at or below this size skip the md5 prefilter


def _h8_expr(dialect: str, key: str) -> str:
    """Integer value of the first 8 md5 hex nibbles (0 .. 2³²−1)."""
    pos = "instr" if dialect == "spark" else "strpos"
    terms = [
        # widen BEFORE multiplying: nibble * 16^7 overflows int32 (ANSI error)
        f"CAST({pos}('{_HEX}', substr(md5({key}), {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


def sample_stratified_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-count stratified sample (1/5 of the corpus, proportional per
    lang): integer largest-remainder allocation (k_g = n_g div 5, the
    N div 5 − Σ floor remainder seats go to the largest n_g mod 5, lang
    tie-break), selection = lowest md5 order within each stratum.

    Scale shape: the per-stratum rank window never sees the stratum — a
    deterministic md5-range PRE-FILTER (keep h8/2³² < min(1, 4·k/n))
    cuts survivors to ≈4k per stratum first, so the window ranks a
    bounded candidate set instead of funneling a giant stratum through
    one task.  Allocation windows run over #strata rows.  Everything is
    integer or mirrored-double arithmetic — no rand(), identical output
    on every engine/retry/partitioning."""
    den = _STRAT_DEN
    d = _t(spark, sf, "documents").select("doc_id", "lang")
    ng = d.groupBy("lang").agg(F.count("*").alias("n"))
    tot = ng.agg(
        F.sum("n").alias("nn"), F.sum(F.expr(f"n div {den}")).alias("base")
    )
    wr = Window.orderBy(F.expr(f"n % {den}").desc(), F.col("lang").asc())
    alloc = (
        ng.crossJoin(F.broadcast(tot))
        .withColumn("extra_rank", F.row_number().over(wr))
        .withColumn(
            "k",
            F.expr(f"n div {den}")
            + F.when(
                F.col("extra_rank") <= F.expr(f"nn div {den} - base"), 1
            ).otherwise(0),
        )
        .select("lang", "n", F.col("k").cast("long").alias("k"))
        # #strata rows; materialized so the survivor join doesn't re-scan
        # the fact table through the allocation lineage
        .localCheckpoint()
    )
    h = d.withColumn("h8", F.expr(_h8_expr("spark", "CAST(doc_id AS STRING)")))
    # prefilter floor: below _STRAT_MIN_PREFILTER rows the 4·k/n range
    # filter could deterministically strand a stratum with < k survivors
    # (e.g. n=5, k=1 fails w.p. ≈3e-4) — tiny strata skip it outright
    # (the rank window then sees ≤ the floor, still bounded); above the
    # floor k ≥ floor/5 and the shortfall probability is astronomically
    # small (Binomial(n, 0.8) < n/5)
    surv = h.join(F.broadcast(alloc), "lang").filter(
        F.expr(
            f"n <= {_STRAT_MIN_PREFILTER}"
            " OR (CAST(h8 AS DOUBLE) / 4294967296.0) < LEAST(4.0 * k / n, 1.0)"
        )
    )
    wk = Window.partitionBy("lang").orderBy("h8", "doc_id")
    return (
        surv.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= F.col("k"))
        .select("doc_id", "lang")
    )


_STRAT_SQL = f"""
WITH ng AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
tot AS (SELECT SUM(n) AS nn, SUM(n // {_STRAT_DEN}) AS base FROM ng),
alloc AS (
  SELECT lang, n,
         CAST(n // {_STRAT_DEN}
              + CASE WHEN ROW_NUMBER() OVER (ORDER BY n % {_STRAT_DEN} DESC, lang)
                          <= nn // {_STRAT_DEN} - base
                     THEN 1 ELSE 0 END AS BIGINT) AS k
  FROM ng, tot
),
h AS (
  SELECT doc_id, lang, {_h8_expr('duck', 'CAST(doc_id AS VARCHAR)')} AS h8
  FROM documents
),
surv AS (
  SELECT h.doc_id, h.lang, h.h8, a.k
  FROM h JOIN alloc a USING (lang)
  WHERE a.n <= {_STRAT_MIN_PREFILTER}
     OR (CAST(h8 AS DOUBLE) / 4294967296.0) < LEAST(4.0 * a.k / a.n, 1.0)
),
ranked AS (
  SELECT doc_id, lang, k,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h8, doc_id) AS rn
  FROM surv
)
SELECT doc_id, lang FROM ranked WHERE rn <= k
"""


# ---------------------------------------------------------------------------
# sequence packing — assemble fixed-token-budget training batches
# ---------------------------------------------------------------------------

_PACK_BUDGET = 512  # tokens per packed batch
_PACK_BUCKETS = 64  # parallel packing streams


def pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Assign documents to fixed-budget training batches: docs are
    spread across ``_PACK_BUCKETS`` md5 streams, ordered deterministically
    within each stream (md5, doc_id), and batched by the running token
    total — batch_id = (bucket, floor(cum_before/budget)).

    Scale shape: the running sum partitions on the bucket — 64 (or 64k)
    independent streams, never one global cumulative window; batch
    numbering is per-stream so streams never coordinate.  The boundary
    doc that straddles a budget edge stays in its starting batch
    (budget-approximate by ≤1 doc — the standard streaming-packing
    trade; exact bin packing is NP-hard and needs no more fidelity
    here).  Deterministic: same batches on every engine/retry."""
    d = _t(spark, sf, "documents").select(
        "doc_id", F.expr("size(split(text, ' '))").cast("long").alias("n_tok")
    )
    bucket = F.expr(f"{_bucket_expr('spark', 'CAST(doc_id AS STRING)')} % {_PACK_BUCKETS}")
    w = Window.partitionBy("bucket").orderBy(
        F.expr("md5(CAST(doc_id AS STRING))"), F.col("doc_id")
    )
    return (
        d.withColumn("bucket", bucket.cast("int"))
        .withColumn(
            "cum_before",
            F.coalesce(
                F.sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .select(
            "doc_id",
            "bucket",
            "n_tok",
            F.expr(f"CAST(cum_before div {_PACK_BUDGET} AS BIGINT)").alias("batch_in_bucket"),
        )
    )


_PACK_SQL = f"""
WITH d AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         CAST({_bucket_expr('duck', 'CAST(doc_id AS VARCHAR)')} % {_PACK_BUCKETS} AS INTEGER) AS bucket
  FROM documents
), c AS (
  SELECT doc_id, bucket, n_tok,
         COALESCE(SUM(n_tok) OVER (PARTITION BY bucket
                                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM d
)
SELECT doc_id, bucket, n_tok,
       CAST(cum_before // {_PACK_BUDGET} AS BIGINT) AS batch_in_bucket
FROM c
"""


# ---------------------------------------------------------------------------
# data-mixture sampling — temperature-weighted per-source rates
# ---------------------------------------------------------------------------

_MIX_SCALE = 3.0  # k_s = floor(scale · √n_s): per-source keep rate ∝ 1/√n_s


def sample_mixture_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-weighted data-mixture sampling (the α = 0.5 mixing rule
    used to rebalance source corpora for LLM training): each source keeps
    ``k_s = floor(scale · √n_s)`` documents, so small sources are kept at a
    much higher RATE (∝ 1/√n_s) than web-scale ones — multinomial
    temperature sampling made exact-count and deterministic.

    Selection within a source is the k_s lowest md5 orders, with the same
    md5-range prefilter as the stratified sampler so the per-source rank
    window never funnels a whole source through one task (critical when
    one source is 80% of a 100 TB corpus).  √ is IEEE-correctly-rounded
    in both engines, floor is exact — identical k_s and identical picks
    everywhere; no rand(), retry-stable."""
    d = _t(spark, sf, "documents").select("doc_id", "source")
    alloc = (
        d.groupBy("source")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "k",
            F.expr(
                f"LEAST(n, CAST(FLOOR({_MIX_SCALE} * SQRT(CAST(n AS DOUBLE))) AS BIGINT))"
            ),
        )
        .localCheckpoint()  # #sources rows; avoid re-scanning facts per use
    )
    h = d.withColumn("h8", F.expr(_h8_expr("spark", "CAST(doc_id AS STRING)")))
    surv = h.join(F.broadcast(alloc), "source").filter(
        F.expr(
            f"n <= {_STRAT_MIN_PREFILTER}"
            " OR (CAST(h8 AS DOUBLE) / 4294967296.0) < LEAST(4.0 * k / n, 1.0)"
        )
    )
    wk = Window.partitionBy("source").orderBy("h8", "doc_id")
    return (
        surv.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= F.col("k"))
        .select("doc_id", "source", F.col("k").cast("long").alias("source_quota"))
    )


_MIX_SQL = f"""
WITH alloc AS (
  SELECT source, COUNT(*) AS n,
         LEAST(COUNT(*), CAST(FLOOR({_MIX_SCALE} * SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT)) AS k
  FROM documents GROUP BY 1
), h AS (
  SELECT doc_id, source, {_h8_expr('duck', 'CAST(doc_id AS VARCHAR)')} AS h8
  FROM documents
), surv AS (
  SELECT h.doc_id, h.source, h.h8, a.k
  FROM h JOIN alloc a USING (source)
  WHERE a.n <= {_STRAT_MIN_PREFILTER}
     OR (CAST(h8 AS DOUBLE) / 4294967296.0) < LEAST(4.0 * a.k / a.n, 1.0)
), ranked AS (
  SELECT doc_id, source, k,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h8, doc_id) AS rn
  FROM surv
)
SELECT doc_id, source, CAST(k AS BIGINT) AS source_quota FROM ranked WHERE rn <= k
"""


# ---------------------------------------------------------------------------
# sliding-window document chunking (context-window / RAG prep)
# ---------------------------------------------------------------------------

_CHUNK_K = 32  # tokens per chunk
_CHUNK_STRIDE = 24  # overlap = K − STRIDE = 8 tokens


def chunk_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window chunking: cut every document into {k}-token windows
    every {stride} tokens (8-token overlap) — the standard
    context-window prep for RAG indexing and fixed-length pretraining
    examples.  Tail windows shorter than {k} tokens are kept (callers
    drop or pad; the row carries its true length).

    Physical shape at 100 TB: a PURE NARROW MAP — split, windowed slice
    via ``transform(sequence(...))``, one explode; no shuffle, no
    window function, no state.  Chunk identity is (doc_id, chunk_idx)
    and the text ships as (length, md5) so the gated output stays
    narrow; the text itself is one ``array_join`` away for a real
    sink."""
    d = _t(spark, sf, "documents").select("doc_id", F.split("text", " ").alias("toks"))
    chunks = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(toks) - 1, {_CHUNK_STRIDE}),"
                f" s -> named_struct('start_tok', CAST(s AS BIGINT),"
                f"   'n_tok', CAST(least({_CHUNK_K}, size(toks) - s) AS BIGINT),"
                f"   'txt', array_join(slice(toks, s + 1, {_CHUNK_K}), ' ')))"
            )
        ).alias("chunk_idx", "c"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("c.start_tok").alias("start_tok"),
        F.col("c.n_tok").alias("n_tok"),
        F.md5("c.txt").alias("chunk_md5"),
    )


chunk_documents.__doc__ = chunk_documents.__doc__.format(k=_CHUNK_K, stride=_CHUNK_STRIDE)

_CHUNK_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), starts AS (
  SELECT doc_id, toks, UNNEST(range(0, len(toks), {_CHUNK_STRIDE})) AS s FROM d
)
SELECT doc_id,
       CAST(s // {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(s AS BIGINT) AS start_tok,
       CAST(LEAST({_CHUNK_K}, len(toks) - s) AS BIGINT) AS n_tok,
       md5(array_to_string(toks[s + 1 : s + {_CHUNK_K}], ' ')) AS chunk_md5
FROM starts
"""


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al. 2023, "Data Selection for Language
# Models via Importance Resampling")
# ---------------------------------------------------------------------------

_DSIR_TARGET = "src0"  # the "target domain" corpus (DSIR's Wikipedia role)
_DSIR_B = 256  # hashed n-gram feature buckets (two md5 nibbles)
_DSIR_K = 100  # documents to resample


def dsir_scores(spark: SparkSession, sf: str) -> DataFrame:
    """The DSIR score relation BEFORE the top-k cut: (doc_id, n_buckets,
    log_w, sel_key) for every candidate document — consumed by
    :func:`sample_dsir_importance` (TakeOrdered k) and by
    pipeline.pipeline_selection_funnel (rank within a filtered
    population).  See sample_dsir_importance for semantics and the scale
    shape."""
    return _dsir_scores(spark, sf)


def sample_dsir_importance(spark: SparkSession, sf: str, *, k: int = _DSIR_K) -> DataFrame:
    """DSIR data selection: score every raw document by the hashed-n-gram
    importance ratio between a target-domain LM and a raw-corpus LM, then
    resample k docs by deterministic Gumbel-top-k.

    Features are unigrams + bigrams hashed into {b} buckets (first two
    md5 nibbles — the repo's portable bucket hash).  Both "LMs" are
    bag-of-buckets unigram models with add-one smoothing: p̂_target from
    the docs of source ``{target}``, q̂_raw from the whole corpus.  A
    candidate doc's log importance weight is
    ``log w = Σ_b c_b · (ln p̂_t(b) − ln q̂_r(b))`` — folded in pinned
    bucket order so both engines add identical doubles identically.
    Resampling ∝ exp(log w) without replacement is Gumbel-top-k with the
    uniform drawn from md5(doc_id) (no rand(): same selection on every
    engine, retry, and partitioning).

    Physical shape at 100 TB: ONE corpus pass (explode → groupBy on the
    uniform (doc_id, bucket) key); both LMs contract to ≤{b}-row tables
    that BROADCAST into the scoring join, and selection is a TakeOrdered
    k — no corpus-scale sort, no pair space, no driver loop.  The
    {b}-bucket cap is what DSIR's hashing buys: the Zipf-hot token key
    never becomes a shuffle key.

    Beyond-reference (training-data pipeline); reference's nearest
    analog is the two-class cohort selection in
    mmeds/mmeds/util.py (load_metadata splits)."""
    return (
        _dsir_scores(spark, sf)
        .orderBy(F.col("sel_key").desc(), "doc_id")
        .limit(k)
    )


def _dsir_scores(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("a")
    )
    # unigram + bigram features from ONE explode over the concatenated
    # array — the union-of-two-explodes form scanned (and re-split) the
    # corpus twice for what is a single feature stream (r12: one parquet
    # scan, one split per doc; the feature multiset is identical, and
    # order never matters under the groupBy).  The raw docs repartition
    # first — the same single-input-split rescue _doc_shingles documents:
    # the test corpus is one parquet row group, which would serialize the
    # md5-heavy explode+partial-agg into one task (the union form hid
    # that behind its two parallel branches); a many-file 100 TB corpus
    # already yields thousands of splits, where this becomes a
    # balance/no-op shuffle
    feats = d.repartition("doc_id").select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "concat(a, transform(slice(a, 1, size(a) - 1),"
                " (x, i) -> concat(x, ' ', a[i + 1])))"
            )
        ).alias("f"),
    )
    bexpr = _bucket_expr("spark", "f")
    # ONE corpus pass: (doc_id, b, c) is consumed three ways (target LM,
    # raw LM, candidate scoring) — checkpoint so the explode+agg runs once
    # (at cluster scale: persist(DISK_ONLY) or a checkpoint table)
    cnt = (
        feats.select("doc_id", "source", F.expr(bexpr).alias("b"))
        .groupBy("doc_id", "source", "b")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    tgt = (
        cnt.filter(F.col("source") == _DSIR_TARGET)
        .groupBy("b")
        .agg(F.expr("CAST(SUM(c) AS BIGINT)").alias("tc"))
    )
    raw = cnt.groupBy("b").agg(F.expr("CAST(SUM(c) AS BIGINT)").alias("rc"))
    tn = tgt.agg(F.expr("CAST(SUM(tc) AS BIGINT)").alias("tn"))
    rn = raw.agg(F.expr("CAST(SUM(rc) AS BIGINT)").alias("rn"))
    lm = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tn))
        .crossJoin(F.broadcast(rn))
        .select(
            "b",
            F.expr(
                f"LN(CAST(COALESCE(tc, 0) + 1 AS DOUBLE) / CAST(tn + {_DSIR_B} AS DOUBLE))"
                f" - LN(CAST(rc + 1 AS DOUBLE) / CAST(rn + {_DSIR_B} AS DOUBLE))"
            ).alias("lr"),
        )
    )
    scored = (
        cnt.filter(F.col("source") != _DSIR_TARGET)
        .join(F.broadcast(lm), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.expr(
                "aggregate(array_sort(collect_list(struct(b, c, lr))),"
                " CAST(0 AS DOUBLE), (acc, q) -> acc + q.c * q.lr)"
            ).alias("lw"),
        )
    )
    h8 = _h8_expr("spark", "concat('gumbel:', CAST(doc_id AS STRING))")
    keyed = scored.select(
        "doc_id",
        "n_buckets",
        F.expr("ROUND(lw, 6)").alias("log_w"),
        F.expr(
            f"ROUND(lw - LN(-LN(CAST({h8} + 1 AS DOUBLE) / CAST(4294967297 AS DOUBLE))), 6)"
        ).alias("sel_key"),
    )
    return keyed


sample_dsir_importance.__doc__ = sample_dsir_importance.__doc__.format(
    b=_DSIR_B, target=_DSIR_TARGET
)

# the WITH-body producing `dsirkeyed` (doc_id, n_buckets, log_w, sel_key)
# — shared by the sample_dsir_importance oracle and the selection-funnel
# composition in pipeline.py
_DSIR_CTES = f"""dsd AS (
  SELECT doc_id, source, string_split(text, ' ') AS a FROM documents
), uni AS (
  SELECT doc_id, source, generate_subscripts(a, 1) AS i, unnest(a) AS f FROM dsd
), big AS (
  SELECT t1.doc_id, t1.source, t1.f || ' ' || t2.f AS f
  FROM uni t1 JOIN uni t2 ON t1.doc_id = t2.doc_id AND t2.i = t1.i + 1
), feats AS (
  SELECT doc_id, source, f FROM uni UNION ALL SELECT doc_id, source, f FROM big
), cnt AS (
  SELECT doc_id, source, {_bucket_expr("duck", "f")} AS b,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM feats GROUP BY 1, 2, 3
), tgt AS (
  SELECT b, CAST(SUM(c) AS BIGINT) AS tc FROM cnt
  WHERE source = '{_DSIR_TARGET}' GROUP BY b
), raw AS (
  SELECT b, CAST(SUM(c) AS BIGINT) AS rc FROM cnt GROUP BY b
), tn AS (SELECT CAST(SUM(tc) AS BIGINT) AS tn FROM tgt
), rn AS (SELECT CAST(SUM(rc) AS BIGINT) AS rn FROM raw
), lm AS (
  SELECT b,
         LN(CAST(COALESCE(tc, 0) + 1 AS DOUBLE) / CAST(tn + {_DSIR_B} AS DOUBLE))
         - LN(CAST(rc + 1 AS DOUBLE) / CAST(rn + {_DSIR_B} AS DOUBLE)) AS lr
  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tn CROSS JOIN rn
), scored AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_buckets,
         list_reduce(list(c * lr ORDER BY b), (acc, x) -> acc + x) AS lw
  FROM cnt JOIN lm USING (b)
  WHERE source <> '{_DSIR_TARGET}'
  GROUP BY doc_id
), dsirkeyed AS (
  SELECT doc_id, n_buckets, ROUND(lw, 6) AS log_w,
         ROUND(lw - LN(-LN(
           CAST({_h8_expr("duck", "'gumbel:' || CAST(doc_id AS VARCHAR)")} + 1 AS DOUBLE)
           / CAST(4294967297 AS DOUBLE))), 6) AS sel_key
  FROM scored
)"""

_DSIR_SQL = f"""
WITH {_DSIR_CTES}
SELECT doc_id, n_buckets, log_w, sel_key
FROM dsirkeyed
ORDER BY sel_key DESC, doc_id
LIMIT {_DSIR_K}
"""


# ---------------------------------------------------------------------------
# greedy k-center coreset (Gonzalez 2-approximation) — diversity selection
# ---------------------------------------------------------------------------

_KC_K = 8  # coreset size


def sample_kcenter_coreset(spark: SparkSession, sf: str, *, k: int = _KC_K) -> DataFrame:
    """Greedy k-center coreset over the embedding table (Gonzalez's
    2-approximation): start from the lowest vec_id, then repeatedly add
    the point FARTHEST from the selected set — the
    diversity-maximizing selection that complements dedup (remove
    near-dups) and DSIR (match a target) in a data-selection toolkit.
    Output: (round, vec_id, r2) — r2 is the squared distance at which
    the center was selected, i.e. the coverage radius² the selection
    improved; a 2-approx bound on the optimal k-center radius².

    EXACT argmax: all distances are squared L2 over DECIMAL(9,4)
    -quantized coordinates accumulated in DECIMAL(30,8) (the
    kmeans_buckets_exact discipline) — every comparison is rational, so
    Spark (which embeds each new center's coordinates as decimal
    literals) and DuckDB (which derives them relationally) select
    byte-identical centers; r2 ships as the exact decimal.

    Scale shape: k−1 rounds, each ONE narrow distance map (the center is
    a broadcast-in-all-but-name literal) + a running LEAST + a
    TakeOrdered(1); only k rows and k×dim decimal strings ever cross the
    driver.  Lineage truncates each round with a lazy localCheckpoint."""
    e = (
        _t(spark, sf, "embeddings")
        .select(
            "vec_id",
            F.expr(
                "transform(embedding, x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(9,4)))"
            ).alias("qv"),
        )
    )

    def d2_expr(coords: list[str]) -> str:
        arr = ", ".join(f"CAST('{c}' AS DECIMAL(9,4))" for c in coords)
        return (
            f"aggregate(zip_with(qv, array({arr}), (a, b) -> (a - b) * (a - b)), "
            f"CAST(0 AS DECIMAL(30,8)), (acc, z) -> CAST(acc + z AS DECIMAL(30,8)))"
        )

    first = e.orderBy("vec_id").limit(1).collect()[0]
    picked = [(0, int(first.vec_id), None)]
    coords = [str(x) for x in first.qv]
    cur = e.select(
        "vec_id", "qv", F.expr(d2_expr(coords)).alias("d2min")
    ).localCheckpoint(eager=False)
    for r in range(1, k):
        far = (
            cur.filter(~F.col("vec_id").isin([p[1] for p in picked]))
            .orderBy(F.col("d2min").desc(), "vec_id")
            .limit(1)
            .collect()[0]
        )
        picked.append((r, int(far.vec_id), str(far.d2min)))
        coords = [str(x) for x in far.qv]
        cur = cur.select(
            "vec_id",
            "qv",
            F.expr(f"LEAST(d2min, {d2_expr(coords)})").alias("d2min"),
        ).localCheckpoint(eager=False)
    rows = " UNION ALL ".join(
        f"SELECT {r} AS round, CAST({v} AS BIGINT) AS vec_id, "
        + (
            "CAST(NULL AS DOUBLE) AS r2"
            if d2 is None
            else f"CAST(CAST('{d2}' AS DECIMAL(30,8)) AS DOUBLE) AS r2"
        )
        for r, v, d2 in picked
    )
    return spark.sql(rows)


def _kcenter_sql() -> str:
    """The same greedy loop unrolled: each round derives the new center
    RELATIONALLY (the argmax row joined back to the coordinate table) —
    identical decimals, identical selections."""
    cte = [
        "e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        "el AS MATERIALIZED (\n  SELECT vec_id, u.i, CAST(u.x AS DECIMAL(9,4)) AS q\n"
        "  FROM (SELECT vec_id, unnest(list_transform(v, (x, i) -> {'x': x, 'i': i})) AS u FROM e)\n)",
        "s0 AS MATERIALIZED (SELECT MIN(vec_id) AS cid FROM el)",
        "c0 AS MATERIALIZED (SELECT i, q FROM el WHERE vec_id = (SELECT cid FROM s0))",
        "m0 AS MATERIALIZED (\n  SELECT el.vec_id, CAST(SUM((el.q - c.q) * (el.q - c.q)) AS DECIMAL(30,8)) AS d2min\n"
        "  FROM el JOIN c0 c ON el.i = c.i GROUP BY el.vec_id\n)",
        "sel AS MATERIALIZED (SELECT 0 AS round, cid AS vec_id, CAST(NULL AS DECIMAL(30,8)) AS r2 FROM s0)",
    ]
    prev_m, prev_sel = "m0", "sel"
    for r in range(1, _KC_K):
        s, c, m, ns = f"s{r}", f"c{r}", f"m{r}", f"sel{r}"
        cte.append(
            f"{s} AS MATERIALIZED (\n  SELECT vec_id, d2min FROM {prev_m}\n"
            f"  WHERE vec_id NOT IN (SELECT vec_id FROM {prev_sel})\n"
            f"  ORDER BY d2min DESC, vec_id LIMIT 1\n)"
        )
        cte.append(
            f"{c} AS MATERIALIZED (SELECT i, q FROM el WHERE vec_id = (SELECT vec_id FROM {s}))"
        )
        cte.append(
            f"{m} AS MATERIALIZED (\n  SELECT m.vec_id,"
            f" LEAST(m.d2min, d.d2) AS d2min\n"
            f"  FROM {prev_m} m JOIN (\n"
            f"    SELECT el.vec_id, CAST(SUM((el.q - c.q) * (el.q - c.q)) AS DECIMAL(30,8)) AS d2\n"
            f"    FROM el JOIN {c} c ON el.i = c.i GROUP BY el.vec_id\n"
            f"  ) d ON m.vec_id = d.vec_id\n)"
        )
        cte.append(
            f"{ns} AS MATERIALIZED (\n  SELECT * FROM {prev_sel}\n"
            f"  UNION ALL SELECT {r}, vec_id, d2min FROM {s}\n)"
        )
        prev_m, prev_sel = m, ns
    return (
        "WITH " + ",\n".join(cte)
        + f"\nSELECT round, CAST(vec_id AS BIGINT) AS vec_id,"
        f" CAST(r2 AS DOUBLE) AS r2 FROM {prev_sel}"
    )


# ---------------------------------------------------------------------------
# source-mixture concentration profile — data-mixture diagnostics
# ---------------------------------------------------------------------------


def a23_source_mixture_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus mixture diagnostics: how concentrated is the corpus across
    sources?  One row: source count, Gini coefficient and Shannon
    entropy of the document distribution, and the top-1 / top-5 source
    shares — the report a mixture-weighting step (sample_mixture_weighted)
    reads before choosing its temperature.

    Exactness: with per-source counts x₁ ≤ … ≤ x_k (count asc, source
    tie-break), Gini = Σ(2i − k − 1)xᵢ / (k·Σx) — an exact INTEGER
    numerator and denominator, one final division; entropy folds
    −Σ pᵢ ln pᵢ in pinned source order with each pᵢ an exact integer
    ratio; shares are integer ratios.  Scale shape: one partial-agg
    shuffle to k source rows; every window/fold runs over those k rows
    only."""
    src = (
        _t(spark, sf, "documents")
        .groupBy("source")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("x"))
    )
    return mixture_profile(src)


def mixture_profile(src: DataFrame) -> DataFrame:
    """The concentration profile over any (source, x BIGINT) count
    relation — shared by :func:`a23_source_mixture_profile` and the
    streaming mixture monitor (streaming/mixture.py), so streaming
    profiles are bit-identical to batch ones over the same documents."""
    w = Window.orderBy(F.col("x").asc(), F.col("source").asc())
    full = Window.partitionBy()
    ranked = (
        src.withColumn("i", F.row_number().over(w))
        .withColumn("k", F.count("*").over(full))
        .withColumn("tot", F.sum("x").over(full))
        .withColumn("p", F.expr("CAST(x AS DOUBLE) / CAST(tot AS DOUBLE)"))
    )
    return ranked.agg(
        F.expr("CAST(MAX(k) AS BIGINT)").alias("n_sources"),
        F.expr(
            "ROUND(CAST(SUM((2 * i - k - 1) * x) AS DOUBLE)"
            " / (CAST(MAX(k) AS DOUBLE) * MAX(tot)), 6)"
        ).alias("gini"),
        F.expr(
            "ROUND(-aggregate(array_sort(collect_list(named_struct("
            "'s', source, 'plp', p * LN(p)))),"
            " CAST(0 AS DOUBLE), (acc, q) -> acc + q.plp), 6)"
        ).alias("entropy"),
        F.expr("ROUND(CAST(MAX(x) AS DOUBLE) / MAX(tot), 6)").alias("top1_share"),
        F.expr(
            "ROUND(CAST(SUM(CASE WHEN i > k - 5 THEN x ELSE 0 END)"
            " AS DOUBLE) / MAX(tot), 6)"
        ).alias("top5_share"),
    )


_MIXPROF_SQL = """
WITH src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS x FROM documents GROUP BY source
), ranked AS (
  SELECT source, x,
         ROW_NUMBER() OVER (ORDER BY x ASC, source ASC) AS i,
         COUNT(*) OVER () AS k, SUM(x) OVER () AS tot
  FROM src
)
SELECT CAST(MAX(k) AS BIGINT) AS n_sources,
       ROUND(CAST(SUM((2 * i - k - 1) * x) AS DOUBLE)
             / (CAST(MAX(k) AS DOUBLE) * MAX(tot)), 6) AS gini,
       ROUND(-list_reduce(
         list(CAST(x AS DOUBLE) / CAST(tot AS DOUBLE)
              * LN(CAST(x AS DOUBLE) / CAST(tot AS DOUBLE)) ORDER BY source),
         (acc, v) -> acc + v), 6) AS entropy,
       ROUND(CAST(MAX(x) AS DOUBLE) / MAX(tot), 6) AS top1_share,
       ROUND(CAST(SUM(CASE WHEN i > k - 5 THEN x ELSE 0 END) AS DOUBLE)
             / MAX(tot), 6) AS top5_share
FROM ranked
"""


# ---------------------------------------------------------------------------
# epoch shuffle — the training-export last mile: deterministic global order
# ---------------------------------------------------------------------------

_EPOCHS = 2
_EPOCH_SHARDS = 8


def sample_epoch_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """Epoch-deterministic global shuffle + shard assignment — the last
    mile of a training-data pipeline: every epoch needs the corpus in a
    DIFFERENT but REPRODUCIBLE random order, written as N independent
    shard files.  Key = md5(epoch:doc_id); shard = key's first byte mod
    N; position = rank of the key within (epoch, shard).  Each epoch is
    a permutation of the corpus (asserted in tests); changing the epoch
    changes every key, so epochs are independent shuffles; re-running
    any epoch reproduces it bit-for-bit — no RNG state to persist.

    Physical shape at 100 TB: one narrow map to (epoch, shard, key),
    then ONE shuffle on (epoch, shard) with an IN-PARTITION sort — the
    rank window never crosses shards, so this is exactly
    ``repartition(epoch, shard) + sortWithinPartitions(key)`` feeding N
    sorted shard files per epoch; no global sort ever exists.  Size N so
    a shard fits an executor's write stream; E epochs are E map streams
    off the same scan.  md5 keys make the order uniform AND portable —
    the oracle reproduces every (shard, pos) exactly."""
    d = _t(spark, sf, "documents")
    hexpos = lambda i: f"(instr('{_HEX}', substr(k, {i}, 1)) - 1)"  # noqa: E731
    keyed = d.select(
        "doc_id",
        F.explode(F.array(*[F.lit(i) for i in range(_EPOCHS)])).alias("epoch"),
    ).select(
        "epoch",
        "doc_id",
        F.expr("md5(concat(CAST(epoch AS STRING), ':', CAST(doc_id AS STRING)))").alias("k"),
    )
    sharded = keyed.withColumn(
        "shard", F.expr(f"({hexpos(1)} * 16 + {hexpos(2)}) % {_EPOCH_SHARDS}")
    )
    w = Window.partitionBy("epoch", "shard").orderBy("k")
    return sharded.select(
        F.col("epoch").cast("int").alias("epoch"),
        F.col("shard").cast("int").alias("shard"),
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
        "doc_id",
    )


def _epoch_sql() -> str:
    hexpos = lambda i: f"(strpos('{_HEX}', substr(k, {i}, 1)) - 1)"  # noqa: E731
    return f"""
WITH keyed AS (
  SELECT epoch, doc_id,
         md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS k
  FROM documents, (SELECT unnest(range(0, {_EPOCHS})) AS epoch)
), sharded AS (
  SELECT epoch, doc_id, k,
         ({hexpos(1)} * 16 + {hexpos(2)}) % {_EPOCH_SHARDS} AS shard
  FROM keyed
)
SELECT CAST(epoch AS INTEGER) AS epoch, CAST(shard AS INTEGER) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard ORDER BY k) - 1 AS BIGINT) AS pos,
       doc_id
FROM sharded
"""


# ---------------------------------------------------------------------------
# epoch plan — data-constrained repetition (how many copies of each doc
# fit a T-token run)
# ---------------------------------------------------------------------------

_EP_NUM, _EP_DEN = 5, 2  # token target T = (5/2)x the corpus — 2 full
# epochs + a half-epoch remainder (repeating data up to ~4 epochs is
# near-free per Muennighoff et al. 2023, "Scaling Data-Constrained LMs")


def sample_epoch_plan(spark: SparkSession, sf: str) -> DataFrame:
    """EPOCH PLAN for a token-budgeted training run: given a target of
    T = ({num}/{den})·total_corpus_tokens, how many copies of each doc
    ship — every doc gets ⌊T/total⌋ full-epoch copies, and the remainder
    budget is filled by a deterministic md5-ordered greedy prefix
    (largest prefix of md5(doc_id) order whose token sum fits) — exactly
    how a trainer materializes "2.5 epochs over this corpus".

    The scale shape is the quality-quota trick transposed to the md5
    axis: the remainder selection needs a GLOBAL running token sum in
    md5 order, which as one window is a single-task corpus sort.
    Instead the 256-class md5-prefix histogram gives each bucket's token
    subtotal (one partial agg), the exclusive bucket prefix is a ≤256-row
    window, whole buckets below the crossing are taken wholesale, and
    only the ONE boundary bucket (~1/256 of the corpus) is ordered
    exactly.  Deterministic: integer token target ((T = {num}·total
    DIV {den})), md5 order, doc_id tie-break."""
    d = _t(spark, sf, "documents").select(
        "doc_id",
        "source",
        F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("n_tokens"),
        F.expr("md5(CAST(doc_id AS STRING))").alias("k"),
    )
    d = d.withColumn("bkt", F.expr(_bucket_expr("spark", "CAST(doc_id AS STRING)")))
    tot = d.agg(
        F.expr("SUM(n_tokens)").alias("total")
    ).select(
        "total",
        F.expr(f"CAST({_EP_NUM} * total DIV {_EP_DEN} AS BIGINT)").alias("t_target"),
    ).select(
        "total",
        "t_target",
        F.expr("CAST(t_target DIV total AS BIGINT)").alias("full_copies"),
        F.expr("CAST(t_target % total AS BIGINT)").alias("rem"),
    )
    bs = d.groupBy("bkt").agg(F.expr("SUM(n_tokens)").alias("bt"))
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, 0)
    pre = bs.withColumn("pre", F.sum("bt").over(wb) - F.col("bt")).select(
        "bkt", "pre", "bt"
    )
    flagged = d.join(F.broadcast(pre), "bkt").crossJoin(F.broadcast(tot))
    below = flagged.filter(F.col("pre") + F.col("bt") <= F.col("rem")).withColumn(
        "extra", F.lit(1)
    )
    wk = Window.partitionBy("bkt").orderBy("k", "doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    boundary = (
        flagged.filter(
            (F.col("pre") <= F.col("rem")) & (F.col("pre") + F.col("bt") > F.col("rem"))
        )
        .withColumn("cum", F.sum("n_tokens").over(wk))
        .withColumn(
            "extra", F.expr("CASE WHEN pre + cum <= rem THEN 1 ELSE 0 END")
        )
    )
    above = flagged.filter(F.col("pre") > F.col("rem")).withColumn("extra", F.lit(0))
    cols = ["doc_id", "source", "n_tokens", "full_copies", "extra"]
    return (
        below.select(*cols)
        .unionAll(boundary.select(*cols))
        .unionAll(above.select(*cols))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.expr("CAST(full_copies + extra AS BIGINT)").alias("n_copies"),
            F.expr("CAST(n_tokens * (full_copies + extra) AS BIGINT)").alias(
                "planned_tokens"
            ),
        )
    )


sample_epoch_plan.__doc__ = sample_epoch_plan.__doc__.format(num=_EP_NUM, den=_EP_DEN)

_EPOCH_PLAN_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS k
  FROM documents
), tot AS (
  SELECT SUM(n_tokens) AS total,
         ({_EP_NUM} * SUM(n_tokens)) // {_EP_DEN} AS t_target
  FROM d
), plan AS (
  SELECT total, t_target,
         CAST(t_target // total AS BIGINT) AS full_copies,
         CAST(t_target % total AS BIGINT) AS rem
  FROM tot
), cum AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (ORDER BY k, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM d
)
SELECT doc_id, source, n_tokens,
       CAST(full_copies + CASE WHEN c <= rem THEN 1 ELSE 0 END AS BIGINT)
         AS n_copies,
       CAST(n_tokens * (full_copies + CASE WHEN c <= rem THEN 1 ELSE 0 END)
            AS BIGINT) AS planned_tokens
FROM cum, plan
"""


# ---------------------------------------------------------------------------
# cluster-aware split — near-dup clusters never straddle train/eval
# ---------------------------------------------------------------------------


def sample_cluster_split(
    spark: SparkSession, sf: str, *, clusters: DataFrame | None = None
) -> DataFrame:
    """LEAKAGE-SAFE train/eval split: the md5 hash split keyed by the
    near-dup CLUSTER instead of the document — a plain random/hash split
    puts a document in train and its near-duplicate in eval, and the
    eval score silently measures memorization.  Composition: SimHash
    pair generation → connected components (dedup_cluster_components
    verbatim) → every doc inherits its component's min-id as the split
    key (unclustered docs key by themselves) → the sample_hash_split
    rule on the key.  All members of a cluster land on the SAME side by
    construction.

    Physical shape: the CC fixpoint (contraction + O(log d) pointer
    jumping) plus one doc_id-keyed left join of docs against the
    cluster relation and a narrow md5 map.  The cluster side is NOT
    broadcast-hinted on purpose: pair participation is usually a small
    fraction of the corpus, but on a heavily duplicated corpus (the
    very case this operator guards against) it approaches the corpus
    itself — AQE picks broadcast at runtime when it actually fits.
    ``clusters=`` shares a precomputed (doc_id, cluster_id) relation
    across the CC consumers, so a session runs the fixpoint once."""
    from .dedup import dedup_cluster_components

    cc = clusters if clusters is not None else dedup_cluster_components(spark, sf)
    d = _t(spark, sf, "documents").select("doc_id")
    keyed = (
        d.join(cc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("split_key"),
            F.col("cluster_id").isNotNull().alias("is_clustered"),
        )
    )
    bucket = F.expr(f"{_bucket_expr('spark', 'CAST(split_key AS STRING)')} % 100")
    return keyed.select(
        "doc_id",
        "split_key",
        "is_clustered",
        bucket.cast("int").alias("bucket"),
        F.when(bucket < _EVAL_PCT, F.lit("eval"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def _cluster_split_sql() -> str:
    from .dedup import _components_sql

    return f"""
WITH cc AS ({_components_sql()}
), keyed AS (
  SELECT d.doc_id,
         COALESCE(cc.cluster_id, d.doc_id) AS split_key,
         cc.cluster_id IS NOT NULL AS is_clustered
  FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id
)
SELECT doc_id, split_key, is_clustered,
       CAST({_bucket_expr('duck', 'CAST(split_key AS VARCHAR)')} % 100 AS INTEGER)
         AS bucket,
       CASE WHEN {_bucket_expr('duck', 'CAST(split_key AS VARCHAR)')} % 100
                 < {_EVAL_PCT}
            THEN 'eval' ELSE 'train' END AS split
FROM keyed
"""


QUERIES: dict[str, QuerySpec] = {
    "sample_cluster_split": QuerySpec(
        sample_cluster_split,
        _cluster_split_sql(),
        "LLM-pipeline leakage-safe split (Lee et al. 2022 dedup-before-split): the hash split keyed by the "
        "near-dup CLUSTER (CC fixpoint verbatim), so a doc and its "
        "near-duplicates always land on the same side",
    ),
    "sample_epoch_plan": QuerySpec(
        sample_epoch_plan,
        _EPOCH_PLAN_SQL,
        "LLM-pipeline data-constrained repetition (Muennighoff 2023): full-epoch "
        "copies + md5-greedy remainder fill to an exact token target, via the "
        "256-class prefix histogram (only the boundary bucket is ordered)",
    ),
    "sample_epoch_shuffle": QuerySpec(
        sample_epoch_shuffle,
        _epoch_sql(),
        "beyond-reference: epoch-deterministic global shuffle + shard "
        "assignment (md5 order, one (epoch,shard) shuffle with in-partition "
        "sort — the shuffled-shard training export)",
    ),
    "a23_source_mixture_profile": QuerySpec(
        a23_source_mixture_profile,
        _MIXPROF_SQL,
        "beyond-reference: source-mixture concentration profile (Gini 1912 exact-integer "
        "Gini, pinned-fold entropy, top-k shares)",
    ),
    "sample_kcenter_coreset": QuerySpec(
        sample_kcenter_coreset,
        _kcenter_sql(),
        "beyond-reference: greedy k-center coreset (Gonzalez 2-approx, exact-decimal "
        "argmax; diversity-maximizing selection)",
    ),
    "sample_dsir_importance": QuerySpec(
        sample_dsir_importance,
        _DSIR_SQL,
        "beyond-reference: DSIR importance resampling (hashed-n-gram LM ratio"
        " + deterministic Gumbel-top-k; Xie et al. 2023)",
    ),
    "chunk_documents": QuerySpec(
        chunk_documents,
        _CHUNK_SQL,
        "beyond-reference: sliding-window chunking for RAG/pretraining (overlapping-context windows, cf. Lewis et al. 2020 RAG; pure narrow map)",
    ),
    "sample_hash_split": QuerySpec(
        sample_hash_split, _SPLIT_SQL, "deterministic C4-style train/eval md5-bucket split"
    ),
    "pack_sequences": QuerySpec(
        pack_sequences,
        _PACK_SQL,
        "beyond-reference: fixed-budget training-batch packing (T5-style, Raffel et al. 2020; bucketed running sum)",
    ),
    "sample_balanced_topk": QuerySpec(
        sample_balanced_topk, _TOPK_SQL, "per-group cap / class-balanced top-k (class-balanced sampling, Cui et al. 2019)"
    ),
    "sample_quality_quota": QuerySpec(
        sample_quality_quota,
        _QQ_SQL,
        "beyond-reference: exact per-source quality quota (RefinedWeb-style per-source budgets) via a bounded "
        "score-histogram threshold — no per-group rank window over the corpus",
    ),
    "sample_stratified_exact": QuerySpec(
        sample_stratified_exact,
        _STRAT_SQL,
        "exact-count stratified sample (largest remainder + md5-range prefilter)",
    ),
    "sample_mixture_weighted": QuerySpec(
        sample_mixture_weighted,
        _MIX_SQL,
        "beyond-reference: temperature-weighted (α=0.5) data-mixture sampling (Arivazhagan et al. 2019)",
    ),
}
