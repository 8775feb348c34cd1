"""Deduplication operators for large-scale training-data pipelines.

These extend the reference's duplicate-detection semantics
(validate.py:222-252 `check_duplicates`; metadata_uploader.py:283-297 `seen`
cache) to the document/corpus scale a 100 TB training-data pipeline needs:

* exact dedup        — hash-groupBy (one shuffle on the fingerprint)
* n-gram Jaccard     — inverted-index self-join on shingles (never a cross
                       join); document-frequency cap kills the quadratic
                       blowup hot shingles would cause
* MinHash + LSH      — double-hashed md5 MinHash, banded; candidate pairs
                       come from equi-joins on (band, key) buckets only
* embedding cosine   — blocked (by label) pair generation + cosine ≥ τ

Portability note: every hash derives from ``md5`` (hex strings, or 56-bit
integer halves of the digest for the double-hashed MinHash family) —
identical in Spark and DuckDB, no engine-native ``hash()`` anywhere.

Scale notes: all pair generation is bucket-local (shingle, LSH band, or
label block).  At 100 TB you'd additionally salt hot buckets and cap
bucket width; the df-cap here is that same idea applied at the semantic
level.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation, SparkSession, Window

from ..testdata import table as _t
from . import QuerySpec

# ---------------------------------------------------------------------------
# exact dedup — md5(text) hash-groupBy
# ---------------------------------------------------------------------------


def dedup_exact_hash(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup: fingerprint → group; keeper = min(doc_id) per group.
    One shuffle on the (high-cardinality, unskewed) fingerprint."""
    d = _t(spark, sf, "documents")
    return (
        d.withColumn("fingerprint", F.md5("text"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


_EXACT_SQL = """
SELECT md5(text) AS fingerprint, COUNT(*) AS n_docs,
       MIN(doc_id) AS keeper_doc_id, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY md5(text)
"""

def _norm_expr(dialect: str, col: str) -> str:
    """Canonicalization before hashing (C4/RefinedWeb-style): lowercase,
    strip everything but letters/digits/whitespace, squeeze whitespace
    runs, trim.  The regexes are identical; only the string-literal
    escaping differs (Spark SQL literals process backslashes, standard
    SQL does not) and DuckDB needs the explicit ``'g'`` flag — its
    regexp_replace replaces only the FIRST match by default, while
    Spark's always replaces all."""
    bs = "\\\\" if dialect == "spark" else "\\"
    g = "" if dialect == "spark" else ", 'g'"
    return (
        f"trim(regexp_replace(regexp_replace(lower({col}),"
        f" '[^a-z0-9{bs}s]', ''{g}), '{bs}s+', ' '{g}))"
    )


def dedup_exact_normalized(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup on CANONICALIZED text — lowercase, punctuation
    stripped, whitespace squeezed — the C4/RefinedWeb normalization
    that catches trivially-reformatted copies exact-hash misses
    (casing, smart quotes, double spaces).  Same one-shuffle shape as
    dedup_exact_hash, plus the diagnostic every normalization decision
    needs: how many EXTRA duplicates normalization exposed
    (n_docs − n_raw_variants is the over-match risk surface to review).
    """
    d = _t(spark, sf, "documents")
    # two-level pre-agg, not COUNT(DISTINCT): the expand rewrite doubles
    # the shuffled volume (dedup_span_topk precedent) — 4 exchanges → 2
    per_raw = (
        d.withColumn("norm_fp", F.expr("md5(" + _norm_expr("spark", "text") + ")"))
        .withColumn("raw_fp", F.md5("text"))
        .groupBy("norm_fp", "raw_fp")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("kd"))
    )
    return per_raw.groupBy("norm_fp").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_raw_variants"),
        F.min("kd").alias("keeper_doc_id"),
    )


_EXACT_NORM_SQL = f"""
WITH per_raw AS (
  SELECT md5({_norm_expr('duck', 'text')}) AS norm_fp, md5(text) AS raw_fp,
         COUNT(*) AS n, MIN(doc_id) AS kd
  FROM documents GROUP BY 1, 2
)
SELECT norm_fp, CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_raw_variants,
       MIN(kd) AS keeper_doc_id
FROM per_raw GROUP BY norm_fp
"""


# ---------------------------------------------------------------------------
# shared shingle builder (word 2-grams, distinct per doc)
# ---------------------------------------------------------------------------


def _doc_shingles(
    spark: SparkSession, sf: str, *, repartition_input: bool = False
) -> DataFrame:
    """(doc_id, shingle) distinct word-2-grams.

    Built narrowly — ``transform(sequence(...))`` pairs adjacent tokens
    inside one codegen stage (no self-join, no shuffle until the final
    distinct).  ``array_distinct`` pre-dedups per doc before the explode so
    the distinct shuffle carries no within-doc duplicates."""
    # ``repartition_input`` is the single-input-split rescue (see
    # dedup_simhash): worth it ONLY for consumers whose downstream
    # per-shingle work is heavy enough to beat the extra shuffle of raw
    # docs.  Measured at sf0.1: the k-hash MinHash signature chain wins
    # (0.52 s → 0.35 s warm, 2.7 s → 0.5 s cold); the light ngram-overlap
    # consumers LOSE (~1 s shuffle > the hashing it parallelizes), so the
    # default stays False.  On a many-file corpus the scan itself
    # provides the splits and the flag is a no-op balance pass.
    d = _t(spark, sf, "documents")
    if repartition_input:
        d = d.repartition("doc_id")
    d = d.select("doc_id", F.split("text", " ").alias("toks"))
    shingles = F.expr(
        "CASE WHEN size(toks) >= 2 THEN "
        "array_distinct(transform(sequence(0, size(toks) - 2),"
        " i -> concat(toks[i], ' ', toks[i + 1]))) "
        "ELSE array() END"
    )
    return d.select("doc_id", F.explode(shingles).alias("shingle"))


_SHINGLE_SQL = """
  toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents
  ), shingles AS (
    SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok AS shingle
    FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  )
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup — inverted-index join, df-capped
# ---------------------------------------------------------------------------

_DF_CAP_FRAC = 0.20  # drop shingles present in >20% of docs (hot buckets)
_JACCARD_TAU = 0.30


def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup pairs by word-2-gram Jaccard ≥ τ.

    Jaccard = |∩| / (|A|+|B|−|∩|) — an integer ratio, so the emitted double
    is bit-identical across engines.  Pair candidates come ONLY from the
    inverted-index join on df-capped shingles (no cross join); |A|,|B| are
    full (uncapped) shingle-set sizes so the statistic stays honest.
    """
    sh = _doc_shingles(spark, sf).localCheckpoint(eager=True)
    n_docs = _t(spark, sf, "documents").count()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    df_ok = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= int(_DF_CAP_FRAC * n_docs))
        .select("shingle")
    )
    rare = sh.join(df_ok, "shingle")
    a = rare.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = rare.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.expr("CAST(inter AS DOUBLE) / (na + nb - inter)"))
        .filter(F.col("jaccard") >= _JACCARD_TAU)
        .select("doc_a", "doc_b", "inter", "jaccard")
    )


_JACCARD_SQL = f"""
WITH {_SHINGLE_SQL},
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id
), ndocs AS (
  SELECT COUNT(*) AS n FROM documents
), df_ok AS (
  SELECT shingle FROM shingles, ndocs GROUP BY shingle, n
  HAVING COUNT(*) <= CAST({_DF_CAP_FRAC} * n AS BIGINT)
), rare AS (
  SELECT doc_id, shingle FROM shingles WHERE shingle IN (SELECT shingle FROM df_ok)
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter,
       CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= {_JACCARD_TAU}
"""


# ---------------------------------------------------------------------------
# containment near-dup — asymmetric |A∩B| / min(|A|,|B|)
# ---------------------------------------------------------------------------

_CONTAIN_TAU = 0.60


def dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Partial-copy detection: pairs where the SMALLER document's shingle
    set is ≥ τ contained in the other — the quote/boilerplate/subset case
    Jaccard systematically misses (a 50-shingle doc fully quoted inside a
    5000-shingle doc has Jaccard ≈ 0.01 but containment 1.0).  This is
    the second standard near-dup statistic next to Jaccard in corpus
    dedup (Broder 1997 distinguishes resemblance vs containment).

    Same inverted-index physical shape as :func:`dedup_ngram_jaccard`
    (candidates ONLY from the df-capped shingle join; set sizes stay
    uncapped and honest); containment is an integer ratio →
    bit-identical double.  Output: (doc_a, doc_b, inter, n_small,
    containment), doc_a < doc_b."""
    sh = _doc_shingles(spark, sf).localCheckpoint(eager=True)
    n_docs = _t(spark, sf, "documents").count()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    df_ok = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= int(_DF_CAP_FRAC * n_docs))
        .select("shingle")
    )
    rare = sh.join(df_ok, "shingle")
    a = rare.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = rare.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_small", F.least("na", "nb"))
        .withColumn("containment", F.expr("CAST(inter AS DOUBLE) / n_small"))
        .filter(F.col("containment") >= _CONTAIN_TAU)
        .select("doc_a", "doc_b", "inter", "n_small", "containment")
    )


_CONTAIN_SQL = f"""
WITH {_SHINGLE_SQL},
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id
), ndocs AS (
  SELECT COUNT(*) AS n FROM documents
), df_ok AS (
  SELECT shingle FROM shingles, ndocs GROUP BY shingle, n
  HAVING COUNT(*) <= CAST({_DF_CAP_FRAC} * n AS BIGINT)
), rare AS (
  SELECT doc_id, shingle FROM shingles WHERE shingle IN (SELECT shingle FROM df_ok)
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter,
       LEAST(sa.n_sh, sb.n_sh) AS n_small,
       CAST(inter AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh) AS containment
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(inter AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh) >= {_CONTAIN_TAU}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH — double-hashed md5 minhash, banded
# ---------------------------------------------------------------------------

_N_HASHES = 8
_BAND_ROWS = 2  # 4 bands × 2 rows
_MH_P = 9007199254740881  # largest prime < 2⁵³: double-hashing modulus
_BUCKET_CAP = 50  # hot-bucket cap: a (band, key) bucket wider than this is
# dropped before pair generation (its pairs resurface via other bands) —
# bounds any bucket's pair fan-out at cap² regardless of corpus skew


def _banded_long(sh: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key) banded MinHash signatures from a
    shingle relation — the shared front half of dedup_minhash_lsh and
    decon_fuzzy_minhash.  One md5 per shingle, K-M double-hashed mins,
    md5 band keys; materialized (localCheckpoint) because downstream
    consumers read it with different prunings, which defeats exchange
    reuse — without this the k-hash min aggregation executes three
    times (same pathology as the SimHash fingerprints)."""
    hashed = sh.selectExpr(
        "doc_id",
        f"CAST(conv(substr(md5(shingle), 1, 14), 16, 10) AS BIGINT) % {_MH_P} AS a",
        f"CAST(conv(substr(md5(shingle), 15, 14), 16, 10) AS BIGINT) % {_MH_P} AS b",
    )
    sig = hashed.groupBy("doc_id").agg(
        *[F.expr(f"MIN((a + {i} * b) % {_MH_P})").alias(f"m{i}") for i in range(_N_HASHES)]
    )
    bands = [
        F.md5(
            F.concat_ws("|", *[F.col(f"m{b * _BAND_ROWS + r}") for r in range(_BAND_ROWS)])
        ).alias(f"band{b}")
        for b in range(_N_HASHES // _BAND_ROWS)
    ]
    sig_b = sig.select("doc_id", *bands)
    return sig_b.selectExpr(
        "doc_id",
        "stack("
        + str(_N_HASHES // _BAND_ROWS)
        + ", "
        + ", ".join(f"{b}, band{b}" for b in range(_N_HASHES // _BAND_ROWS))
        + ") AS (band_id, band_key)",
    ).localCheckpoint()


def dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """LSH candidate pairs: signature = per-seed MIN(h_i(shingle)) with
    h_i = (a + i·b) mod P double hashing over one md5 per shingle
    (Kirsch & Mitzenmacher 2006 — k independent-enough hashes from two);
    band key = md5(concat of the band's rows); candidates share any band.

    The O(n²) pair space never materializes — only bucket-local equi-joins.
    At 100 TB this is THE dedup path (Jaccard verify runs on candidates
    only).  Output: candidate pairs with the number of agreeing bands.
    """
    sh = _doc_shingles(spark, sf, repartition_input=True)
    # one pass: ONE md5 per shingle, k hashes derived by double hashing
    # (Kirsch–Mitzenmacher: h_i = (a + i·b) mod P) — measured 8×-md5
    # signatures were the dominant cost of the whole operator.  a, b are
    # the two 56-bit halves of the digest (conv(hex,16,10) agrees with
    # DuckDB's '0x'::UBIGINT parse), reduced mod P at derivation so each
    # is near-uniform over [0, P) (2⁵⁶/P ≈ 8 + 1e-8, so the residual
    # non-uniformity is ~1e-8 — an unreduced 56-bit half folded through a
    # final % P keeps the same marginal but the K-M guarantee is stated
    # for uniform coefficients, so we reduce first); a + 7b < 2⁵⁶ never
    # overflows BIGINT.  Estimator caveat: K-M double hashing bounds
    # Bloom-filter FPR, not MinHash Jaccard moments — collision
    # probability of affinely-dependent h_i deviates slightly from true
    # Jaccard.  Here that only shapes candidate RECALL: membership is
    # re-verified with exact integer-ratio Jaccard in
    # :func:`dedup_lsh_verified`, so precision is never affected.
    long = _banded_long(sh)
    # Bucket-cap election as COUNT(*) OVER the band key, not a
    # groupBy-count + join-back (the r12 window-count-election rework the
    # span/paragraph dedup family got): the join-back form re-reads
    # ``long`` for the probe side and shuffles the bucket-width relation —
    # which at corpus scale is |docs|·bands/width rows, never
    # broadcastable — while the window computes the same cap filter
    # inside the ONE exchange on (band_id, band_key) the self-join needs
    # anyway (the join's both sides inherit that partitioning, so the
    # candidate join adds NO further shuffle).
    capped = (
        long.withColumn(
            "__w", F.count("*").over(Window.partitionBy("band_id", "band_key"))
        )
        .filter(F.col("__w") <= _BUCKET_CAP)
        .drop("__w")
    )
    other = capped.select(
        F.col("doc_id").alias("doc_b"), F.col("band_id").alias("band_id2"), F.col("band_key").alias("band_key2")
    )
    return (
        capped.join(
            other,
            (F.col("band_id") == F.col("band_id2"))
            & (F.col("band_key") == F.col("band_key2"))
            & (F.col("doc_id") < F.col("doc_b")),
        )
        .groupBy(F.col("doc_id").alias("doc_a"), "doc_b")
        .agg(F.count("*").alias("n_bands"))
    )


def dedup_lsh_verified(spark: SparkSession, sf: str) -> DataFrame:
    """The production near-dup pipeline end-to-end: LSH candidates
    (:func:`dedup_minhash_lsh`) → EXACT Jaccard verification — the
    verify stage touches only candidate pairs, so its cost is bounded by
    the LSH recall set (×  avg shingles/doc), never the corpus².

    Contrast with :func:`dedup_ngram_jaccard`, which builds the full
    df-capped inverted index: at 100 TB the LSH-then-verify composition
    is the cheaper path when candidates ≪ capped-bucket pairs, and its
    Jaccard values are exact (integer ratio), not signature estimates."""
    cand = dedup_minhash_lsh(spark, sf).select("doc_a", "doc_b")
    sh = _doc_shingles(spark, sf).localCheckpoint()  # two pruned consumers
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"), ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")), "doc_b")
        .withColumn("jaccard", F.expr("CAST(inter AS DOUBLE) / (na + nb - inter)"))
        .filter(F.col("jaccard") >= _JACCARD_TAU)
        .select("doc_a", "doc_b", "inter", "jaccard")
    )


_FUZZY_TAU = 0.5  # near-dup contamination threshold (vs _DECON_TAU's exact-overlap 0.2)
_FUZZY_BENCH_MOD = 7  # denser stand-in than decon_ngram's mod-101: the synthetic
# corpus's near-dup clusters must straddle the corpus/benchmark split for the
# gate row to carry non-trivial evidence (mod 101 strands every cluster
# entirely on the corpus side - verified at sf0.01, max cross Jaccard 0.06)


def decon_fuzzy_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """FUZZY benchmark decontamination: flag corpus documents that are
    NEAR-duplicates of a held-out benchmark doc (exact Jaccard ≥ τ
    after MinHash-LSH candidate generation) — the companion of
    decon_ngram_overlap's exact n-gram test, catching lightly
    paraphrased or truncated eval leaks that shingle-overlap fractions
    under-score.  Benchmark membership is the same deterministic
    doc_id ≡ 0 (mod {mod}) stand-in.

    Physical shape at 100 TB: the corpus side computes banded
    signatures in one pass (the shared _banded_long relation); the
    BENCHMARK'S band keys — an eval suite is MBs — ship broadcast, so
    candidate generation never shuffles the corpus; exact-Jaccard
    verification touches candidate (doc, bench) pairs only."""
    sh = _doc_shingles(spark, sf, repartition_input=True).localCheckpoint()
    long = _banded_long(sh)
    bench_bands = long.filter(F.col("doc_id") % _FUZZY_BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "band_id", "band_key"
    )
    cand = (
        long.filter(F.col("doc_id") % _FUZZY_BENCH_MOD != 0)
        .join(F.broadcast(bench_bands), ["band_id", "band_key"])
        .select("doc_id", "bench_id")
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        cand.join(sh, "doc_id")
        .join(
            sh.select(F.col("doc_id").alias("bench_id"), "shingle"),
            ["bench_id", "shingle"],
        )
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes, "doc_id")
        .join(
            sizes.select(F.col("doc_id").alias("bench_id"), F.col("n_sh").alias("nb")),
            "bench_id",
        )
        .withColumn("jaccard", F.expr("CAST(inter AS DOUBLE) / (n_sh + nb - inter)"))
        .filter(F.col("jaccard") >= _FUZZY_TAU)
        .select("doc_id", "bench_id", "jaccard")
    )


def _fuzzy_decon_sql() -> str:
    return f"""
WITH {_minhash_ctes()},
bench_bands AS (
  SELECT doc_id AS bench_id, band_id, band_key FROM long WHERE doc_id % {_FUZZY_BENCH_MOD} = 0
),
cand AS (
  SELECT DISTINCT l.doc_id, b.bench_id
  FROM long l JOIN bench_bands b USING (band_id, band_key)
  WHERE l.doc_id % {_FUZZY_BENCH_MOD} != 0
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id
), inter AS (
  SELECT c.doc_id, c.bench_id, COUNT(*) AS inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.doc_id
  JOIN shingles sb ON sb.doc_id = c.bench_id AND sb.shingle = sa.shingle
  GROUP BY 1, 2
)
SELECT i.doc_id, i.bench_id,
       CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_id = sa.doc_id
JOIN sizes sb ON i.bench_id = sb.doc_id
WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= {_FUZZY_TAU}
"""


_LSH_CONFIGS = [(32, 1), (16, 2), (8, 4), (4, 8)]  # (bands, rows) with b·r = 32


def _pow_chain(x: str, n: int) -> str:
    """x^n as a repeated-squaring multiplication chain — n a power of 2.
    The SAME text runs on both engines, so the doubles agree bit-for-bit
    (no libm pow())."""
    if n == 1:
        return x
    half = _pow_chain(x, n // 2)
    return f"({half} * {half})"


def dedup_lsh_tuning_curve(spark: SparkSession, sf: str) -> DataFrame:
    """LSH parameter advisor: for each (bands, rows) banding of a
    32-hash MinHash budget, the expected candidate recall over THIS
    corpus's measured similarity distribution — Σ cnt(s)·(1−(1−sʳ)ᵇ) /
    Σ cnt(s) over the exact-Jaccard histogram of the current candidate
    pairs.  This is the standard S-curve analysis (Leskovec et al.,
    Mining of Massive Datasets §3.4) evaluated against real data
    instead of a guessed similarity mix — the table an engineer reads
    before re-banding a 100 TB dedup job.

    Determinism: jaccard is an integer ratio rounded to 4dp; the
    histogram is grouped on that value; sʳ and (1−sʳ)ᵇ are repeated-
    squaring multiplication chains (identical expression text on both
    engines — no pow()); the weighted sum folds in s order.

    Physical shape: the pair histogram is bounded by 4dp value
    cardinality (≤ 10⁴ rows) and localCheckpoint'd once; each config is
    one fold over it."""
    cand = dedup_minhash_lsh(spark, sf).select("doc_a", "doc_b")
    sh = _doc_shingles(spark, sf).localCheckpoint()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"), ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    hist = (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")), "doc_a"
        )
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")), "doc_b")
        .select(F.expr("ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 4)").alias("s"))
        .groupBy("s")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint()  # ≤ 10⁴ rows, folded once per config
    )
    parts = []
    for b, r in _LSH_CONFIGS:
        sr = _pow_chain("s", r)
        p = f"(1.0 - {_pow_chain(f'(1.0 - {sr})', b)})"
        parts.append(
            hist.agg(
                F.expr(
                    "aggregate(array_sort(collect_list(struct(s,"
                    f" CAST(cnt AS DOUBLE) * {p} AS v))),"
                    " CAST(0 AS DOUBLE), (acc, q) -> acc + q.v)"
                ).alias("num"),
                F.sum("cnt").cast("long").alias("n_pairs"),
            ).select(
                F.lit(b).cast("int").alias("bands"),
                F.lit(r).cast("int").alias("rows_per_band"),
                "n_pairs",
                F.expr("ROUND(num / n_pairs, 6)").alias("expected_recall"),
            )
        )
    out = parts[0]
    for x in parts[1:]:
        out = out.unionAll(x)
    return out


def _lsh_tuning_sql() -> str:
    selects = []
    for b, r in _LSH_CONFIGS:
        sr = _pow_chain("s", r)
        p = f"(1.0 - {_pow_chain(f'(1.0 - {sr})', b)})"
        selects.append(
            f"""
SELECT CAST({b} AS INTEGER) AS bands, CAST({r} AS INTEGER) AS rows_per_band,
       CAST(SUM(cnt) AS BIGINT) AS n_pairs,
       CASE WHEN SUM(cnt) IS NULL THEN NULL
            ELSE ROUND(list_reduce(list(CAST(cnt AS DOUBLE) * {p} ORDER BY s),
                                   (acc, x) -> acc + x) / SUM(cnt), 6)
       END AS expected_recall
FROM hist"""
        )
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH {_minhash_ctes()},
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a
  JOIN capped b ON a.band_id = b.band_id AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id
), inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.doc_a
  JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
), hist AS MATERIALIZED (
  SELECT ROUND(CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter), 4) AS s,
         COUNT(*) AS cnt
  FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  GROUP BY 1
)
{union}
"""


def _lsh_verified_sql() -> str:
    return f"""
WITH {_minhash_ctes()},
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a
  JOIN capped b ON a.band_id = b.band_id AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id
), inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.doc_a
  JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter,
       CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= {_JACCARD_TAU}
"""


def _minhash_ctes() -> str:
    """The shared CTE chain: shingles → (a,b) halves → signatures →
    banded keys → capped buckets.  Reused by the candidate query and the
    LSH-verified pipeline so both oracles stay in lockstep."""
    mins = ",\n         ".join(
        f"MIN((a + {i} * b) % {_MH_P}) AS m{i}" for i in range(_N_HASHES)
    )
    bands = ",\n       ".join(
        "md5("
        + " || '|' || ".join(
            f"CAST(m{b * _BAND_ROWS + r} AS VARCHAR)" for r in range(_BAND_ROWS)
        )
        + f") AS band{b}"
        for b in range(_N_HASHES // _BAND_ROWS)
    )
    stack = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, band{b} AS band_key FROM sig_b"
        for b in range(_N_HASHES // _BAND_ROWS)
    )
    return f"""{_SHINGLE_SQL},
ab AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(shingle), 1, 14)) AS UBIGINT)::BIGINT % {_MH_P} AS a,
         CAST(('0x' || substr(md5(shingle), 15, 14)) AS UBIGINT)::BIGINT % {_MH_P} AS b
  FROM shingles
),
sig AS (
  SELECT doc_id, {mins}
  FROM ab GROUP BY doc_id
), sig_b AS (
  SELECT doc_id, {bands}
  FROM sig
), long AS ({stack}),
ok_buckets AS (
  SELECT band_id, band_key FROM long GROUP BY band_id, band_key
  HAVING COUNT(*) <= {_BUCKET_CAP}
), capped AS (
  SELECT l.* FROM long l JOIN ok_buckets USING (band_id, band_key)
)"""


def _minhash_sql() -> str:
    return f"""
WITH {_minhash_ctes()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands
FROM capped a
JOIN capped b ON a.band_id = b.band_id AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# embedding cosine near-dup — label-blocked pairs
# ---------------------------------------------------------------------------

_COS_TAU = 0.35


def dedup_embedding_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup vector pairs (cosine ≥ τ) within label blocks.

    Blocking (here: the label column; in production: an LSH/IVF bucket)
    keeps pair generation linear per block.  Cosine is rounded to 4dp on
    both engines before the threshold so the emitted values agree.
    """
    e = _t(spark, sf, "embeddings").select(
        "vec_id", "label", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    a = e.select(F.col("vec_id").alias("vec_a"), "label", F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("label").alias("label2"), F.col("v").alias("vb"))
    dot = F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, z) -> acc + z)")
    na = F.expr("SQRT(aggregate(zip_with(va, va, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, z) -> acc + z))")
    nb = F.expr("SQRT(aggregate(zip_with(vb, vb, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, z) -> acc + z))")
    return (
        a.join(b, (F.col("label") == F.col("label2")) & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("cos_sim", F.round(dot / (na * nb), 4))
        .filter(F.col("cos_sim") >= _COS_TAU)
        .select("vec_a", "vec_b", "label", "cos_sim")
    )


_EMB_COS_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
       ROUND(list_dot_product(a.v, b.v)
             / (SQRT(list_dot_product(a.v, a.v))
                * SQRT(list_dot_product(b.v, b.v))), 4) AS cos_sim
FROM e a
JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.v, b.v)
            / (SQRT(list_dot_product(a.v, a.v))
               * SQRT(list_dot_product(b.v, b.v))), 4) >= {_COS_TAU}
"""


# ---------------------------------------------------------------------------
# embedding near-dup on LEARNED IVF buckets — kmeans blocking
# ---------------------------------------------------------------------------

_IVF_K = 8
_IVF_ITERS = 2


def dedup_embedding_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup vector pairs (cosine ≥ τ) blocked on LEARNED k-means IVF
    buckets — the production blocking for :func:`dedup_embedding_cosine`,
    whose ``label`` blocking silently misses cross-label near-dups.

    Composition: functions/kmeans.kmeans_buckets_exact (seeds = first K
    vectors, 2 Lloyd rounds on DECIMAL(9,4)-quantized coordinates — every
    distance/centroid exactly reproducible in SQL, so the unrolled DuckDB
    oracle assigns byte-identical buckets) + the cosine pair join of
    dedup_embedding_cosine restricted to each bucket.  Pair generation is
    bucket-local: candidates per vector scale with N/K, never N."""
    from ..functions.kmeans import kmeans_buckets_exact

    e = (
        _t(spark, sf, "embeddings")
        .select(
            "vec_id",
            "label",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        .withColumn("qv", F.expr("transform(v, x -> CAST(x AS DECIMAL(9,4)))"))
    )
    assigned = kmeans_buckets_exact(e, k=_IVF_K, iters=_IVF_ITERS).persist()
    a = assigned.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "bucket"
    )
    b = assigned.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("bucket").alias("bucket2")
    )
    dot = F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, z) -> acc + z)")
    na = F.expr("SQRT(aggregate(zip_with(va, va, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, z) -> acc + z))")
    nb = F.expr("SQRT(aggregate(zip_with(vb, vb, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, z) -> acc + z))")
    return (
        a.join(b, (F.col("bucket") == F.col("bucket2")) & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("cos_sim", F.round(dot / (na * nb), 4))
        .filter(F.col("cos_sim") >= _COS_TAU)
        .select("vec_a", "vec_b", "bucket", "cos_sim")
    )


def _kmeans_cte(k: int, iters: int) -> tuple[list[str], str]:
    """The unrolled kmeans_buckets_exact CTE chain (seeds → (assign →
    update)×iters → final assign), shared by the IVF and SemDeDup
    oracles.  Returns (cte_list, final_assignment_name)."""
    cte = [
        "e AS (\n  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings\n)",
        "el AS (\n  SELECT vec_id, u.i, CAST(u.x AS DECIMAL(9,4)) AS q\n"
        "  FROM (SELECT vec_id, unnest(list_transform(v, (x, i) -> {'x': x, 'i': i})) AS u FROM e)\n)",
        f"c0 AS (\n  SELECT vec_id AS cid, i, q AS cq FROM el WHERE vec_id < {k}\n)",
    ]
    prev = "c0"
    for t in range(1, iters + 2):  # iters updates + 1 final assignment
        cte.append(
            f"d{t} AS (\n  SELECT el.vec_id, c.cid, SUM((el.q - c.cq) * (el.q - c.cq)) AS d2\n"
            f"  FROM el JOIN {prev} c ON el.i = c.i GROUP BY 1, 2\n)"
        )
        cte.append(
            f"a{t} AS (\n  SELECT vec_id, cid AS bucket FROM (\n"
            f"    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn\n"
            f"    FROM d{t}) WHERE rn = 1\n)"
        )
        if t <= iters:
            cte.append(
                f"u{t} AS (\n  SELECT a.bucket AS cid, el.i,\n"
                f"         CAST(CAST(SUM(el.q) AS DOUBLE) / COUNT(*) AS DECIMAL(9,4)) AS cq\n"
                f"  FROM el JOIN a{t} a USING (vec_id) GROUP BY 1, 2\n)"
            )
            cte.append(
                f"c{t} AS (\n  SELECT p.cid, p.i, COALESCE(u{t}.cq, p.cq) AS cq\n"
                f"  FROM {prev} p LEFT JOIN u{t} ON u{t}.cid = p.cid AND u{t}.i = p.i\n)"
            )
            prev = f"c{t}"
    return cte, f"a{iters + 1}"


def _ivf_sql() -> str:
    """Unrolled transcription of kmeans_buckets_exact: seeds → (assign →
    update)×ITERS → final assign → bucket-local cosine pairs.  All bucket
    arithmetic on DECIMAL(9,4) quantized coordinates (exact, order-free);
    centroid updates CAST(exact-decimal-sum AS DOUBLE)/n re-quantized —
    the identical-double-expression rule, so buckets match Spark's."""
    cte, fin = _kmeans_cte(_IVF_K, _IVF_ITERS)
    cos = (
        "ROUND(list_dot_product(ea.v, eb.v) / (SQRT(list_dot_product(ea.v, ea.v))"
        " * SQRT(list_dot_product(eb.v, eb.v))), 4)"
    )
    return (
        "WITH " + ",\n".join(cte) + f"""
SELECT fa.vec_id AS vec_a, fb.vec_id AS vec_b, fa.bucket, {cos} AS cos_sim
FROM {fin} fa
JOIN {fin} fb ON fa.bucket = fb.bucket AND fa.vec_id < fb.vec_id
JOIN e ea ON ea.vec_id = fa.vec_id
JOIN e eb ON eb.vec_id = fb.vec_id
WHERE {cos} >= {_COS_TAU}
"""
    )


def dedup_semdedup(spark: SparkSession, sf: str, *, k: int = _IVF_K) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023): cluster the
    embedding space with k-means, and within each cluster PRUNE every
    item that has an ε-similar neighbor ranked "more extreme" than it —
    where the keep-order is cosine-to-centroid ASCENDING (the paper's
    finding: keeping the examples FARTHEST from the centroid beats
    keeping the closest).  An item is removed iff some lower-rank
    cluster-mate is within cosine ≥ ε of it — the pure pairwise form of
    the reference implementation's prefix rule (each point is compared
    against all points before it in the sorted cluster block).

    Composition: kmeans_buckets_exact (the dedup_embedding_ivf blocking)
    → per-bucket centroid = per-dim mean of the quantized coordinates
    (exact decimal sums ÷ n — identical doubles on both engines) →
    rank by pinned-order cosine-to-centroid → bucket-local ε-pair join
    restricted to rank_lo < rank_hi.  Output is a per-vector decision
    relation (vec_id, bucket, cos_centroid, keep).

    Scale shape at 100 TB: centroids contract to K×dim rows (BROADCAST
    into the rank pass), the pair space is bucket-local (candidates per
    vector ≈ N/K, never N), and the rank window partitions per bucket.
    The within-cluster pair work is inherently quadratic in cluster
    size, so ``k`` MUST scale ∝ N to hold N/K constant — the round-7
    scaling probe measured the fixed-K pathology directly (5.2 s →
    36.7 s at 4× data, SCALE_NOTES.md); the gated demo pins k={k}
    only so the DuckDB oracle replays the identical clustering.
    ε here reuses τ = {tau} so the demo corpus exercises both branches;
    production SemDeDup runs ε ≈ 0.95."""
    from ..functions.kmeans import kmeans_buckets_exact

    e = (
        _t(spark, sf, "embeddings")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        .withColumn("qv", F.expr("transform(v, x -> CAST(x AS DECIMAL(9,4)))"))
    )
    assigned = kmeans_buckets_exact(e, k=k, iters=_IVF_ITERS).persist()
    cent = (
        assigned.select("bucket", F.posexplode("qv").alias("i", "q"))
        .groupBy("bucket", "i")
        .agg(F.expr("CAST(CAST(SUM(q) AS DOUBLE) / COUNT(*) AS DOUBLE)").alias("c"))
        .groupBy("bucket")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(i, c))), s -> s.c)"
            ).alias("carr")
        )
    )
    cosc = F.expr(
        "aggregate(zip_with(v, carr, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, z) -> acc + z)"
        " / (SQRT(aggregate(zip_with(v, v, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, z) -> acc + z))"
        " * SQRT(aggregate(zip_with(carr, carr, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, z) -> acc + z)))"
    )
    w = Window.partitionBy("bucket").orderBy(F.col("cosc").asc(), F.col("vec_id").asc())
    ranked = (
        assigned.join(F.broadcast(cent), "bucket")
        .select("vec_id", "bucket", "v", cosc.alias("cosc"))
        .withColumn("rk", F.row_number().over(w))
        .persist()
    )
    lo = ranked.select(
        F.col("bucket").alias("b2"), F.col("v").alias("va"), F.col("rk").alias("rka")
    )
    hi = ranked.select("vec_id", "bucket", F.col("v").alias("vb"), F.col("rk").alias("rkb"))
    pcos = F.expr(
        "ROUND(aggregate(zip_with(va, vb, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, z) -> acc + z)"
        " / (SQRT(aggregate(zip_with(va, va, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, z) -> acc + z))"
        " * SQRT(aggregate(zip_with(vb, vb, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, z) -> acc + z))), 4)"
    )
    rem = (
        hi.join(lo, (F.col("bucket") == F.col("b2")) & (F.col("rka") < F.col("rkb")))
        .filter(pcos >= _COS_TAU)
        .select("vec_id")
        .distinct()
        .withColumn("rm", F.lit(1))
    )
    return ranked.join(rem, "vec_id", "left").select(
        "vec_id",
        "bucket",
        F.expr("ROUND(cosc, 6)").alias("cos_centroid"),
        F.expr("rm IS NULL").alias("keep"),
    )


dedup_semdedup.__doc__ = dedup_semdedup.__doc__.format(tau=_COS_TAU, k=_IVF_K)


def _semdedup_sql() -> str:
    """SemDeDup oracle: the shared kmeans CTE chain, then centroid means
    / pinned-order cosine folds / rank / prefix ε-pair removal —
    list_reduce over i-ordered products so DuckDB adds the exact doubles
    Spark's zip_with folds add."""
    cte, fin = _kmeans_cte(_IVF_K, _IVF_ITERS)
    pcos = (
        "ROUND(list_dot_product(ea.v, eb.v) / (SQRT(list_dot_product(ea.v, ea.v))"
        " * SQRT(list_dot_product(eb.v, eb.v))), 4)"
    )
    cte.extend(
        [
            f"cm AS (\n  SELECT f.bucket, el.i,"
            " CAST(CAST(SUM(el.q) AS DOUBLE) / COUNT(*) AS DOUBLE) AS c\n"
            f"  FROM el JOIN {fin} f USING (vec_id) GROUP BY 1, 2\n)",
            "ev AS (\n  SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM e\n)",
            f"cp AS (\n  SELECT f.vec_id, f.bucket, ev.i, ev.x * cm.c AS xc,"
            " ev.x * ev.x AS xx, cm.c * cm.c AS cc\n"
            f"  FROM {fin} f JOIN ev ON ev.vec_id = f.vec_id\n"
            "  JOIN cm ON cm.bucket = f.bucket AND cm.i = ev.i\n)",
            "cosr AS (\n  SELECT vec_id, bucket,\n"
            "         list_reduce(list(xc ORDER BY i), (a, b) -> a + b)\n"
            "         / (SQRT(list_reduce(list(xx ORDER BY i), (a, b) -> a + b))\n"
            "            * SQRT(list_reduce(list(cc ORDER BY i), (a, b) -> a + b))) AS cosc\n"
            "  FROM cp GROUP BY 1, 2\n)",
            "ranked AS (\n  SELECT *,"
            " ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY cosc ASC, vec_id ASC) AS rk\n"
            "  FROM cosr\n)",
            f"rem AS (\n  SELECT DISTINCT hi.vec_id\n"
            "  FROM ranked lo JOIN ranked hi ON lo.bucket = hi.bucket AND lo.rk < hi.rk\n"
            "  JOIN e ea ON ea.vec_id = lo.vec_id\n"
            "  JOIN e eb ON eb.vec_id = hi.vec_id\n"
            f"  WHERE {pcos} >= {_COS_TAU}\n)",
        ]
    )
    return (
        "WITH " + ",\n".join(cte) + """
SELECT r.vec_id, r.bucket, ROUND(r.cosc, 6) AS cos_centroid,
       rem.vec_id IS NULL AS keep
FROM ranked r LEFT JOIN rem ON r.vec_id = rem.vec_id
"""
    )


# ---------------------------------------------------------------------------
# SimHash near-dup — 32-bit fingerprints from token votes, hamming ≤ τ
# ---------------------------------------------------------------------------

_SH_BITS = 32
_HAMMING_TAU = 4
_HEX = "0123456789abcdef"


def _simhash_word_expr(dialect: str) -> str:
    """First 8 hex nibbles of md5(tok) parsed as one 32-bit integer —
    computed ONCE per token row; the 32 bit votes are then cheap
    shift-and-mask probes instead of 32 substr/instr chains."""
    if dialect == "spark":
        return "CAST(conv(substr(md5(tok), 1, 8), 16, 10) AS BIGINT)"
    return "CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT)::BIGINT"


def _simhash_bit_exprs(dialect: str) -> list[str]:
    """Per-token ±1 vote for each of the 32 bits, over a pre-projected
    ``w`` column (:func:`_simhash_word_expr`).  Bit 4j+r is bit r of hex
    nibble j (j=0 = the digest's FIRST hex char = w's top nibble), i.e.
    bit (7−j)·4+r of w — the same fingerprint the nibble-lookup
    formulation produced."""
    exprs = []
    for j in range(8):  # nibble index
        for r in range(4):  # bit within nibble
            n = (7 - j) * 4 + r
            bit = f"(shiftright(w, {n}) & 1)" if dialect == "spark" else f"((w >> {n}) & 1)"
            exprs.append(f"(2 * {bit} - 1)")
    return exprs  # 32 entries, bit index = 4*j + r


def _simhash_band_bounds() -> list[tuple[int, int]]:
    """(offset, width) for τ+1 contiguous bit bands covering the 32 bits.
    Pigeonhole: two fingerprints within Hamming τ differ in ≤ τ bands, so
    they MUST agree exactly on at least one of the τ+1 bands."""
    n_bands = _HAMMING_TAU + 1
    base, extra = divmod(_SH_BITS, n_bands)
    bounds, off = [], 0
    for b in range(n_bands):
        width = base + (1 if b < extra else 0)
        bounds.append((off, width))
        off += width
    return bounds


_SH_BUCKET_TARGET = 50  # rows per salted band sub-bucket


def _simhash_banded_pairs(sigs: DataFrame) -> DataFrame:
    """Banded near-dup pairs from a (doc_id, fingerprint) relation.

    Pigeonhole banding: the fingerprint splits into τ+1 bit bands and
    candidates come from equi-joins on (band_id, band bits) — EXACTLY the
    pairs the direct O(n²) join finds (≤ τ flipped bits leave ≥ 1 band
    untouched), so the oracle stays the direct pairwise SQL.

    Hot-bucket salting: a (band_id, band_key) bucket of width w makes one
    join task do w² comparisons (boilerplate-heavy corpora share band
    values).  Buckets wider than the target are split: the probe side gets
    a deterministic salt in 0..nsalt-1, the build side is replicated
    across all nsalt salts — the SAME pair set (each unordered pair
    appears once after doc_id < doc_b), but no task is quadratic in the
    bucket width.  Cold buckets keep nsalt=1 and pay nothing; the width
    table is aggregated once and AQE broadcasts it when small.

    Cross-band dedup is the FIRST-AGREEING-BAND rule, not a distinct():
    a pair matching in several bands is kept only in its lowest agreeing
    band (cheap bitwise checks on the two fingerprints already in the
    row), so no candidate-set shuffle exists — at corpus scale that
    distinct() on the candidate pairs is a full extra exchange.
    """
    band_rows = [
        f"({b}, CAST(shiftright(fingerprint, {off}) & {(1 << width) - 1} AS BIGINT))"
        for b, (off, width) in enumerate(_simhash_band_bounds())
    ]
    long = sigs.selectExpr(
        "doc_id",
        "fingerprint",
        f"inline(array({', '.join('struct' + r for r in band_rows)})) AS (band_id, band_key)",
    )
    hot = (
        long.groupBy("band_id", "band_key")
        .agg(F.count("*").alias("__w"))
        .filter(F.col("__w") > _SH_BUCKET_TARGET)
        .select(
            "band_id",
            "band_key",
            F.ceil(F.col("__w") / _SH_BUCKET_TARGET).cast("int").alias("nsalt"),
        )
    )
    # hot is tiny by construction (only buckets wider than the target) —
    # broadcast it explicitly rather than relying on AQE's size estimate.
    # (Materializing `salted` was A/B-tested and is a wash: exchange reuse
    # already shares the hot-bucket aggregation between probe and build.)
    salted = long.join(F.broadcast(hot), ["band_id", "band_key"], "left").withColumn(
        "nsalt", F.coalesce("nsalt", F.lit(1))
    )
    probe = salted.withColumn(
        "salt", F.pmod(F.crc32(F.col("doc_id").cast("string")), F.col("nsalt")).cast("int")
    )
    build = salted.select(
        F.col("doc_id").alias("doc_b"),
        F.col("fingerprint").alias("fb"),
        "band_id",
        "band_key",
        F.explode(F.expr("sequence(0, nsalt - 1)")).alias("salt"),
    ).hint("shuffle_hash")
    # shuffle-hash, not sort-merge: the band join's keys are few and fat
    # (every doc lands in τ+1 buckets keyed by 6-7 bits), so SMJ pays a
    # sort over the full candidate expansion while SHJ streams the probe
    # side through per-partition hash tables.  The build side per
    # partition is bounded by construction (bucket cap × salt
    # replication), so the hash tables always fit — measured 3-4× on the
    # sf0.1 banding join (2.7 s → 0.8 s).
    first_band = " AND ".join(
        f"(band_id <= {b} OR (shiftright(fingerprint, {off}) & {(1 << w) - 1})"
        f" != (shiftright(fb, {off}) & {(1 << w) - 1}))"
        for b, (off, w) in enumerate(_simhash_band_bounds())
    )
    return (
        probe.join(build, ["band_id", "band_key", "salt"])
        .filter(F.col("doc_id") < F.col("doc_b"))
        .filter(F.expr(first_band))
        .select(
            F.col("doc_id").alias("doc_a"),
            "doc_b",
            F.expr("CAST(bit_count(fingerprint ^ fb) AS INT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= _HAMMING_TAU)
    )


def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash: per doc, each token votes ±1 on 32 bits (bit = hex nibble
    bits of md5(token)); fingerprint bit = sign of the vote sum; near-dups
    are pairs with Hamming(fp_a, fp_b) ≤ τ via bit_count(a ^ b).

    All integer arithmetic → bit-identical across engines.  Pair
    generation is banded + hot-bucket-salted (see
    :func:`_simhash_banded_pairs`); the oracle is the direct pairwise
    join, which the banding provably reproduces."""
    # Repartition the raw docs BEFORE the explode/md5/32-sum pipeline: the
    # test corpus arrives as one parquet row group (one input split), which
    # serializes the whole vote aggregation into a single task.  The
    # shuffle moves only the raw doc rows (cheap) and buys full-core
    # parallelism for the expensive part — measured 2× at sf0.1 (3.1 s →
    # 1.5 s).  A many-file 100 TB corpus already yields thousands of scan
    # splits, where this becomes a balance/no-op shuffle; count follows
    # spark.sql.shuffle.partitions.
    d = _t(spark, sf, "documents").repartition("doc_id")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).selectExpr(
        "doc_id", f"{_simhash_word_expr('spark')} AS w"
    )
    votes = _simhash_bit_exprs("spark")
    agg = tok.groupBy("doc_id").agg(
        *[F.expr(f"SUM({v})").alias(f"s{i}") for i, v in enumerate(votes)]
    )
    fp = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN CAST({2 ** i} AS BIGINT) ELSE 0 END)"
        for i in range(_SH_BITS)
    )
    # Materialize the fingerprints: the banding subplan reads sigs from
    # three differently-pruned branches (hot-bucket agg, probe, build),
    # and the pruning difference defeats exchange reuse — without this
    # the 32-sum vote aggregation executes three times.
    sigs = agg.select("doc_id", F.expr(fp).alias("fingerprint")).localCheckpoint()
    return _simhash_banded_pairs(sigs)


def _simhash_sigs_cte() -> str:
    """The shared CTE prologue: documents → token votes → fingerprints."""
    votes = _simhash_bit_exprs("duck")
    sums = ",\n         ".join(f"SUM({v}) AS s{i}" for i, v in enumerate(votes))
    fp = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN CAST({2 ** i} AS BIGINT) ELSE 0 END)"
        for i in range(_SH_BITS)
    )
    return f"""tok AS (
  SELECT doc_id, {_simhash_word_expr('duck')} AS w
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
), agg AS (
  SELECT doc_id, {sums}
  FROM tok GROUP BY doc_id
), sigs AS (
  SELECT doc_id, {fp} AS fingerprint FROM agg
)"""


def _simhash_sql() -> str:
    return f"""
WITH {_simhash_sigs_cte()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.fingerprint, b.fingerprint)) AS INT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= {_HAMMING_TAU}
"""


# ---------------------------------------------------------------------------
# incremental near-dup — new batch vs existing corpus, no all-pairs redo
# ---------------------------------------------------------------------------

_NEW_FRAC = 0.9  # doc_id >= floor(0.9·(max_id+1)) plays the "new batch"


def dedup_simhash_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental SimHash near-dup: only pairs touching the NEW batch
    (here: the top-10% doc_id range standing in for a fresh ingest) are
    generated — old×old pairs are already known from prior runs.

    Scale shape: the probe side of the band join is restricted to the
    new batch BEFORE the join, so incremental cost is |new| × bucket
    density, never |corpus|².  In production the build side's
    fingerprints come from the stored signature table instead of being
    recomputed; banding and first-agreeing-band dedup are shared with
    the full-corpus operator.  A task's work is bounded by
    |new ∩ bucket| × bucket width — already probe-limited; for corpora
    whose buckets exceed the cap, compose with the full operator's
    hot-bucket salting.  A new×new pair is kept only from its lower-id
    probe (no duplicates by construction).
    Output: (doc_a, doc_b, hamming), doc_a < doc_b, ≥1 side new."""
    # same single-input-split rescue as dedup_simhash (see comment there)
    d = _t(spark, sf, "documents").repartition("doc_id")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).selectExpr(
        "doc_id", f"{_simhash_word_expr('spark')} AS w"
    )
    votes = _simhash_bit_exprs("spark")
    agg = tok.groupBy("doc_id").agg(
        *[F.expr(f"SUM({v})").alias(f"s{i}") for i, v in enumerate(votes)]
    )
    fp = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN CAST({2 ** i} AS BIGINT) ELSE 0 END)"
        for i in range(_SH_BITS)
    )
    sigs = agg.select("doc_id", F.expr(fp).alias("fingerprint")).localCheckpoint()
    thresh = sigs.agg(
        F.expr(f"CAST(FLOOR({_NEW_FRAC} * (MAX(doc_id) + 1)) AS BIGINT)").alias("t")
    )
    band_rows = [
        f"({b}, CAST(shiftright(fingerprint, {off}) & {(1 << width) - 1} AS BIGINT))"
        for b, (off, width) in enumerate(_simhash_band_bounds())
    ]
    long = sigs.selectExpr(
        "doc_id",
        "fingerprint",
        f"inline(array({', '.join('struct' + r for r in band_rows)})) AS (band_id, band_key)",
    )
    # shuffle-hash for the same reason as the full operator's band join
    # (few fat keys make SMJ sort the candidate expansion; SHJ streams
    # it) — hinted on the NEW-BATCH side, which is the small side by
    # construction, so the per-partition hash tables hold |new| rows,
    # never the corpus.
    probe = (
        long.crossJoin(F.broadcast(thresh))
        .filter(F.col("doc_id") >= F.col("t"))
        .hint("shuffle_hash")
    )
    build = long.select(
        F.col("doc_id").alias("doc_b"),
        F.col("fingerprint").alias("fb"),
        "band_id",
        "band_key",
    )
    first_band = " AND ".join(
        f"(band_id <= {b} OR (shiftright(fingerprint, {off}) & {(1 << w) - 1})"
        f" != (shiftright(fb, {off}) & {(1 << w) - 1}))"
        for b, (off, w) in enumerate(_simhash_band_bounds())
    )
    return (
        probe.join(build, ["band_id", "band_key"])
        # old docs pair with any probe; a new build doc only with a
        # lower-id probe (the pair's other orientation is dropped)
        .filter((F.col("doc_b") > F.col("doc_id")) | (F.col("doc_b") < F.col("t")))
        .filter(F.expr(first_band))
        .select(
            F.least("doc_id", "doc_b").alias("doc_a"),
            F.greatest("doc_id", "doc_b").alias("doc_b"),
            F.expr("CAST(bit_count(fingerprint ^ fb) AS INT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= _HAMMING_TAU)
    )


def _simhash_incremental_sql() -> str:
    return f"""
WITH {_simhash_sigs_cte()}, t AS (
  SELECT CAST(FLOOR({_NEW_FRAC} * (MAX(doc_id) + 1)) AS BIGINT) AS t FROM sigs
)
SELECT LEAST(a.doc_id, b.doc_id) AS doc_a,
       GREATEST(a.doc_id, b.doc_id) AS doc_b,
       CAST(bit_count(xor(a.fingerprint, b.fingerprint)) AS INT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id CROSS JOIN t
WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= {_HAMMING_TAU}
  AND GREATEST(a.doc_id, b.doc_id) >= t.t
"""


# ---------------------------------------------------------------------------
# near-dup cluster formation — connected components over the pair graph
# ---------------------------------------------------------------------------


# process-global sequence for CC-loop Observation names: each round's
# metric must carry a session-unique name, including across multiple CC
# invocations in one session (funnel + split + stats may all run the loop)
_CC_OBS_SEQ = [0]


def dedup_cluster_components(
    spark: SparkSession, sf: str, *, pairs: DataFrame | None = None
) -> DataFrame:
    """Connected components over the SimHash near-dup pair graph:
    cluster_id = MIN(doc_id) in the component — the "keep one per
    cluster" step every corpus-scale dedup pipeline runs after pair
    generation.

    One contraction pass, then iterative min-label propagation as a
    driver loop of joins: each round every node adopts the minimum label
    among itself and its neighbors, then pointer-jumps (label := its
    label's label).  The jump doubles propagation distance per round, so
    convergence is O(log diameter), not O(diameter) — the form that
    survives a 100 TB corpus with long near-dup chains; the up-front
    contraction makes every round run on the family quotient graph
    (orders of magnitude fewer edges for the dense graphs near-dup
    detection produces) instead of the raw pair graph.

    Output: (doc_id, cluster_id) for every doc in ≥1 near-dup pair.
    """
    # Materialize pairs BEFORE the symmetrizing union: union(pairs,
    # swapped) otherwise executes the salted band-join subplan twice
    # inside the one edges materialization.  ``pairs=`` lets a session
    # share ONE pair relation across the CC consumers (cluster stats,
    # dedup funnel, cluster split) — the counts-passthrough convention
    # the diversity family uses; the caller owns its materialization.
    if pairs is None:
        pairs = dedup_simhash(spark, sf).select("doc_a", "doc_b").localCheckpoint()
    else:
        pairs = pairs.select("doc_a", "doc_b")
    # edges/l1 stay LAZY: both are cheap projections/aggs over the
    # checkpointed pairs blocks, and re-evaluating them inside the one
    # contraction plan is faster than materializing each (measured 3.75 s
    # → 3.18 s at sf0.1 — two fewer sequential job barriers).  Only the
    # loop-carried frames below checkpoint, which is what truncates the
    # iterative lineage (the exponential-plan-growth pitfall).
    edges = pairs.union(pairs.select(F.col("doc_b"), F.col("doc_a"))).toDF(
        "src", "dst"
    )
    # Phase A — one min-label round + GRAPH CONTRACTION.  Near-dup graphs
    # are dense (families of near-identical docs form near-cliques), so a
    # single "adopt the minimum neighbor" pass collapses most of each
    # family onto one label; re-expressing the edges in label space and
    # deduping then shrinks the edge list by orders of magnitude (514k →
    # 20.5k at sf0.1) before the iterative loop ever runs.  At 100 TB this
    # is the difference between iterating on the full pair graph and
    # iterating on the family quotient graph.
    l1 = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("nmin"))
        .select(F.col("src").alias("node"), F.least("src", "nmin").alias("l1"))
    )
    edges = (
        edges.join(l1.select(F.col("node").alias("src"), F.col("l1").alias("ls")), "src")
        .join(l1.select(F.col("node").alias("dst"), F.col("l1").alias("ld")), "dst")
        .select(F.col("ls").alias("src"), F.col("ld").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    # labels only ever decrease elementwise, so the global label sum is a
    # monotone potential: unchanged sum ⟺ fixpoint.  Summed as
    # DECIMAL(38,0): a wrapped long sum could alias the previous round's
    # value and terminate early at corpus-scale id ranges.  The sum rides
    # the checkpoint's OWN materialization job via ``observe`` (an
    # accumulator-backed CollectMetrics node — no extra scan), so each
    # round runs ONE job, not checkpoint + a separate convergence agg
    # (r12 optimization: 2.03 → 1.55 s for the post-pairs fixpoint at
    # sf0.1, output byte-identical; at scale it removes one full pass
    # over the label relation per round).
    def _ckpt_with_sum(lb: DataFrame):
        _CC_OBS_SEQ[0] += 1
        ob = Observation(f"cc_label_sum_{_CC_OBS_SEQ[0]}")
        ck = lb.observe(
            ob, F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).localCheckpoint()
        return ck, ob.get["s"]

    # Seed labels one adopt-min step ahead: label₀(v) = min(v, min
    # neighbor) — the same groupBy the identity init's distinct() paid,
    # but it fuses round 1's neighbor-min step into the init
    # materialization (r12: one fewer 2-join fixpoint round).  The label
    # is still a node id inside v's component and ≤ v, which is the
    # invariant the pointer jump and the min-fixpoint need; the fixpoint
    # (= component min) is independent of any such seed.
    labels, prev_sum = _ckpt_with_sum(
        edges.groupBy("src")
        .agg(F.min("dst").alias("nmin"))
        .select(
            F.col("src").alias("node"),
            F.least("src", "nmin").alias("label"),
        )
    )
    while True:
        nbr = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        stepped = labels.join(nbr, labels["node"] == nbr["src"], "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
        )
        # pointer jump: a label is itself a node id in the same component,
        # so label-of-label is a valid (and ≤) label — halves the rounds
        # (A/B'd against a jump-free loop this round: 3 rounds vs 5,
        # jump wins).
        ptr = stepped.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        labels, new_sum = _ckpt_with_sum(
            stepped.join(ptr, stepped["label"] == ptr["pnode"], "left").select(
                "node",
                F.least(F.col("label"), F.coalesce("plabel", "label")).alias("label"),
            )
        )
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    # Phase C — resolve original nodes through the contraction: the
    # component min m satisfies l1(m) = m (it is smaller than every
    # neighbor), so comp(l1(v)) is the original component min; a node
    # whose whole component contracted to one label has no entry in the
    # quotient loop and keeps l1 directly.
    comp = labels.select(F.col("node").alias("l1"), F.col("label").alias("comp"))
    return l1.join(comp, "l1", "left").select(
        F.col("node").alias("doc_id"),
        F.coalesce("comp", "l1").alias("cluster_id"),
    )


def _components_sql() -> str:
    """Recursive-CTE oracle: a label reaches every node on a path from
    its origin (the pruning guard lab < node only ever drops labels that
    cannot be a component minimum), so MIN per node = component min."""
    return f"""
WITH RECURSIVE pairs AS ({_simhash_sql()}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
comp AS (
  SELECT node, node AS lab FROM nodes
  UNION
  SELECT e.dst AS node, c.lab FROM comp c JOIN edges e ON e.src = c.node
  WHERE c.lab < e.dst
)
SELECT node AS doc_id, MIN(lab) AS cluster_id FROM comp GROUP BY node
"""


# ---------------------------------------------------------------------------
# canonical-doc selection — keep the best document per near-dup cluster
# ---------------------------------------------------------------------------


def dedup_keep_best(
    spark: SparkSession, sf: str, *, clusters: DataFrame | None = None
) -> DataFrame:
    """The end step of every corpus dedup pipeline: after pair generation
    (SimHash) and clustering (connected components), keep ONE canonical
    document per cluster — the one with the highest type-token ratio
    (vocab richness), doc_id as the deterministic tie-break.  Docs in no
    near-dup pair are their own singleton cluster.

    Scale shape: the per-cluster argmax is a partial aggregation
    (max over a (ratio, doc_id) struct), NOT a window — a boilerplate-
    heavy corpus with one giant near-dup cluster produces a hot GROUP
    key, which map-side combine absorbs, where a rank window would
    funnel the whole cluster through one task.  ``clusters=`` shares a
    precomputed (doc_id, cluster_id) relation across CC consumers."""
    comp = (
        clusters
        if clusters is not None
        else dedup_cluster_components(spark, sf)
    )
    d = _t(spark, sf, "documents")
    full = (
        d.select("doc_id")
        .join(comp, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
    )
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    ratio = tok.groupBy("doc_id").agg(
        F.expr("CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*)").alias("ratio")
    )
    return (
        full.join(ratio, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.max(F.struct(F.col("ratio"), F.col("doc_id"))).alias("__best"),
            F.count("*").cast("long").alias("n_members"),
        )
        .select(
            "cluster_id",
            F.col("__best.doc_id").alias("keep_doc_id"),
            "n_members",
            F.col("__best.ratio").alias("keep_ratio"),
        )
    )


def _keep_best_sql() -> str:
    return f"""
WITH RECURSIVE pairs AS ({_simhash_sql()}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
comp AS (
  SELECT node, node AS lab FROM nodes
  UNION
  SELECT e.dst AS node, c.lab FROM comp c JOIN edges e ON e.src = c.node
  WHERE c.lab < e.dst
),
clusters AS (SELECT node AS doc_id, MIN(lab) AS cluster_id FROM comp GROUP BY node),
fullc AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN clusters c USING (doc_id)
),
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
ratio AS (
  SELECT doc_id, CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*) AS ratio
  FROM tok GROUP BY doc_id
),
best AS (
  SELECT f.cluster_id,
         MAX({{'ratio': r.ratio, 'doc_id': f.doc_id}}) AS b,
         CAST(COUNT(*) AS BIGINT) AS n_members
  FROM fullc f JOIN ratio r USING (doc_id)
  GROUP BY f.cluster_id
)
SELECT cluster_id, b.doc_id AS keep_doc_id, n_members, b.ratio AS keep_ratio
FROM best
"""


# ---------------------------------------------------------------------------
# benchmark decontamination — n-gram overlap vs a held-out eval set
# ---------------------------------------------------------------------------

_DECON_TAU = 0.20  # flag docs sharing ≥20% of their shingles with any bench doc
_BENCH_MOD = 101  # stand-in benchmark membership: doc_id ≡ 0 (mod 101)


def decon_ngram_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Training-set decontamination: flag corpus documents whose word-2-gram
    shingle overlap with any held-out benchmark document exceeds τ — the
    standard n-gram-collision eval-leak check run before every LLM
    training job (cf. GPT-3/PaLM appendix decontamination).

    The benchmark set here is the docs with doc_id ≡ 0 (mod {mod}) — a
    deterministic stand-in for a real eval-suite table, which is always
    TINY (MBs) next to the corpus.  That asymmetry is the scale design:
    benchmark shingles ship BROADCAST, the 100 TB corpus side streams
    through a narrow map + one partial-agg shuffle on (doc_id, bench_id)
    — no shuffle of corpus shingles against each other, no inverted
    index over the corpus.  overlap_frac is an integer ratio
    (n_common / n_doc_shingles) → bit-identical double cross-engine.
    """
    sh = _doc_shingles(spark, sf)
    bench = sh.filter(F.col("doc_id") % _BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    corpus = sh.filter(F.col("doc_id") % _BENCH_MOD != 0)
    sizes = corpus.groupBy("doc_id").agg(F.count("*").alias("n_doc_shingles"))
    hits = (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        hits.join(sizes, "doc_id")
        .withColumn("overlap_frac", F.col("n_common").cast("double") / F.col("n_doc_shingles"))
        .filter(F.col("overlap_frac") >= _DECON_TAU)
        .select("doc_id", "bench_id", "n_common", "n_doc_shingles", "overlap_frac")
    )


decon_ngram_overlap.__doc__ = decon_ngram_overlap.__doc__.format(mod=_BENCH_MOD)

_DECON_SQL = f"""
WITH {_SHINGLE_SQL},
bench AS (
  SELECT doc_id AS bench_id, shingle FROM shingles WHERE doc_id % {_BENCH_MOD} = 0
), corpus AS (
  SELECT doc_id, shingle FROM shingles WHERE doc_id % {_BENCH_MOD} <> 0
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_doc_shingles FROM corpus GROUP BY doc_id
), hits AS (
  SELECT c.doc_id, b.bench_id, COUNT(*) AS n_common
  FROM corpus c JOIN bench b USING (shingle)
  GROUP BY c.doc_id, b.bench_id
)
SELECT h.doc_id, h.bench_id, h.n_common, s.n_doc_shingles,
       CAST(h.n_common AS DOUBLE) / s.n_doc_shingles AS overlap_frac
FROM hits h JOIN sizes s USING (doc_id)
WHERE CAST(h.n_common AS DOUBLE) / s.n_doc_shingles >= {_DECON_TAU}
"""


# ---------------------------------------------------------------------------
# duplicated-span removal — exact-substring dedup at span granularity
# ---------------------------------------------------------------------------

_SPAN_K = 8  # tokens per non-overlapping span


def dedup_span_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicated-span removal: cut every document into non-overlapping
    {k}-token spans, count each span's occurrences across the WHOLE
    corpus, and rebuild each document from only its corpus-unique spans
    — the span-granular form of exact-substring deduplication (Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better"), which removes boilerplate shared across documents instead
    of dropping whole near-dup docs.

    Physical shape at 100 TB: the span explode is a narrow map emitting
    n_tokens/{k} rows; occurrence counting is ONE partial-agg shuffle on
    md5(span) (uniform keys — no skew); the count join back is an
    equi-join on the same key (AQE picks SMJ when the span table
    outgrows broadcast); the rebuild groupBy doc_id collects at most the
    doc's own spans — bounded by document length, never corpus size.
    Output stays narrow: the retained text is emitted as (length, md5),
    not the string itself."""
    d = _t(spark, sf, "documents").select("doc_id", F.split("text", " ").alias("toks"))
    spans = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(toks) - 1, {_SPAN_K}),"
                f" s -> array_join(slice(toks, s + 1, {_SPAN_K}), ' '))"
            )
        ).alias("span_idx", "span_text"),
    ).withColumn("h", F.md5("span_text"))
    # COUNT(*) OVER (PARTITION BY h) instead of groupBy + join back: ONE
    # pass over the span explode and ONE exchange on the uniform md5 key
    # (the join form re-executed the explode — array_join + md5 per span —
    # for the probe side; same n_occ per h, bit-identical output)
    flagged = spans.withColumn(
        "n_occ", F.count("*").over(Window.partitionBy("h"))
    ).withColumn("dup", F.col("n_occ") > 1)
    kept = F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(F.when(~F.col("dup"), F.struct("span_idx", "span_text")))
            ),
            lambda s: s["span_text"],
        ),
        " ",
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum(F.when(F.col("dup"), 1).otherwise(0)).cast("long").alias("n_dup_spans"),
            kept.alias("_kept"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_dup_spans",
            (F.col("n_dup_spans").cast("double") / F.col("n_spans")).alias("dup_ratio"),
            F.length("_kept").cast("long").alias("kept_n_chars"),
            F.md5("_kept").alias("kept_md5"),
        )
    )


dedup_span_exact.__doc__ = dedup_span_exact.__doc__.format(k=_SPAN_K)

_SPAN_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), starts AS (
  SELECT doc_id, toks, UNNEST(range(0, len(toks), {_SPAN_K})) AS s FROM d
), sp AS (
  SELECT doc_id, CAST(s // {_SPAN_K} AS INTEGER) AS span_idx,
         array_to_string(toks[s + 1 : s + {_SPAN_K}], ' ') AS span_text
  FROM starts
), hashed AS (
  SELECT doc_id, span_idx, span_text, md5(span_text) AS h FROM sp
), counts AS (
  SELECT h, COUNT(*) AS n_occ FROM hashed GROUP BY h
), flagged AS (
  SELECT doc_id, span_idx, span_text, n_occ FROM hashed JOIN counts USING (h)
), agg AS (
  SELECT doc_id,
         COUNT(*) AS n_spans,
         SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS n_dup,
         COALESCE(string_agg(span_text, ' ' ORDER BY span_idx)
                  FILTER (WHERE n_occ = 1), '') AS kept
  FROM flagged GROUP BY doc_id
)
SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
       CAST(n_dup AS BIGINT) AS n_dup_spans,
       CAST(n_dup AS DOUBLE) / n_spans AS dup_ratio,
       CAST(length(kept) AS BIGINT) AS kept_n_chars,
       md5(kept) AS kept_md5
FROM agg
"""


_SPAN_TOPK = 20  # report rows


def dedup_span_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Most-duplicated-passages report: the top-{k} corpus-wide duplicated
    {w}-token spans by occurrence count — the diagnostic a curation team
    reads BEFORE running span removal (Lee et al. 2022 §4 reports exactly
    this table: the most-repeated training passages are boilerplate,
    licenses, navigation chrome).  Output per span: occurrences, distinct
    documents containing it, the smallest containing doc_id as a lookup
    example, and the span length.

    Physical shape at 100 TB: identical to dedup_span_exact's count side
    — narrow span explode, ONE partial-agg shuffle on md5(span) (uniform
    keys); the distinct-doc count rides the same shuffle via a two-level
    (h, doc_id) pre-aggregation rather than a COUNT(DISTINCT) expand;
    top-k is TakeOrderedAndProject (per-partition partial top-k), never a
    global sort.  Only hashes and counts shuffle — span text stays in the
    map stage (span_chars is computed before the exchange)."""
    d = _t(spark, sf, "documents").select("doc_id", F.split("text", " ").alias("toks"))
    spans = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(toks) - 1, {_SPAN_K}),"
                f" s -> array_join(slice(toks, s + 1, {_SPAN_K}), ' '))"
            )
        ).alias("span_text"),
    ).select(
        "doc_id", F.md5("span_text").alias("h"), F.length("span_text").alias("chars")
    )
    per_doc = spans.groupBy("h", "doc_id").agg(
        F.count("*").alias("n_in_doc"), F.min("chars").alias("chars")
    )
    counts = per_doc.groupBy("h").agg(
        F.sum("n_in_doc").cast("long").alias("n_occ"),
        F.count("*").cast("long").alias("n_docs"),
        F.min("doc_id").alias("example_doc_id"),
        F.min("chars").cast("long").alias("span_chars"),
    )
    topk = (
        counts.filter(F.col("n_occ") > 1)
        .orderBy(F.col("n_occ").desc(), F.col("h"))
        .limit(_SPAN_TOPK)
    )
    return topk.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("n_occ").desc(), F.col("h"))).cast("long"),
    ).select("rank", F.col("h").alias("span_h"), "n_occ", "n_docs", "example_doc_id", "span_chars")


dedup_span_topk.__doc__ = dedup_span_topk.__doc__.format(k=_SPAN_TOPK, w=_SPAN_K)

_SPAN_TOPK_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), starts AS (
  SELECT doc_id, toks, UNNEST(range(0, len(toks), {_SPAN_K})) AS s FROM d
), sp AS (
  SELECT doc_id,
         md5(array_to_string(toks[s + 1 : s + {_SPAN_K}], ' ')) AS h,
         length(array_to_string(toks[s + 1 : s + {_SPAN_K}], ' ')) AS chars
  FROM starts
), per_doc AS (
  SELECT h, doc_id, COUNT(*) AS n_in_doc, MIN(chars) AS chars
  FROM sp GROUP BY h, doc_id
), counts AS (
  SELECT h, CAST(SUM(n_in_doc) AS BIGINT) AS n_occ,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         MIN(doc_id) AS example_doc_id,
         CAST(MIN(chars) AS BIGINT) AS span_chars
  FROM per_doc GROUP BY h
), ranked AS (
  SELECT h, n_occ, n_docs, example_doc_id, span_chars,
         CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, h) AS BIGINT) AS rank
  FROM counts WHERE n_occ > 1
)
SELECT rank, h AS span_h, n_occ, n_docs, example_doc_id, span_chars
FROM ranked WHERE rank <= {_SPAN_TOPK}
"""


_ISL_W = 8  # overlapping-shingle width (tokens); min detectable dup length


def dedup_substring_islands(spark: SparkSession, sf: str) -> DataFrame:
    """Arbitrary-boundary duplicated-substring detection — the exact
    Lee et al. 2022 semantics that dedup_span_exact approximates with
    non-overlapping spans: a token position is duplicated iff SOME
    {w}-token window covering corpus-repeated text contains it, so
    maximal runs of consecutive duplicated window positions are maximal
    duplicated substrings (of any length ≥ {w}, at any offset).

    Per document this reports the duplicated-substring ISLANDS: maximal
    runs of duplicated positions → token intervals [a, b+{w}-1] →
    interval union (runs separated by a small clean gap can still
    overlap in tokens), plus the dup-token ratio the span operator
    cannot see across span boundaries.

    Physical shape at 100 TB: the overlapping explode emits n_tokens
    rows (stride 1 — {w}× the span op's volume, the price of exactness);
    occurrence counting is ONE partial-agg shuffle on md5 (uniform
    keys); runs and islands are per-doc windows — bounded by document
    length, never corpus size — and the counts join is an equi-join on
    the same uniform key."""
    d = _t(spark, sf, "documents").select("doc_id", F.split("text", " ").alias("toks"))
    elig = d.filter(F.size("toks") >= _ISL_W)
    sh = elig.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(toks) - {_ISL_W}),"
                f" s -> md5(array_join(slice(toks, s + 1, {_ISL_W}), ' ')))"
            )
        ).alias("pos", "h"),
    )
    # occurrence count as COUNT(*) OVER (PARTITION BY h): ONE pass over the
    # exploded windows and ONE exchange on the uniform md5 key, instead of
    # the former groupBy + self-join that re-executed the n_tokens-row
    # md5-window explode (the dominant CPU of this operator) a second time
    # for the probe side (r12: 2 corpus explodes → 1; plan: 8 → 5
    # exchanges; same n_occ per h, bit-identical output)
    dup = (
        sh.withColumn("n_occ", F.count("*").over(Window.partitionBy("h")))
        .filter(F.col("n_occ") > 1)
        .select("doc_id", "pos")
    )
    w_pos = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        dup.withColumn("grp", F.col("pos") - F.row_number().over(w_pos))
        .groupBy("doc_id", "grp")
        .agg(F.min("pos").alias("a"), (F.max("pos") + F.lit(_ISL_W - 1)).alias("e"))
    )
    w_a = Window.partitionBy("doc_id").orderBy("a")
    prev_max = F.max("e").over(w_a.rowsBetween(Window.unboundedPreceding, -1))
    islands = (
        runs.withColumn(
            "new_isl", F.when(prev_max.isNull() | (F.col("a") > prev_max), 1).otherwise(0)
        )
        .withColumn("isl", F.sum("new_isl").over(w_a.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "isl")
        .agg(F.min("a").alias("s"), F.max("e").alias("e"))
    )
    stats = islands.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_dup_islands"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("dup_token_count"),
        F.max(F.col("e") - F.col("s") + 1).cast("long").alias("longest_dup_tokens"),
    )
    base = d.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
    return (
        base.join(stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_islands", F.lit(0)).cast("long").alias("n_dup_islands"),
            F.coalesce("dup_token_count", F.lit(0)).cast("long").alias("dup_token_count"),
            F.coalesce("longest_dup_tokens", F.lit(0)).cast("long").alias("longest_dup_tokens"),
        )
        .withColumn(
            "dup_ratio", F.col("dup_token_count").cast("double") / F.col("n_tokens")
        )
    )


dedup_substring_islands.__doc__ = dedup_substring_islands.__doc__.format(w=_ISL_W)

_ISL_SQL = f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS MATERIALIZED (
  SELECT doc_id, s AS pos,
         md5(array_to_string(toks[s + 1 : s + {_ISL_W}], ' ')) AS h
  FROM d, UNNEST(range(0, len(toks) - {_ISL_W} + 1)) AS t(s)
  WHERE len(toks) >= {_ISL_W}
), counts AS (
  SELECT h, COUNT(*) AS n_occ FROM sh GROUP BY h
), dup AS (
  SELECT doc_id, pos FROM sh JOIN counts USING (h) WHERE n_occ > 1
), runs AS (
  SELECT doc_id, MIN(pos) AS a, MAX(pos) + {_ISL_W - 1} AS e
  FROM (
    SELECT doc_id, pos,
           pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM dup
  ) GROUP BY doc_id, grp
), marked AS (
  SELECT doc_id, a, e,
         CASE WHEN MAX(e) OVER (PARTITION BY doc_id ORDER BY a
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
              OR a > MAX(e) OVER (PARTITION BY doc_id ORDER BY a
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_isl
  FROM runs
), islands AS (
  SELECT doc_id, isl, MIN(a) AS s, MAX(e) AS e FROM (
    SELECT doc_id, a, e,
           SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY a
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
    FROM marked
  ) GROUP BY doc_id, isl
), stats AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_islands,
         CAST(SUM(e - s + 1) AS BIGINT) AS dup_token_count,
         CAST(MAX(e - s + 1) AS BIGINT) AS longest_dup_tokens
  FROM islands GROUP BY doc_id
)
SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_tokens,
       COALESCE(st.n_dup_islands, 0) AS n_dup_islands,
       COALESCE(st.dup_token_count, 0) AS dup_token_count,
       COALESCE(st.longest_dup_tokens, 0) AS longest_dup_tokens,
       CAST(COALESCE(st.dup_token_count, 0) AS DOUBLE) / len(d.toks) AS dup_ratio
FROM d LEFT JOIN stats st USING (doc_id)
"""


def decon_span_islands(spark: SparkSession, sf: str) -> DataFrame:
    """SPAN-level benchmark decontamination — the REDACTION spec, not
    just the verdict: for every corpus document containing verbatim
    benchmark text, the maximal leaked token intervals (the
    dedup_substring_islands run/interval-union machinery, with
    "duplicated" replaced by "appears in the benchmark").  The doc-level
    tests (n-gram/Bloom/fuzzy/embedding) say WHETHER a doc leaked; this
    says WHICH tokens to cut so the rest of the document survives —
    what a real decontamination pass actually edits.  Intervals ship as
    a portable ``s-e`` CSV string (start/end token offsets, 0-based).
    Benchmark membership is doc_id ≡ 0 (mod 7) — decon_fuzzy_minhash's
    denser stand-in, chosen so the synthetic fixture actually contains
    verbatim leaks (the mod-101 set shares no 8-token window).

    Physical shape at 100 TB: the benchmark's window hashes BROADCAST
    (an eval suite is MBs); the corpus side is the stride-1 window
    explode + a broadcast semi-join — no corpus-vs-corpus shuffle at
    all (cheaper than the dedup twin, which must count occurrences) —
    and runs/islands are per-doc windows bounded by document length."""
    d = _t(spark, sf, "documents").select("doc_id", F.split("text", " ").alias("toks"))
    elig = d.filter(F.size("toks") >= _ISL_W)
    sh = elig.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(toks) - {_ISL_W}),"
                f" s -> md5(array_join(slice(toks, s + 1, {_ISL_W}), ' ')))"
            )
        ).alias("pos", "h"),
    )
    bench = (
        sh.filter(F.col("doc_id") % _FUZZY_BENCH_MOD == 0).select("h").distinct()
    )
    leak = (
        sh.filter(F.col("doc_id") % _FUZZY_BENCH_MOD != 0)
        .join(F.broadcast(bench), "h", "left_semi")
        .select("doc_id", "pos")
    )
    w_pos = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        leak.withColumn("grp", F.col("pos") - F.row_number().over(w_pos))
        .groupBy("doc_id", "grp")
        .agg(F.min("pos").alias("a"), (F.max("pos") + F.lit(_ISL_W - 1)).alias("e"))
    )
    w_a = Window.partitionBy("doc_id").orderBy("a")
    prev_max = F.max("e").over(w_a.rowsBetween(Window.unboundedPreceding, -1))
    islands = (
        runs.withColumn(
            "new_isl", F.when(prev_max.isNull() | (F.col("a") > prev_max), 1).otherwise(0)
        )
        .withColumn(
            "isl", F.sum("new_isl").over(w_a.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("doc_id", "isl")
        .agg(F.min("a").alias("s"), F.max("e").alias("e"))
    )
    stats = islands.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_leak_islands"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("leak_token_count"),
        F.expr(
            "concat_ws(',', transform(sort_array(collect_list(struct(s, e))),"
            " q -> concat(CAST(q.s AS STRING), '-', CAST(q.e AS STRING))))"
        ).alias("leak_intervals"),
    )
    base = d.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
    return stats.join(base, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_leak_islands",
        "leak_token_count",
        (F.col("leak_token_count").cast("double") / F.col("n_tokens")).alias(
            "leak_ratio"
        ),
        "leak_intervals",
    )


_SPAN_DECON_SQL = f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS MATERIALIZED (
  SELECT doc_id, s AS pos,
         md5(array_to_string(toks[s + 1 : s + {_ISL_W}], ' ')) AS h
  FROM d, UNNEST(range(0, len(toks) - {_ISL_W} + 1)) AS t(s)
  WHERE len(toks) >= {_ISL_W}
), bench AS (
  SELECT DISTINCT h FROM sh WHERE doc_id % {_FUZZY_BENCH_MOD} = 0
), leak AS (
  SELECT doc_id, pos FROM sh
  WHERE doc_id % {_FUZZY_BENCH_MOD} != 0 AND h IN (SELECT h FROM bench)
), runs AS (
  SELECT doc_id, MIN(pos) AS a, MAX(pos) + {_ISL_W - 1} AS e
  FROM (
    SELECT doc_id, pos,
           pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM leak
  ) GROUP BY doc_id, grp
), marked AS (
  SELECT doc_id, a, e,
         CASE WHEN MAX(e) OVER (PARTITION BY doc_id ORDER BY a
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
              OR a > MAX(e) OVER (PARTITION BY doc_id ORDER BY a
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_isl
  FROM runs
), islands AS (
  SELECT doc_id, isl, MIN(a) AS s, MAX(e) AS e FROM (
    SELECT doc_id, a, e,
           SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY a
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
    FROM marked
  ) GROUP BY doc_id, isl
), stats AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_leak_islands,
         CAST(SUM(e - s + 1) AS BIGINT) AS leak_token_count,
         string_agg(CAST(s AS VARCHAR) || '-' || CAST(e AS VARCHAR), ','
                    ORDER BY s) AS leak_intervals
  FROM islands GROUP BY doc_id
)
SELECT st.doc_id, CAST(len(d.toks) AS BIGINT) AS n_tokens,
       st.n_leak_islands, st.leak_token_count,
       CAST(st.leak_token_count AS DOUBLE) / len(d.toks) AS leak_ratio,
       st.leak_intervals
FROM stats st JOIN d USING (doc_id)
"""


# ---------------------------------------------------------------------------
# prefix-filtered exact similarity join (AllPairs / PPJoin family)
# ---------------------------------------------------------------------------

_SIMJOIN_NUM, _SIMJOIN_DEN = 4, 5  # τ = 4/5 — kept rational for integer-exact tests


def simjoin_prefix_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT threshold similarity join: all document pairs with bag-of-
    tokens Jaccard ≥ τ ({num}/{den}), via prefix filtering (Bayardo et
    al. 2007 AllPairs).  Unlike MinHash/SimHash candidates, prefix
    filtering has NO false negatives: two docs with J ≥ τ must share at
    least one element among each one's (df-ordered) first
    n − ⌈τ·n⌉ + 1 elements, so joining on prefix elements alone is a
    lossless prune.

    Bags are exact: each (token, occurrence-index) is one element, so
    multiplicity counts.  Physical shape at 100 TB: per-doc term counts
    (one shuffle), element document-frequencies (one shuffle on el —
    uniform), per-doc df-sorted element arrays (one shuffle on doc_id,
    bounded by doc length), then the candidate join touches ONLY prefix
    elements — the globally RAREST elements of each doc, which is the
    built-in skew guard (a stop-word-like hot element is ordered last
    and never enters a prefix unless the doc is tiny).  Verification
    joins the two bounded element arrays and tests
    {den}·|A∩B| ≥ {num}·|A∪B| in exact integer arithmetic — the double
    ``jaccard`` column is display-only.

    Dictionary-encoded fast path (round 7, measured 13.0 → 9.1 s at
    sf0.1): elements carry a Spark-internal ``xxhash64`` id — candidate
    generation joins on 8-byte longs instead of strings, and
    verification runs in two LOSSLESS stages: (1) an id-set
    intersection bound ub = |set(ids_a) ∩ set(ids_b)| + dup_a + dup_b
    (for every common element its id is in both sets; elements sharing
    a collided id are covered by the per-doc duplicate counts, so
    ub ≥ |A∩B| PROVABLY, collisions or not) filters the 2.46M
    candidates down to the survivors, then (2) the exact string-array
    intersection decides only those few hundred.  Ids never reach the
    oracle — it states the plain quadratic semantics."""
    d = _t(spark, sf, "documents").select("doc_id", F.split("text", " ").alias("toks"))
    tf = (
        d.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    e = tf.select(
        "doc_id",
        F.expr("explode(transform(sequence(1, cnt), i -> concat(tok, '#', i)))").alias("el"),
    )
    dfreq = e.groupBy("el").agg(F.count("*").alias("df"))
    # materialized ONCE: four differently-pruned consumers (prefix explode,
    # both verify sides) would otherwise re-execute the tf/df/sort pipeline
    # per branch — same fix as the SimHash fingerprints (16 scans → 2)
    docs = (
        e.join(dfreq, "el")
        # Pin the doc-summary aggregation's partitioning to the session's
        # shuffle parallelism: collect_list has NO map-side reduction, so
        # this repartition IS the aggregation's exchange (groupBy on the
        # same key reuses it — zero extra shuffle, verified in the r12
        # plan capture), but an explicit REPARTITION_BY_NUM is exempt
        # from AQE byte-based coalescing.  Without it, AQE sees a few MB
        # of aggregated bytes and coalesces the checkpointed relation to
        # 3-4 partitions, which then SERIALIZES every RDD-fed downstream
        # stage — including the 13.9M-row candidate expansion, the most
        # CPU-dense stage of the whole query (measured r12: 7.1 → 5.1 s
        # at sf0.1).  The partition count follows spark.sql.shuffle
        # .partitions (sized to the cluster), never a local constant.
        .repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions")), "doc_id"
        )
        .groupBy("doc_id")
        .agg(
            F.expr("transform(sort_array(collect_list(struct(df, el))), s -> s.el)").alias("els"),
            F.count("*").alias("n"),
        )
        # Spark-internal dictionary ids: same df order, 8-byte join keys,
        # plus the per-doc distinct-id set and collision-duplicate count
        # that make the verify-stage bound provably lossless (docstring)
        .withColumn("ids", F.expr("transform(els, x -> xxhash64(x))"))
        .withColumn("idset", F.expr("array_distinct(ids)"))
        .withColumn("dup", F.expr("n - size(idset)"))
    ).localCheckpoint()
    # prefix length p = n − ⌈τ·n⌉ + 1; ⌈(num·n)/den⌉ = (num·n + den − 1) DIV den
    # posexplode keeps each element's 0-based rank — fuel for the
    # positional filter below
    prefixes = docs.select(
        "doc_id",
        "n",
        F.posexplode(
            F.expr(
                f"slice(ids, 1, n - (({_SIMJOIN_NUM} * n + {_SIMJOIN_DEN} - 1)"
                f" DIV {_SIMJOIN_DEN}) + 1)"
            )
        ).alias("pos", "el"),
    )
    # Two LOSSLESS prunes (Bayardo 2007 / Xiao 2008 ppjoin) applied to the
    # raw prefix-match rows BEFORE pair dedup — they matter precisely when
    # the vocabulary is small relative to the corpus (each prefix element
    # then matches many docs and the raw pair space explodes; measured at
    # sf0.1: 13.9M raw match rows → 6.4M distinct pairs → 256 survivors
    # without them; with them 2.46M pairs and wall 12.2 s → 8.9 s):
    #   * length:     J ≥ τ ⟹ den·min(n_a,n_b) ≥ num·max(n_a,n_b).
    #   * positional: a match at ranks (i, j) bounds the intersection by
    #     min(i,j) + 1 + min(n_a−i−1, n_b−j−1) (elements before the match
    #     contribute at most min(i,j); after it at most min of the
    #     remainders), which must reach α = ⌈τ/(1+τ)·(n_a+n_b)⌉ =
    #     ⌈num·(n_a+n_b)/(num+den)⌉.  A pair survives if ANY of its match
    #     rows passes — a superset of the classical first-match test, so
    #     no false negatives.
    # (The PPJoin asymmetric index-prefix reduction was tried and REVERTED:
    # it cut candidates a further 21% but measured 3-4 s SLOWER end-to-end
    # here — the self-join's reused broadcast exchange beats streaming two
    # distinct prefix relations at this scale.)
    _ns, _nd = _SIMJOIN_NUM, _SIMJOIN_NUM + _SIMJOIN_DEN
    cand = (
        prefixes.alias("a")
        .join(prefixes.alias("b"), "el")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(
            _SIMJOIN_DEN * F.least("a.n", "b.n")
            >= _SIMJOIN_NUM * F.greatest("a.n", "b.n")
        )
        .filter(
            F.least("a.pos", "b.pos")
            + 1
            + F.least(
                F.col("a.n") - F.col("a.pos") - 1, F.col("b.n") - F.col("b.pos") - 1
            )
            >= F.expr(f"({_ns} * (a.n + b.n) + {_nd} - 1) DIV {_nd}")
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # verify stage 1: lossless id-set bound over the full candidate set
    ia = docs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("idset").alias("ia"),
        F.col("dup").alias("dup_a"),
        F.col("n").alias("na1"),
    )
    ib = docs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("idset").alias("ib"),
        F.col("dup").alias("dup_b"),
        F.col("n").alias("nb1"),
    )
    pre = (
        cand.join(ia, "doc_a")
        .join(ib, "doc_b")
        .withColumn("ub", F.expr("size(array_intersect(ia, ib)) + dup_a + dup_b"))
        .filter(
            _SIMJOIN_DEN * F.col("ub")
            >= _SIMJOIN_NUM * (F.col("na1") + F.col("nb1") - F.col("ub"))
        )
        .select("doc_a", "doc_b")
    )
    # verify stage 2: exact string-array intersection on the survivors
    da = docs.select(F.col("doc_id").alias("doc_a"), F.col("els").alias("els_a"), F.col("n").alias("n_a"))
    db = docs.select(F.col("doc_id").alias("doc_b"), F.col("els").alias("els_b"), F.col("n").alias("n_b"))
    return (
        pre.join(da, "doc_a")
        .join(db, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("els_a", "els_b")).cast("long"))
        .filter(
            _SIMJOIN_DEN * F.col("inter")
            >= _SIMJOIN_NUM * (F.col("n_a") + F.col("n_b") - F.col("inter"))
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            "inter",
            (
                F.col("inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            ).alias("jaccard"),
        )
    )


simjoin_prefix_jaccard.__doc__ = simjoin_prefix_jaccard.__doc__.format(
    num=_SIMJOIN_NUM, den=_SIMJOIN_DEN
)

# Oracle = the PLAIN quadratic statement of the same semantics (all pairs,
# exact bag Jaccard, integer threshold).  Prefix filtering is lossless, so
# the Spark plan must return the identical pair set.
_SIMJOIN_SQL = f"""
WITH tf AS (
  SELECT doc_id, tok, COUNT(*) AS cnt
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok
), e AS (
  SELECT doc_id, tok || '#' || CAST(UNNEST(range(1, cnt + 1)) AS VARCHAR) AS el
  FROM tf
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM e GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM e a JOIN e b ON a.el = b.el AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       CAST(i.inter AS BIGINT) AS inter,
       CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE {_SIMJOIN_DEN} * i.inter >= {_SIMJOIN_NUM} * (sa.n + sb.n - i.inter)
"""


# ---------------------------------------------------------------------------
# Bloom-filter decontamination — fixed-size broadcast filter
# ---------------------------------------------------------------------------

_BLOOM_M = 65536  # bits
_BLOOM_K = 4  # hash functions
_BLOOM_TAU = 0.20


def _bloom_pos(dialect: str, j: str, key: str) -> str:
    """Hash ``j`` of ``key`` → bit position in [0, m): first 8 md5 hex
    nibbles of 'j:key' mod m — same digest family as the CMS rows."""
    if dialect == "spark":
        inner = f"md5(concat(CAST({j} AS STRING), ':', {key}))"
        return f"(CAST(conv(substr({inner}, 1, 8), 16, 10) AS BIGINT) % {_BLOOM_M})"
    inner = f"md5(CAST({j} AS VARCHAR) || ':' || {key})"
    return f"(CAST(('0x' || substr({inner}, 1, 8)) AS UBIGINT)::BIGINT % {_BLOOM_M})"


def decon_bloom_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination via a Bloom filter: the held-out set's
    shingles are folded into a FIXED-SIZE bit set (m={m}, k={k}); a
    corpus shingle is a (possible) benchmark hit iff all k of its bit
    positions are set.  Reports per-doc hit ratios ≥ τ.

    This is the scale complement to ``decon_ngram_overlap``: the join
    variant ships every benchmark shingle; the Bloom variant ships a
    filter whose size is CONSTANT in the benchmark (≤ m set bits ⇒ a
    {m}-bit / 8 KiB broadcast even for a benchmark of millions of
    grams), trading exactness for one-sided error — hits can be false
    positives (rate ≈ (s/m)^k for s set bits), misses are exact.  The
    set-bit table is represented relationally (≤ m rows) so the same
    filter is buildable in ANSI SQL; bit-packing it into 1024 longs is
    a transport detail, not a semantic one.

    Physical shape at 100 TB: benchmark side collapses to ≤ m distinct
    positions (partial-agg); corpus side is a narrow {k}-way position
    explode + broadcast-hash left join + two partial-agg groupBys
    (shingle-level all-bits vote, then doc-level ratio).  No
    corpus-side shuffle touches the benchmark at all."""
    sh = _doc_shingles(spark, sf)
    bench = sh.filter(F.col("doc_id") % _BENCH_MOD == 0)
    corpus = sh.filter(F.col("doc_id") % _BENCH_MOD != 0)
    js = ", ".join(str(j) for j in range(_BLOOM_K))
    bits = (
        bench.select(F.expr(f"explode(array({js}))").alias("j"), "shingle")
        .select(F.expr(_bloom_pos("spark", "j", "shingle")).alias("pos"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    probe = corpus.select(
        "doc_id", "shingle", F.expr(f"explode(array({js}))").alias("j")
    ).select("doc_id", "shingle", F.expr(_bloom_pos("spark", "j", "shingle")).alias("pos"))
    gram_hits = (
        probe.join(F.broadcast(bits), "pos", "left")
        .groupBy("doc_id", "shingle")
        .agg(F.min(F.coalesce(F.col("hit"), F.lit(0))).alias("all_set"))
    )
    return (
        gram_hits.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum("all_set").cast("long").alias("n_bloom_hits"),
        )
        .withColumn(
            "hit_ratio", F.col("n_bloom_hits").cast("double") / F.col("n_shingles")
        )
        .filter(F.col("hit_ratio") >= _BLOOM_TAU)
        .select("doc_id", "n_shingles", "n_bloom_hits", "hit_ratio")
    )


decon_bloom_filter.__doc__ = decon_bloom_filter.__doc__.format(m=_BLOOM_M, k=_BLOOM_K)


def _bloom_sql() -> str:
    js = ", ".join(f"({j})" for j in range(_BLOOM_K))
    return f"""
WITH {_SHINGLE_SQL},
ks (j) AS (VALUES {js}),
bits AS (
  SELECT DISTINCT {_bloom_pos('duck', 'ks.j', 's.shingle')} AS pos
  FROM shingles s, ks WHERE s.doc_id % {_BENCH_MOD} = 0
), probe AS (
  SELECT s.doc_id, s.shingle, {_bloom_pos('duck', 'ks.j', 's.shingle')} AS pos
  FROM shingles s, ks WHERE s.doc_id % {_BENCH_MOD} <> 0
), gram_hits AS (
  SELECT p.doc_id, p.shingle,
         MIN(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END) AS all_set
  FROM probe p LEFT JOIN bits b ON p.pos = b.pos
  GROUP BY p.doc_id, p.shingle
), agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(all_set) AS BIGINT) AS n_bloom_hits
  FROM gram_hits GROUP BY doc_id
)
SELECT doc_id, n_shingles, n_bloom_hits,
       CAST(n_bloom_hits AS DOUBLE) / n_shingles AS hit_ratio
FROM agg WHERE CAST(n_bloom_hits AS DOUBLE) / n_shingles >= {_BLOOM_TAU}
"""


# ---------------------------------------------------------------------------
# cluster statistics — the dedup-savings report
# ---------------------------------------------------------------------------


def dedup_cluster_stats(
    spark: SparkSession, sf: str, *, clusters: DataFrame | None = None
) -> DataFrame:
    """Near-dup cluster size histogram: for each component size, how many
    clusters exist, how many documents they hold, and how many are
    REMOVABLE (all but one keeper per cluster) — the "what will this
    dedup pass actually save?" report every curation run reads before
    committing to a deletion.

    COMPOSITION: consumes :func:`dedup_cluster_components` directly —
    the CC fixpoint, the per-cluster count, and this histogram fuse into
    one job chain.  Beyond the pair-covered docs, the report is two
    matrix-sized aggregations (cluster → size, size → histogram) — free
    at any corpus size once CC has run.  ``clusters=`` shares a
    precomputed (doc_id, cluster_id) relation across CC consumers."""
    cc = clusters if clusters is not None else dedup_cluster_components(spark, sf)
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .select(
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.col("n_clusters").cast("long").alias("n_clusters"),
            (F.col("cluster_size") * F.col("n_clusters")).cast("long").alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters"))
            .cast("long")
            .alias("n_removable"),
        )
    )


def _cluster_stats_sql() -> str:
    return f"""
WITH cc AS ({_components_sql()}),
sizes AS (
  SELECT cluster_id, COUNT(*) AS cluster_size FROM cc GROUP BY cluster_id
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
       CAST((cluster_size - 1) * COUNT(*) AS BIGINT) AS n_removable
FROM sizes GROUP BY cluster_size
"""


# ---------------------------------------------------------------------------
# cross-source duplication matrix — the mixture-planning artifact
# ---------------------------------------------------------------------------


def dedup_cross_source_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """CROSS-SOURCE duplication matrix: for every source pair, how much
    of their shingle vocabulary is shared — the artifact a mixture
    planner reads before weighting sources (two crawls of the same
    sites look like independent data until this table says they are
    80% the same text; cf. the overlap audits in the Pile/Dolma source
    analyses).  Exact distinct word-2-gram vocabularies per source,
    pairwise intersection counts, and the vocabulary Jaccard as an
    integer ratio.

    Physical shape at 100 TB: ONE corpus pass to the distinct
    (shingle, source) relation; the self-join is keyed by shingle where
    every key carries ≤ |sources| rows (the expansion is
    |sources|²-bounded PER KEY, never corpus×corpus); the result is one
    |sources|²-row matrix.  Every source pair appears — pairs sharing
    nothing report 0.0 via the per-source-totals cross join, which is
    |sources|-bounded and broadcast."""
    d = _t(spark, sf, "documents").select("source", F.split("text", " ").alias("toks"))
    shingles = F.expr(
        "CASE WHEN size(toks) >= 2 THEN "
        "array_distinct(transform(sequence(0, size(toks) - 2),"
        " i -> concat(toks[i], ' ', toks[i + 1]))) "
        "ELSE array() END"
    )
    ss = d.select("source", F.explode(shingles).alias("shingle")).distinct()
    na = ss.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    a = ss.select(F.col("source").alias("source_a"), "shingle")
    # shuffle-hash: shingle keys are many and thin (≤ |sources| rows
    # each) — SHJ streams the pair expansion, SMJ would sort it
    b = ss.select(F.col("source").alias("source_b"), "shingle").hint("shuffle_hash")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    ta = na.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    tb = na.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        ta.crossJoin(tb)
        .filter(F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(shared), ["source_a", "source_b"], "left")
        .fillna(0, subset=["n_shared"])
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_shared",
            F.expr(
                "ROUND(CAST(n_shared AS DOUBLE) / (n_a + n_b - n_shared), 6)"
            ).alias("vocab_jaccard"),
        )
    )


_CROSS_SOURCE_SQL = """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos,
         doc_id
  FROM documents
), ss AS (
  SELECT DISTINCT a.source, a.tok || ' ' || b.tok AS shingle
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
             AND a.source = b.source
), na AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM ss GROUP BY source
), shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM ss a JOIN ss b ON a.shingle = b.shingle AND a.source < b.source
  GROUP BY 1, 2
)
SELECT ta.source AS source_a, tb.source AS source_b,
       ta.n AS n_a, tb.n AS n_b,
       COALESCE(s.n_shared, 0) AS n_shared,
       ROUND(CAST(COALESCE(s.n_shared, 0) AS DOUBLE)
             / (ta.n + tb.n - COALESCE(s.n_shared, 0)), 6) AS vocab_jaccard
FROM na ta
JOIN na tb ON ta.source < tb.source
LEFT JOIN shared s ON s.source_a = ta.source AND s.source_b = tb.source
"""


# deferred: _BENCH_MOD is defined next to decon_ngram_overlap, below the
# fuzzy twin's source position
decon_fuzzy_minhash.__doc__ = decon_fuzzy_minhash.__doc__.format(mod=_FUZZY_BENCH_MOD)




# ---------------------------------------------------------------------------
# CCNet-style paragraph-level dedup (keep-first, normalized hashes,
# document reassembly)
# ---------------------------------------------------------------------------

_PARA_K = 12  # tokens per synthetic "paragraph" of the gate workload


def _para_norm(col: str, *, spark_side: bool) -> str:
    """CCNet's pre-hash normalization (Wenzek et al. 2020): lowercase,
    digits dropped, whitespace collapsed — so near-identical boilerplate
    paragraphs hash together.  Identical regexes on both engines."""
    lowered = f"lower({col})"
    nodigit = f"regexp_replace({lowered}, '[0-9]+', '')"
    return f"trim(regexp_replace({nodigit}, ' +', ' '))"


def dedup_paragraphs_ccnet(
    spark: SparkSession, sf: str, *, k: int = _PARA_K
) -> DataFrame:
    """Paragraph-level corpus dedup, CCNet semantics (Wenzek et al.
    2020: CCNet hashes NORMALIZED paragraphs across all shards and keeps
    ONE occurrence): unlike ``dedup_span_exact`` (Lee et al. 2022
    semantics — every corpus-duplicated span is removed from EVERY
    document), the first occurrence survives — ordered by (doc_id,
    position), the deterministic twin of CCNet's shard order — and each
    document is REASSEMBLED from its kept paragraphs in original order.

    The gate workload cuts the synthetic corpus into {k}-token
    paragraphs; a real corpus passes newline-split paragraphs through
    the same relations (the paragraph delimiter is the only
    corpus-specific piece).

    Physical shape at 100 TB: paragraph explode is a narrow map; the
    keeper election is ONE partial-agg shuffle on md5(normalized
    paragraph) (MIN combines map-side — uniform keys, no skew); the
    keeper join back is an equi-join on the same key; the reassembly
    groupBy collects at most each document's own paragraphs.
    """
    return ccnet_paras_report(ccnet_paras(_t(spark, sf, "documents"), k=k))


def ccnet_paras(docs: DataFrame, *, k: int = _PARA_K) -> DataFrame:
    """The (doc_id, pos, para, h) paragraph relation of a documents
    feed — the narrow explode + normalized-hash half, shared by the
    batch operator and the streaming membership store
    (streaming/paragraphs.py)."""
    d = docs.select("doc_id", F.split("text", " ").alias("toks"))
    return d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(toks) - 1, {k}),"
                f" s -> array_join(slice(toks, s + 1, {k}), ' '))"
            )
        ).alias("pos", "para"),
    ).withColumn("h", F.md5(F.expr(_para_norm("para", spark_side=True))))


def ccnet_paras_report(paras: DataFrame) -> DataFrame:
    """Keeper election + per-document reassembly over a paragraph
    relation — the batch tail, run verbatim by the streaming twin's
    read side (keep-first is a MIN monoid over (doc_id, pos), so
    cross-batch distinct memberships fold exactly)."""
    # keeper election as MIN(struct) OVER (PARTITION BY h): ONE pass over
    # the paragraph explode and ONE exchange on the uniform md5 key — the
    # former groupBy + join back re-executed the paragraph explode (slice +
    # array_join + normalize + md5 per paragraph) for the probe side.
    # Same MIN monoid per h, bit-identical output.
    flagged = paras.withColumn(
        "first", F.min(F.struct("doc_id", "pos")).over(Window.partitionBy("h"))
    ).withColumn(
        "kept",
        (F.col("doc_id") == F.col("first.doc_id"))
        & (F.col("pos") == F.col("first.pos")),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_paras"),
            F.expr("CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)").alias(
                "n_removed"
            ),
            F.expr(
                "concat_ws(' ', transform(array_sort("
                "collect_list(CASE WHEN kept THEN struct(pos, para) END)),"
                " x -> x.para))"
            ).alias("text_dedup"),
        )
        .select(
            "doc_id",
            "n_paras",
            "n_removed",
            F.md5("text_dedup").alias("text_dedup_md5"),
            F.length("text_dedup").cast("long").alias("n_chars_dedup"),
        )
    )


def _para_ccnet_sql(k: int = _PARA_K) -> str:
    norm = _para_norm("para", spark_side=False)
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
), rebuilt AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_paras,
         CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
         COALESCE(string_agg(CASE WHEN kept THEN para END, ' ' ORDER BY pos), '')
           AS text_dedup
  FROM flagged GROUP BY doc_id
)
SELECT doc_id, n_paras, n_removed,
       md5(text_dedup) AS text_dedup_md5,
       CAST(length(text_dedup) AS BIGINT) AS n_chars_dedup
FROM rebuilt
"""


QUERIES: dict[str, QuerySpec] = {
    "dedup_cross_source_matrix": QuerySpec(
        dedup_cross_source_matrix,
        _CROSS_SOURCE_SQL,
        "LLM-pipeline mixture planning: exact cross-source shingle (Broder 1997) vocabulary "
        "overlap matrix (one corpus pass, per-key |sources|-bounded pair "
        "expansion, |sources|^2-row output)",
    ),
    "dedup_cluster_stats": QuerySpec(
        dedup_cluster_stats,
        _cluster_stats_sql(),
        "LLM-pipeline dedup (cluster size histogram / savings report, the Lee et al. 2022 dedup accounting — "
        "composition over the CC fixpoint)",
    ),
    "simjoin_prefix_jaccard": QuerySpec(
        simjoin_prefix_jaccard,
        _SIMJOIN_SQL,
        "LLM-pipeline similarity join (AllPairs prefix filtering — EXACT threshold "
        "join, no LSH recall loss; candidates only from rarest-element prefixes)",
    ),
    "dedup_paragraphs_ccnet": QuerySpec(
        dedup_paragraphs_ccnet,
        _para_ccnet_sql(),
        "LLM-pipeline dedup (CCNet paragraph dedup, Wenzek et al. 2020: "
        "normalized-hash keep-first across the corpus + per-document "
        "reassembly — the keep-one complement of dedup_span_exact's "
        "remove-all Lee et al. 2022 semantics)",
    ),
    "dedup_span_exact": QuerySpec(
        dedup_span_exact,
        _SPAN_SQL,
        "LLM-pipeline dedup (exact-substring/span removal, Lee et al. 2022; "
        "one uniform-key shuffle + doc-bounded rebuild)",
    ),
    "dedup_exact_normalized": QuerySpec(
        dedup_exact_normalized,
        _EXACT_NORM_SQL,
        "beyond-reference: exact dedup on canonicalized text (C4/RefinedWeb "
        "normalization) with the raw-variant over-match diagnostic",
    ),
    "decon_fuzzy_minhash": QuerySpec(
        decon_fuzzy_minhash,
        _fuzzy_decon_sql(),
        "beyond-reference: FUZZY benchmark decontamination (MinHash-LSH "
        "candidates vs a broadcast eval set, exact-Jaccard verified) — the "
        "paraphrase-tolerant companion of decon_ngram_overlap",
    ),
    "dedup_lsh_tuning_curve": QuerySpec(
        dedup_lsh_tuning_curve,
        _lsh_tuning_sql(),
        "beyond-reference: LSH banding advisor — expected S-curve recall per "
        "(bands, rows) over the measured exact-Jaccard histogram (MMDS §3.4); "
        "pow-free repeated-squaring chains, value-bounded histogram",
    ),
    "decon_span_islands": QuerySpec(
        decon_span_islands,
        _SPAN_DECON_SQL,
        "beyond-reference: SPAN-level benchmark decontamination (Lee et al. 2022 span matches) — the "
        "redaction spec (leaked token intervals via broadcast-bench "
        "stride-1 windows + run/interval-union islands)",
    ),
    "dedup_substring_islands": QuerySpec(
        dedup_substring_islands,
        _ISL_SQL,
        "LLM-pipeline dedup (arbitrary-boundary duplicated-substring islands, "
        "Lee et al. 2022 exact semantics — overlapping shingles, run/island "
        "interval union; one uniform-key shuffle + doc-bounded windows)",
    ),
    "dedup_span_topk": QuerySpec(
        dedup_span_topk,
        _SPAN_TOPK_SQL,
        "LLM-pipeline dedup diagnostics (most-duplicated-passages report, "
        "Lee et al. 2022 §4; counts-only shuffle + TakeOrdered top-k)",
    ),
    "dedup_cluster_components": QuerySpec(
        dedup_cluster_components,
        _components_sql(),
        "cluster step after near-dup pairs (iterative CC via contraction + pointer jumping, Kiveris et al. 2014; oracle = recursive CTE)",
    ),
    "dedup_simhash": QuerySpec(
        dedup_simhash, _simhash_sql(), "LLM-pipeline dedup (SimHash fingerprints)"
    ),
    "dedup_embedding_ivf": QuerySpec(
        dedup_embedding_ivf,
        _ivf_sql(),
        "LLM-pipeline near-dup on LEARNED kmeans IVF buckets (kmeans_buckets_exact + bucket-local cosine)",
    ),
    "dedup_semdedup": QuerySpec(
        dedup_semdedup,
        _semdedup_sql(),
        "LLM-pipeline semantic dedup (SemDeDup, Abbas et al. 2023: kmeans clusters + "
        "keep-farthest-from-centroid prefix pruning)",
    ),
    "dedup_exact_hash": QuerySpec(
        dedup_exact_hash, _EXACT_SQL, "LLM-pipeline dedup (exact); A7 validate.py:222-252 analog"
    ),
    "dedup_ngram_jaccard": QuerySpec(
        dedup_ngram_jaccard, _JACCARD_SQL, "LLM-pipeline dedup (n-gram Jaccard, inverted index)"
    ),
    "dedup_minhash_lsh": QuerySpec(
        dedup_minhash_lsh, _minhash_sql(), "LLM-pipeline dedup (MinHash+LSH banding)"
    ),
    "dedup_lsh_verified": QuerySpec(
        dedup_lsh_verified,
        _lsh_verified_sql(),
        "LLM-pipeline dedup (LSH candidates -> exact-Jaccard verify, candidate-bounded)",
    ),
    "dedup_embedding_cosine": QuerySpec(
        dedup_embedding_cosine, _EMB_COS_SQL, "LLM-pipeline dedup (embedding cosine, blocked; SemDeDup-family signal)"
    ),
    "dedup_keep_best": QuerySpec(
        dedup_keep_best,
        _keep_best_sql(),
        "LLM-pipeline canonical-doc selection per near-dup cluster (C4/RefinedWeb keep-best practice; argmax quality, partial-agg)",
    ),
    "dedup_simhash_incremental": QuerySpec(
        dedup_simhash_incremental,
        _simhash_incremental_sql(),
        "LLM-pipeline incremental near-dup (SimHash, Manku et al. 2007): new batch vs corpus, probe-restricted band join",
    ),
    "decon_ngram_overlap": QuerySpec(
        decon_ngram_overlap,
        _DECON_SQL,
        "LLM-pipeline decontamination: corpus-vs-benchmark n-gram overlap, broadcast bench side",
    ),
    "dedup_containment": QuerySpec(
        dedup_containment,
        _CONTAIN_SQL,
        "LLM-pipeline dedup (asymmetric containment, Broder 1997 — partial-copy/quote detection, "
        "Broder resemblance-vs-containment)",
    ),
    "decon_bloom_filter": QuerySpec(
        decon_bloom_filter,
        _bloom_sql(),
        "LLM-pipeline decontamination via Bloom filter — constant-size (8 KiB) "
        "broadcast bit set, one-sided error; no benchmark-side shuffle",
    ),
}
