"""BPE merge-table training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") — the tokenizer-training
step of an LLM data pipeline, as a Spark iterative operator.

The classic trainer never touches the corpus after one pass: it runs on
the WORD-FREQUENCY table (vocab ≪ corpus — the 100 TB corpus collapses
to at most a few hundred million distinct words, and Zipf makes the
weighted pair counts identical to corpus-level counts).  Each merge
step is:

1. pair counts: one partial-agg shuffle over the vocab's adjacent
   symbol pairs, weighted by word frequency;
2. argmax pair: ``orderBy(count DESC, lhs, rhs).limit(1)`` —
   TakeOrderedAndProject, ONE row collected to the driver per merge
   (the same bounded-collect contract as kmeans' k seed rows);
3. merge application: a narrow higher-order fold over each word's
   symbol array — greedy left-to-right non-overlapping replacement,
   the exact BPE semantics (after [a,a,a] merges (a,a) the result is
   [aa,a], never [a,aa]).

Lineage is truncated with an eager ``localCheckpoint`` every two merges
(the repo's iterative-operator convention, cf. d2_pcoa_power): the
vocab table is small, and without the checkpoint each step nests
another fold expression into the plan until codegen falls back to
interpreted mode.

The DuckDB oracle replays the identical algorithm as ONE chained-CTE
query: per step, pair counts → scalar best-pair CTE → greedy merge via
the run/offset window identity (greedy left-to-right non-overlap ==
keeping the even offsets within each maximal run of consecutive
candidate positions) → rebuild.  Cross-engine determinism: weighted
counts are exact integers; ties break on (count DESC, lhs ASC, rhs ASC)
under binary string collation on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..testdata import table as _t
from . import QuerySpec

_N_MERGES = 8
_EOW = "</w>"  # end-of-word marker (Sennrich's word-boundary symbol)


def _word_symbols(spark: SparkSession, sf: str) -> DataFrame:
    """(word, freq, syms): corpus → word-frequency table → per-word
    character-symbol arrays with the end-of-word marker appended."""
    d = _t(spark, sf, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("w")).filter(F.col("w") != "")
    vocab = words.groupBy("w").agg(F.count("*").alias("freq"))
    return vocab.select(
        "w",
        "freq",
        F.expr(f"concat(regexp_extract_all(w, '.', 0), array('{_EOW}'))").alias("syms"),
    )


def _pair_counts(syms_df: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency — one shuffle."""
    pairs = syms_df.select(
        "freq",
        F.explode(
            F.expr(
                "zip_with(slice(syms, 1, size(syms) - 1),"
                " slice(syms, 2, size(syms) - 1),"
                " (a, b) -> struct(a AS lhs, b AS rhs))"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.lhs", "p.rhs").agg(F.sum("freq").cast("long").alias("cnt"))


def _merge_fold(lhs: str, rhs: str) -> F.Column:
    """Greedy left-to-right non-overlapping merge of (lhs, rhs) in the
    ``syms`` array, as a single narrow fold (no UDF, no shuffle).
    ``try_element_at`` keeps the lookahead ANSI-safe at the last index."""
    syms = F.col("syms")

    def step(st, i):
        pair_here = (
            F.when(i < F.size(syms), F.try_element_at(syms, i + F.lit(1))).otherwise(
                F.lit(None)
            )
            == F.lit(rhs)
        ) & (F.element_at(syms, i) == F.lit(lhs))
        return (
            F.when(st["skip"], F.struct(st["out"].alias("out"), F.lit(False).alias("skip")))
            .when(
                pair_here,
                F.struct(
                    F.concat(st["out"], F.array(F.lit(lhs + rhs))).alias("out"),
                    F.lit(True).alias("skip"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(st["out"], F.array(F.element_at(syms, i))).alias("out"),
                    F.lit(False).alias("skip"),
                )
            )
        )

    init = F.struct(
        F.expr("CAST(array() AS ARRAY<STRING>)").alias("out"), F.lit(False).alias("skip")
    )
    # guard: sequence(1, 0) DESCENDS in Spark, so an empty syms array would
    # index element_at(syms, 1) and throw under ANSI — pass it through as-is
    return F.when(F.size(syms) < 1, syms).otherwise(
        F.aggregate(F.sequence(F.lit(1), F.size(syms)), init, step, lambda st: st["out"])
    )


def _train(
    spark: SparkSession, sf: str, n_merges: int
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Run the merge loop; returns (merge table, final encoded vocab) —
    the trainer's last state IS the corpus vocabulary with every merge
    applied, so the encode side comes for free."""
    # LAZY checkpoints throughout the loop (the sample_kcenter_coreset
    # discipline): each checkpoint still truncates the fold-expression
    # lineage (the returned frame is LogicalRDD-backed either way), but
    # the very next per-merge argmax ``collect()`` is the materializing
    # action — its pair-count aggregation reads every partition, so the
    # checkpoint rides that job instead of paying its own serial barrier
    # (eager form: n_merges/2 + 1 extra jobs per train; consumers are
    # strictly sequential, so the lazy RDD is never computed twice).
    syms_df = _word_symbols(spark, sf).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    for step_no in range(1, n_merges + 1):
        best = (
            _pair_counts(syms_df)
            .orderBy(F.col("cnt").desc(), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not best:  # vocabulary fully merged — nothing left to pair
            break
        lhs, rhs, cnt = best[0].lhs, best[0].rhs, best[0].cnt
        merges.append((step_no, lhs, rhs, cnt))
        syms_df = syms_df.withColumn("syms", _merge_fold(lhs, rhs))
        if step_no % 2 == 0:  # truncate the fold-expression lineage
            syms_df = syms_df.localCheckpoint(eager=False)
    return merges, syms_df


def bpe_train(spark: SparkSession, sf: str, *, n_merges: int = _N_MERGES) -> DataFrame:
    """Train the first ``n_merges`` BPE merges over the documents corpus;
    returns the merge table (step, lhs, rhs, pair_count)."""
    merges, _ = _train(spark, sf, n_merges)
    return spark.createDataFrame(
        merges, "step BIGINT, lhs STRING, rhs STRING, pair_count BIGINT"
    )


def text_bpe_train(spark: SparkSession, sf: str) -> DataFrame:
    return bpe_train(spark, sf)


def text_bpe_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """The apply half at corpus scale: per-document BPE token counts
    under the freshly trained merge table — the number every packing /
    budget / mixture step actually needs (token counts under the REAL
    tokenizer, not the whitespace proxy).

    Physical shape at 100 TB: the encoded vocabulary (trainer's final
    state — word → merged symbol count) is vocab-sized, so the apply is
    ONE equi-join of exploded words against it (AQE broadcasts it while
    it fits, shuffles on the word key otherwise — never a per-doc
    re-tokenization) followed by one per-doc partial agg."""
    _, syms_df = _train(spark, sf, _N_MERGES)
    enc = syms_df.select("w", F.size("syms").alias("n_sym"))
    d = _t(spark, sf, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("w")).filter(
        F.col("w") != ""
    )
    return words.join(enc, "w").groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum("n_sym").cast("long").alias("n_bpe_tokens"),
    )


def bpe_encode(syms_df: DataFrame, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    """Apply a trained merge table to a (w, freq, syms) table in rank
    order — the encode half of BPE, for tests and downstream token
    counting.  Pure narrow folds; no shuffle.  Same every-2-merges eager
    checkpoint as the trainer — 8 nested folds in ONE plan push codegen
    past the JIT limit and analysis time explodes."""
    for i, (_, lhs, rhs, _) in enumerate(sorted(merges), start=1):
        syms_df = syms_df.withColumn("syms", _merge_fold(lhs, rhs))
        if i % 2 == 0:
            syms_df = syms_df.localCheckpoint(eager=True)
    return syms_df


_VOCAB_TOPK = 30


def text_bpe_vocab(spark: SparkSession, sf: str) -> DataFrame:
    """The vocabulary file a trained tokenizer ships: the top-{k}
    subword units by corpus occurrence after the trained merges are
    applied (character symbols that survived + merged units), weighted
    by word frequency.

    Physical shape: the trainer's final vocab state exploded once —
    subword counting is a partial-agg shuffle over vocab-sized input,
    and the report is TakeOrderedAndProject."""
    from pyspark.sql import Window

    _, syms_df = _train(spark, sf, _N_MERGES)
    counts = (
        syms_df.select("freq", F.explode("syms").alias("subword"))
        .groupBy("subword")
        .agg(F.sum("freq").cast("long").alias("n_occ"))
    )
    topk = counts.orderBy(F.col("n_occ").desc(), "subword").limit(_VOCAB_TOPK)
    return topk.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("n_occ").desc(), F.col("subword")))
        .cast("long"),
    ).select("rank", "subword", "n_occ")


text_bpe_vocab.__doc__ = text_bpe_vocab.__doc__.format(k=_VOCAB_TOPK)


def _bpe_chain(n_merges: int = _N_MERGES) -> str:
    """The shared chained-CTE prefix: s0 + one merge-step block per step."""
    parts = [
        f"""
WITH s0 AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
         list_append(regexp_extract_all(w, '.'), '{_EOW}') AS syms
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w != '' GROUP BY w
)"""
    ]
    for k in range(1, n_merges + 1):
        p = k - 1
        parts.append(
            f"""
, pc{k} AS MATERIALIZED (
  SELECT syms[i] AS lhs, syms[i + 1] AS rhs, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM s{p}, UNNEST(range(1, len(syms))) AS t(i)
  GROUP BY 1, 2
), best{k} AS MATERIALIZED (
  SELECT lhs, rhs, cnt FROM pc{k} ORDER BY cnt DESC, lhs, rhs LIMIT 1
), pos{k} AS MATERIALIZED (
  SELECT w, freq, generate_subscripts(syms, 1) AS i, unnest(syms) AS sym FROM s{p}
), cand{k} AS (
  SELECT a.w, a.i
  FROM pos{k} a JOIN pos{k} b ON b.w = a.w AND b.i = a.i + 1
  CROSS JOIN best{k} m
  WHERE a.sym = m.lhs AND b.sym = m.rhs
), keep{k} AS MATERIALIZED (
  -- greedy left-to-right non-overlap == even offsets within each
  -- maximal run of consecutive candidate positions
  SELECT w, i FROM (
    SELECT w, i, i - MIN(i) OVER (PARTITION BY w, grp) AS off FROM (
      SELECT w, i, i - ROW_NUMBER() OVER (PARTITION BY w ORDER BY i) AS grp
      FROM cand{k}
    )
  ) WHERE off % 2 = 0
), s{k} AS MATERIALIZED (
  SELECT p.w, p.freq,
         list(CASE WHEN kk.i IS NOT NULL THEN m.lhs || m.rhs ELSE p.sym END
              ORDER BY p.i) AS syms
  FROM pos{k} p
  CROSS JOIN best{k} m
  LEFT JOIN keep{k} kk ON kk.w = p.w AND kk.i = p.i
  LEFT JOIN keep{k} kp ON kp.w = p.w AND kp.i = p.i - 1
  WHERE kp.i IS NULL
  GROUP BY p.w, p.freq
)"""
        )
    return "".join(parts)


def _bpe_sql(n_merges: int = _N_MERGES) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS step, lhs, rhs, cnt AS pair_count FROM best{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        _bpe_chain(n_merges)
        + f"\nSELECT step, lhs, rhs, pair_count FROM ({union}) ORDER BY step"
    )


def _bpe_count_sql(n_merges: int = _N_MERGES) -> str:
    return (
        _bpe_chain(n_merges)
        + f"""
, enc AS (SELECT w, len(syms) AS n_sym FROM s{n_merges})
, tokw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens
FROM tokw JOIN enc USING (w)
WHERE w != ''
GROUP BY doc_id
"""
    )


def _bpe_vocab_sql(n_merges: int = _N_MERGES) -> str:
    return (
        _bpe_chain(n_merges)
        + f"""
, sub AS (
  SELECT unnest(syms) AS subword, freq FROM s{n_merges}
), counts AS (
  SELECT subword, CAST(SUM(freq) AS BIGINT) AS n_occ FROM sub GROUP BY subword
), ranked AS (
  SELECT subword, n_occ,
         CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, subword) AS BIGINT) AS rank
  FROM counts
)
SELECT rank, subword, n_occ FROM ranked WHERE rank <= {_VOCAB_TOPK}
"""
    )


QUERIES: dict[str, QuerySpec] = {
    "text_bpe_train": QuerySpec(
        text_bpe_train,
        _bpe_sql(),
        "beyond-reference: BPE merge-table training (Sennrich et al. 2016) — "
        "iterative argmax-merge over the word-frequency table; oracle is the "
        "same algorithm as one chained-CTE query",
    ),
    "text_bpe_token_count": QuerySpec(
        text_bpe_token_count,
        _bpe_count_sql(),
        "beyond-reference: per-document token counts under the trained BPE "
        "merges (the apply half — one vocab equi-join, no per-doc re-tokenize)",
    ),
    "text_bpe_vocab": QuerySpec(
        text_bpe_vocab,
        _bpe_vocab_sql(),
        "beyond-reference: the trained BPE (Sennrich et al. 2016) tokenizer's subword vocabulary with "
        "corpus occurrence counts (vocab-sized explode + TakeOrdered)",
    ),
}
