"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Two query sets:

* HEADLINE — the 12 queries benched since round 1, unchanged so ``value``
  stays apples-to-apples across rounds.  Per-query MIN of FIVE passes:
  the round-5 "regression" (total 15.58 → 16.15 s) reproduced as pure
  warm-up variance — at the identical commit, per-query times keep
  falling through pass 3-4 (codegen/JIT caches), e.g. d2_unifrac_weighted
  2.144 (r5 min-of-2) → 1.584 (isolated min-of-5), j3 2.186 → 1.557,
  w1 0.623 → 0.276 — so two passes under-warm; five interleaved passes
  reach the same steady state the isolated series shows.  All raw
  passes are emitted for spread analysis.
* HEAVY — the round-4+ operators whose 100-TB claims previously rested
  on plan audits alone (span-granular exact dedup, AllPairs prefix
  similarity join, Mantel with 199 in-plan permutations, the curation
  funnel composition).  Min of THREE interleaved passes (round-8 verdict
  #5: two rounds in a row produced phantom heavy-set "regressions" that
  same-commit diagnosis traced to host sampling — min-of-2 cannot
  separate a real regression from one stalled pass, min-of-3 with the
  per-query min/median/max spread in BENCH_DETAIL.json can: a REAL
  regression moves the MIN with a tight spread, host noise shows a wide
  spread around an unmoved min).  Regression triage threshold (also
  stated in SCALE_NOTES.md): a heavy query is flagged code-vs-host ONLY
  if its min rises >25% over its anchor AND its spread (max/min) is
  <1.5; otherwise re-measure before concluding.  Reported separately as
  ``heavy_queries``/``heavy_total`` so the legacy total stays
  comparable.

Each query is materialized with the no-op sink (full execution, no driver
collect overhead).  A warm-up run of the first query absorbs JVM/codegen
startup so the numbers reflect steady-state plan execution.

Output contract (repaired per the round-6 verdict — BENCH_r06 came back
``"parsed": null`` because the ever-growing one-line JSON plus Spark's
console-progress '\\r' frames overflowed the driver's stdout tail window):

* stdout carries exactly ONE compact JSON line — headline total +
  per-query mins + heavy mins — printed LAST, with console progress
  disabled for this process (``SPARK_GRAFT_NO_PROGRESS``) so nothing
  interleaves with or precedes it in the tail.
* full per-pass detail goes to the ``BENCH_DETAIL.json`` sidecar next to
  this script (also ``$SPARK_GRAFT_BENCH_DETAIL`` to relocate).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mmeds_meta_spark.operators import registry  # noqa: E402
from mmeds_meta_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q_meta_cohort",
    "j3_wide_denorm_distinct",
    "a13_hierarchical_collapse",
    "f19_weight_cascade",
    "w1_child_ordinal_ids",
    "a11_grouped_mean_sem",
    "r1_unpivot_melt",
    "dedup_minhash_lsh",
    "dedup_cluster_components",
    "d2_unifrac_weighted",
    "text_quality_score",
    "ann_cosine_topk",
]

HEAVY = [
    "dedup_span_exact",
    "simjoin_prefix_jaccard",
    "d9_mantel_test",
    "pipeline_curation_funnel",
    # round-6 additions: the in-plan permutation-statistics family and the
    # power-iteration ordination — heavy by construction (K+1 relabelings /
    # 2×24 matvec steps), so their wall-times are tracked from day one
    "d4_permanova",
    "d2_pcoa_power",
    # round-6 session-2 additions: the two full-corpus-pass selection ops
    # (hashed-n-gram LM ratio scoring; NB train+apply) — tracked so the
    # broadcast-model claims carry measured times
    "sample_dsir_importance",
    "text_nb_classifier",
    # round-6 session-3: the double-ordination composition (2 × 24 matvec
    # steps over two metrics + the closed-form SVD)
    "d13_procrustes",
    # round-6 session-5: the iterative BPE merge trainer (8 × pair-count
    # shuffle + argmax + narrow fold over the word-frequency table)
    "text_bpe_train",
    # round-7: the round-6 ops that had plan audits + sf0.1 verification
    # but no tracked wall-times (verdict item 5), plus the new composed
    # training-export funnel
    "dedup_substring_islands",
    "text_ccnet_buckets",
    "decon_fuzzy_minhash",
    "sample_epoch_shuffle",
    "sketch_kmv_overlap_matrix",
    "pipeline_export_funnel",
    # round-7 session-2: the last beta-group-significance method and the
    # composed core-metrics bundle — both permutation/branch-heavy
    "d16_permdisp",
    "pipeline_core_metrics",
    # round-7 session-3: the dedup-escalation funnel (composes the CC
    # fixpoint) — the heaviest of the final additions
    "pipeline_dedup_funnel",
    # round-8: the newly gated one-row-fold chain solves (K+1 value-level
    # folds over the transition matrix) and the composed differential-
    # abundance bundle — tracked from their first gated round
    "w17_markov_absorption",
    "w18_markov_removal",
    "pipeline_diff_abundance",
    # round-8 session-2: the micro-unit attribution pair, the composed
    # mixture plan, and the leakage-safe split (composes the CC fixpoint)
    "w19_position_attribution",
    "w20_time_decay_attribution",
    "pipeline_mixture_plan",
    "sample_cluster_split",
    # round-9: the WET-path domain stage (canonicalization is ~25 string
    # expressions per row — tracked so the narrow-map claim carries a
    # measured time) and the deterministic rarefaction draw
    "dedup_url_canonical",
    "sample_domain_cap",
    "d1_rarefaction_det",
    # round-9 session-2: host-graph PageRank — tracked so the
    # one-corpus-pass + bounded-iterations claim carries a measured time
    "web_host_pagerank",
    # round-9 session-2: both composition funnels' plans changed (window
    # flags + narrow quality + checkpointed selection flags) — tracked
    # so the refactors carry measured anchors
    "pipeline_selection_funnel",
    # round-9 session-2: harmonic centrality (shared host_edges pass) and
    # the survival pair — tracked so the bounded-iteration and
    # duration-bounded-risk-table claims carry measured anchors
    "web_host_harmonic",
    "d18_kaplan_meier",
    "d19_logrank_test",
    # round-10: the third survival estimator (shares d18's risk-table +
    # the new linear blocked fold), the demux-QC pass (per-read JVM
    # levenshtein over the broadcast mapping), the HyperBall harmonic
    # sketch (the linear-state scale path), and the PSL-walk domain cap
    # rides the existing sample_domain_cap anchor
    "d20_nelson_aalen",
    "s13_demux_validate",
    "web_host_harmonic_hll",
    # round-10 session-2: CCNet paragraph dedup (corpus explode + MIN
    # keeper shuffle + reassembly) — the heaviest new shape — and the
    # composed crawl-graph report (four rankings off one edge checkpoint)
    "dedup_paragraphs_ccnet",
    "pipeline_web_report",
    # round-11: HTML main-text extraction (the WARC front door) — a pure
    # narrow map, tracked so the zero-exchange claim carries a measured
    # time; and the full-PSL domain walk rides the existing
    # sample_domain_cap anchor (fixed ~0.9 s parse cost documented in
    # SCALE_NOTES round 11)
    "text_html_extract",
    "text_c4_line_filter",
    "web_url_filter",
    "pipeline_crawl_funnel",
    "text_kn_bigram_lm",
    # round-12: the KenLM-exact modified-KN variant and the full-recursion
    # trigram — tracked from their first gated round so the broadcast-model
    # claims carry anchors
    "text_kn_modified_bigram_lm",
    "text_kn_trigram_lm",
    # round-12: the composed CCNet pipeline — one paragraph shuffle +
    # checkpointed dedup relation + broadcast LM; tracked from day one
    "pipeline_ccnet_funnel",
]


# ---------------------------------------------------------------------------
# Quiet-host guard (round-11 verdict #5).  The r10/r11 phantom-regression
# adjudications both came down to "was the host quiet?", answered manually
# by re-running after the suite settled.  Automate it: a fixed CPU-bound
# calibration workload (xxhash64 fold over spark.range — no IO, no
# parquet cache effects) runs before EACH query set; if its min exceeds
# the recorded quiet-host band, the pass is tagged ``"host":
# "pressured"`` in BENCH_DETAIL.json and the stdout line, and the
# regression rule (below + SCALE_NOTES) EXCLUDES pressured passes from
# anchor comparison.  Re-pin CALIB_QUIET_SEC when the hardware changes
# (measured 2026-08-16, local[32]: warm mins 1.93-2.30 s).
CALIB_ROWS = 8_000_000_000
CALIB_QUIET_SEC = 1.95
CALIB_PRESSURE_RATIO = 1.35  # pressured when min > ratio × quiet ref


def calibrate(spark, n_runs: int = 3) -> dict:
    def one() -> float:
        t0 = time.time()
        (
            spark.range(0, CALIB_ROWS, 1, 32)
            .selectExpr("sum(xxhash64(id) % 1000000) AS h")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.time() - t0

    runs = [round(one(), 3) for _ in range(n_runs)]
    lo = min(runs)
    return {
        "runs": runs,
        "min": lo,
        "quiet_ref": CALIB_QUIET_SEC,
        "band": round(CALIB_QUIET_SEC * CALIB_PRESSURE_RATIO, 3),
        "pressured": lo > CALIB_QUIET_SEC * CALIB_PRESSURE_RATIO,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    os.environ["SPARK_GRAFT_NO_PROGRESS"] = "1"  # keep stdout JSON-clean
    spark = get_spark("mmeds-meta-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()

    def run(name: str) -> float:
        t0 = time.time()
        reg[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        # belt-and-braces: operators now localCheckpoint their shared
        # intermediates (blocks are GC-released with the DataFrame), but
        # clearing the cache manager here keeps the harness honest if a
        # future operator reintroduces .cache()
        spark.catalog.clearCache()
        return dt

    run(HEADLINE[0])  # warm-up: JVM + codegen + parquet footer cache
    calib_head = calibrate(spark)
    # five interleaved passes, per-query MIN: the host shows transient
    # noisy-neighbor stalls AND multi-run warm-up drift (see module
    # docstring); no cache is reused across queries (clearCache after
    # every execution) so the min is an honest steady-state number.
    passes = [{name: run(name) for name in HEADLINE} for _ in range(5)]
    times = {
        name: round(min(p[name] for p in passes), 3) for name in HEADLINE
    }
    total = round(sum(times.values()), 3)
    calib_heavy = calibrate(spark)
    heavy_passes = [{name: run(name) for name in HEAVY} for _ in range(3)]
    heavy = {
        name: round(min(p[name] for p in heavy_passes), 3) for name in HEAVY
    }
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
    )
    def spread(pss: list[dict], names: list[str]) -> dict:
        out = {}
        for n in names:
            xs = sorted(p[n] for p in pss)
            out[n] = {
                "min": round(xs[0], 3),
                "median": round(xs[len(xs) // 2], 3),
                "max": round(xs[-1], 3),
                "max_over_min": round(xs[-1] / xs[0], 2) if xs[0] > 0 else None,
            }
        return out

    with open(detail_path, "w") as fh:
        json.dump(
            {
                "sf": sf,
                "regression_rule": (
                    "flag code-regression only if min > 1.25x anchor AND "
                    "max_over_min < 1.5 AND host == 'quiet'; wide spread or "
                    "a pressured calibration = host sampling, re-measure"
                ),
                "host": "pressured"
                if (calib_head["pressured"] or calib_heavy["pressured"])
                else "quiet",
                "calibration": {
                    "before_headline": calib_head,
                    "before_heavy": calib_heavy,
                },
                "passes": {
                    f"pass_{i + 1}": {k: round(v, 3) for k, v in p.items()}
                    for i, p in enumerate(passes)
                },
                "heavy_passes": {
                    f"pass_{i + 1}": {k: round(v, 3) for k, v in p.items()}
                    for i, p in enumerate(heavy_passes)
                },
                "spread": spread(passes, HEADLINE),
                "heavy_spread": spread(heavy_passes, HEAVY),
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    # the ONE machine-readable stdout line, printed LAST (per-pass detail
    # lives in the sidecar; Spark console progress is disabled above)
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "headline_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": times,
                "heavy_queries": heavy,
                "heavy_total": round(sum(heavy.values()), 3),
                "host": "pressured"
                if (calib_head["pressured"] or calib_heavy["pressured"])
                else "quiet",
                "sf": sf,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
