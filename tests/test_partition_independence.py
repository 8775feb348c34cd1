"""Partition-independence: representative operators return IDENTICAL
rows under different shuffle partitionings — the decimal-exact
aggregation discipline holds by construction, not by luck.

The subset deliberately spans the risk classes: float aggregation
(a11 SEM), banded pair generation (LSH), integer-ratio pairwise
(weighted UniFrac), and the iterative fixpoint (connected components).
"""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE

from mmeds_meta_spark.operators import registry

REG = registry()

OPS = [
    "a11_grouped_mean_sem",
    "dedup_minhash_lsh",
    "d2_unifrac_weighted",
    "dedup_cluster_components",
    "dedup_embedding_ivf",  # learned-centroid iteration (decimal Lloyd)
    "d5_ancombc",  # iterative bias-corrected estimator
    "sample_stratified_exact",  # windowed selection after md5 prefilter
    "sketch_kmv_distinct",  # bottom-k estimate must not depend on layout
    # round-4 additions, one per new risk class
    "sample_mixture_weighted",  # √n quotas + md5-range selection
    "text_repetition_signals",  # two-level n-gram aggregation
    "ann_pq_adc_topk",  # exact-decimal PQ codes + ADC ranking
    "asof_join_attribution",  # union+carry running window
    "a18_quantile_profile",  # CDF order statistics + interpolation
    "a20_corr_profile",  # five-moment closed-form doubles
    "dedup_lsh_verified",  # candidate-bounded exact-Jaccard verify
    # round-5 additions
    "sketch_cms_heavy",  # depth×width counter table + broadcast probe
    "w5_range_join_bucketed",  # exploded 2-bucket composite-key range join
    "decon_ngram_overlap",  # broadcast bench side + integer-ratio fraction
    "text_tfidf_topk",  # per-doc rank over rational-idf scores
    "sketch_hll_distinct",  # register MAX must be layout-independent
    "dedup_containment",  # inverted-index pair stats, asymmetric ratio
    # round-5 session-2 additions
    "simjoin_prefix_jaccard",  # df-ordered prefixes: global order must not depend on layout
    "dedup_span_exact",  # positional rebuild via sort_array(collect_list)
    "sketch_kmv_setops",  # union bottom-k + presence flags
    "w8_retention_cohorts",  # collect_set of active days
    "decon_bloom_filter",  # broadcast bit-set membership votes
    "d8_chisq_independence",  # pinned-order float fold over contingency cells
    "w9_rolling_window_range",  # RANGE-frame peer-row semantics
    "w10_session_stats",  # window -> agg -> agg composition
    "pipeline_curation_funnel",  # three-branch signal join
    "d9_mantel_test",  # pinned-order moment folds over pair distances
    "w11_time_weighted_avg",  # split-idiom wide-int double cast
    "w12_interval_overlap",  # bucketed interval join + distinct
    "w13_forward_fill",  # running ignore-nulls frame
    "f23_json_props_rollup",  # schema-on-read parse + rollup
    "r6_pivot_events",  # declared-values pivot
    "multimodal_frame_dedup",  # frame-hash inverted-index containment
    "dedup_cluster_stats",  # histogram over the CC fixpoint
    "w14_session_funnel",  # session window ∘ funnel MIN composition
    "sketch_hll_by_group",  # grouped register MAX must be layout-independent
    # round-6 session-3 additions
    "sample_dsir_importance",  # pinned bucket folds + md5-Gumbel top-k
    "text_nb_classifier",  # broadcast model, per-(doc,class) pinned folds
    "dedup_semdedup",  # centroid-rank windows over kmeans buckets
    "text_bm25_topk",  # per-doc pinned term folds + TakeOrdered
    "a22_mad_outliers",  # two-level CDF medians, integer decision rule
    "d12_feature_table_summarize",  # dual-axis CDF quantiles
    "sample_kcenter_coreset",  # greedy driver loop over exact-decimal argmax
    "pipeline_selection_funnel",  # composed flags + broadcast-threshold cut
    "d13_procrustes",  # two power-iteration ordinations + closed-form SVD
    "d14_alpha_correlation",  # two mid-rank builds + permutation image joins
    "a23_source_mixture_profile",  # k-row Gini/entropy folds
    # round-6 session-4 additions
    "text_gopher_quality",  # higher-order array folds per row
    "sketch_hist_quantile",  # bin CDF + pinned-order interpolation
    "a24_skew_profile",  # count-of-counts CDF + exact Σcnt²
    "sketch_kmv_overlap_matrix",  # global bottom-k + membership arrays
    "sample_epoch_shuffle",  # md5-ranked (epoch, shard) positions
    # round-6 session-5 additions
    "ann_srp_lsh_topk",  # sign-bit signatures + banded candidate join
    "embed_random_projection",  # fixed-order Rademacher dot folds
    "dedup_span_topk",  # two-level (h, doc) pre-agg + TakeOrdered
    "text_ccnet_buckets",  # value-histogram cum counts per lang
    "text_bpe_train",  # iterative argmax over weighted pair counts
    "text_bpe_token_count",  # vocab equi-join + per-doc partial agg
    "text_bpe_vocab",  # freq-weighted subword counts + TakeOrdered
    "dedup_substring_islands",  # run-grouping + interval-union windows
    "w15_seasonal_anomaly",  # integer-moment baseline + broadcast probe
    "dedup_lsh_tuning_curve",  # value-histogram S-curve folds
    "decon_fuzzy_minhash",  # broadcast bench bands + exact-Jaccard verify
    "dedup_exact_normalized",  # canonicalize + hash groupBy
    "text_vocab_kl_drift",  # capped-class grid + pinned LN folds
    "a25_rollup_cube",  # Expand + single partial agg, exact decimal sums
    "d15_chao1_coverage",  # singleton/doubleton integer profile
    # round-7 additions
    "pipeline_export_funnel",  # bucketed pack windows + modular checksums
    "pipeline_decontam_report",  # three-modality union + doc rollup
    "text_bigram_lm_score",  # lag-window bigrams + broadcast grid folds
    "decon_embedding_cosine",  # broadcast bench + per-vector max/count agg
    "text_gopher_full",  # narrow-map half ∧ exploded-agg half join
    "d16_permdisp",  # PCoA centroid distances + permutation ANOVA F
    "text_length_ks_drift",  # bounded-grid CDF windows + max fold
    "sample_quality_quota",  # histogram threshold + boundary-class rank
    "p11_k_anonymity",  # two-level quasi-class agg
    "d17_pielou_evenness",  # richness-normalized double tree
    "pipeline_core_metrics",  # 10-branch union + pinned mean folds
    "d2_jaccard_beta",  # binary inverted-index pairs, integer ratio
    "w16_sliding_distinct_hll",  # windowed register-MAX merge + correction
    "decon_span_islands",  # broadcast-bench semi-join + island windows
    "pipeline_dedup_funnel",  # two md5 keepers + CC fixpoint + rollup
    "w17_markov_absorption",  # lag pairs + one-row absorbing-chain fold
    "w18_markov_removal",  # per-channel chain variants, one plan
]


# round-8: the suite covers the ENTIRE registry — the complement of the
# curated risk-class list above is derived dynamically, so an operator
# added in a future round is layout-checked from day one by construction
REST = sorted(set(REG) - set(OPS))


def _assert_layout_independent(name: str, spark) -> None:
    spec = REG[name]
    default = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for parts in ("1", "7", default):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            # key=repr (verify_local's convention): plain tuple ordering
            # breaks on NULL grouping-set subtotal keys (None < int)
            results.append(
                sorted(map(tuple, spec.spark(spark, SF_SMOKE).collect()), key=repr)
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default)
    assert results[0] == results[1] == results[2]


@pytest.mark.parametrize("name", OPS)
def test_same_rows_under_any_partitioning(name, spark):
    _assert_layout_independent(name, spark)


@pytest.mark.parametrize("name", REST)
def test_same_rows_under_any_partitioning_rest(name, spark):
    _assert_layout_independent(name, spark)
