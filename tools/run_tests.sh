#!/usr/bin/env bash
# Sharded test runner: the full suite exceeds a single 10-minute command
# budget (the 513-TSV golden validation corpus alone takes ~9 min), so CI
# and judges run it in bounded chunks.
#
#   tools/run_tests.sh        # run all shards sequentially (prints per-shard)
#   tools/run_tests.sh 2      # run only shard 2
#
# Each shard is sized to finish well inside 10 minutes on local[32].
set -u
cd "$(dirname "$0")/.."

SHARD_1=(tests/test_golden_corpus.py)                       # golden corpus (~9 min)
SHARD_2=(tests/test_validation.py tests/test_metadata_io.py # metadata engine
         tests/test_normalize_query.py tests/test_clear_user_data.py
         tests/test_scalars.py tests/test_summary_inputs.py)
SHARD_3=(tests/test_operators_oracle.py tests/test_dedup_skew.py  # operators
         tests/test_feature_tables.py tests/test_core_analysis.py
         tests/test_kmeans.py tests/test_newick.py
         tests/test_diff_abundance.py tests/test_pcoa_additions.py
         tests/test_permanova_p10.py tests/test_partition_independence.py
         tests/test_bucketing.py tests/test_pq_adc.py
         tests/test_property_invariants.py tests/test_unicode_edges.py
         tests/test_mantel.py tests/test_dsir.py
         tests/test_nb_classifier.py tests/test_semdedup.py
         tests/test_feature_table_summarize.py tests/test_bm25.py
         tests/test_mad_outliers.py tests/test_kcenter.py
         tests/test_selection_funnel.py tests/test_mixture_profile.py
         tests/test_procrustes.py tests/test_alpha_correlation.py
         tests/test_hist_quantile.py tests/test_skew_profile.py
         tests/test_kmv_overlap_matrix.py tests/test_text_gopher.py
         tests/test_srp_jl.py tests/test_bpe.py
         tests/test_span_topk_ccnet.py tests/test_substring_islands.py
         tests/test_pcoa_block.py tests/test_ann_recall.py tests/test_ks_drift.py
         tests/test_dedup_recall.py
         tests/test_advice_r07.py tests/test_advice_r08.py
         tests/test_decon_recall.py tests/test_round8_ops.py
         tests/test_advice_r09.py tests/test_cluster_sharing.py
         tests/test_web_ops.py tests/test_kaplan_meier.py
         tests/test_advice_r10.py tests/test_demux_validate.py
         tests/test_pheniqs_config.py tests/test_ccnet_paragraphs.py
         tests/test_badwords_filter.py tests/test_advice_r11.py
         tests/test_kn_bigram.py
         tests/test_html_extract.py tests/test_advice_r12.py
         tests/test_verify_harness.py tests/test_ccnet_funnel.py
         tests/test_optimization_r12.py)
SHARD_4=(tests/test_sources_streaming.py tests/test_streaming_ingest.py  # streams + study paths
         tests/test_multimodal.py tests/test_meta_study.py
         tests/test_mixed_subjects.py tests/test_animal_path.py
         tests/test_qza.py tests/test_sampling_ops.py
         tests/test_text_repetition.py tests/test_asof_join.py
         tests/test_streaming_joins.py
         tests/test_documents_jsonl.py tests/test_maintenance.py
         tests/test_streaming_topk.py tests/test_fastq_datasource.py
         tests/test_upsert_store.py tests/test_streaming_quantile.py
         tests/test_epoch_shuffle.py tests/test_wet_source.py
         tests/test_shard_export.py tests/test_streaming_anomaly.py
         tests/test_observe.py tests/test_export_funnel.py
         tests/test_streaming_export.py tests/test_permdisp.py
         tests/test_streaming_decon.py tests/test_streaming_diversity.py
         tests/test_markov_absorption.py tests/test_streaming_cross_source.py
         tests/test_rarefaction_det.py tests/test_streaming_url_dedup.py
         tests/test_streaming_host_graph.py tests/test_streaming_survival.py
         tests/test_streaming_demux.py tests/test_streaming_paragraphs.py
         tests/test_streaming_crawl.py)

run_shard() {
    local n=$1; shift
    echo "=== shard $n: $* ==="
    python -m pytest "$@" -q
}

rc=0
if [[ $# -ge 1 ]]; then
    case "$1" in
        1) run_shard 1 "${SHARD_1[@]}" || rc=$? ;;
        2) run_shard 2 "${SHARD_2[@]}" || rc=$? ;;
        3) run_shard 3 "${SHARD_3[@]}" || rc=$? ;;
        4) run_shard 4 "${SHARD_4[@]}" || rc=$? ;;
        *) echo "usage: $0 [1|2|3|4]" >&2; exit 2 ;;
    esac
else
    for n in 1 2 3 4; do
        v="SHARD_$n[@]"
        run_shard "$n" "${!v}" || rc=$?
    done
fi

# fail if any test file on disk is missing from every shard (drift guard)
all=$(printf '%s\n' "${SHARD_1[@]}" "${SHARD_2[@]}" "${SHARD_3[@]}" "${SHARD_4[@]}" | sort)
for f in tests/test_*.py; do
    if ! grep -qx "$f" <<<"$all"; then
        echo "ERROR: $f not assigned to any shard" >&2
        rc=1
    fi
done

# registry provenance audit: every QuerySpec.doc must cite a resolvable
# reference file:line or a public-work anchor (round-9 verdict #8)
python tools/audit_registry_docs.py || rc=1

# gate-freshness floor: no tail entry's newest driver evidence may be
# more than 6 rounds old — rotate oldest-first (round-10 verdict #6)
python tools/gate_freshness.py --enforce 6 || rc=1
exit $rc
