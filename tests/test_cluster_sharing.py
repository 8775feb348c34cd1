"""CC-relation sharing across its consumers (round-8 verdict #7): a
session computes the SimHash pair generation + connected-components
fixpoint ONCE and hands the (doc_id, cluster_id) relation to
dedup_keep_best / dedup_cluster_stats / pipeline_dedup_funnel /
sample_cluster_split via ``clusters=`` — the diversity family's
``counts=`` passthrough convention.  Results must be identical to the
standalone path (which stays byte-identical: clusters defaults to None
and the original plan builds verbatim).
"""

from __future__ import annotations

from mmeds_meta_spark.operators.dedup import (
    dedup_cluster_components,
    dedup_cluster_stats,
    dedup_keep_best,
)
from mmeds_meta_spark.operators.pipeline import pipeline_dedup_funnel
from mmeds_meta_spark.operators.sampling import sample_cluster_split

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_shared_clusters_identical_results(spark):
    cc = dedup_cluster_components(spark, SF).localCheckpoint(eager=True)
    for fn in (
        dedup_keep_best,
        dedup_cluster_stats,
        pipeline_dedup_funnel,
        sample_cluster_split,
    ):
        assert _rows(fn(spark, SF, clusters=cc)) == _rows(fn(spark, SF)), fn.__name__


def test_shared_pairs_identical_components(spark):
    from mmeds_meta_spark.operators.dedup import dedup_simhash

    pairs = dedup_simhash(spark, SF).select("doc_a", "doc_b").localCheckpoint(
        eager=True
    )
    assert _rows(dedup_cluster_components(spark, SF, pairs=pairs)) == _rows(
        dedup_cluster_components(spark, SF)
    )
