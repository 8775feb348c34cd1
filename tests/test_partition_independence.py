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
]


@pytest.mark.parametrize("name", OPS)
def test_same_rows_under_any_partitioning(name, spark):
    spec = REG[name]
    default = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for parts in ("1", "7", default):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            results.append(sorted(map(tuple, spec.spark(spark, SF_SMOKE).collect())))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default)
    assert results[0] == results[1] == results[2]
