"""ANN quality: measured recall@k against the brute-force oracle.

The ANN operators' exactness oracles prove the PLANS are deterministic
and portable; this suite proves the "approximate" claim is a measured
one — each bucketed/quantized searcher must recover a stated fraction
of the TRUE cosine top-k (ann_cosine_topk, the brute-force baseline).

Floors are set from measured fixture-scale recall (sf0.001: SRP 0.6,
IVF-PQ 0.5, IVF 0.9 at k=10) with headroom, and are all vastly above
the random baseline k/N ≈ 0.04 — a regression to random bucketing or a
broken codebook fails immediately, while benign testdata drift passes.
"""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE

from mmeds_meta_spark.operators import registry

REG = registry()

# (operator, minimum recall@10 at fixture scale)
BOUNDS = [
    ("ann_ivf_topk", 0.8),      # exact distances, bucket-restricted
    ("ann_srp_lsh_topk", 0.5),  # 16-bit sign signatures, 4-bit bands
    ("ann_ivf_pq_topk", 0.4),   # coarse IVF route + 2-sub PQ codebook
]


@pytest.fixture(scope="module")
def truth(spark):
    rows = REG["ann_cosine_topk"].spark(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    return {r.vec_id for r in rows}


@pytest.mark.parametrize("name,floor", BOUNDS)
def test_ann_recall_at_k(name, floor, spark, truth):
    got = {r.vec_id for r in REG[name].spark(spark, SF_SMOKE).collect()}
    assert got, f"{name} returned no candidates"
    recall = len(got & truth) / len(truth)
    assert recall >= floor, f"{name} recall@10 = {recall:.2f} < {floor}"
