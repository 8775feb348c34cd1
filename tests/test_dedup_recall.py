"""Near-dup dedup quality: measured candidate recall against the exact
brute-force Jaccard ground truth (the dedup mirror of test_ann_recall).

The exactness oracles prove the LSH plans are deterministic; this suite
proves the "approximate" layer is measured: MinHash-LSH candidate
generation must recover (essentially) every TRUE τ-Jaccard pair, and
the LSH-then-exact-verify operator must emit ONLY true pairs."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE

from mmeds_meta_spark.operators import registry

REG = registry()


@pytest.fixture(scope="module")
def truth(spark):
    # exact inverted-index Jaccard at tau — the brute-force ground truth
    return {
        (r.doc_a, r.doc_b)
        for r in REG["dedup_ngram_jaccard"].spark(spark, SF_SMOKE).collect()
    }


def test_minhash_lsh_candidate_recall(spark, truth):
    assert truth, "fixture should contain tau-similar pairs"
    cand = {
        (r.doc_a, r.doc_b)
        for r in REG["dedup_minhash_lsh"].spark(spark, SF_SMOKE).collect()
    }
    recall = len(truth & cand) / len(truth)
    # measured 1.0 at fixture scale; 0.9 floor leaves room for benign
    # testdata drift while still failing on broken banding
    assert recall >= 0.9, f"LSH candidate recall {recall:.2f}"


def test_lsh_verified_emits_only_true_pairs(spark, truth):
    verified = {
        (r.doc_a, r.doc_b)
        for r in REG["dedup_lsh_verified"].spark(spark, SF_SMOKE).collect()
    }
    assert verified, "verified pass should confirm some pairs"
    assert verified <= truth  # exact verify -> zero false positives
    assert len(verified) / len(truth) >= 0.9  # and near-total recall
