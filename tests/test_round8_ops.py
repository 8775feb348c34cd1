"""Round-8 operator invariants beyond the oracle gate:
dedup_cross_source_matrix and sample_epoch_plan."""

from __future__ import annotations

from conftest import SF_SMOKE

from mmeds_meta_spark.operators import registry

REG = registry()


def test_cross_source_matrix_shape_and_bounds(spark):
    rows = REG["dedup_cross_source_matrix"].spark(spark, SF_SMOKE).collect()
    sources = {r.source_a for r in rows} | {r.source_b for r in rows}
    n = len(sources)
    assert len(rows) == n * (n - 1) // 2, "every unordered source pair reports"
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 <= r.n_shared <= min(r.n_a, r.n_b)
        assert 0.0 <= r.vocab_jaccard <= 1.0
        # the jaccard is the stated integer ratio
        assert r.vocab_jaccard == round(r.n_shared / (r.n_a + r.n_b - r.n_shared), 6)


def test_epoch_plan_budget_and_determinism(spark):
    rows = REG["sample_epoch_plan"].spark(spark, SF_SMOKE).collect()
    total = sum(r.n_tokens for r in rows)
    t_target = 5 * total // 2
    planned = sum(r.planned_tokens for r in rows)
    # greedy prefix fill: within one doc's tokens of the target, never over
    assert planned <= t_target
    assert t_target - planned < max(r.n_tokens for r in rows)
    full = t_target // total
    assert {r.n_copies for r in rows} <= {full, full + 1}
    # per-doc arithmetic is consistent
    for r in rows:
        assert r.planned_tokens == r.n_tokens * r.n_copies
    # deterministic: a second invocation plans the identical copies
    again = {
        r.doc_id: r.n_copies
        for r in REG["sample_epoch_plan"].spark(spark, SF_SMOKE).collect()
    }
    assert again == {r.doc_id: r.n_copies for r in rows}


def test_mixture_plan_invariants(spark):
    rows = REG["pipeline_mixture_plan"].spark(spark, SF_SMOKE).collect()
    assert rows
    # weights form a distribution (6dp rounding tolerance)
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 0.0 <= r.top_overlap_containment <= 1.0
        assert 0 <= r.effective_tokens <= r.n_tokens
        # the discount is exactly the stated floor expression
        # (containment is rounded at 6dp for display only, so allow
        # one-token slack from the rounding)
        assert (
            abs(
                r.effective_tokens
                - int(r.n_tokens * (1 - r.top_overlap_containment))
            )
            <= max(1, int(r.n_tokens * 1e-5))
        )
