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


# ---------------------------------------------------------------------------
# session-3 reworks
# ---------------------------------------------------------------------------


def test_minhash_lsh_bucket_cap_is_window(spark):
    """dedup_minhash_lsh: the bucket cap must be a window count over the
    band key, never a groupBy-count + join-back — the width table is
    |buckets|-sized (corpus-scale, not broadcastable at 100 TB) and the
    join-back re-read the banded relation.  One Window, and exactly ONE
    join (the candidate self-join)."""
    from mmeds_meta_spark.operators.dedup import dedup_minhash_lsh

    plan = _formatted_plan(dedup_minhash_lsh(spark, SF))
    # the windowed cap relation is restated once per self-join side (its
    # exchange is reused at runtime); the join-back form had ZERO Window
    # nodes and TWO joins (ok_buckets + self-join)
    assert 1 <= _nodes(plan, "Window") <= 2, plan
    assert (
        _nodes(plan, "(?:BroadcastHash|SortMerge|ShuffledHash)Join") == 1
    ), plan


def test_dsir_feature_fusion_is_value_identical(spark):
    """The fused unigram+bigram explode must yield the identical
    (doc_id, b, c) relation the former union-of-two-explodes produced
    (order never matters under the groupBy)."""
    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "x"), (3, "p q")],
        "doc_id LONG, text STRING",
    )
    d = docs.select("doc_id", F.split("text", " ").alias("a"))
    fused = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "concat(a, transform(slice(a, 1, size(a) - 1),"
                " (x, i) -> concat(x, ' ', a[i + 1])))"
            )
        ).alias("f"),
    )
    uni = d.select("doc_id", F.explode("a").alias("f"))
    big = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(a, 1, size(a) - 1),"
                " (x, i) -> concat(x, ' ', a[i + 1]))"
            )
        ).alias("f"),
    )
    agg = lambda df: sorted(  # noqa: E731
        df.groupBy("doc_id", "f").count().collect(),
        key=lambda r: (r.doc_id, r.f),
    )
    assert agg(fused) == agg(uni.unionByName(big))


def test_cc_seeded_init_components_canonical(spark):
    """The seeded fixpoint init (label₀ = min(v, min neighbor)) must land
    on the identical component labeling: every cluster_id is the
    component MIN, so it appears as its own member row."""
    from mmeds_meta_spark.operators.dedup import dedup_cluster_components

    rows = dedup_cluster_components(spark, SF).collect()
    ids = {r.doc_id: r.cluster_id for r in rows}
    assert rows, "sf0.001 must produce near-dup pairs"
    for doc, cl in ids.items():
        assert cl <= doc
        assert ids.get(cl) == cl, (doc, cl)


def test_bpe_train_checkpoints_ride_the_collects(spark):
    """The trainer's lineage-truncation checkpoints are LAZY: the next
    merge's argmax collect materializes them, so a full train runs at
    most warm-up + 2 jobs per merge (the eager form paid n/2 + 1 extra
    serial checkpoint jobs on top)."""
    from mmeds_meta_spark.operators.bpe import _N_MERGES, bpe_train

    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    bpe_train(spark, SF).collect()
    after = set(tracker.getJobIdsForGroup(None) or [])
    n_jobs = len(after - before)
    # measured: eager-checkpoint form 24 jobs, lazy form 19 (AQE stage
    # jobs included); 20 separates the two cleanly at every SF
    assert n_jobs <= 2 * _N_MERGES + 4, n_jobs
