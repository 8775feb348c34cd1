"""pipeline_ccnet_funnel (round 12): the composed CCNet pipeline —
stage coherence against the standalone entries it is built from."""

from __future__ import annotations

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.dedup import dedup_paragraphs_ccnet
from mmeds_meta_spark.operators.pipeline import pipeline_ccnet_funnel


def test_ccnet_funnel_stage_coherence(spark):
    rows = pipeline_ccnet_funnel(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    by = {(r.lang, r.ccnet_bucket): r for r in rows}
    langs = {l for l, _ in by}
    buckets = {b for _, b in by}
    assert buckets <= {"head", "middle", "tail"}
    # tercile rule: per language, head <= n/3 and head+middle <= 2n/3
    for lang in langs:
        n = sum(r.n_docs for (l, _), r in by.items() if l == lang)
        head = sum(r.n_docs for (l, b), r in by.items() if l == lang and b == "head")
        mid = sum(r.n_docs for (l, b), r in by.items() if l == lang and b == "middle")
        assert head * 3 <= n
        assert (head + mid) * 3 <= 2 * n
    # total paragraphs removed equals the standalone dedup entry's total
    want_removed = sum(
        r.n_removed for r in dedup_paragraphs_ccnet(spark, SF_SMOKE).collect()
    )
    got_removed = sum(r.n_removed_paras for r in rows)
    assert got_removed == want_removed and want_removed > 0
    # every document lands in exactly one (lang, bucket) cell
    n_docs_total = sum(r.n_docs for r in rows)
    assert n_docs_total == dedup_paragraphs_ccnet(spark, SF_SMOKE).count()


def test_ccnet_funnel_deterministic(spark):
    a = sorted(tuple(r) for r in pipeline_ccnet_funnel(spark, SF_SMOKE).collect())
    b = sorted(tuple(r) for r in pipeline_ccnet_funnel(spark, SF_SMOKE).collect())
    assert a == b
