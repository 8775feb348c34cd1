"""Streaming diversity store: merged counts must reproduce every batch
alpha metric bit-for-bit over the same events."""

from __future__ import annotations

import shutil

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.diversity import (
    d1_shannon_diversity,
    d15_chao1_coverage,
    d17_pielou_evenness,
)
from mmeds_meta_spark.streaming.diversity import (
    alpha_from_counts,
    diversity_store_counts,
    start_streaming_diversity,
)


def test_streamed_alpha_metrics_match_batch(spark, tmp_path):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    for name, pred in (("a", "event_id % 2 = 0"), ("b", "event_id % 2 = 1")):
        out = tmp_path / f"half_{name}"
        ev.where(pred).coalesce(1).write.parquet(str(out))
        part = next(out.glob("part-*.parquet"))
        shutil.copy(part, feed / f"{name}.parquet")

    store = str(tmp_path / "store")
    q = start_streaming_diversity(spark, str(feed), store, str(tmp_path / "ck"))
    q.awaitTermination(180)

    got = {
        r.user_id: r for r in alpha_from_counts(diversity_store_counts(spark, store)).collect()
    }
    sh = {r.user_id: r for r in d1_shannon_diversity(spark, SF_SMOKE).collect()}
    ev17 = {r.user_id: r for r in d17_pielou_evenness(spark, SF_SMOKE).collect()}
    ch = {r.user_id: r for r in d15_chao1_coverage(spark, SF_SMOKE).collect()}
    assert set(got) == set(sh) == set(ev17) == set(ch)
    for u, r in got.items():
        assert r.n_features == sh[u].n_features
        assert r.shannon == sh[u].shannon  # bit-identical, not approximate
        assert r.pielou_evenness == ev17[u].pielou_evenness
        assert r.chao1 == ch[u].chao1
        assert r.goods_coverage == ch[u].goods_coverage
