"""Streaming Bloom decontamination store: the streamed filter must probe
identically to the batch operator, and replaying a batch must be a
no-op (set-bit union is idempotent)."""

from __future__ import annotations

import shutil

from conftest import SF_SMOKE

from mmeds_meta_spark.operators import registry
from mmeds_meta_spark.operators.dedup import _BENCH_MOD
from mmeds_meta_spark.streaming.decon_bloom import (
    _positions,
    bloom_store_bits,
    probe_with_store,
    start_streaming_bloom_bench,
)


def test_streamed_filter_probes_like_batch_operator(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    bench = docs.where(f"doc_id % {_BENCH_MOD} = 0")
    corpus = docs.where(f"doc_id % {_BENCH_MOD} != 0")

    feed = tmp_path / "feed"
    feed.mkdir()
    # two plain files -> two availableNow micro-batches
    for name, pred in (("a", "doc_id % 2 = 0"), ("b", "doc_id % 2 = 1")):
        out = tmp_path / f"half_{name}"
        bench.where(pred).coalesce(1).write.parquet(str(out))
        part = next(out.glob("part-*.parquet"))
        shutil.copy(part, feed / f"{name}.parquet")

    store = str(tmp_path / "store")
    q = start_streaming_bloom_bench(spark, str(feed), store, str(tmp_path / "ck"))
    q.awaitTermination(180)

    # streamed bit set == batch-built bit set (the OR-fold is exact)
    streamed = {r.pos for r in bloom_store_bits(spark, store).collect()}
    batch = {r.pos for r in _positions(bench).collect()}
    assert streamed == batch and streamed

    got = {
        r.doc_id: (r.n_shingles, r.n_bloom_hits, r.hit_ratio)
        for r in probe_with_store(spark, store, corpus).collect()
    }
    want = {
        r.doc_id: (r.n_shingles, r.n_bloom_hits, r.hit_ratio)
        for r in registry()["decon_bloom_filter"].spark(spark, SF_SMOKE).collect()
    }
    assert got == want and want  # identical flags, counts, and ratios


def test_replaying_a_batch_is_a_no_op(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    bench = docs.where(f"doc_id % {_BENCH_MOD} = 0")
    store = str(tmp_path / "store")
    # simulate a replay: the same batch content written under two ids
    _positions(bench).coalesce(1).write.parquet(f"{store}/batch_id=0")
    _positions(bench).coalesce(1).write.parquet(f"{store}/batch_id=1")
    once = {r.pos for r in bloom_store_bits(spark, store).collect()}
    assert once == {r.pos for r in _positions(bench).collect()}
