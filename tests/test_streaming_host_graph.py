"""Streaming host-graph store: the streamed rankings must equal the
batch operators over the concatenated feed bit-for-bit, replay must be
a no-op by set-union algebra (edge weights derive from distinct link
memberships, never from summed partials), and an un-fed store must
read as an empty ranking."""

from __future__ import annotations

import shutil

from conftest import SF_SMOKE

from mmeds_meta_spark.operators import registry
from mmeds_meta_spark.streaming.host_graph import (
    harmonic_from_store,
    host_edges_from_store,
    pagerank_from_store,
    start_streaming_link_store,
)


def _feed(spark, tmp_path, preds):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    feed = tmp_path / "feed"
    feed.mkdir()
    for name, pred in preds:
        out = tmp_path / f"part_{name}"
        docs.where(pred).coalesce(1).write.parquet(str(out))
        part = next(out.glob("part-*.parquet"))
        shutil.copy(part, feed / f"{name}.parquet")
    return str(feed)


def test_streamed_rankings_equal_batch_operators(spark, tmp_path):
    # two micro-batches whose link sets overlap on every host, so the
    # read-side cross-batch weight aggregation is actually exercised
    feed = _feed(spark, tmp_path, (("a", "doc_id % 2 = 0"), ("b", "doc_id % 2 = 1")))
    store = str(tmp_path / "store")
    q = start_streaming_link_store(spark, feed, store, str(tmp_path / "ck"))
    q.awaitTermination(180)

    reg = registry()
    for streamed_fn, batch_name in (
        (pagerank_from_store, "web_host_pagerank"),
        (harmonic_from_store, "web_host_harmonic"),
    ):
        streamed = sorted(tuple(r) for r in streamed_fn(spark, store).collect())
        batch = sorted(
            tuple(r) for r in reg[batch_name].spark(spark, SF_SMOKE).collect()
        )
        assert streamed == batch and streamed


def test_unfed_store_reads_as_empty_ranking(spark, tmp_path):
    store = str(tmp_path / "never_fed")
    assert host_edges_from_store(spark, store).collect() == []
    assert pagerank_from_store(spark, store).collect() == []


def test_replayed_batch_is_a_no_op(spark, tmp_path):
    # exactly-once under replay by ALGEBRA: the store holds distinct
    # (src, dst, doc_id, slot) memberships — a set-union monoid — so the
    # same batch content landing under TWO batch ids (a crash between
    # store commit and checkpoint commit) must not change any edge weight
    from mmeds_meta_spark.streaming.host_graph import _link_memberships

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    store = str(tmp_path / "store")
    pairs = _link_memberships(docs)
    pairs.coalesce(1).write.parquet(f"{store}/batch_id=0")
    pairs.coalesce(1).write.parquet(f"{store}/batch_id=1")
    twice = sorted(tuple(r) for r in pagerank_from_store(spark, store).collect())
    once_store = str(tmp_path / "store_once")
    pairs.coalesce(1).write.parquet(f"{once_store}/batch_id=0")
    once = sorted(tuple(r) for r in pagerank_from_store(spark, once_store).collect())
    assert twice == once and once


def test_slot_keeps_same_host_double_links(spark):
    # a document whose two outlinks hit the SAME host must contribute
    # weight 2, exactly as the batch explode does — the slot column is
    # what keeps the membership set faithful to that multiset
    from mmeds_meta_spark.streaming.host_graph import _link_memberships

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    m = _link_memberships(docs)
    doubled = (
        m.groupBy("src_host", "dst_host", "doc_id")
        .count()
        .filter("count = 2")
        .count()
    )
    assert doubled > 0  # the synth workload really produces such docs


def test_mid_stream_kill_and_restart_converges(spark, tmp_path):
    import os
    import time

    feed = _feed(
        spark,
        tmp_path,
        (("a", "doc_id % 3 = 0"), ("b", "doc_id % 3 = 1"), ("c", "doc_id % 3 = 2")),
    )
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    q = start_streaming_link_store(spark, feed, store, ck)
    deadline = time.time() + 180
    while time.time() < deadline:
        if os.path.isdir(os.path.join(store, "batch_id=0")):
            break
        time.sleep(0.05)
    q.stop()

    q2 = start_streaming_link_store(spark, feed, store, ck)
    q2.awaitTermination(180)

    streamed = sorted(tuple(r) for r in pagerank_from_store(spark, store).collect())
    batch = sorted(
        tuple(r)
        for r in registry()["web_host_pagerank"].spark(spark, SF_SMOKE).collect()
    )
    assert streamed == batch and streamed


def test_duplicate_doc_folds_once(spark, tmp_path):
    # a RE-INGESTED document (same doc_id in two different batches — a
    # re-crawl or replayed segment) folds to ONE edge contribution via
    # the membership distinct; the batch operator over a feed containing
    # it twice would double its edge weights.  This pins the documented
    # one-vote-per-document semantics (module docstring).
    from mmeds_meta_spark.streaming.host_graph import (
        _link_memberships,
        host_edges_from_store,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    dup = docs.limit(1)  # one document re-ingested in a later batch
    store = str(tmp_path / "store_dup")
    _link_memberships(docs).coalesce(1).write.parquet(f"{store}/batch_id=0")
    _link_memberships(dup).coalesce(1).write.parquet(f"{store}/batch_id=1")
    with_dup = sorted(
        tuple(r) for r in host_edges_from_store(spark, store).collect()
    )
    clean = str(tmp_path / "store_clean")
    _link_memberships(docs).coalesce(1).write.parquet(f"{clean}/batch_id=0")
    without = sorted(
        tuple(r) for r in host_edges_from_store(spark, clean).collect()
    )
    assert with_dup == without and without


def test_streamed_hll_ranking_equals_batch(spark, tmp_path):
    # the HyperBall sketch read over the store equals the batch sketch
    # over the same graph bit-for-bit (deterministic registers + the
    # store's set-union algebra compose: both folds are idempotent)
    from mmeds_meta_spark.operators.web import web_host_harmonic_hll
    from mmeds_meta_spark.streaming.host_graph import (
        harmonic_hll_from_store,
        start_streaming_link_store,
    )

    feed = _feed(
        spark, tmp_path, (("a", "doc_id % 2 = 0"), ("b", "doc_id % 2 = 1"))
    )
    store = str(tmp_path / "store_hll")
    q = start_streaming_link_store(spark, feed, store, str(tmp_path / "ck_hll"))
    q.awaitTermination(180)
    streamed = sorted(
        tuple(r) for r in harmonic_hll_from_store(spark, store).collect()
    )
    batch = sorted(
        tuple(r) for r in web_host_harmonic_hll(spark, SF_SMOKE).collect()
    )
    assert streamed == batch and streamed
