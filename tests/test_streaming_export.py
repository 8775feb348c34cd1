"""Streaming export manifest: incremental per-shard checksums must equal
the batch exporter's manifest bit-for-bit over the same documents."""

from __future__ import annotations

import shutil

from conftest import SF_SMOKE

from mmeds_meta_spark.sources.shard_export import write_training_shards
from mmeds_meta_spark.streaming.export import (
    export_manifest_from_store,
    start_streaming_export_manifest,
)


def test_streaming_manifest_matches_batch_exporter(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    feed = tmp_path / "feed"
    feed.mkdir()
    # three plain files -> three availableNow micro-batches
    for name, pred in (
        ("a", "doc_id % 3 = 0"),
        ("b", "doc_id % 3 = 1"),
        ("c", "doc_id % 3 = 2"),
    ):
        out = tmp_path / f"third_{name}"
        docs.where(pred).coalesce(1).write.parquet(str(out))
        part = next(out.glob("part-*.parquet"))
        shutil.copy(part, feed / f"{name}.parquet")

    store = str(tmp_path / "store")
    q = start_streaming_export_manifest(
        spark, str(feed), store, str(tmp_path / "ck"), epoch=2, n_shards=4
    )
    q.awaitTermination(180)

    merged = {
        r.shard: (r.n_docs, r.n_chars, r.checksum)
        for r in export_manifest_from_store(spark, store).collect()
    }
    manifest = write_training_shards(docs, str(tmp_path / "batch"), epoch=2, n_shards=4)
    batch = {
        int(s): (v["n_docs"], None, v["checksum"])
        for s, v in manifest["shards"].items()
    }
    assert set(merged) == set(batch)
    for s in batch:
        assert merged[s][0] == batch[s][0], f"shard {s} doc count"
        assert merged[s][2] == batch[s][2], f"shard {s} checksum"
    assert sum(v[0] for v in merged.values()) == manifest["total_docs"]
