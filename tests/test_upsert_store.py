"""Hash-bucketed parquet upsert: MERGE semantics, bounded rewrite."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from conftest import SF_SMOKE


def test_upsert_merge_semantics_and_bounded_rewrite(spark, tmp_path):
    from mmeds_meta_spark.sources.upsert_store import HashPartitionedStore

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    store = HashPartitionedStore(spark, str(tmp_path / "store"), n_buckets=8)
    store.write_initial(docs)
    assert store.read().count() == docs.count()

    # batch: update 3 existing docs (same bucket keys), insert 2 new
    updates = docs.filter(F.col("doc_id").isin(0, 8, 16)).withColumn(
        "text", F.lit("UPDATED")
    )
    inserts = spark.createDataFrame(
        [(100001, "new one", "en", "srcX", 7), (100002, "new two", "en", "srcX", 7)],
        docs.schema,
    )
    batch = updates.unionByName(inserts)

    before = {
        d: sorted(os.listdir(tmp_path / "store" / d))
        for d in os.listdir(tmp_path / "store")
    }
    report = store.upsert(batch)
    # doc_ids 0,8,16 -> bucket 0; 100001 -> 1; 100002 -> 2 (mod 8)
    assert report["buckets_touched"] == 3

    after = store.read()
    assert after.count() == docs.count() + 2
    got = {r.doc_id: r.text for r in after.filter(F.col("doc_id").isin(0, 8, 16, 100001)).collect()}
    assert got[0] == got[8] == got[16] == "UPDATED"
    assert got[100001] == "new one"

    # untouched buckets were not rewritten (identical file listings)
    for d, files in before.items():
        k = int(d.split("=")[1])
        if k not in (0, 1, 2):
            assert sorted(os.listdir(tmp_path / "store" / d)) == files


def test_upsert_into_empty_bucket(spark, tmp_path):
    from mmeds_meta_spark.sources.upsert_store import HashPartitionedStore

    store = HashPartitionedStore(spark, str(tmp_path / "s2"), n_buckets=4)
    batch = spark.createDataFrame(
        [(5, "a", "en", "s", 1)], "doc_id long, text string, lang string, source string, n_chars long"
    )
    store.upsert(batch)
    assert store.read().count() == 1


def test_streaming_cdc_upsert(spark, tmp_path):
    import shutil as _sh

    import pyspark.sql.functions as F

    from mmeds_meta_spark.sources.upsert_store import (
        HashPartitionedStore,
        start_streaming_upsert,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    feed = tmp_path / "feed"
    feed.mkdir()
    # wave 0: docs 0..249; wave 1: docs 200..299 with updated text
    docs.filter(F.col("doc_id") < 250).coalesce(1).write.parquet(str(tmp_path / "w0"))
    docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 300)).withColumn(
        "text", F.lit("V2")
    ).coalesce(1).write.parquet(str(tmp_path / "w1"))
    for i, wave in enumerate(sorted(tmp_path.glob("w[01]/*.parquet"))):
        _sh.move(str(wave), str(feed / f"w{i}.parquet"))

    store = HashPartitionedStore(spark, str(tmp_path / "cdc_store"), n_buckets=4)
    q = start_streaming_upsert(
        spark, str(feed), store, str(tmp_path / "ck"), docs.schema
    )
    q.awaitTermination(180)

    final = store.read()
    assert final.count() == 300  # 0..299, no duplicates
    v2 = final.filter(F.col("text") == "V2").select("doc_id").collect()
    assert {r.doc_id for r in v2} == set(range(200, 300))


def test_read_never_serves_swap_artifacts(spark, tmp_path):
    """A reader listing mid-upsert must skip bucket=K__tmp/__old (would
    double-serve that bucket's rows)."""
    from mmeds_meta_spark.sources.upsert_store import HashPartitionedStore

    root = tmp_path / "s3"
    store = HashPartitionedStore(spark, str(root), n_buckets=2)
    batch = spark.createDataFrame(
        [(0, "a", "en", "s", 1), (1, "b", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    store.write_initial(batch)
    # simulate an in-flight swap: tmp committed to disk, renames pending
    store.read().filter(F.col("doc_id") == 0).write.parquet(
        str(root / "bucket=0__tmp")
    )
    assert store.read().count() == 2  # not 3


def test_crash_recovery_promotes_tmp(spark, tmp_path):
    """Crash between the two renames: only __old + __tmp on disk.  Init
    must promote __tmp (the complete merged bucket), not resurrect __old
    or drop the bucket."""
    import os as _os

    from mmeds_meta_spark.sources.upsert_store import HashPartitionedStore

    root = tmp_path / "s4"
    store = HashPartitionedStore(spark, str(root), n_buckets=2)
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    store.write_initial(
        spark.createDataFrame([(0, "old", "en", "s", 1), (1, "b", "en", "s", 1)], schema)
    )
    # hand-build the mid-swap state for bucket 0
    spark.createDataFrame([(0, "new", "en", "s", 1)], schema).write.parquet(
        str(root / "bucket=0__tmp")
    )
    _os.rename(str(root / "bucket=0"), str(root / "bucket=0__old"))

    recovered = HashPartitionedStore(spark, str(root), n_buckets=2)
    got = {r.doc_id: r.text for r in recovered.read().collect()}
    assert got == {0: "new", 1: "b"}
    assert not any(
        d.endswith("__tmp") or d.endswith("__old") for d in _os.listdir(root)
    )
