"""The streaming intake pipeline must emit EXACTLY the batch twin's rows:
same function, same expressions, two execution modes."""

from __future__ import annotations

import shutil

from conftest import SF_SMOKE

from mmeds_meta_spark.streaming.ingest import ingest_profile, streaming_ingest


def test_streaming_matches_batch(spark, tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/documents.parquet", d / "documents.parquet")
    docs_dir = str(d)
    q = (
        streaming_ingest(spark, docs_dir)
        .writeStream.format("memory")
        .queryName("ingest_profile_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(
        map(tuple, spark.sql("SELECT * FROM ingest_profile_stream").collect())
    )
    batch = sorted(
        map(tuple, ingest_profile(spark.read.parquet(docs_dir)).collect())
    )
    assert streamed == batch
    assert len(batch) > 0
    # split fractions are deterministic: every doc_id lands where md5 says
    splits = {r[-1] for r in batch}
    assert splits <= {"train", "eval"}


def test_streaming_hll_matches_batch(spark, tmp_path):
    """The streaming register store fed the same documents must yield the
    batch operator's BIT-IDENTICAL estimate row — HLL merge (per-bucket
    MAX) is order- and slicing-insensitive."""
    import pyspark.sql.functions as F

    from mmeds_meta_spark.operators.sketches import sketch_hll_distinct
    from mmeds_meta_spark.streaming.sketches import hll_estimate, start_streaming_hll

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    feed = tmp_path / "feed"
    feed.mkdir()
    docs.filter(F.col("doc_id") < 250).coalesce(1).write.parquet(str(tmp_path / "w0"))
    docs.filter(F.col("doc_id") >= 250).coalesce(1).write.parquet(str(tmp_path / "w1"))
    for i, wave in enumerate(sorted(tmp_path.glob("w[01]/*.parquet"))):
        shutil.move(str(wave), str(feed / f"w{i}.parquet"))

    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    sq = start_streaming_hll(spark, str(feed), store_dir=store, checkpoint_dir=ck)
    sq.awaitTermination(120)

    streamed = hll_estimate(spark, store).collect()
    batch = sketch_hll_distinct(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]


def test_streaming_incremental_dedup_matches_batch(spark, tmp_path):
    """Micro-batched incremental dedup over a growing signature store must
    discover exactly the batch operator's full pair set, regardless of
    arrival order — each pair surfaces when its later document lands."""
    import pyspark.sql.functions as F

    from conftest import SF_SMOKE
    from mmeds_meta_spark.operators.dedup import dedup_simhash
    from mmeds_meta_spark.streaming.incremental_dedup import start_incremental_dedup

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    feed = tmp_path / "feed"
    feed.mkdir()
    # two arrival waves → at least two micro-batches (maxFilesPerTrigger=1
    # is a file-source option; two separate files suffice here)
    docs.filter(F.col("doc_id") < 250).coalesce(1).write.parquet(str(feed / "wave0"))
    docs.filter(F.col("doc_id") >= 250).coalesce(1).write.parquet(str(feed / "wave1"))
    # flatten: file source watches one dir of files
    import shutil

    for i, wave in enumerate(sorted(feed.glob("wave*/*.parquet"))):
        shutil.move(str(wave), str(feed / f"w{i}.parquet"))
    shutil.rmtree(feed / "wave0")
    shutil.rmtree(feed / "wave1")

    store, pairs, ck = (str(tmp_path / d) for d in ("store", "pairs", "ck"))
    sq = start_incremental_dedup(
        spark,
        str(feed),
        store_dir=store,
        pairs_dir=pairs,
        checkpoint_dir=ck,
        max_files_per_trigger=1,
    )
    sq.awaitTermination(180)

    got = sorted(
        map(tuple, spark.read.parquet(pairs).select("doc_a", "doc_b", "hamming").collect())
    )
    expected = sorted(map(tuple, dedup_simhash(spark, SF_SMOKE).collect()))
    assert got == expected
    # ≥2 micro-batches actually ran (the store has ≥2 batch partitions)
    import os

    batch_dirs = [d for d in os.listdir(store) if d.startswith("batch_id=")]
    assert len(batch_dirs) >= 2

    # checkpoint-replay idempotence: re-process the LAST batch with the
    # same batch id (its signatures already sit in the store, exactly the
    # crash-before-commit state) — pair set must not change
    from mmeds_meta_spark.streaming.incremental_dedup import process_batch

    last_id = max(int(d.split("=")[1]) for d in batch_dirs)
    last_docs = spark.read.parquet(str(feed / f"w{last_id}.parquet"))
    process_batch(last_docs, last_id, store_dir=store, pairs_dir=pairs)
    replayed = sorted(
        map(tuple, spark.read.parquet(pairs).select("doc_a", "doc_b", "hamming").collect())
    )
    assert replayed == expected


def test_streaming_cms_matches_batch(spark, tmp_path):
    """The batch-partitioned CMS counter store fed the same documents in
    two micro-batches must SUM to the batch counter table exactly
    (counts are linear), and restarting the finished stream on the same
    checkpoint must not double-count."""
    import pyspark.sql.functions as F

    from mmeds_meta_spark.operators.sketches import cms_counters
    from mmeds_meta_spark.streaming.sketches import (
        cms_store_counters,
        start_streaming_cms,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    feed = tmp_path / "feed"
    feed.mkdir()
    docs.filter(F.col("doc_id") < 250).coalesce(1).write.parquet(str(tmp_path / "w0"))
    docs.filter(F.col("doc_id") >= 250).coalesce(1).write.parquet(str(tmp_path / "w1"))
    for i, wave in enumerate(sorted(tmp_path.glob("w[01]/*.parquet"))):
        shutil.move(str(wave), str(feed / f"w{i}.parquet"))

    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    sq = start_streaming_cms(spark, str(feed), store_dir=store, checkpoint_dir=ck)
    sq.awaitTermination(120)

    want = sorted(map(tuple, cms_counters(docs).collect()))
    got = sorted(map(tuple, cms_store_counters(spark, store).collect()))
    assert got == want

    # restart on the same checkpoint: no new files -> no new partitions,
    # totals unchanged (replay safety is partition-keyed idempotence)
    sq2 = start_streaming_cms(spark, str(feed), store_dir=store, checkpoint_dir=ck)
    sq2.awaitTermination(120)
    again = sorted(map(tuple, cms_store_counters(spark, store).collect()))
    assert again == want


def test_streaming_mixture_matches_batch(spark, tmp_path):
    """The batch-keyed mixture store fed the same documents in two
    micro-batches must reproduce the batch concentration profile
    bit-for-bit (counts are linear; the profile expressions are shared),
    and restarting the finished stream must not double-count."""
    import pyspark.sql.functions as F

    from mmeds_meta_spark.operators.sampling import mixture_profile
    from mmeds_meta_spark.streaming.mixture import (
        mixture_store_profile,
        start_streaming_mixture,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    feed = tmp_path / "feed"
    feed.mkdir()
    docs.filter(F.col("doc_id") < 250).coalesce(1).write.parquet(str(tmp_path / "w0"))
    docs.filter(F.col("doc_id") >= 250).coalesce(1).write.parquet(str(tmp_path / "w1"))
    for i, wave in enumerate(sorted(tmp_path.glob("w[01]/*.parquet"))):
        shutil.move(str(wave), str(feed / f"w{i}.parquet"))

    store, ck = str(tmp_path / "mstore"), str(tmp_path / "mck")
    sq = start_streaming_mixture(spark, str(feed), store_dir=store, checkpoint_dir=ck)
    sq.awaitTermination(120)

    want = sorted(
        map(
            tuple,
            mixture_profile(
                docs.groupBy("source").agg(
                    F.expr("CAST(COUNT(*) AS BIGINT)").alias("x")
                )
            ).collect(),
        )
    )
    got = sorted(map(tuple, mixture_store_profile(spark, store).collect()))
    assert got == want
    assert len(want) == 1 and want[0][0] > 0  # n_sources

    sq2 = start_streaming_mixture(spark, str(feed), store_dir=store, checkpoint_dir=ck)
    sq2.awaitTermination(120)
    again = sorted(map(tuple, mixture_store_profile(spark, store).collect()))
    assert again == want
