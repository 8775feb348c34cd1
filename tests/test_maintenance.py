"""Compaction: fragmented directory -> size-targeted files, same rows."""

from __future__ import annotations

from conftest import SF_SMOKE


def test_compact_parquet_roundtrip_and_count(spark, tmp_path):
    from mmeds_meta_spark.sources.maintenance import compact_parquet, parquet_dir_stats

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    frag = tmp_path / "fragmented"
    docs.repartition(37).write.parquet(str(frag))
    n_before, _ = parquet_dir_stats(str(frag))
    assert n_before == 37

    out = tmp_path / "compacted"
    report = compact_parquet(spark, str(frag), str(out), target_file_mb=128)
    assert report["files_before"] == 37
    assert report["files_after"] == report["target_files"] == 1  # tiny table -> 1 file

    want = sorted(map(tuple, docs.collect()))
    got = sorted(map(tuple, spark.read.parquet(str(out)).collect()))
    assert got == want


def test_compact_clustered_prunes(spark, tmp_path):
    from mmeds_meta_spark.sources.maintenance import compact_parquet

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    frag = tmp_path / "frag2"
    docs.repartition(10).write.parquet(str(frag))
    out = tmp_path / "clustered"
    # force multiple output files so range clustering is observable
    report = compact_parquet(
        spark, str(frag), str(out), target_file_mb=1, cluster_by=["doc_id"]
    )
    n = report["files_after"]
    back = spark.read.parquet(str(out))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))
    if n > 1:
        # range clustering: per-file doc_id ranges must not overlap
        import pyspark.sql.functions as F

        ranges = (
            back.withColumn("f", F.input_file_name())
            .groupBy("f")
            .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
            .collect()
        )
        spans = sorted((r.lo, r.hi) for r in ranges)
        for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
            assert hi1 < lo2
