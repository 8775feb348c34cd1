"""Shard export: determinism, manifest round-trip, corruption detection."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from conftest import SF_SMOKE

from mmeds_meta_spark.sources.shard_export import (
    _MOD,
    validate_shards,
    write_training_shards,
)
from mmeds_meta_spark.testdata import table as _t


def test_write_then_validate_roundtrip(spark, tmp_path):
    d = _t(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "export")
    manifest = write_training_shards(d, out, epoch=1, n_shards=4)
    assert manifest["total_docs"] == d.count()
    assert set(manifest["shards"]) <= {str(i) for i in range(4)}
    assert all(0 <= v["checksum"] < _MOD for v in manifest["shards"].values())
    # the on-disk manifest equals the returned one
    with open(os.path.join(out, "_manifest.json")) as fh:
        assert json.load(fh) == manifest
    rows = validate_shards(spark, out).collect()
    assert len(rows) == len(manifest["shards"])
    assert all(r.ok for r in rows)
    # in-shard order is the shuffle key order (resumable readers rely on it)
    one = spark.read.parquet(os.path.join(out, "data")).filter("shard = %d" % int(next(iter(manifest["shards"]))))
    keys = [r.key for r in one.collect()]
    assert keys == sorted(keys)


def test_export_is_epoch_deterministic(spark, tmp_path):
    d = _t(spark, SF_SMOKE, "documents")
    m1 = write_training_shards(d, str(tmp_path / "a"), epoch=3, n_shards=4)
    m2 = write_training_shards(d, str(tmp_path / "b"), epoch=3, n_shards=4)
    assert m1 == m2  # same epoch → bit-identical manifest
    m3 = write_training_shards(d, str(tmp_path / "c"), epoch=4, n_shards=4)
    assert m3["total_docs"] == m1["total_docs"]
    assert m3["shards"] != m1["shards"]  # different epoch → different shuffle


def test_validation_flags_only_the_corrupted_shard(spark, tmp_path):
    d = _t(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "export")
    write_training_shards(d, out, epoch=0, n_shards=4)
    # corrupt shard 2: rewrite it with one document's text altered
    sdir = os.path.join(out, "data", "shard=2")
    df2 = spark.read.parquet(sdir)
    key0 = df2.orderBy("key").first().key
    corrupted = df2.withColumn(
        "text",
        F.when(F.col("key") == key0, F.concat(F.col("text"), F.lit(" TAMPERED")))
        .otherwise(F.col("text")),
    )
    corrupted.write.mode("overwrite").parquet(str(tmp_path / "swap"))
    import shutil

    shutil.rmtree(sdir)
    shutil.copytree(str(tmp_path / "swap"), sdir)
    got = {r.shard: r for r in validate_shards(spark, out).collect()}
    assert not got[2].ok and not got[2].checksum_match
    assert got[2].n_docs_expected == got[2].n_docs_found  # count alone can't see it
    for s in (0, 1, 3):
        assert got[s].ok


def test_validation_flags_missing_rows(spark, tmp_path):
    d = _t(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "export")
    write_training_shards(d, out, epoch=0, n_shards=4)
    sdir = os.path.join(out, "data", "shard=1")
    df1 = spark.read.parquet(sdir)
    trimmed = df1.orderBy("key").limit(df1.count() - 1)
    trimmed.write.mode("overwrite").parquet(str(tmp_path / "swap2"))
    import shutil

    shutil.rmtree(sdir)
    shutil.copytree(str(tmp_path / "swap2"), sdir)
    got = {r.shard: r for r in validate_shards(spark, out).collect()}
    assert not got[1].ok
    assert got[1].n_docs_found == got[1].n_docs_expected - 1
