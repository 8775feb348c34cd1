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
