"""Stream-stream attribution join matches the batch range join's pairs."""

from __future__ import annotations

import shutil

import pytest

import pyspark.sql.functions as F

from conftest import SF_SMOKE


@pytest.fixture()
def events_dir(tmp_path):
    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "events.parquet")
    return str(d)


def test_stream_stream_attribution_matches_batch(spark, events_dir, tmp_path):
    from mmeds_meta_spark.streaming.joins import streaming_attribution_join

    q = (
        streaming_attribution_join(spark, events_dir)
        .writeStream.format("memory")
        .queryName("attr_join_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_attr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.purchase_id, r.follow_id)
        for r in spark.sql("SELECT * FROM attr_join_test").collect()
    }

    from mmeds_meta_spark.functions.event_time import event_ts

    raw = spark.read.parquet(events_dir)
    ev = raw.withColumn("event_ts", event_ts(raw.schema))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("event_ts").alias("p_ts"),
    )
    e = ev.select(
        F.col("event_id").alias("follow_id"),
        F.col("user_id").alias("e_user"),
        F.col("event_ts").alias("e_ts"),
    )
    want = {
        (r.purchase_id, r.follow_id)
        for r in p.join(
            e,
            F.expr(
                "p_user = e_user AND e_ts > p_ts"
                " AND e_ts <= p_ts + INTERVAL 10 minutes"
            ),
        ).collect()
    }
    assert want, "batch join found no pairs — fixture too sparse"
    # inner stream-stream join on a finite availableNow feed emits every
    # batch match exactly once
    assert got == want
