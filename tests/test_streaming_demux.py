"""Streaming demux-QC store (streaming/demux.py): the streamed
per-sample validation report must equal the batch operator over the
concatenated feed bit-for-bit, replay and re-delivered lanes must fold
by set-union algebra, an un-fed store must read as the zero-read report,
and mid-stream kill-and-restart must converge."""

from __future__ import annotations

import os
import shutil
import time

from mmeds_meta_spark.operators.demux import (
    demux_reads_from_fastq,
    demux_validate,
)
from mmeds_meta_spark.streaming.demux import (
    _read_memberships,
    demux_store_reads,
    demux_validate_from_store,
    start_streaming_demux_store,
)

MAPPING = [
    ("sampleA", "CTCGACTT", "ATCGTACG"),
    ("sampleB", "GGAATTCC", "TTGGCCAA"),
    ("ghost", "AAAAAAAA", "CCCCCCCC"),
]


def _mapping_df(spark):
    return spark.createDataFrame(
        MAPPING, "sample_id string, fwd_bc string, rev_bc string"
    )


def _fastq_rows(spark, lane: int, n: int = 6):
    # lane-keyed deterministic reads: sampleA gets exact pairs, sampleB a
    # 1-error fwd on odd records and a 2-error rev on records % 3 == 0
    rows = []
    for i in range(n):
        rid = lane * 1000 + i
        if i % 2 == 0:
            f, fwd, rev = "sampleA_1.fastq", "CTCGACTT", "ATCGTACG"
        else:
            fwd = "GGAATTCA" if i % 4 == 1 else "GGAATTCC"
            rev = "TTGGCCTT" if i % 3 == 0 else "TTGGCCAA"
            f = "sampleB_1.fastq"
        rows.append(
            (f, rid, f"M00914:50:0-J:1:1101:{rid}:1663 1:N:0:{fwd}-{rev}", "ACGT", "BBBB")
        )
    return spark.createDataFrame(
        rows, "file string, record_id long, header string, seq string, qual string"
    )


def _write_feed(spark, tmp_path, lanes=(0, 1)):
    feed = tmp_path / "feed"
    feed.mkdir()
    for lane in lanes:
        out = tmp_path / f"lane_{lane}"
        _fastq_rows(spark, lane).coalesce(1).write.parquet(str(out))
        part = next(out.glob("part-*.parquet"))
        shutil.copy(part, feed / f"lane_{lane}.parquet")
    return str(feed)


def _batch_report(spark, lanes=(0, 1)):
    allrows = _fastq_rows(spark, lanes[0])
    for lane in lanes[1:]:
        allrows = allrows.unionByName(_fastq_rows(spark, lane))
    return sorted(
        tuple(r)
        for r in demux_validate(
            demux_reads_from_fastq(allrows), _mapping_df(spark)
        ).collect()
    )


def test_streamed_report_equals_batch_operator(spark, tmp_path):
    feed = _write_feed(spark, tmp_path)
    store = str(tmp_path / "store")
    q = start_streaming_demux_store(spark, feed, store, str(tmp_path / "ck"))
    q.awaitTermination(180)
    streamed = sorted(
        tuple(r)
        for r in demux_validate_from_store(spark, store, _mapping_df(spark)).collect()
    )
    assert streamed == _batch_report(spark) and streamed


def test_unfed_store_reads_as_zero_report(spark, tmp_path):
    store = str(tmp_path / "never_fed")
    assert demux_store_reads(spark, store).collect() == []
    rep = {
        r["sample_id"]: r
        for r in demux_validate_from_store(spark, store, _mapping_df(spark)).collect()
    }
    # mapping samples still reported, all-zero (the validate contract)
    assert set(rep) == {s for s, _, _ in MAPPING}
    assert all(r["n_reads"] == 0 for r in rep.values())


def test_replay_and_redelivered_lane_fold_once(spark, tmp_path):
    # same lane content under two batch ids (crash replay) AND a
    # re-delivered lane: both fold to one membership per read_uid
    m = _read_memberships(_fastq_rows(spark, 0))
    store = str(tmp_path / "store")
    m.coalesce(1).write.parquet(f"{store}/batch_id=0")
    m.coalesce(1).write.parquet(f"{store}/batch_id=1")
    twice = sorted(
        tuple(r)
        for r in demux_validate_from_store(spark, store, _mapping_df(spark)).collect()
    )
    once_store = str(tmp_path / "store_once")
    m.coalesce(1).write.parquet(f"{once_store}/batch_id=0")
    once = sorted(
        tuple(r)
        for r in demux_validate_from_store(
            spark, once_store, _mapping_df(spark)
        ).collect()
    )
    assert twice == once and once


def test_mid_stream_kill_and_restart_converges(spark, tmp_path):
    feed = _write_feed(spark, tmp_path, lanes=(0, 1, 2))
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    q = start_streaming_demux_store(spark, feed, store, ck)
    deadline = time.time() + 180
    while time.time() < deadline:
        if os.path.isdir(os.path.join(store, "batch_id=0")):
            break
        time.sleep(0.05)
    q.stop()
    q2 = start_streaming_demux_store(spark, feed, store, ck)
    q2.awaitTermination(180)
    streamed = sorted(
        tuple(r)
        for r in demux_validate_from_store(spark, store, _mapping_df(spark)).collect()
    )
    assert streamed == _batch_report(spark, lanes=(0, 1, 2)) and streamed
