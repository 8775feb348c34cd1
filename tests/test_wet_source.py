"""WET (Common Crawl) data source: framing, gzip members, malformed tails."""

from __future__ import annotations

import gzip
import io

from mmeds_meta_spark.sources.wet import (
    iter_wet_records,
    register_wet_source,
    write_wet,
)

RECS = [
    {"uri": "https://a.example/1", "text": "hello world\nsecond line"},
    {"uri": "https://b.example/2", "text": "café — naïve ünïcode ✓"},
    {"uri": "https://c.example/3", "text": ""},
]


def test_wet_source_reads_directory_plain_and_gz(spark, tmp_path):
    d = tmp_path / "dump"
    d.mkdir()
    write_wet(RECS[:2], str(d / "seg-00000.wet"))
    write_wet(RECS[2:], str(d / "seg-00001.wet.gz"))
    register_wet_source(spark)
    df = spark.read.format("wet").load(str(d))
    rows = sorted(df.collect(), key=lambda r: (r.file, r.record_id))
    assert len(rows) == 3  # warcinfo records skipped, conversions kept
    assert [r.target_uri for r in rows] == [r["uri"] for r in RECS]
    assert rows[1].text == RECS[1]["text"]  # UTF-8 round-trip
    assert rows[1].content_length == len(RECS[1]["text"].encode("utf-8"))
    assert rows[1].n_chars == len(RECS[1]["text"])
    assert rows[2].text == "" and rows[2].n_chars == 0
    # file-granular partitions: one per input file
    assert df.rdd.getNumPartitions() == 2


def test_wet_gzip_members_concatenate(tmp_path):
    """CC writes one gzip member per record; gzip.open must stream them
    all as one logical file."""
    p = tmp_path / "multi.wet.gz"
    write_wet(RECS, str(p))
    with gzip.open(p, "rb") as fh:
        got = [r for r in iter_wet_records(fh)]
    assert len(got) == 4  # warcinfo + 3 conversions
    assert got[0]["headers"]["warc-type"] == "warcinfo"
    assert [g["headers"]["warc-type"] for g in got[1:]] == ["conversion"] * 3


def test_wet_truncated_payload_stops_cleanly():
    body = b"WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 100\r\n\r\nshort"
    got = list(iter_wet_records(io.BytesIO(body)))
    assert got == []  # truncated payload → stop, never a partial row


def test_wet_bad_length_and_lost_framing_stop_cleanly():
    bad_len = b"WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: NaN\r\n\r\nxx"
    assert list(iter_wet_records(io.BytesIO(bad_len))) == []
    lost = b"this is not a warc file\r\nWARC/1.0\r\n"
    assert list(iter_wet_records(io.BytesIO(lost))) == []


def test_wet_pipeline_composes_with_engine_ops(spark, tmp_path):
    """WET rows feed the curation operators directly (schema contract)."""
    import pyspark.sql.functions as F

    d = tmp_path / "dump2"
    d.mkdir()
    write_wet(
        [{"uri": f"u{i}", "text": f"tok{i % 2} common words here"} for i in range(10)],
        str(d / "seg.wet"),
    )
    register_wet_source(spark)
    df = spark.read.format("wet").load(str(d))
    # exact dedup over WET text — md5 groupBy, the engine's standard shape
    dups = (
        df.select(F.md5("text").alias("h"))
        .groupBy("h")
        .count()
        .filter("count > 1")
        .collect()
    )
    assert len(dups) == 2  # two alternating texts, 5 copies each
