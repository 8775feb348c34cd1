"""Streaming crawl ingest (sources/wet.py CrawlStreamReader): the warc/
wet formats as Structured Streaming sources — filename-watermark
offsets, incremental micro-batches as segments arrive, checkpoint
resume without re-reads, and the extract chain over the stream."""

from __future__ import annotations

import pyspark.sql.functions as F

from mmeds_meta_spark.operators.html import html_extract
from mmeds_meta_spark.sources.wet import (
    register_warc_source,
    register_wet_source,
    write_warc,
    write_wet,
)

PAGES = [
    {"uri": "https://a.example/", "html": "<p>first page body that is long enough to keep around.</p>"},
    {"uri": "https://b.example/", "html": "<p>second page body, also long enough to keep around!</p>"},
    {"uri": "https://c.example/", "html": "<p>third page body, arriving after a restart, kept too.</p>"},
]


def _start(spark, feed, out, ck):
    return (
        spark.readStream.format("warc")
        .load(str(feed))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ck))
        .trigger(processingTime="1 second")
        .start()
    )


def test_streaming_warc_incremental_and_resume(spark, tmp_path):
    register_warc_source(spark)
    feed = tmp_path / "feed"
    feed.mkdir()
    out, ck = tmp_path / "out", tmp_path / "ck"
    write_warc([PAGES[0]], str(feed / "seg-00000.warc"))

    q = _start(spark, feed, out, ck)
    q.processAllAvailable()
    assert spark.read.parquet(str(out)).count() == 1

    # a new segment lands mid-stream -> exactly its records appended
    write_warc([PAGES[1]], str(feed / "seg-00001.warc.gz"))
    q.processAllAvailable()
    assert spark.read.parquet(str(out)).count() == 2
    q.stop()

    # restart from the checkpoint: a third segment written while DOWN is
    # picked up, the consumed ones are NOT re-read (watermark offsets)
    write_warc([PAGES[2]], str(feed / "seg-00002.warc"))
    q2 = _start(spark, feed, out, ck)
    q2.processAllAvailable()
    q2.stop()
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) == 3  # no duplicates after resume
    assert sorted(r.target_uri for r in rows) == [p["uri"] for p in PAGES]
    # streamed rows equal the batch reader over the same directory
    batch = spark.read.format("warc").load(str(feed)).collect()
    assert sorted(tuple(r) for r in rows) == sorted(tuple(r) for r in batch)


def test_streaming_wet_source_and_extract_chain(spark, tmp_path):
    register_wet_source(spark)
    register_warc_source(spark)
    feed = tmp_path / "wetfeed"
    feed.mkdir()
    write_wet(
        [{"uri": "https://a.example/1", "text": "plain wet text"}],
        str(feed / "seg-00000.wet"),
    )
    out, ck = tmp_path / "wetout", tmp_path / "wetck"
    q = (
        spark.readStream.format("wet")
        .load(str(feed))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ck))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(str(out)).collect()
    assert [r.text for r in got] == ["plain wet text"]

    # the extraction chain composes on the STREAM (narrow expressions
    # are streaming-safe): warc feed -> html_extract -> parquet sink
    wfeed = tmp_path / "wfeed"
    wfeed.mkdir()
    write_warc(PAGES[:2], str(wfeed / "seg-00000.warc"))
    wout, wck = tmp_path / "wout", tmp_path / "wck"
    q2 = (
        html_extract(spark.readStream.format("warc").load(str(wfeed)))
        .select("target_uri", "n_kept", "text")
        .writeStream.format("parquet")
        .option("path", str(wout))
        .option("checkpointLocation", str(wck))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    ex = {r.target_uri: r for r in spark.read.parquet(str(wout)).collect()}
    assert len(ex) == 2
    assert ex["https://a.example/"].text.startswith("first page body")
    assert all(r.n_kept == 1 for r in ex.values())


def test_empty_feed_starts_clean(spark, tmp_path):
    register_warc_source(spark)
    feed = tmp_path / "empty"
    feed.mkdir()
    out, ck = tmp_path / "eout", tmp_path / "eck"
    q = _start(spark, feed, out, ck)
    q.processAllAvailable()
    q.stop()
    import os

    parts = (
        [f for f in os.listdir(str(out)) if f.endswith(".parquet")]
        if os.path.exists(str(out))
        else []
    )
    # an empty feed may commit zero batches or one empty batch; either
    # way the sink holds zero ROWS
    assert not parts or spark.read.parquet(str(out)).count() == 0


def test_streaming_whole_funnel_equals_batch(spark, tmp_path):
    """Round-11 verdict #7: the WHOLE funnel (url filter → extraction →
    C4 → badwords) composes over CrawlStreamReader; a replayed
    two-segment directory produces the same per-doc verdicts and the
    same aggregate report as the batch run."""
    from mmeds_meta_spark.operators.html import crawl_funnel_rows

    register_warc_source(spark)
    feed = tmp_path / "ffeed"
    feed.mkdir()
    good = (
        "<p>This substantive paragraph easily clears every minimum and"
        " it ends with proper punctuation to satisfy the line rules.</p>"
        "<p>A second long sentence keeps the page past the sentence"
        " threshold for the funnel's relaxed page rule!</p>"
    )
    seg0 = [
        {"uri": "https://keep.example.com/a", "html": good},
        {"uri": "https://www.src0.co.jp/x", "html": good},  # banned domain
    ]
    seg1 = [
        {"uri": "https://keep.example.com/b", "html": "<p>tiny</p>"},  # fails extract
        {"uri": "https://keep.example.com/c",
         "html": good.replace("paragraph easily", "paragraph dup easily")},  # badwords
    ]
    write_warc(seg0, str(feed / "seg-00000.warc"))
    out, ck = tmp_path / "fout", tmp_path / "fck"

    def start():
        return (
            crawl_funnel_rows(spark.readStream.format("warc").load(str(feed)))
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ck))
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    write_warc(seg1, str(feed / "seg-00001.warc"))  # lands while DOWN
    q2 = start()  # replay from checkpoint + pick up the new segment
    q2.processAllAvailable()
    q2.stop()

    streamed = sorted(
        tuple(r) for r in spark.read.parquet(str(out)).collect()
    )
    batch = sorted(
        tuple(r)
        for r in crawl_funnel_rows(
            spark.read.format("warc").load(str(feed))
        ).collect()
    )
    assert streamed == batch and len(streamed) == 4
    by_url = {r[0]: r for r in streamed}
    assert by_url["https://keep.example.com/a"][5]  # k4 survivor
    assert by_url["https://keep.example.com/a"][6].startswith("This substantive")
    assert not by_url["https://www.src0.co.jp/x"][2]  # k1 banned domain
    assert not by_url["https://keep.example.com/b"][3]  # k2 extract fail
    k3_fail_c = by_url["https://keep.example.com/c"]
    assert k3_fail_c[4] and not k3_fail_c[5]  # passed C4, dropped by badwords
    # the aggregate stage report computed from the streamed sink equals
    # the batch aggregation (the funnel-report shape downstream uses)
    agg = lambda rows: [sum(1 for r in rows if r[i]) for i in (2, 3, 4, 5)]
    assert agg(streamed) == agg(batch) == [3, 2, 2, 1]


def test_streaming_crawl_report_matches_batch(spark, tmp_path):
    """Round-12: the funnel REPORT maintained incrementally — segments
    arrive across two batches with a kill-and-restart between them; the
    merged store equals the batch funnel aggregation over the same
    directory (batch-keyed overwrite = replay-safe SUM merge)."""
    from mmeds_meta_spark.operators.html import crawl_funnel_rows
    from mmeds_meta_spark.streaming.crawl_report import (
        crawl_report_store,
        start_streaming_crawl_report,
    )

    register_warc_source(spark)
    feed = tmp_path / "rfeed"
    feed.mkdir()
    good = (
        "<p>This substantive paragraph easily clears every minimum and"
        " it ends with proper punctuation to satisfy the line rules.</p>"
        "<p>A second long sentence keeps the page past the sentence"
        " threshold for the funnel's relaxed page rule!</p>"
    )
    write_warc(
        [
            {"uri": "https://keep.example.com/a", "html": good},
            {"uri": "https://www.src0.co.jp/x", "html": good},
        ],
        str(feed / "seg-00000.warc"),
    )
    store, ck = str(tmp_path / "rstore"), str(tmp_path / "rck")
    q = start_streaming_crawl_report(spark, str(feed), store, ck)
    q.awaitTermination()
    write_warc(
        [
            {"uri": "https://keep.example.com/b", "html": "<p>tiny</p>"},
            {"uri": "https://keep.example.com/c",
             "html": good.replace("paragraph easily", "paragraph dup easily")},
        ],
        str(feed / "seg-00001.warc"),
    )
    q2 = start_streaming_crawl_report(spark, str(feed), store, ck)  # restart
    q2.awaitTermination()

    streamed = sorted(
        tuple(r) for r in crawl_report_store(spark, store).collect()
    )
    rows = crawl_funnel_rows(spark.read.format("warc").load(str(feed))).collect()
    s = [len(rows)] + [sum(1 for r in rows if r[f"k{i}"]) for i in (1, 2, 3, 4)]
    batch = sorted(
        (i + 1, n, s[i], s[i + 1])
        for i, n in enumerate(
            ("url_filter", "html_extract", "c4_line_filter", "badwords")
        )
    )
    assert streamed == batch
    assert s == [4, 3, 2, 2, 1]
