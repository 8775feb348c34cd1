"""Streaming crawl-funnel report: the per-stage survivor counts of
``pipeline_crawl_funnel`` maintained incrementally as crawl segments
arrive (round-12 extension of the round-11 streaming crawl ingest).

Each micro-batch maps its WARC records through the SAME funnel
expressions as the batch operator (operators.html.crawl_funnel_rows —
url filter → extraction → C4 cleanup → badwords, all narrow, so the
plan is streaming-safe unchanged), then contracts to ONE row of stage
counters.  Counters accumulate in a BATCH-KEYED parquet store (the
mixture/CMS discipline: per-stage SUM merge is linear but NOT
idempotent, so a replayed micro-batch overwrites only its own
``batch_id=N/`` partition with the same deterministic content —
checkpoint replay cannot double-count; the filename-watermark offsets
of CrawlStreamReader guarantee the replayed batch re-reads exactly its
own files).  The read side emits the batch operator's report shape
``(stage, name, n_in, n_out)``, so a live crawl dashboard reads the
same relation a batch recompute would produce over the same segments.

At 100 TB/day each batch writes ONE tiny row — store growth is one
partition per micro-batch; compact whenever batch count bothers you
(the merge is associative).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.html import crawl_funnel_rows

_STAGES = ("url_filter", "html_extract", "c4_line_filter", "badwords")


def start_streaming_crawl_report(
    spark: SparkSession,
    feed_dir: str,
    store_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Maintain the stage-counter store over a WARC segment feed (the
    ``warc`` source must be registered on this session)."""
    rows = crawl_funnel_rows(spark.readStream.format("warc").load(feed_dir))

    def _merge(batch: DataFrame, batch_id: int) -> None:
        (
            batch.agg(
                F.count("*").cast("long").alias("s0"),
                *[
                    F.expr(
                        f"CAST(SUM(CASE WHEN k{i} THEN 1 ELSE 0 END) AS BIGINT)"
                    ).alias(f"s{i}")
                    for i in (1, 2, 3, 4)
                ],
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(store_dir, f"batch_id={batch_id}"))
        )

    return (
        rows.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def crawl_report_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged funnel report ``(stage, name, n_in, n_out)`` across
    all consumed segments — the batch report shape verbatim."""
    from ._store import read_store

    tot = read_store(
        spark,
        store_dir,
        "s0 BIGINT, s1 BIGINT, s2 BIGINT, s3 BIGINT, s4 BIGINT",
    ).agg(*[F.expr(f"CAST(SUM(s{i}) AS BIGINT)").alias(f"s{i}") for i in range(5)])
    rows = ", ".join(
        f"struct({i + 1} AS stage, '{n}' AS name, s{i} AS n_in, s{i + 1} AS n_out)"
        for i, n in enumerate(_STAGES)
    )
    return tot.select(F.explode(F.expr(f"array({rows})")).alias("r")).select("r.*")
