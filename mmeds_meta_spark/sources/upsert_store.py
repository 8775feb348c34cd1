"""Keyed upsert ("poor man's MERGE") into a hash-bucketed parquet store.

Plain parquet has no MERGE: an upsert naively rewrites the whole table.
This store hash-partitions rows into ``bucket=K/`` subdirectories by
key, so an upsert batch rewrites ONLY the buckets its keys land in —
write amplification is (touched buckets / total buckets) of the table,
and a small CDC batch touches few buckets.  This is the pattern Hive
ACID / Delta / Iceberg industrialize; the point here is that the engine
expresses it with two DataFrame ops (anti-join + union) per bucket.

Consistency: each bucket rewrite lands in a temp directory first and is
swapped in with two renames; a crash between the renames loses at most
one bucket's availability, never mixes old and new rows in one read
(readers list ``bucket=*/`` only).  Buckets are the unit of both
parallel rewrite and atomicity — at 100 TB you size ``n_buckets`` so a
bucket is a few GB (the rewrite job per bucket stays small and the
driver loop stays bounded by the TOUCHED bucket count, not table size).

Reference parity: the reference's ``dedup-or-insert`` convention (J6,
metadata_uploader.py:283-297) is this store's per-key semantics applied
at warehouse scale.
"""

from __future__ import annotations

import os
import re
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


class HashPartitionedStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        key: str = "doc_id",
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.root = root
        self.key = key
        self.n = n_buckets
        os.makedirs(root, exist_ok=True)
        # Recover from a crash mid-swap before serving reads.  The swap
        # order is: write __tmp (fully materialized) → rename bucket→__old
        # → rename __tmp→bucket → rm __old.  So on restart:
        #   * bucket exists: any __tmp never committed and any __old is
        #     superseded — delete both.
        #   * bucket missing but __tmp exists (crash between the renames):
        #     __tmp holds the COMPLETE merged bucket — promote it.
        #   * bucket missing, only __old (cannot happen given the order,
        #     but restore defensively rather than lose rows).
        # __tmp first: when both artifacts survive, __tmp is the newer
        # complete state and must win the promotion.
        for suffix in ("__tmp", "__old"):
            for d in os.listdir(root):
                if d.endswith(suffix):
                    base = os.path.join(root, d[: -len(suffix)])
                    stale = os.path.join(root, d)
                    if os.path.isdir(base):
                        shutil.rmtree(stale, ignore_errors=True)
                    else:
                        os.rename(stale, base)

    def _bucket_dir(self, k: int) -> str:
        return os.path.join(self.root, f"bucket={k}")

    def write_initial(self, df: DataFrame) -> None:
        """Full (re)load: every bucket written once."""
        for k in range(self.n):
            part = df.filter(F.pmod(F.col(self.key), F.lit(self.n)) == k)
            part.write.mode("overwrite").parquet(self._bucket_dir(k))

    def read(self) -> DataFrame:
        # fullmatch, not startswith: "bucket=K__tmp"/"bucket=K__old" swap
        # artifacts must never be served — a read that listed them during
        # an in-flight upsert would mix old and new rows for that bucket.
        dirs = [
            os.path.join(self.root, d)
            for d in sorted(os.listdir(self.root))
            if re.fullmatch(r"bucket=\d+", d)
        ]
        return self.spark.read.parquet(*dirs)

    def upsert(self, batch: DataFrame) -> dict:
        """MERGE semantics per key: batch rows replace same-key rows,
        new keys append.  Rewrites only touched buckets; returns a
        report.  Batch must carry unique keys (last-writer-wins within a
        batch is the CALLER's resolution to apply first)."""
        tagged = batch.withColumn(
            "_b", F.pmod(F.col(self.key), F.lit(self.n)).cast("int")
        )
        touched = sorted(r._b for r in tagged.select("_b").distinct().collect())
        for k in touched:
            bdir = self._bucket_dir(k)
            newb = tagged.filter(F.col("_b") == k).drop("_b")
            if os.path.isdir(bdir):
                old = self.spark.read.parquet(bdir)
                merged = old.join(
                    newb.select(self.key), self.key, "left_anti"
                ).unionByName(newb)
            else:
                merged = newb
            tmp = bdir + "__tmp"
            # materialize BEFORE the swap: the merged plan lazily reads the
            # files the swap deletes
            merged.write.mode("overwrite").parquet(tmp)
            retired = bdir + "__old"
            if os.path.isdir(bdir):
                os.rename(bdir, retired)
            os.rename(tmp, bdir)
            shutil.rmtree(retired, ignore_errors=True)
        return {"buckets_touched": len(touched), "n_buckets": self.n}


def start_streaming_upsert(
    spark: SparkSession,
    feed_dir: str,
    store: HashPartitionedStore,
    checkpoint_dir: str,
    schema,
):
    """CDC intake: every micro-batch MERGEs into the store via
    ``foreachBatch``.  Upsert is IDEMPOTENT per batch (same keys, same
    rows → same final state), so checkpoint replay needs no batch-id
    bookkeeping — the third exactly-once discipline in this repo, next
    to MAX-merge (HLL) and batch-keyed writes (CMS)."""

    def _merge(batch: DataFrame, _batch_id: int) -> None:
        store.upsert(batch)

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
        .writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
