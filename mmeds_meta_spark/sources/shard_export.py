"""Training-shard export with a verifiable manifest — the hand-off point
between the curation engine and a training job.

``write_training_shards`` materializes one epoch of the deterministic
epoch shuffle (same md5(epoch:doc_id) keying as
``operators.sampling.sample_epoch_shuffle``) as ``shard=K`` parquet
directories, each internally sorted by the shuffle key, plus a
``_manifest.json`` recording, per shard: document count, byte/char
volume, and an ORDER-INDEPENDENT content checksum.  ``validate_shards``
recomputes everything from the data files and reports per-shard status —
the integrity check a training job runs before consuming data it didn't
produce.

Checksum design: per-document fingerprint = the first 15 hex digits of
``md5(key || ':' || md5(text))`` as a BIGINT (60 bits — safely inside
both engines' int64), combined per shard with SUM mod 2^60.  Addition is
commutative, so the checksum is independent of row order AND computable
as one partial aggregation (map-side combine) — no sorted concatenation
of a shard's worth of strings, no giant agg state.  A dropped, added, or
textually corrupted document changes the sum with probability
1 − 2⁻⁶⁰ per event.

Scale shape: the write is ONE shuffle (repartition by shard) with an
in-partition sort; the manifest aggregation rides the same pass shape
(groupBy shard partial agg); validation is an independent scan with the
same partial agg — nothing driver-side beyond the n_shards manifest rows.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_MOD = 1 << 60
_MANIFEST = "_manifest.json"


def _fingerprinted(df: DataFrame, epoch: int, n_shards: int) -> DataFrame:
    """doc_id/text + (key, shard, fp): the shuffle key, its shard, and
    the 60-bit per-doc content fingerprint."""
    keyed = df.withColumn(
        "key",
        F.expr(f"md5(concat(CAST({epoch} AS STRING), ':', CAST(doc_id AS STRING)))"),
    )
    return keyed.withColumn(
        "shard",
        F.expr(
            "(instr('0123456789abcdef', substr(key, 1, 1)) - 1) * 16"
            " + (instr('0123456789abcdef', substr(key, 2, 1)) - 1)"
        ).cast("int")
        % n_shards,
    ).withColumn(
        "fp",
        F.expr("CAST(conv(substr(md5(concat(key, ':', md5(text))), 1, 15), 16, 10) AS BIGINT)"),
    )


def _shard_stats(fp_df: DataFrame) -> DataFrame:
    return fp_df.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
        # DECIMAL(38,0) accumulator: a raw BIGINT sum of 60-bit values
        # overflows at ~8 docs under ANSI; decimal is exact to 10^38
        (F.sum(F.col("fp").cast("decimal(38,0)")) % F.lit(_MOD)).cast("long").alias("checksum"),
    )


def write_training_shards(
    df: DataFrame, out_dir: str, *, epoch: int = 0, n_shards: int = 8
) -> dict:
    """Write one epoch of deterministically shuffled shards + manifest.

    ``df`` must carry (doc_id, text); all other columns ship along.
    Returns the manifest dict (also written to ``out_dir/_manifest.json``)."""
    fp = _fingerprinted(df, epoch, n_shards)
    (
        fp.repartition(n_shards, "shard")
        # (shard, key), not key alone: the partitionBy writer requires
        # rows ordered by the partition column and would otherwise insert
        # its own NON-STABLE sort on shard, scrambling the key order
        .sortWithinPartitions("shard", "key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(out_dir, "data"))
    )
    stats = _shard_stats(fp).collect()  # bounded: n_shards rows
    manifest = {
        "epoch": epoch,
        "n_shards": n_shards,
        "total_docs": int(sum(r.n_docs for r in stats)),
        "shards": {
            str(r.shard): {
                "n_docs": int(r.n_docs),
                "n_chars": int(r.n_chars),
                "checksum": int(r.checksum),
            }
            for r in stats
        },
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def validate_shards(spark, out_dir: str) -> DataFrame:
    """Recompute every shard's stats from the data files and compare to
    the manifest.  Returns one row per manifest shard:
    (shard, ok, n_docs_expected, n_docs_found, checksum_match) — a
    missing shard directory reports 0 found rows, an extra data shard
    not in the manifest reports ok = false with expected = 0."""
    with open(os.path.join(out_dir, _MANIFEST)) as fh:
        manifest = json.load(fh)
    # recompute the fingerprint FROM key+text — trusting the stored fp
    # column would miss a corrupted text whose fp survived intact
    data = spark.read.parquet(os.path.join(out_dir, "data")).select(
        "shard",
        "text",
        F.expr(
            "CAST(conv(substr(md5(concat(key, ':', md5(text))), 1, 15), 16, 10) AS BIGINT)"
        ).alias("fp"),
    )
    found = (
        _shard_stats(data)
        .withColumnRenamed("n_docs", "n_docs_found")
        .withColumnRenamed("checksum", "checksum_found")
        .drop("n_chars")
    )
    exp_rows = [
        (int(s), v["n_docs"], v["checksum"]) for s, v in manifest["shards"].items()
    ]
    exp = spark.createDataFrame(
        exp_rows, "shard INT, n_docs_expected BIGINT, checksum_expected BIGINT"
    )
    return (
        exp.join(found, "shard", "full")
        .select(
            "shard",
            F.coalesce("n_docs_expected", F.lit(0)).alias("n_docs_expected"),
            F.coalesce("n_docs_found", F.lit(0)).alias("n_docs_found"),
            (
                F.coalesce("checksum_expected", F.lit(-1))
                == F.coalesce("checksum_found", F.lit(-2))
            ).alias("checksum_match"),
        )
        .withColumn(
            "ok",
            (F.col("n_docs_expected") == F.col("n_docs_found"))
            & F.col("checksum_match"),
        )
        .select("shard", "ok", "n_docs_expected", "n_docs_found", "checksum_match")
    )
