"""Scaling-curve probe for the EVENTS-family operators — the analysis
chains and event analytics whose input is events.parquet (the docs
probe covers the documents/embeddings families).

Duplication shifts BOTH event_id and user_id, so the corpus grows the
way a real study grows: more samples (users), same event-type
vocabulary.  Consequences worth knowing before reading the numbers:

* the Markov chain fit stays |types|²-bounded — the lag shuffle grows
  linearly, the solve cost is constant;
* the per-feature KW/LDA/ANCOM moments grow linearly in samples;
* pipeline_core_metrics' pairwise half is BLOCK-capped (user_id < 40),
  so only its alpha half scales — by design (the block is the
  registered oracle's contract, the block size is the scale knob).

Usage: python tools/scale_probe_events.py [out_dir]
Prints markdown rows for SCALE_NOTES.md.  Shuffle partitions scale with
the multiplier (the round-8 sizing rule).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")

import pyspark.sql.functions as F  # noqa: E402

from mmeds_meta_spark.operators import registry  # noqa: E402
from mmeds_meta_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
OPS = [
    "w17_markov_absorption",
    "w18_markov_removal",
    "pipeline_diff_abundance",
    "pipeline_core_metrics",
    "d11_alpha_group_significance",
]
SCALES = (1, 2, 4)


def build_scaled_events(spark, mult: int, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    e = spark.read.parquet(f"{SRC}/events.parquet")
    n_ev = e.agg(F.max("event_id")).collect()[0][0] + 1
    n_us = e.agg(F.max("user_id")).collect()[0][0] + 1
    parts = [
        e.withColumn("event_id", (F.col("event_id") + F.lit(k * n_ev)).cast("long"))
        .withColumn("user_id", (F.col("user_id") + F.lit(k * n_us)).cast("long"))
        for k in range(mult)
    ]
    ev = parts[0]
    for p in parts[1:]:
        ev = ev.unionAll(p)
    ev.repartition(8).write.mode("overwrite").parquet(f"{out}/events.parquet")
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings",
    ):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)


def main() -> None:
    owns = len(sys.argv) <= 1
    out_root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="scaleev_")
    spark = get_spark("scale-probe-events")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    dirs: dict[int, str] = {1: SRC}
    for m in SCALES:
        if m == 1:
            continue
        d = os.path.join(out_root, f"x{m}")
        build_scaled_events(spark, m, d)
        dirs[m] = d

    base = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def run(name: str, m: int) -> float:
        spark.conf.set("spark.sql.shuffle.partitions", str(base * m))
        try:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                reg[name].spark(spark, dirs[m]).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
                spark.catalog.clearCache()
            return best
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", str(base))

    run(OPS[0], 1)  # warm-up
    print("| op | 1x (sf0.1) | 2x | 4x |")
    print("|---|---|---|---|")
    for name in OPS:
        ts = [run(name, m) for m in SCALES]
        print(f"| {name} | " + " | ".join(f"{t:.2f} s" for t in ts) + " |", flush=True)
    if owns:
        shutil.rmtree(out_root, ignore_errors=True)


if __name__ == "__main__":
    main()
