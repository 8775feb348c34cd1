"""Round-9 scaling probes (round-8 verdict #6 + round-9 additions).

Two questions:

1. The two most join-dense plans — ``d11_alpha_group_significance``
   (84 exchanges) and ``pipeline_diff_abundance`` (148) — were fine at
   4x (2.1x / 1.34x wall).  Is there a superlinear knee at 8x/16x?
   Probe them (plus the new ``d1_rarefaction_det``) on events corpora
   duplicated with the round-8 user-id-shifting rule: more samples,
   same event-type vocabulary — the way a real study grows.
2. The round-9 WET-path ops (``dedup_url_canonical``,
   ``sample_domain_cap``) are narrow-map + one-shuffle plans; confirm
   linear-at-worst on documents corpora at 4x/16x.

Methodology matches the earlier probes: data derived ONLY from the
driver's sf0.1 tables (duplication preserves every distribution except
cardinality), min of two passes, shuffle partitions scaled with the
multiplier (the round-8 sizing rule).

Usage: python tools/scale_probe_r09.py [out_dir]
Prints markdown rows for SCALE_NOTES.md.
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
EVENT_OPS = [
    "d11_alpha_group_significance",
    "pipeline_diff_abundance",
    "d1_rarefaction_det",
]
EVENT_SCALES = (1, 4, 8, 16)
DOC_OPS = [
    "dedup_url_canonical",
    "sample_domain_cap",
    "web_host_pagerank",
    "web_host_harmonic",
    "pipeline_curation_funnel",
]
DOC_SCALES = (1, 4, 16)

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def _passthrough(out: str, built: set[str]) -> None:
    for t in TABLES:
        dst = f"{out}/{t}.parquet"
        if t not in built and not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)


def build_scaled_events(spark, mult: int, out: str) -> None:
    """User-id-shifting duplication: more samples, same type vocabulary."""
    os.makedirs(out, exist_ok=True)
    e = spark.read.parquet(f"{SRC}/events.parquet")
    n_ev = e.agg(F.max("event_id")).collect()[0][0] + 1
    n_us = e.agg(F.max("user_id")).collect()[0][0] + 1
    ev = e
    for k in range(1, mult):
        ev = ev.unionAll(
            e.withColumn("event_id", (F.col("event_id") + F.lit(k * n_ev)).cast("long"))
            .withColumn("user_id", (F.col("user_id") + F.lit(k * n_us)).cast("long"))
        )
    ev.repartition(8 * max(1, mult // 4)).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )
    _passthrough(out, {"events"})


def build_scaled_docs(spark, mult: int, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    d = spark.read.parquet(f"{SRC}/documents.parquet")
    n_doc = d.agg(F.max("doc_id")).collect()[0][0] + 1
    docs = d
    for k in range(1, mult):
        docs = docs.unionAll(
            d.withColumn("doc_id", (F.col("doc_id") + F.lit(k * n_doc)).cast("long"))
        )
    docs.repartition(8 * max(1, mult // 4)).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    _passthrough(out, {"documents"})


def main() -> None:
    # --docs-only reruns just the documents section (used when a new web
    # op lands mid-round and the 8x/16x events rows are already recorded)
    docs_only = "--docs-only" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--docs-only"]
    owns_out_root = not args
    out_root = args[0] if args else tempfile.mkdtemp(prefix="scaler09_")
    spark = get_spark("scale-probe-r09")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    base = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def run(name: str, sf_dir: str, m: int) -> float:
        spark.conf.set("spark.sql.shuffle.partitions", str(base * m))
        try:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                reg[name].spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
                spark.catalog.clearCache()
            return best
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", str(base))

    ev_dirs: dict[int, str] = {1: SRC}
    for m in EVENT_SCALES:
        if m == 1 or docs_only:
            continue
        d = os.path.join(out_root, f"ev_x{m}")
        build_scaled_events(spark, m, d)
        ev_dirs[m] = d
    doc_dirs: dict[int, str] = {1: SRC}
    for m in DOC_SCALES:
        if m == 1:
            continue
        d = os.path.join(out_root, f"doc_x{m}")
        build_scaled_docs(spark, m, d)
        doc_dirs[m] = d

    run((DOC_OPS if docs_only else EVENT_OPS)[0], SRC, 1)  # warm-up
    if not docs_only:
        print("| op | " + " | ".join(f"{m}x" for m in EVENT_SCALES) + " |")
        print("|---|" + "---|" * len(EVENT_SCALES))
        for name in EVENT_OPS:
            ts = [run(name, ev_dirs[m], m) for m in EVENT_SCALES]
            print(f"| {name} | " + " | ".join(f"{t:.2f} s" for t in ts) + " |", flush=True)

    print("\n| op | " + " | ".join(f"{m}x" for m in DOC_SCALES) + " |")
    print("|---|" + "---|" * len(DOC_SCALES))
    for name in DOC_OPS:
        ts = [run(name, doc_dirs[m], m) for m in DOC_SCALES]
        print(f"| {name} | " + " | ".join(f"{t:.2f} s" for t in ts) + " |", flush=True)

    if owns_out_root:
        shutil.rmtree(out_root, ignore_errors=True)


if __name__ == "__main__":
    main()
