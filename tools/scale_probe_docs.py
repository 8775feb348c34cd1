"""Scaling-curve probe for the document/embedding operator families.

Replays the round-5 methodology on the round-6/7 operators: duplicate
the sf0.1 corpus 2x and 4x (unique doc_ids / vec_ids, 8-file parquet so
the scan exposes real input splits) and time each operator at every
scale on local[32], min of two passes.  The probe DATA is derived from
the driver-generated sf0.1 tables only — nothing hand-synthesized; the
duplication preserves every distribution except cardinality.

Usage: python tools/scale_probe_docs.py [out_dir]
Prints a markdown table for SCALE_NOTES.md.
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
    "sample_dsir_importance",
    "text_nb_classifier",
    "dedup_semdedup",
    "dedup_substring_islands",
    "text_bpe_train",
    "text_ccnet_buckets",
    "decon_fuzzy_minhash",
    "sample_epoch_shuffle",
    "sketch_kmv_overlap_matrix",
    "pipeline_export_funnel",
    # round-7 session-2/3 additions
    "text_bigram_lm_score",
    "text_gopher_full",
    "text_length_ks_drift",
    "sample_quality_quota",
    "pipeline_decontam_report",
    "decon_span_islands",
    "decon_embedding_cosine",
    "pipeline_dedup_funnel",
]
SCALES = (1, 2, 4)


def build_scaled(spark, base: str, mult: int, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    d = spark.read.parquet(f"{SRC}/documents.parquet")
    n_doc = d.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = [
        d.withColumn("doc_id", (F.col("doc_id") + F.lit(k * n_doc)).cast("long"))
        for k in range(mult)
    ]
    docs = parts[0]
    for p in parts[1:]:
        docs = docs.unionAll(p)
    docs.repartition(8).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    e = spark.read.parquet(f"{SRC}/embeddings.parquet")
    n_vec = e.agg(F.max("vec_id")).collect()[0][0] + 1
    eparts = [
        e.withColumn("vec_id", (F.col("vec_id") + F.lit(k * n_vec)).cast("long"))
        for k in range(mult)
    ]
    embs = eparts[0]
    for p in eparts[1:]:
        embs = embs.unionAll(p)
    embs.repartition(8).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    # remaining tables pass through untouched (the probed ops read only
    # documents/embeddings; symlinks keep the sf-dir contract intact)
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events"):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)


def main() -> None:
    # only auto-delete directories this probe itself created — a
    # caller-supplied out_root (argv[1]) is left in place (round-8 ADVICE)
    owns_out_root = len(sys.argv) <= 1
    out_root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="scaleprobe_")
    spark = get_spark("scale-probe-docs")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    dirs: dict[int, str] = {1: SRC}
    for m in SCALES:
        if m == 1:
            continue
        d = os.path.join(out_root, f"x{m}")
        build_scaled(spark, SRC, m, d)
        dirs[m] = d

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            reg[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        return best

    run(OPS[0], SRC)  # warm-up
    rows = []
    for name in OPS:
        times = [run(name, dirs[m]) for m in SCALES]
        rows.append((name, times))
        print(f"DONE {name}: " + "  ".join(f"{t:.2f}s" for t in times), flush=True)

    print("\n| op | 1x (sf0.1) | 2x (8 files) | 4x (8 files) |")
    print("|---|---|---|---|")
    for name, times in rows:
        print(f"| {name} | " + " | ".join(f"{t:.2f} s" for t in times) + " |")
    if owns_out_root:
        shutil.rmtree(out_root, ignore_errors=True)


if __name__ == "__main__":
    main()
