"""Round-8 scaling probes (r7 verdict item 6).

1. The composed funnels at 8x/16x: the 2x/4x curves cover the singles;
   pipeline_dedup_funnel's 2.7x-at-4x trend is the one worth
   extrapolating before trusting it at 100 TB (its duplicated-corpus
   pair space grows with the SQUARE of the multiplier — the worst case).
2. decon_embedding_cosine with the benchmark side HELD FIXED while the
   corpus scales — the realistic deployment (an eval suite does not grow
   with the training corpus).  The earlier 4x number (4.24 s) was a
   probe artifact: duplication quadrupled the bench side too, growing
   the pair space 16x.  The fixed-bench variant reuses the operator's
   exact scoring expressions with bench pinned to the 1x corpus's
   vec_id % mod = 0 rows.

Data derivation matches tools/scale_probe_docs.py (duplicate sf0.1 with
unique ids, 8-file parquet).  Usage:
    python tools/scale_probe_r08.py [out_dir]
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
from mmeds_meta_spark.operators.similarity import (  # noqa: E402
    _DECON_BENCH_MOD,
    _DECON_TAU,
    _DOT,
    _as_double,
)
from mmeds_meta_spark.session import get_spark  # noqa: E402
from scale_probe_docs import SRC, build_scaled  # noqa: E402

FUNNELS = ["pipeline_dedup_funnel", "pipeline_decontam_report", "pipeline_export_funnel"]
SCALES = (1, 2, 4, 8, 16)


def decon_fixed_bench(spark, sf_dir: str, bench_df) -> None:
    """decon_embedding_cosine's exact expressions with the bench side
    pinned (broadcast) instead of re-derived from the scaled corpus."""
    e = _as_double(spark.read.parquet(f"{sf_dir}/embeddings.parquet"), "v")
    corpus = e.filter(F.col("vec_id") % _DECON_BENCH_MOD != 0)
    cos = F.expr(
        f"ROUND({_DOT.format(a='v', b='bv')} / (SQRT({_DOT.format(a='v', b='v')})"
        f" * SQRT({_DOT.format(a='bv', b='bv')})), 4)"
    )
    scored = corpus.crossJoin(F.broadcast(bench_df)).withColumn("cos_b", cos)
    out = scored.groupBy("vec_id", "label").agg(
        F.max("cos_b").alias("max_bench_cos"),
        F.sum(F.when(F.col("cos_b") >= _DECON_TAU, 1).otherwise(0))
        .cast("long")
        .alias("n_bench_hits"),
        (F.max("cos_b") >= F.lit(_DECON_TAU)).alias("is_contaminated"),
    )
    out.write.format("noop").mode("overwrite").save()


def main() -> None:
    owns_out_root = len(sys.argv) <= 1
    out_root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="scaleprobe8_")
    spark = get_spark("scale-probe-r08")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    dirs: dict[int, str] = {1: SRC}
    for m in SCALES:
        if m == 1:
            continue
        d = os.path.join(out_root, f"x{m}")
        build_scaled(spark, SRC, m, d)
        dirs[m] = d

    # the FIXED benchmark: the 1x corpus's bench rows, materialized once
    bench = (
        _as_double(
            spark.read.parquet(f"{SRC}/embeddings.parquet").select(
                "vec_id", "label", "embedding"
            ),
            "v",
        )
        .filter(F.col("vec_id") % _DECON_BENCH_MOD == 0)
        .select(F.col("v").alias("bv"))
        .localCheckpoint(eager=True)
    )

    base_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def run(fn, mult: int = 1) -> float:
        # the standard cluster sizing rule, applied honestly: shuffle
        # partition count scales with input so per-partition state (the
        # band join's SHJ hash tables, whose per-bucket rows are capped
        # by salting but whose buckets-per-partition are not) stays
        # constant.  At a FIXED 32 partitions the 8x/16x corpus OOMs the
        # hash build — measured, recorded in SCALE_NOTES round 8.
        spark.conf.set("spark.sql.shuffle.partitions", str(base_parts * mult))
        try:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                fn()
                best = min(best, time.time() - t0)
                spark.catalog.clearCache()
            return best
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", str(base_parts))

    # warm-up
    run(lambda: reg[FUNNELS[1]].spark(spark, SRC).write.format("noop").mode("overwrite").save())

    header = "| op | " + " | ".join(f"{m}x" for m in SCALES) + " |"
    sep = "|---" * (len(SCALES) + 1) + "|"
    rows = []
    for name in FUNNELS:
        times = [
            run(
                lambda d=dirs[m]: reg[name].spark(spark, d).write.format("noop").mode("overwrite").save(),
                mult=m,
            )
            for m in SCALES
        ]
        rows.append((name, times))
        print(f"DONE {name}: " + "  ".join(f"{t:.2f}s" for t in times), flush=True)
    times = [
        run(lambda d=dirs[m]: decon_fixed_bench(spark, d, bench), mult=m)
        for m in SCALES
    ]
    rows.append(("decon_embedding_cosine (bench FIXED at 1x)", times))
    print(f"DONE decon fixed-bench: " + "  ".join(f"{t:.2f}s" for t in times), flush=True)

    print()
    print(header)
    print(sep)
    for name, ts in rows:
        print(f"| {name} | " + " | ".join(f"{t:.2f} s" for t in ts) + " |")
    if owns_out_root:
        shutil.rmtree(out_root, ignore_errors=True)


if __name__ == "__main__":
    main()
