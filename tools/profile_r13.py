"""Round-12 optimization profiler.

For each named bench query (default: the bench HEADLINE+HEAVY sets) it
measures, separately:

* ``build_s``  — wall time of ``reg[name].spark(spark, sf_dir)``: Python-side
  plan construction, py4j traffic, expression parsing, plus any EAGER work
  the operator does at build time (localCheckpoint materializations run
  here, not at the sink).
* ``exec_s``   — wall time of the noop-sink write of the returned DataFrame
  (analysis + optimization + physical execution).

It also writes ``plans/r13/<name>_before.txt`` (or ``_after.txt`` with
``--after``) containing ``explain('formatted')`` for the returned plan.

Usage:
    python tools/profile_r13.py [--after] [--plans-only] [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one JSON line per query and a total line at the end.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from mmeds_meta_spark.operators import registry  # noqa: E402
from mmeds_meta_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    suffix = "_after" if "--after" in args else "_before"
    plans_only = "--plans-only" in args
    names = [a for a in args if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ["SPARK_GRAFT_NO_PROGRESS"] = "1"
    spark = get_spark("mmeds-meta-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    if not names:
        import bench

        names = bench.HEADLINE + bench.HEAVY
    plans_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "plans", "r13"
    )
    os.makedirs(plans_dir, exist_ok=True)

    # warm-up: JVM + codegen + parquet footer cache
    reg[names[0]].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = reg[name].spark(spark, sf_dir)
        t_build = time.time() - t0
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        if plans_only:
            spark.catalog.clearCache()
            continue
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t_exec = time.time() - t0
        spark.catalog.clearCache()
        out[name] = {"build_s": round(t_build, 3), "exec_s": round(t_exec, 3)}
        print(json.dumps({"query": name, **out[name]}), flush=True)
    if out:
        print(
            json.dumps(
                {
                    "total_build": round(sum(v["build_s"] for v in out.values()), 3),
                    "total_exec": round(sum(v["exec_s"] for v in out.values()), 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
