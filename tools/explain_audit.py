"""Plan-quality audit: for every registered operator, inspect the physical
plan and report scan pushdown, join strategies, and exchange counts.

This is the ".explain and iterate" loop from the build brief, made into a
repeatable artifact: run it after touching an operator and diff the
summary.  Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from mmeds_meta_spark.operators import registry  # noqa: E402
from mmeds_meta_spark.session import get_spark  # noqa: E402


def audit(df) -> dict:
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "scans": len(re.findall(r"Scan parquet", plan)),
        "pushed_filters": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "codegen_spans": len(
            set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
            | set(re.findall(r"codegen id : (\d+)", plan))
        ),
        "python_udf": len(re.findall(r"BatchEvalPython|ArrowEvalPython", plan)),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'query':32s} exch bcast smj shj bnlj scans pushed codegen pyudf")
    for name, spec in registry().items():
        if only and name not in only:
            continue
        try:
            a = audit(spec.spark(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} ERROR {e}")
            continue
        flag = ""
        if a["smj"] and not a["broadcast_joins"]:
            flag = "  <- all-shuffle joins: check dim sizes"
        if a["python_udf"]:
            flag += "  <- python in plan"
        print(
            f"{name:32s} {a['exchanges']:4d} {a['broadcast_joins']:5d} {a['smj']:3d}"
            f" {a['shj']:3d} {a['bnlj']:4d} {a['scans']:5d} {a['pushed_filters']:6d}"
            f" {a['codegen_spans']:7d} {a['python_udf']:5d}{flag}"
        )


if __name__ == "__main__":
    main()
