"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given SF, then compares row count, column names, and an
order-insensitive value comparison (rows sorted, columns sorted by name).
Exact equality is required for every cell — the engine's determinism
contract (decimal-exact aggregation / identical double expressions) is
designed to deliver exactly that.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

from mmeds_meta_spark.session import get_spark  # noqa: E402
from mmeds_meta_spark.testdata import TABLES  # noqa: E402


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return v
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [c for _, c in sorted(zip(cols, cols))], out


def compare(name, spark_df, con, sql):
    t0 = time.time()
    s_rows = spark_df.collect()
    s_cols = [c.lower() for c in spark_df.columns]
    t_spark = time.time() - t0
    t0 = time.time()
    rel = con.sql(sql)
    d_cols = [c.lower() for c in rel.columns]
    d_rows = rel.fetchall()
    t_duck = time.time() - t0
    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount: spark={len(s_rows)} duck={len(d_rows)}")
    if not problems:
        _, sn = _norm_rows(s_cols, [tuple(r) for r in s_rows])
        _, dn = _norm_rows(d_cols, d_rows)
        if sn != dn:
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b]
            problems.append(f"values: {len(diffs)} differing rows; first: {diffs[:2]}")
    status = "OK " if not problems else "FAIL"
    print(f"{status} {name:32s} rows={len(s_rows):7d} spark={t_spark:5.1f}s duck={t_duck:4.1f}s "
          + ("" if not problems else " | ".join(problems)))
    return not problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    ok = fail = skip = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                nrows = df.count()
                print(f"SKIP {name:32s} rows={nrows:7d} (no oracle; rows-only check)")
                skip += 1
                continue
            if compare(name, df, con, oracles[name]):
                ok += 1
            else:
                fail += 1
        except Exception:
            print(f"ERR  {name}")
            traceback.print_exc()
            fail += 1
        finally:
            spark.catalog.clearCache()  # release operator-scoped .cache() blocks
    print(f"\n{ok} ok, {fail} fail, {skip} rows-only")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
