"""Negative controls for the oracle comparator (tools/verify_local.py):
the cross-engine gate is only as strong as its compare function, so
prove it FAILS on each mismatch class — a wrong cell value, a dropped
row, a renamed column, a float nudged in the last compared digit — and
passes only on genuine equality (incl. column/row order insensitivity
and NaN normalization).
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo/tools")
from verify_local import compare  # noqa: E402


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_compare_passes_on_equal_modulo_order(spark):
    con = duckdb.connect()
    df = _df(spark, [(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, x double")
    # different row AND column order on the oracle side -> still OK
    assert compare("ctl_ok", df, con,
                   "SELECT x, s, id FROM (VALUES (2.5, 'b', CAST(2 AS BIGINT)),"
                   " (1.5, 'a', CAST(1 AS BIGINT))) t(x, s, id)")


def test_compare_fails_on_wrong_cell(spark):
    con = duckdb.connect()
    df = _df(spark, [(1, 1.5)], "id long, x double")
    assert not compare("ctl_cell", df, con,
                       "SELECT CAST(1 AS BIGINT) AS id, 1.5000001 AS x")


def test_compare_fails_on_rowcount_and_schema(spark):
    con = duckdb.connect()
    df = _df(spark, [(1,), (2,)], "id long")
    assert not compare("ctl_rows", df, con, "SELECT CAST(1 AS BIGINT) AS id")
    assert not compare("ctl_cols", df, con,
                       "SELECT CAST(1 AS BIGINT) AS id2, CAST(2 AS BIGINT) AS x")


def test_compare_nan_normalized_and_distinguished(spark):
    con = duckdb.connect()
    df = _df(spark, [(float("nan"),)], "x double")
    assert compare("ctl_nan", df, con, "SELECT CAST('nan' AS DOUBLE) AS x")
    assert not compare("ctl_nan2", df, con, "SELECT CAST(0.0 AS DOUBLE) AS x")
