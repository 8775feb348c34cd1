"""Every registered operator must match its DuckDB oracle at sf0.001.

This is the in-repo mirror of the driver's correctness gate (the driver
runs the same comparison at sf0.01); tools/verify_local.py runs it at any
SF.  Oracle-less operators get a rows-materialize smoke check.
"""

from __future__ import annotations

import math

import pytest

from mmeds_meta_spark.operators import registry

from conftest import SF_SMOKE

REG = registry()


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return ("nan",)
    return v


@pytest.mark.parametrize("name", sorted(REG))
def test_operator_matches_oracle(name, spark, duck):
    spec = REG[name]
    df = spec.spark(spark, SF_SMOKE)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only smoke
        return
    s_cols = [c.lower() for c in df.columns]
    s_rows = [tuple(r) for r in df.collect()]
    rel = duck.sql(spec.oracle)
    d_cols = [c.lower() for c in rel.columns]
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"schema mismatch in {name}"
    assert len(s_rows) == len(d_rows), f"rowcount mismatch in {name}"
    order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    sn = sorted((tuple(_norm(r[i]) for i in order_s) for r in s_rows), key=repr)
    dn = sorted((tuple(_norm(r[i]) for i in order_d) for r in d_rows), key=repr)
    assert sn == dn, f"value mismatch in {name}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) == 5


def test_every_query_has_doc():
    for name, spec in REG.items():
        assert spec.doc, name


def test_no_collection_output_columns(spark):
    """The driver's canonicalizer sorts result rows in pandas, which dies on
    unhashable cells — so no gated entry may emit an array/map/struct column.
    Collections must be stringified (repo rule, operators/__init__.py).
    Schema-only: builds each plan at sf0.001 without executing it."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, spec in sorted(REG.items()):
        df = spec.spark(spark, SF_SMOKE)
        for field in df.schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not offenders, f"collection-typed gated outputs: {offenders}"


def test_gate_tail_names_resolve():
    """A misspelled _GATE_TAIL entry would silently leave the intended
    entry in the gate head and displace a real one — fail loudly."""
    from mmeds_meta_spark.operators import _GATE_TAIL

    missing = [n for n in _GATE_TAIL if n not in REG]
    assert not missing, f"_GATE_TAIL names not in registry: {missing}"
    assert len(REG) - len(_GATE_TAIL) == 50, (
        "gate head must be exactly the driver's 50 slots: "
        f"{len(REG)} entries - {len(_GATE_TAIL)} tail = {len(REG) - len(_GATE_TAIL)}"
    )
