"""_pcoa_core's two physical strategies must agree BIT-FOR-BIT.

The dense bounded-block (single-row array arithmetic) and distributed
(matvec joins) forms run the identical IEEE operation sequence — same
pinned fold orders, same closing expression trees — so their doubles
must be equal exactly, not approximately.  This is the same determinism
contract the DuckDB oracles rely on, applied across physical plans.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.diversity import (
    _PCOA_ITERS,
    _pcoa_core,
    d2_bray_curtis,
)


def test_block_and_distributed_pcoa_are_bit_identical(spark):
    p = (
        d2_bray_curtis(spark, SF_SMOKE)
        .select("ua", "ub", F.expr("bray_curtis * bray_curtis").alias("dd"))
        .localCheckpoint(eager=True)
    )
    blk = {r.i: r for r in _pcoa_core(p, _PCOA_ITERS, block=True).collect()}
    dst = {r.i: r for r in _pcoa_core(p, _PCOA_ITERS, block=False).collect()}
    assert set(blk) == set(dst) and len(blk) > 1
    for i in blk:
        for f in ("u1", "u2", "lam", "lam2"):
            assert getattr(blk[i], f) == getattr(dst[i], f), (i, f)


def test_block_pcoa_short_chain_matches_too(spark):
    # a non-multiple of _PCOA_NORM_EVERY exercises the tail-normalize path
    p = (
        d2_bray_curtis(spark, SF_SMOKE)
        .select("ua", "ub", F.expr("bray_curtis * bray_curtis").alias("dd"))
        .localCheckpoint(eager=True)
    )
    blk = {r.i: r for r in _pcoa_core(p, 8, block=True).collect()}
    dst = {r.i: r for r in _pcoa_core(p, 8, block=False).collect()}
    for i in blk:
        for f in ("u1", "u2", "lam", "lam2"):
            assert getattr(blk[i], f) == getattr(dst[i], f), (i, f)
