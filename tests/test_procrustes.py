"""Procrustes M²: checked against a numpy SVD over the collected-matrix
PCoA reference (functions/pcoa.py) for both metrics."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from conftest import SF_CORRECT


def test_procrustes_matches_numpy(spark):
    from mmeds_meta_spark.functions.pcoa import pcoa
    from mmeds_meta_spark.operators.diversity import d2_bray_curtis
    from mmeds_meta_spark.operators.phylo import d2_unifrac_weighted, d13_procrustes

    bc = d2_bray_curtis(spark, SF_CORRECT).select(
        "ua", "ub", F.col("bray_curtis").alias("distance")
    )
    uf = d2_unifrac_weighted(spark, SF_CORRECT).select(
        "ua", "ub", F.col("unifrac_w").alias("distance")
    )
    rx, ry = pcoa(bc, n_axes=2), pcoa(uf, n_axes=2)
    ids = rx.sample_ids
    assert set(ids) == set(ry.sample_ids)
    order = [ry.sample_ids.index(s) for s in ids]
    X = np.array(rx.coordinates[:, :2], dtype=float)
    Y = np.array(ry.coordinates[:, :2], dtype=float)[order]
    X = X - X.mean(axis=0)
    Y = Y - Y.mean(axis=0)
    X /= np.sqrt((X**2).sum())
    Y /= np.sqrt((Y**2).sum())
    t = float(np.linalg.svd(X.T @ Y, compute_uv=False).sum())
    m2 = 1 - t * t

    got = d13_procrustes(spark, SF_CORRECT).collect()[0]
    assert got.n_samples == len(ids)
    # power iteration approximates the exact eigenvectors — tolerance
    # matches the pcoa-vs-numpy tests (coordinates agree to ~5e-3)
    assert got.trace_sigma == pytest.approx(t, abs=5e-3)
    assert got.m2 == pytest.approx(m2, abs=1e-2)
    assert 0.0 <= got.m2 <= 1.0
    assert 0.0 <= got.trace_sigma <= 1.0 + 1e-9  # von Neumann bound
