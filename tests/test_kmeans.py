"""Distributed Lloyd k-means: blob recovery + determinism + real embeddings."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from conftest import SF_SMOKE

from mmeds_meta_spark.functions.kmeans import kmeans_fit


def test_recovers_planted_blobs(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    rows = []
    centers = [(-10.0, -10.0), (0.0, 10.0), (12.0, -3.0)]
    for i in range(150):
        cx, cy = centers[i % 3]
        rows.append((i, [cx + rng.normal(0, 0.5), cy + rng.normal(0, 0.5)]))
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    assigned, centroids = kmeans_fit(df, k=3, max_iter=15)
    got = assigned.collect()
    # every planted blob maps to exactly one cluster label
    by_blob = {}
    for r in got:
        by_blob.setdefault(r.vec_id % 3, set()).add(r.cluster)
    assert all(len(s) == 1 for s in by_blob.values()), by_blob
    assert len({next(iter(s)) for s in by_blob.values()}) == 3
    # centroids land near the planted centers
    import math

    recovered = sorted((round(c[0]), round(c[1])) for _, c in centroids)
    assert recovered == sorted((round(x), round(y)) for x, y in centers)


def test_deterministic(spark):
    rows = [(i, [float(i % 7), float((i * 3) % 5)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    a1, c1 = kmeans_fit(df, k=4, max_iter=8)
    a2, c2 = kmeans_fit(df, k=4, max_iter=8)
    assert c1 == c2
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_on_real_embeddings(spark):
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    assigned, centroids = kmeans_fit(e, k=8, max_iter=5)
    sizes = assigned.groupBy("cluster").count().collect()
    assert sum(r["count"] for r in sizes) == e.count()
    assert len(sizes) >= 2  # vectors actually spread over clusters
