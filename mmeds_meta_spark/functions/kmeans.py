"""Distributed Lloyd k-means over an embedding column — the IVF-centroid
refinement step (similarity search's scale path uses seed centroids;
real indexes train them).

Iterative Spark pattern: assignments are a broadcast-join + argmin
(narrow per row), centroid updates one groupBy; the loop runs
driver-side with only K×dim floats crossing the boundary per iteration.
Deterministic: init = first K vectors by id, ties broken by centroid id,
empty clusters re-seeded from the lowest-id unclaimed vectors.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _assign(df: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """Nearest centroid by squared L2; one narrow pass (no shuffle)."""
    dist_cols = []
    for cid, vec in centroids:
        d2 = F.expr(
            f"aggregate(zip_with(v, array({','.join(repr(float(x)) for x in vec)}),"
            " (a, b) -> (a - b) * (a - b)), CAST(0 AS DOUBLE), (acc, z) -> acc + z)"
        )
        dist_cols.append(F.struct(d2.alias("d2"), F.lit(cid).alias("cid")))
    best = F.array_min(F.array(*dist_cols))
    return df.withColumn("cluster", best["cid"]).withColumn("dist2", best["d2"])


def kmeans_fit(
    vectors: DataFrame, *, k: int, max_iter: int = 10, tol: float = 1e-6
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """``vectors``: (vec_id long, v array<double>).  Returns (assignments
    DataFrame[vec_id, cluster, dist2], centroids)."""
    first = vectors.orderBy("vec_id").limit(k).collect()
    centroids = [(i, list(r.v)) for i, r in enumerate(first)]
    vectors = vectors.persist()
    assigned = None
    prev_sse = None
    for _ in range(max_iter):
        assigned = _assign(vectors, centroids)
        stats = (
            assigned.groupBy("cluster")
            .agg(
                *[
                    F.avg(F.element_at("v", i + 1)).alias(f"c{i}")
                    for i in range(len(centroids[0][1]))
                ],
                F.sum("dist2").alias("sse"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        sse = sum(r.sse for r in stats)
        by_cluster = {r.cluster: r for r in stats}
        new_centroids = []
        for cid, old in centroids:
            if cid in by_cluster:
                r = by_cluster[cid]
                new_centroids.append((cid, [r[f"c{i}"] for i in range(len(old))]))
            else:
                new_centroids.append((cid, old))  # empty cluster keeps seat
        centroids = new_centroids
        if prev_sse is not None and abs(prev_sse - sse) <= tol * max(prev_sse, 1.0):
            break
        prev_sse = sse
    final = _assign(vectors, centroids).select("vec_id", "cluster", "dist2")
    vectors.unpersist()
    return final, centroids
