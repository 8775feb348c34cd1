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


# ---------------------------------------------------------------------------
# Cross-engine-exact variant: quantized-decimal Lloyd
# ---------------------------------------------------------------------------

_QT = "DECIMAL(9,4)"  # coordinate quantization — 4dp, exact in both engines


def _exact_assign(e, cents: dict[int, list[str]]):
    """Nearest centroid by squared L2 over DECIMAL(9,4)-quantized
    coordinates: every distance is an exact decimal (accumulator
    DECIMAL(30,8) so Spark's precision cap never forces scale loss), so
    the argmin is a pure rational comparison — bit-identical in any
    engine, no FP summation-order hazard.  K×dim centroid literals are
    embedded in the expression (a broadcast in all but name): the
    assignment is a narrow map, no shuffle."""
    import pyspark.sql.functions as F

    structs = []
    for cid in sorted(cents):
        arr = ", ".join(f"CAST('{c}' AS {_QT})" for c in cents[cid])
        d2 = F.expr(
            f"aggregate(zip_with(qv, array({arr}), (a, b) -> (a - b) * (a - b)), "
            f"CAST(0 AS DECIMAL(30,8)), (acc, z) -> CAST(acc + z AS DECIMAL(30,8)))"
        )
        structs.append(F.struct(d2.alias("d2"), F.lit(cid).alias("cid")))
    best = F.array_min(F.array(*structs))
    return e.withColumn("bucket", best["cid"])


def kmeans_buckets_exact(e, *, k: int, iters: int):
    """Deterministic, cross-engine-reproducible k-means bucketing.

    ``e`` must carry ``vec_id`` and ``qv: array<decimal(9,4)>`` (the
    quantized embedding).  Seeds = vectors 0..k-1; exactly ``iters``
    Lloyd rounds; centroid update = exact decimal per-dim sums cast to
    DOUBLE, divided by the count, re-quantized to DECIMAL(9,4).  Every
    step is either exact decimal arithmetic or an identical double
    expression on identical inputs, and a double→DECIMAL(9,4) rounding
    tie (…xxxx5 exactly) is never representable in binary — so an
    unrolled SQL transcription of this loop produces byte-identical
    buckets (see dedup._ivf_sql).  Returns ``e`` + ``bucket``.

    Scale shape: per round, one narrow assignment pass (broadcast
    K×dim literals) + one partial-agg shuffle for the update — the same
    physical plan as :func:`kmeans_fit`, with only K×dim decimal strings
    crossing the driver boundary per round.
    """
    import pyspark.sql.functions as F

    dim = len(e.select("qv").first().qv)
    seeds = e.filter(F.col("vec_id") < k).select("vec_id", "qv").orderBy("vec_id").collect()
    cents = {int(r.vec_id): [str(x) for x in r.qv] for r in seeds}
    for _ in range(iters):
        assigned = _exact_assign(e, cents)
        upd = (
            assigned.groupBy("bucket")
            .agg(
                F.count("*").alias("n"),
                *[F.sum(F.element_at("qv", i + 1)).alias(f"s{i}") for i in range(dim)],
            )
            .select(
                "bucket",
                *[
                    F.expr(f"CAST(CAST(s{i} AS DOUBLE) / n AS {_QT})").alias(f"c{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        got = {int(r.bucket): [str(r[f"c{i}"]) for i in range(dim)] for r in upd}
        cents = {cid: got.get(cid, old) for cid, old in cents.items()}  # empty keeps seat
    return _exact_assign(e, cents)
