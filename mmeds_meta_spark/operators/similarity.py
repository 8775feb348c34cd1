"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k — the correctness baseline; one pass over the
  vectors, JVM-side zip_with/aggregate arithmetic, top-k via
  ``orderBy().limit(k)`` (TakeOrderedAndProject: per-partition partial
  top-k reduced on the driver — never a global single-partition window).
* IVF (centroid-bucketed) top-k — the scale path: assign every vector to
  its nearest seed centroid (a broadcast of K centroids), then search only
  the query's bucket.  At 100 TB the bucket assignment is a narrow map and
  each query touches 1/K of the data; buckets are the partition key.

Cosine values are rounded to 4dp on BOTH engines before ranking/threshold
so cross-engine summation-order differences (≈1e-15) can't flip results;
ties broken by vec_id for total determinism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..testdata import table as _t
from . import QuerySpec

_QUERY_VEC_ID = 0
_TOP_K = 10
_N_CENTROIDS = 8

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, z) -> acc + z)"


def _as_double(df: DataFrame, out: str) -> DataFrame:
    return df.select(
        "vec_id", "label", F.transform("embedding", lambda x: x.cast("double")).alias(out)
    )


def ann_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-k for the query vector (vec_id=0)."""
    e = _as_double(_t(spark, sf, "embeddings"), "v")
    q = e.filter(F.col("vec_id") == _QUERY_VEC_ID).select(F.col("v").alias("qv"))
    cand = e.filter(F.col("vec_id") != _QUERY_VEC_ID).crossJoin(F.broadcast(q))
    cos = F.expr(
        f"ROUND({_DOT.format(a='v', b='qv')} / (SQRT({_DOT.format(a='v', b='v')})"
        f" * SQRT({_DOT.format(a='qv', b='qv')})), 4)"
    )
    # Top-k via sort+limit → TakeOrderedAndProject: each task keeps its
    # local k, the driver merges P·k rows.  The rank window then runs over
    # exactly k rows that are ALREADY single-partition (TakeOrdered output
    # partitioning satisfies the window's distribution — no Exchange), so
    # no full candidate set ever funnels through one task.
    topk = (
        cand.withColumn("cos_sim", cos)
        .select("vec_id", "label", "cos_sim")
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(_TOP_K)
    )
    return topk.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("cos_sim").desc(), F.col("vec_id")))
        .cast("long"),
    ).select("rank", "vec_id", "label", "cos_sim")


_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
  SELECT v AS qv FROM e WHERE vec_id = {_QUERY_VEC_ID}
), scored AS (
  SELECT vec_id, label,
         ROUND(list_dot_product(v, qv)
               / (SQRT(list_dot_product(v, v)) * SQRT(list_dot_product(qv, qv))), 4) AS cos_sim
  FROM e, q WHERE vec_id != {_QUERY_VEC_ID}
), ranked AS (
  SELECT vec_id, label, cos_sim,
         CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
  FROM scored
)
SELECT rank, vec_id, label, cos_sim FROM ranked WHERE rank <= {_TOP_K}
"""


def ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-style ANN: seed centroids = vectors 0..K-1 (deterministic);
    every vector is assigned to its nearest centroid (argmax cosine,
    tie-break centroid id); the query searches only its own bucket.

    Demonstrates the bucketed physical plan: broadcast centroids → narrow
    assignment → bucket-local candidate scan."""
    e = _as_double(_t(spark, sf, "embeddings"), "v")
    cents = (
        e.filter(F.col("vec_id") < _N_CENTROIDS)
        .select(F.col("vec_id").alias("cent_id"), F.col("v").alias("cv"))
    )
    cos_c = F.expr(
        f"ROUND({_DOT.format(a='v', b='cv')} / (SQRT({_DOT.format(a='v', b='v')})"
        f" * SQRT({_DOT.format(a='cv', b='cv')})), 4)"
    )
    assigned = (
        e.crossJoin(F.broadcast(cents))
        .withColumn("cos_c", cos_c)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.col("cos_c").desc(), F.col("cent_id"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "v", F.col("cent_id").alias("bucket"))
    )
    qb = assigned.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    cand = assigned.join(
        F.broadcast(qb), (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != _QUERY_VEC_ID)
    )
    cos_q = F.expr(
        f"ROUND({_DOT.format(a='v', b='qv')} / (SQRT({_DOT.format(a='v', b='v')})"
        f" * SQRT({_DOT.format(a='qv', b='qv')})), 4)"
    )
    # Same distributed top-k as ann_cosine_topk: TakeOrdered + a k-row
    # rank window (no global-window funnel over the bucket's candidates).
    topk = (
        cand.withColumn("cos_sim", cos_q)
        .select("vec_id", "label", "bucket", "cos_sim")
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(_TOP_K)
    )
    return topk.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("cos_sim").desc(), F.col("vec_id")))
        .cast("long"),
    ).select("rank", "vec_id", "label", "bucket", "cos_sim")


_IVF_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cents AS (
  SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < {_N_CENTROIDS}
), scored AS (
  SELECT e.vec_id, e.label, e.v, cent_id,
         ROUND(list_dot_product(v, cv)
               / (SQRT(list_dot_product(v, v)) * SQRT(list_dot_product(cv, cv))), 4) AS cos_c
  FROM e, cents
), assigned AS (
  SELECT vec_id, label, v, cent_id AS bucket
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY cos_c DESC, cent_id) AS rn
        FROM scored)
  WHERE rn = 1
), qb AS (
  SELECT v AS qv, bucket AS qbucket FROM assigned WHERE vec_id = {_QUERY_VEC_ID}
), cand AS (
  SELECT vec_id, label, bucket,
         ROUND(list_dot_product(v, qv)
               / (SQRT(list_dot_product(v, v)) * SQRT(list_dot_product(qv, qv))), 4) AS cos_sim
  FROM assigned, qb WHERE bucket = qbucket AND vec_id != {_QUERY_VEC_ID}
), ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
  FROM cand
)
SELECT rank, vec_id, label, bucket, cos_sim FROM ranked WHERE rank <= {_TOP_K}
"""


def knn_join(spark: SparkSession, sf: str) -> DataFrame:
    """kNN self-join: every vector's nearest neighbor within its label
    block (k=1 here; same plan shape for any k via the rank filter).
    The label block is the blocking structure — at scale it would be an
    IVF/LSH bucket; candidates never cross blocks."""
    e = _as_double(_t(spark, sf, "embeddings"), "v")
    a = e.select(F.col("vec_id").alias("vec_a"), "label", F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"), F.col("v").alias("vb"))
    cos = F.expr(
        f"ROUND({_DOT.format(a='va', b='vb')} / (SQRT({_DOT.format(a='va', b='va')})"
        f" * SQRT({_DOT.format(a='vb', b='vb')})), 4)"
    )
    pairs = (
        a.join(b, (F.col("label") == F.col("lb")) & (F.col("vec_a") != F.col("vec_b")))
        .withColumn("cos_sim", cos)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_a").orderBy(F.col("cos_sim").desc(), F.col("vec_b"))
            ),
        )
    )
    return pairs.filter(F.col("rn") == 1).select("vec_a", "vec_b", "label", "cos_sim")


_KNN_SQL = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
         ROUND(list_dot_product(a.v, b.v)
               / (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v))), 4) AS cos_sim
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id != b.vec_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_a ORDER BY cos_sim DESC, vec_b) AS rn
  FROM pairs
)
SELECT vec_a, vec_b, label, cos_sim FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# int8 embedding quantization — training-data prep for vector stores
# ---------------------------------------------------------------------------


def embed_quantize_int8_vec(spark: SparkSession, sf: str) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x|,
    q_i = ⌊127·x_i/scale + 0.5⌋ (explicit floor(+0.5) — engine rounding
    modes differ on .5 ties, floor does not).  Narrow map, no shuffle;
    the all-zero vector quantizes to zeros with scale 0 instead of
    dividing by zero.  Returns `q` as a raw ``array<int>`` for API
    callers that want vectors (not registry-gated: the driver's
    canonicalizer cannot sort collection columns)."""
    e = _as_double(_t(spark, sf, "embeddings"), "v")
    return (
        e.withColumn("scale", F.expr("array_max(transform(v, x -> abs(x)))"))
        .select(
            "vec_id",
            "scale",
            F.expr(
                "CASE WHEN scale = 0 THEN transform(v, x -> 0)"
                " ELSE transform(v, x -> CAST(FLOOR(x * 127.0 / scale + 0.5) AS INT)) END"
            ).alias("q"),
        )
    )


def embed_quantize_int8(spark: SparkSession, sf: str) -> DataFrame:
    """Registry-gated variant of :func:`embed_quantize_int8_vec`: emits the
    quantized vector as its positional CSV string (the repo-wide collection
    rule, operators/__init__.py — order is positional, so no sort)."""
    return embed_quantize_int8_vec(spark, sf).select(
        "vec_id", "scale", F.concat_ws(",", "q").alias("q")
    )


_QUANT_SQL = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), s AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS scale FROM e
)
SELECT vec_id, scale,
       array_to_string(
         CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> CAST(FLOOR(x * 127.0 / scale + 0.5) AS INTEGER))
         END, ',') AS q
FROM s
"""


# ---------------------------------------------------------------------------
# product quantization (PQ) + asymmetric-distance (ADC) top-k
# ---------------------------------------------------------------------------

_PQ_M = 8  # subspaces: 64-dim vector → 8 sub-vectors of 8 dims
_PQ_K = 16  # codewords per subspace → 4-bit codes
_PQ_ACC = "DECIMAL(30,8)"  # exact accumulator for sub-distances


def _pq_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """embeddings with double vectors and DECIMAL(9,4)-quantized copies."""
    return (
        _t(spark, sf, "embeddings")
        .select(
            "vec_id",
            "label",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        .withColumn("qv", F.expr("transform(v, x -> CAST(x AS DECIMAL(9,4)))"))
    )


def _pq_code_expr(m: int, sub: int, cb) -> F.Column:
    """Per-subspace encode: argmin_c Σ_i (q_i − w_i)², exact decimals,
    tie-break lower code — one literal expression per subspace."""
    structs = []
    for c in range(_PQ_K):
        arr = ", ".join(f"CAST('{x}' AS DECIMAL(9,4))" for x in cb[m][c])
        d2 = F.expr(
            f"aggregate(zip_with(slice(qv, {m * sub + 1}, {sub}), array({arr}),"
            f" (a, b) -> (a - b) * (a - b)),"
            f" CAST(0 AS {_PQ_ACC}), (acc, z) -> CAST(acc + z AS {_PQ_ACC}))"
        )
        structs.append(F.struct(d2.alias("d2"), F.lit(c).alias("c")))
    return F.array_min(F.array(*structs))["c"]


def _pq_lookup_exprs(e: DataFrame, sub: int, cb):
    """ADC table from the query's quantized sub-vectors vs the codebook —
    exact decimal arithmetic in the driver (M×K scalars, data-size-free).
    Returns lookup_expr(m) emitting the dtable probe for code column m."""
    from decimal import Decimal

    qrow = e.filter(F.col("vec_id") == _QUERY_VEC_ID).select("qv").first()
    dtab = [
        [
            sum(
                (Decimal(str(qx)) - Decimal(w)) ** 2
                for qx, w in zip(qrow.qv[m * sub : (m + 1) * sub], cb[m][c])
            )
            for c in range(_PQ_K)
        ]
        for m in range(_PQ_M)
    ]

    def lookup_expr(m: int) -> str:
        arr = ", ".join(f"CAST('{format(dtab[m][c], 'f')}' AS {_PQ_ACC})" for c in range(_PQ_K))
        return f"element_at(array({arr}), code{m} + 1)"

    return lookup_expr


def _pq_codebook(e: DataFrame) -> tuple[int, list[list[list[str]]]]:
    """Seed codebook: codeword ``(m, c)`` = sub-vector ``m`` of vector
    ``c`` (the same deterministic seeding as :func:`ann_ivf_topk` and
    ``kmeans_buckets_exact``; training refines seeds, the search plan is
    identical).  Returns (sub_dim, codebook[m][c] = decimal strings).
    Driver transfer is K×dim decimal strings — bounded, never corpus-
    proportional."""
    seeds = e.filter(F.col("vec_id") < _PQ_K).select("vec_id", "qv").orderBy("vec_id").collect()
    assert len(seeds) == _PQ_K, f"need ≥{_PQ_K} vectors to seed the PQ codebook"
    dim = len(seeds[0].qv)
    assert dim % _PQ_M == 0, f"dim {dim} not divisible by {_PQ_M} subspaces"
    sub = dim // _PQ_M
    # format(x, 'f') keeps fixed-point notation — str(Decimal) emits
    # scientific form for tiny magnitudes ('1E-8'), which is not a safe
    # SQL decimal literal on every engine
    cb = [
        [[format(x, "f") for x in r.qv[m * sub : (m + 1) * sub]] for r in seeds]
        for m in range(_PQ_M)
    ]
    return sub, cb


def ann_pq_adc_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantized ANN with asymmetric distance (ADC) — the
    memory-bounded scale path: each vector is stored as ``M`` 4-bit codes
    (64-dim float32 = 256 B → 8 codes = 4 B, 64× compression), and a
    query scans CODES, not vectors, using a precomputed per-subspace
    distance table (Jégou et al., "Product Quantization for Nearest
    Neighbor Search", TPAMI 2011).

    Exactness discipline (the ``kmeans_buckets_exact`` convention):
    coordinates quantize to DECIMAL(9,4), every sub-distance is an exact
    DECIMAL(30,8) sum, the ADC lookup table is computed in exact decimal
    arithmetic driver-side from the same quantized values — so codes,
    table, and the final ranking are bit-identical on any engine and the
    DuckDB oracle replicates them relationally.

    Scale shape: encoding is a NARROW map (M×K codeword literals embedded
    in the expression — a broadcast in all but name; no join, no
    shuffle); the ADC table is M×K scalars; the scan is one narrow pass
    over the code column + TakeOrderedAndProject top-k.  At 100 TB the
    working set is the 4-byte codes, and composing with the IVF bucket
    assignment of :func:`ann_ivf_topk` (search only the query's bucket)
    multiplies the saving by K_coarse."""
    e = _pq_embeddings(spark, sf)
    sub, cb = _pq_codebook(e)
    coded = e.select(
        "vec_id", "label", *[_pq_code_expr(m, sub, cb).alias(f"code{m}") for m in range(_PQ_M)]
    )
    lookup_expr = _pq_lookup_exprs(e, sub, cb)
    approx = " + ".join(lookup_expr(m) for m in range(_PQ_M))
    topk = (
        coded.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .withColumn("approx_d2", F.expr(f"CAST({approx} AS DOUBLE)"))
        .select("vec_id", "label", "approx_d2")
        .orderBy(F.col("approx_d2").asc(), F.col("vec_id"))
        .limit(_TOP_K)
    )
    return topk.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("approx_d2").asc(), F.col("vec_id")))
        .cast("long"),
    ).select("rank", "vec_id", "label", "approx_d2")


_PQ_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), el AS (
  SELECT vec_id, u.i, CAST(u.x AS DECIMAL(9,4)) AS q
  FROM (SELECT vec_id, unnest(list_transform(v, (x, i) -> {{'x': x, 'i': i}})) AS u FROM e)
), sub AS (
  SELECT vec_id, CAST((i - 1) // ((SELECT len(v) FROM e LIMIT 1) // {_PQ_M}) AS INTEGER) AS m,
         i, q
  FROM el
), cb AS (
  SELECT vec_id AS c, m, i, q AS w FROM sub WHERE vec_id < {_PQ_K}
), d AS (
  SELECT s.vec_id, s.m, cb.c,
         SUM(CAST((s.q - cb.w) * (s.q - cb.w) AS {_PQ_ACC})) AS d2
  FROM sub s JOIN cb ON cb.m = s.m AND cb.i = s.i
  GROUP BY 1, 2, 3
), code AS (
  SELECT vec_id, m, c AS code
  FROM (SELECT vec_id, m, c,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, c) AS rn
        FROM d)
  WHERE rn = 1
), dt AS (
  SELECT m, c, d2 AS dq FROM d WHERE vec_id = {_QUERY_VEC_ID}
), approx AS (
  SELECT code.vec_id, CAST(SUM(dt.dq) AS DOUBLE) AS approx_d2
  FROM code JOIN dt ON dt.m = code.m AND dt.c = code.code
  GROUP BY 1
), ranked AS (
  SELECT a.vec_id, e.label, a.approx_d2,
         CAST(ROW_NUMBER() OVER (ORDER BY a.approx_d2 ASC, a.vec_id) AS BIGINT) AS rank
  FROM approx a JOIN e ON e.vec_id = a.vec_id
  WHERE a.vec_id != {_QUERY_VEC_ID}
)
SELECT rank, vec_id, label, approx_d2 FROM ranked WHERE rank <= {_TOP_K}
"""


def ann_ivf_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ — the full production ANN layout: the coarse quantizer
    (:func:`ann_ivf_topk`'s broadcast-centroid assignment) restricts the
    scan to the query's bucket, and within the bucket the search runs on
    PQ codes with the ADC table (:func:`ann_pq_adc_topk`).  At 100 TB a
    query touches 1/K_coarse of the corpus AND reads 4-byte codes instead
    of 256-byte vectors — the two savings multiply.

    Determinism: the coarse assignment uses 4dp-rounded cosine with
    centroid-id tie-break; the PQ stage is exact decimal arithmetic —
    both independently oracle-verified, composed here unchanged."""
    e = _pq_embeddings(spark, sf)
    cents = e.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    cos_c = F.expr(
        f"ROUND({_DOT.format(a='v', b='cv')} / (SQRT({_DOT.format(a='v', b='v')})"
        f" * SQRT({_DOT.format(a='cv', b='cv')})), 4)"
    )
    assigned = (
        e.crossJoin(F.broadcast(cents))
        .withColumn("cos_c", cos_c)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.col("cos_c").desc(), F.col("cent_id"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "qv", F.col("cent_id").alias("bucket"))
    )
    qb = assigned.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.col("bucket").alias("qbucket")
    )
    sub, cb = _pq_codebook(e)
    lookup_expr = _pq_lookup_exprs(e, sub, cb)
    coded = assigned.join(
        F.broadcast(qb),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != _QUERY_VEC_ID),
    ).select(
        "vec_id",
        "label",
        "bucket",
        *[_pq_code_expr(m, sub, cb).alias(f"code{m}") for m in range(_PQ_M)],
    )
    approx = " + ".join(lookup_expr(m) for m in range(_PQ_M))
    topk = (
        coded.withColumn("approx_d2", F.expr(f"CAST({approx} AS DOUBLE)"))
        .select("vec_id", "label", "bucket", "approx_d2")
        .orderBy(F.col("approx_d2").asc(), F.col("vec_id"))
        .limit(_TOP_K)
    )
    return topk.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("approx_d2").asc(), F.col("vec_id")))
        .cast("long"),
    ).select("rank", "vec_id", "label", "bucket", "approx_d2")


_IVF_PQ_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cents AS (
  SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < {_N_CENTROIDS}
), scored AS (
  SELECT e.vec_id, e.label, cent_id,
         ROUND(list_dot_product(v, cv)
               / (SQRT(list_dot_product(v, v)) * SQRT(list_dot_product(cv, cv))), 4) AS cos_c
  FROM e, cents
), assigned AS (
  SELECT vec_id, label, cent_id AS bucket
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY cos_c DESC, cent_id) AS rn
        FROM scored)
  WHERE rn = 1
), qb AS (
  SELECT bucket AS qbucket FROM assigned WHERE vec_id = {_QUERY_VEC_ID}
), el AS (
  SELECT vec_id, u.i, CAST(u.x AS DECIMAL(9,4)) AS q
  FROM (SELECT vec_id, unnest(list_transform(v, (x, i) -> {{'x': x, 'i': i}})) AS u FROM e)
), sub AS (
  SELECT vec_id, CAST((i - 1) // ((SELECT len(v) FROM e LIMIT 1) // {_PQ_M}) AS INTEGER) AS m,
         i, q
  FROM el
), cb AS (
  SELECT vec_id AS c, m, i, q AS w FROM sub WHERE vec_id < {_PQ_K}
), d AS (
  SELECT s.vec_id, s.m, cb.c,
         SUM(CAST((s.q - cb.w) * (s.q - cb.w) AS {_PQ_ACC})) AS d2
  FROM sub s JOIN cb ON cb.m = s.m AND cb.i = s.i
  GROUP BY 1, 2, 3
), code AS (
  SELECT vec_id, m, c AS code
  FROM (SELECT vec_id, m, c,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, c) AS rn
        FROM d)
  WHERE rn = 1
), dt AS (
  SELECT m, c, d2 AS dq FROM d WHERE vec_id = {_QUERY_VEC_ID}
), approx AS (
  SELECT code.vec_id, CAST(SUM(dt.dq) AS DOUBLE) AS approx_d2
  FROM code JOIN dt ON dt.m = code.m AND dt.c = code.code
  GROUP BY 1
), ranked AS (
  SELECT a2.vec_id, a2.label, a2.bucket, ap.approx_d2,
         CAST(ROW_NUMBER() OVER (ORDER BY ap.approx_d2 ASC, a2.vec_id) AS BIGINT) AS rank
  FROM assigned a2
  JOIN qb ON a2.bucket = qb.qbucket
  JOIN approx ap ON ap.vec_id = a2.vec_id
  WHERE a2.vec_id != {_QUERY_VEC_ID}
)
SELECT rank, vec_id, label, bucket, approx_d2 FROM ranked WHERE rank <= {_TOP_K}
"""


# ---------------------------------------------------------------------------
# SRP-LSH — signed-random-projection (Charikar 2002) cosine LSH top-k
# ---------------------------------------------------------------------------

_SRP_BITS = 16  # signature length
_SRP_BAND_W = 4  # bits per band → 4 bands; ≥1 shared band = candidate
_SRP_DIM = 64  # embedding dimensionality (testdata contract)


def _rademacher(salt: str, rows: int, dims: int) -> list[list[float]]:
    """rows×dims matrix of ±1.0 derived from md5 — the same deterministic,
    engine-independent derivation both the Spark plan and the DuckDB
    oracle embed as literals, so signatures agree bit-for-bit.  A
    Rademacher matrix is a valid SRP/JL projection (Achlioptas 2003:
    database-friendly random projections)."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{salt}:{j}:{d}".encode()).hexdigest()[0], 16) >= 8 else -1.0
            for d in range(dims)
        ]
        for j in range(rows)
    ]


def _lit_vec_spark(vals: list[float]) -> str:
    return "array(" + ",".join(f"{v:.1f}D" for v in vals) + ")"


def _lit_vec_duck(vals: list[float]) -> str:
    return "[" + ",".join(f"{v:.1f}" for v in vals) + "]"


def _srp_sig_expr(dialect: str, vec: str) -> str:
    """16-char '0'/'1' signature string for vector column ``vec``.

    Each bit is the sign of a Rademacher dot product.  Both engines fold
    the product left-to-right over the same doubles (Spark ``aggregate``
    over ``zip_with``; DuckDB ``list_dot_product``), and the dot is
    rounded to 4dp before the sign test so a summation-order epsilon can
    never flip a bit near zero."""
    signs = _rademacher("srp", _SRP_BITS, _SRP_DIM)
    bits = []
    for j in range(_SRP_BITS):
        if dialect == "spark":
            dot = _DOT.format(a=vec, b=_lit_vec_spark(signs[j]))
        else:
            dot = f"list_dot_product({vec}, {_lit_vec_duck(signs[j])})"
        bits.append(f"(CASE WHEN ROUND({dot}, 4) >= 0 THEN '1' ELSE '0' END)")
    return "CONCAT(" + ", ".join(bits) + ")"


def ann_srp_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    """SRP-LSH approximate cosine top-k (Charikar 2002 simhash-for-vectors
    — the hyperplane-LSH ANN family, complementing the IVF and PQ
    families): every vector gets a {bits}-bit signature (sign of
    {bits} Rademacher projections), split into {bands} bands of
    {w} bits; any vector sharing ≥1 band with the query is a candidate;
    candidates are re-ranked by EXACT cosine.

    Physical shape at 100 TB: the signature is a narrow map (pure
    column arithmetic, whole-stage codegen — no Python); the band
    explode emits {bands} rows/vector; the probe side is the query's
    {bands} band keys — a BROADCAST hash join, so the corpus never
    shuffles; the candidate set is bucket-local and the exact re-rank
    is TakeOrderedAndProject over candidates only.  Recall tunes with
    bands×bits like every LSH: more bands → more candidates."""
    e = _as_double(_t(spark, sf, "embeddings"), "v")
    sig = e.withColumn("sig", F.expr(_srp_sig_expr("spark", "v")))
    bands = sig.select(
        "vec_id",
        "label",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.expr(f"substr(sig, {b * _SRP_BAND_W + 1}, {_SRP_BAND_W})").alias(
                            "band_key"
                        ),
                    )
                    for b in range(_SRP_BITS // _SRP_BAND_W)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", "label", "v", "bk.band_idx", "bk.band_key")
    qbands = bands.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        "band_idx", F.col("band_key").alias("q_key"), F.col("v").alias("qv")
    )
    cand = (
        bands.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .join(
            F.broadcast(qbands),
            (F.col("band_key") == F.col("q_key")) & (bands.band_idx == qbands.band_idx),
        )
        .select("vec_id", "label", "v", "qv")
        .dropDuplicates(["vec_id"])
    )
    cos_q = F.expr(
        f"ROUND({_DOT.format(a='v', b='qv')} / (SQRT({_DOT.format(a='v', b='v')})"
        f" * SQRT({_DOT.format(a='qv', b='qv')})), 4)"
    )
    topk = (
        cand.withColumn("cos_sim", cos_q)
        .select("vec_id", "label", "cos_sim")
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(_TOP_K)
    )
    return topk.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("cos_sim").desc(), F.col("vec_id")))
        .cast("long"),
    ).select("rank", "vec_id", "label", "cos_sim")


ann_srp_lsh_topk.__doc__ = ann_srp_lsh_topk.__doc__.format(
    bits=_SRP_BITS, bands=_SRP_BITS // _SRP_BAND_W, w=_SRP_BAND_W
)


def _srp_sql() -> str:
    n_bands = _SRP_BITS // _SRP_BAND_W
    return f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), sig AS (
  SELECT vec_id, label, v, {_srp_sig_expr('duck', 'v')} AS sig FROM e
), bands AS (
  SELECT vec_id, label, v, b.band_idx,
         substr(sig, b.band_idx * {_SRP_BAND_W} + 1, {_SRP_BAND_W}) AS band_key
  FROM sig, (SELECT UNNEST(range(0, {n_bands})) AS band_idx) b
), qb AS (
  SELECT band_idx, band_key AS q_key, v AS qv FROM bands WHERE vec_id = {_QUERY_VEC_ID}
), cand AS (
  SELECT DISTINCT ON (bd.vec_id) bd.vec_id, bd.label, bd.v, qb.qv
  FROM bands bd JOIN qb ON bd.band_idx = qb.band_idx AND bd.band_key = qb.q_key
  WHERE bd.vec_id != {_QUERY_VEC_ID}
  ORDER BY bd.vec_id
), scored AS (
  SELECT vec_id, label,
         ROUND(list_dot_product(v, qv)
               / (SQRT(list_dot_product(v, v)) * SQRT(list_dot_product(qv, qv))), 4) AS cos_sim
  FROM cand
), ranked AS (
  SELECT vec_id, label, cos_sim,
         CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
  FROM scored
)
SELECT rank, vec_id, label, cos_sim FROM ranked WHERE rank <= {_TOP_K}
"""


# ---------------------------------------------------------------------------
# JL random projection — 64-dim → 8-dim sketch vectors
# ---------------------------------------------------------------------------

_JL_OUT = 8  # target dimensionality


def embed_random_projection(spark: SparkSession, sf: str) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction: project every
    64-dim embedding to {k} dims with a fixed Rademacher matrix scaled by
    1/sqrt({k}) (Achlioptas 2003's database-friendly JL construction).
    The standard pre-step before clustering/dedup over billions of
    embeddings — an 8× narrower vector cuts every downstream shuffle and
    pair computation by the same factor while preserving pairwise
    distances to (1±ε).

    Physical shape: a pure narrow map — {k} fused dot products per row
    inside whole-stage codegen; no shuffle, no Python, no state.  Output
    is one DOUBLE column per target dim (rounded 6dp on both engines on
    top of bit-identical fold order)."""
    signs = _rademacher("jl", _JL_OUT, _SRP_DIM)
    e = _as_double(_t(spark, sf, "embeddings"), "v")
    scale = f"SQRT(CAST({_JL_OUT} AS DOUBLE))"
    cols = [
        F.expr(f"ROUND({_DOT.format(a='v', b=_lit_vec_spark(signs[j]))} / {scale}, 6)").alias(
            f"y{j}"
        )
        for j in range(_JL_OUT)
    ]
    return e.select("vec_id", "label", *cols)


embed_random_projection.__doc__ = embed_random_projection.__doc__.format(k=_JL_OUT)


def _jl_sql() -> str:
    signs = _rademacher("jl", _JL_OUT, _SRP_DIM)
    scale = f"SQRT(CAST({_JL_OUT} AS DOUBLE))"
    cols = ",\n       ".join(
        f"ROUND(list_dot_product(v, {_lit_vec_duck(signs[j])}) / {scale}, 6) AS y{j}"
        for j in range(_JL_OUT)
    )
    return f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT vec_id, label,
       {cols}
FROM e
"""


_DECON_BENCH_MOD = 50  # vec_id ≡ 0 (mod 50) → held-out benchmark stand-in
_DECON_TAU = 0.35  # demo threshold: the synthetic embeddings are near-
# orthogonal (max bench cosine 0.4533 at sf0.01), so 0.35 exercises both
# verdict branches; production decontamination runs tau ~ 0.95


def decon_embedding_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """EMBEDDING-level benchmark decontamination: flag corpus vectors
    whose cosine similarity to ANY held-out benchmark vector reaches
    τ = {tau} (demo value; production runs τ ≈ 0.95) — the semantic companion of the n-gram
    (decon_ngram_overlap), Bloom (decon_bloom_filter), and fuzzy-MinHash
    (decon_fuzzy_minhash) tests: it catches REWRITTEN eval leaks
    (translations, heavy paraphrases, format conversions) that share no
    surface n-grams with the benchmark at all.  Benchmark membership is
    the deterministic vec_id ≡ 0 (mod {mod}) stand-in (the
    decon_fuzzy_minhash convention).

    Output per corpus vector: the max benchmark cosine (4dp), how many
    benchmark items clear τ, and the contamination verdict.

    Physical shape at 100 TB: an eval suite's embeddings are MBs — the
    benchmark side BROADCASTS, scoring is a narrow map over the corpus
    (never a shuffle of it), and the per-vector max/count is a
    map-side-combining partial agg on vec_id.  Nothing scales with
    corpus × corpus."""
    e = _as_double(_t(spark, sf, "embeddings"), "v")
    bench = e.filter(F.col("vec_id") % _DECON_BENCH_MOD == 0).select(
        F.col("v").alias("bv")
    )
    corpus = e.filter(F.col("vec_id") % _DECON_BENCH_MOD != 0)
    cos = F.expr(
        f"ROUND({_DOT.format(a='v', b='bv')} / (SQRT({_DOT.format(a='v', b='v')})"
        f" * SQRT({_DOT.format(a='bv', b='bv')})), 4)"
    )
    scored = corpus.crossJoin(F.broadcast(bench)).withColumn("cos_b", cos)
    return scored.groupBy("vec_id", "label").agg(
        F.max("cos_b").alias("max_bench_cos"),
        F.sum(F.when(F.col("cos_b") >= _DECON_TAU, 1).otherwise(0))
        .cast("long")
        .alias("n_bench_hits"),
        (F.max("cos_b") >= F.lit(_DECON_TAU)).alias("is_contaminated"),
    )


decon_embedding_cosine.__doc__ = decon_embedding_cosine.__doc__.format(
    tau=_DECON_TAU, mod=_DECON_BENCH_MOD
)

_DECON_EMB_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), bench AS (
  SELECT v AS bv FROM e WHERE vec_id % {_DECON_BENCH_MOD} = 0
), scored AS (
  SELECT c.vec_id, c.label,
         ROUND(list_dot_product(c.v, b.bv)
               / (SQRT(list_dot_product(c.v, c.v))
                  * SQRT(list_dot_product(b.bv, b.bv))), 4) AS cos_b
  FROM e c CROSS JOIN bench b
  WHERE c.vec_id % {_DECON_BENCH_MOD} != 0
)
SELECT vec_id, label, MAX(cos_b) AS max_bench_cos,
       CAST(SUM(CASE WHEN cos_b >= {_DECON_TAU} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bench_hits,
       MAX(cos_b) >= {_DECON_TAU} AS is_contaminated
FROM scored GROUP BY vec_id, label
"""


QUERIES: dict[str, QuerySpec] = {
    "ann_cosine_topk": QuerySpec(ann_cosine_topk, _TOPK_SQL, "LLM-pipeline similarity (brute-force cosine top-k — the exact baseline ANN recalls are measured against, cf. Johnson et al. 2019)"),
    "decon_embedding_cosine": QuerySpec(
        decon_embedding_cosine,
        _DECON_EMB_SQL,
        "beyond-reference: embedding-level benchmark decontamination "
        "(broadcast bench side, narrow corpus scoring — catches paraphrased "
        "leaks the n-gram/Bloom/MinHash tests miss)",
    ),
    "embed_quantize_int8": QuerySpec(
        embed_quantize_int8,
        _QUANT_SQL,
        "LLM-pipeline embedding prep (symmetric int8 quantization, Jacob et al. 2018; narrow map)",
    ),
    "ann_ivf_topk": QuerySpec(ann_ivf_topk, _IVF_SQL, "LLM-pipeline similarity (IVF bucketed top-k)"),
    "knn_join": QuerySpec(knn_join, _KNN_SQL, "LLM-pipeline similarity (blocked kNN self-join; cf. Bohm & Krebs 2004 kNN join)"),
    "ann_pq_adc_topk": QuerySpec(
        ann_pq_adc_topk,
        _PQ_SQL,
        "beyond-reference: product-quantized ADC top-k (Jégou et al. 2011; 64× code compression)",
    ),
    "ann_ivf_pq_topk": QuerySpec(
        ann_ivf_pq_topk,
        _IVF_PQ_SQL,
        "beyond-reference: IVF-PQ (coarse bucket restriction × PQ code scan)",
    ),
    "ann_srp_lsh_topk": QuerySpec(
        ann_srp_lsh_topk,
        _srp_sql(),
        "beyond-reference: signed-random-projection cosine LSH (Charikar 2002)",
    ),
    "embed_random_projection": QuerySpec(
        embed_random_projection,
        _jl_sql(),
        "beyond-reference: JL Rademacher random projection 64→8 dims (Achlioptas 2003)",
    ),
}
