"""SemDeDup decision rule: pure-Python recomputation of centroid ranks
and prefix ε-pruning, given the operator's own kmeans buckets (bucket
assignment itself is covered by the gated dedup_embedding_ivf oracle and
the kmeans tests).
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.dedup import _COS_TAU, dedup_semdedup


def _q(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


def _dot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def test_semdedup_rule_matches_pure_python(spark):
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    out = {r.vec_id: r for r in dedup_semdedup(spark, SF_SMOKE).collect()}
    assert set(out) == set(vecs)

    buckets: dict[int, list[int]] = {}
    for vid, r in out.items():
        buckets.setdefault(r.bucket, []).append(vid)

    for b, members in buckets.items():
        dim = len(vecs[members[0]])
        cent = [
            sum(_q(vecs[m][i]) for m in members) / len(members) for i in range(dim)
        ]
        cosc = {
            m: _dot(vecs[m], cent)
            / (math.sqrt(_dot(vecs[m], vecs[m])) * math.sqrt(_dot(cent, cent)))
            for m in members
        }
        order = sorted(members, key=lambda m: (cosc[m], m))
        for m in members:
            assert abs(out[m].cos_centroid - cosc[m]) < 5.1e-7
        # rank-1 (farthest from centroid) is always kept
        assert out[order[0]].keep
        for i, m in enumerate(order):
            removed = any(
                round(
                    _dot(vecs[m], vecs[p])
                    / (
                        math.sqrt(_dot(vecs[m], vecs[m]))
                        * math.sqrt(_dot(vecs[p], vecs[p]))
                    ),
                    4,
                )
                >= _COS_TAU
                for p in order[:i]
            )
            assert out[m].keep == (not removed)


def test_semdedup_prunes_something_and_is_deterministic(spark):
    a = sorted(map(tuple, dedup_semdedup(spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, dedup_semdedup(spark, SF_SMOKE).collect()))
    assert a == b
    keeps = [r[3] for r in a]
    assert any(keeps) and not all(keeps)  # both branches exercised at this SF
