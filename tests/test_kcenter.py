"""k-center coreset: pure-Python greedy recompute with exact decimals."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.sampling import _KC_K, sample_kcenter_coreset


def _q(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)


def _d2(a, b) -> Decimal:
    return sum(((x - y) * (x - y) for x, y in zip(a, b)), Decimal(0))


def _expected(vecs):
    ids = sorted(vecs)
    first = ids[0]
    picked = [(0, first, None)]
    d2min = {i: _d2(vecs[i], vecs[first]) for i in ids}
    for r in range(1, _KC_K):
        chosen = {p[1] for p in picked}
        far = max(
            (i for i in ids if i not in chosen),
            key=lambda i: (d2min[i], -i),
        )
        picked.append((r, far, d2min[far]))
        for i in ids:
            d = _d2(vecs[i], vecs[far])
            if d < d2min[i]:
                d2min[i] = d
    return picked


def test_kcenter_matches_pure_python(spark):
    vecs = {
        r.vec_id: [_q(float(x)) for x in r.embedding]
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    exp = _expected(vecs)
    got = sorted(sample_kcenter_coreset(spark, SF_SMOKE).collect(), key=lambda r: r.round)
    assert len(got) == _KC_K
    for r, (rnd, vid, d2) in zip(got, exp):
        assert r.round == rnd and r.vec_id == vid
        if d2 is None:
            assert r.r2 is None
        else:
            assert abs(Decimal(repr(r.r2)) - d2) < Decimal("1e-6")
    # radii are non-increasing: each new center is the current farthest point
    radii = [e[2] for e in exp[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))
