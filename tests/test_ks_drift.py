"""text_length_ks_drift: pure-Python recomputation of the exact
two-sample KS statistic for every source pair."""

from __future__ import annotations

import math
from collections import Counter

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.text import _KS_CRIT_05, text_length_ks_drift


def _ks(xs: list[int], ys: list[int]) -> float:
    grid = sorted(set(xs) | set(ys))
    ca = Counter(xs)
    cb = Counter(ys)
    d, fa, fb = 0.0, 0, 0
    for v in grid:
        fa += ca.get(v, 0)
        fb += cb.get(v, 0)
        d = max(d, abs(fa / len(xs) - fb / len(ys)))
    return d


def test_ks_matches_pure_python(spark):
    docs = [
        (r.source, len(r.text.split(" ")))
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("source", "text")
        .collect()
    ]
    by_src: dict[str, list[int]] = {}
    for s, n in docs:
        by_src.setdefault(s, []).append(n)

    rows = text_length_ks_drift(spark, SF_SMOKE).collect()
    srcs = sorted(by_src)
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        xs, ys = by_src[r.source_a], by_src[r.source_b]
        assert r.n_a == len(xs) and r.n_b == len(ys)
        want = _ks(xs, ys)
        assert abs(r.ks_stat - want) < 5.1e-7  # operator rounds to 6dp
        crit = _KS_CRIT_05 * math.sqrt((r.n_a + r.n_b) / (r.n_a * r.n_b))
        assert r.reject_05 == (want > crit)
