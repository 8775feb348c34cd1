"""Alpha-correlation: Spearman rho recomputed in pure Python from the
Shannon vector and per-sample depth."""

from __future__ import annotations

import math
from collections import Counter

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.phylo import d14_alpha_correlation


def _midranks(vals):
    cnt = Counter(vals)
    mr = {}
    below = 0
    for v in sorted(cnt):
        t = cnt[v]
        mr[v] = below + (t + 1) / 2
        below += t
    return [mr[v] for v in vals]


def test_alpha_correlation_matches_pure_python(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    depth = {r.user_id: r["count"] for r in ev.groupBy("user_id").count().collect()}
    # Shannon per sample: -sum p ln p over event_type proportions
    et = ev.groupBy("user_id", "event_type").count().collect()
    by_user: dict[int, list[int]] = {}
    for r in et:
        by_user.setdefault(r.user_id, []).append(r["count"])
    shan = {
        u: -sum((c / sum(cs)) * math.log(c / sum(cs)) for c in cs)
        for u, cs in by_user.items()
    }
    samples = sorted(depth)
    rx = _midranks([round(shan[s], 10) for s in samples])
    ry = _midranks([depth[s] for s in samples])
    n = len(samples)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry))
    rho = num / den

    got = d14_alpha_correlation(spark, SF_SMOKE).collect()[0]
    assert got.n_samples == n
    # the operator ranks the exact engine Shannon doubles; the Python
    # Shannon recompute may split float-level ties differently, so allow
    # a small tolerance on rho
    assert abs(got.spearman_rho - rho) < 1e-3
    assert 0.0 < got.p_value <= 1.0
    assert got.n_perm == 199
