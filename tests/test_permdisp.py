"""d16_permdisp: independent pure-Python recomputation of the dispersion
F statistic and the md5-seeded permutation p-value.

Trusts Spark only for the PCoA coordinates (covered bit-exactly by
test_pcoa_block.py and the d2_pcoa_power oracle) and re-derives group
centroids, distances-to-centroid, the one-way ANOVA F, every md5
permutation image, and the +1/+1 p-value in plain Python.
"""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.diversity import (
    _PCOA_ITERS,
    _pcoa_core,
    d2_bray_curtis,
)
from mmeds_meta_spark.operators.phylo import _N_PERM, d16_permdisp


def _f_stat(labels: dict[int, int], pts: dict[int, tuple[float, float]]) -> float:
    groups: dict[int, list[int]] = {}
    for s, g in labels.items():
        groups.setdefault(g, []).append(s)
    z: dict[int, float] = {}
    for g, members in groups.items():
        members.sort()
        m1 = sum(pts[s][0] for s in members) / len(members)
        m2 = sum(pts[s][1] for s in members) / len(members)
        for s in members:
            z[s] = math.sqrt((pts[s][0] - m1) ** 2 + (pts[s][1] - m2) ** 2)
    n, a = len(z), len(groups)
    gm = sum(sum(z[s] for s in sorted(ms)) for ms in groups.values()) / n
    between = sum(
        len(ms) * (sum(z[s] for s in sorted(ms)) / len(ms) - gm) ** 2
        for ms in groups.values()
    )
    within = sum(
        (z[s] - sum(z[t] for t in sorted(ms)) / len(ms)) ** 2
        for ms in groups.values()
        for s in sorted(ms)
    )
    return (between / (a - 1)) / (within / (n - a))


def test_permdisp_matches_pure_python(spark):
    p = (
        d2_bray_curtis(spark, SF_SMOKE)
        .select("ua", "ub", F.expr("bray_curtis * bray_curtis").alias("dd"))
        .localCheckpoint(eager=True)
    )
    pts = {
        r.i: (
            math.sqrt(max(r.lam, 0.0)) * r.u1,
            math.sqrt(max(r.lam2, 0.0)) * r.u2,
        )
        for r in _pcoa_core(p, _PCOA_ITERS).collect()
    }
    samples = sorted(pts)
    f0 = _f_stat({s: s % 3 for s in samples}, pts)
    hits = 0
    for k in range(1, _N_PERM + 1):
        images = sorted(
            samples,
            key=lambda s: (hashlib.md5(f"{k}:{s}".encode()).hexdigest(), s),
        )
        labels = {s: img % 3 for s, img in zip(samples, images)}
        if _f_stat(labels, pts) >= f0:
            hits += 1
    want_p = (hits + 1) / (_N_PERM + 1)

    row = d16_permdisp(spark, SF_SMOKE).collect()[0]
    assert row.n_samples == len(samples)
    assert row.n_groups == 3
    assert abs(row.f_disp - f0) < 5.1e-7  # operator rounds to 6dp
    assert row.p_value == want_p  # exact: integer hit count, same +1/+1
    assert row.n_perm == _N_PERM
