"""Source-mixture profile: pure-Python recompute of Gini/entropy/shares."""

from __future__ import annotations

import math

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.sampling import a23_source_mixture_profile


def test_mixture_profile_matches_pure_python(spark):
    counts = {
        r.source: r.c
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "c")
        .collect()
    }
    xs = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))  # count asc, source
    k, tot = len(xs), sum(c for _, c in xs)
    gini = sum((2 * (i + 1) - k - 1) * c for i, (_, c) in enumerate(xs)) / (k * tot)
    ent = 0.0
    for s, c in sorted(counts.items()):  # pinned source order
        p = c / tot
        ent += p * math.log(p)
    ent = -ent
    top1 = max(counts.values()) / tot
    top5 = sum(c for _, c in xs[-5:]) / tot

    r = a23_source_mixture_profile(spark, SF_SMOKE).collect()[0]
    assert r.n_sources == k
    assert abs(r.gini - gini) < 5.1e-7
    assert abs(r.entropy - ent) < 5.1e-7
    assert abs(r.top1_share - top1) < 5.1e-7
    assert abs(r.top5_share - top5) < 5.1e-7
    assert 0.0 <= r.gini < 1.0 and r.entropy > 0.0
