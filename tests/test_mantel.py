"""Mantel permutation test against a hand-permuted fixture.

The engine's permutation k maps samples sorted by id onto samples sorted
by md5(k || ':' || sample); this test replays that mapping in plain
Python (hashlib + sorted) over a 4-sample fixture, recomputes every
permuted Pearson r with the same pinned (ua, ub) fold order, and checks
the engine's (mantel_r, p_value) one-sided +1/+1 count exactly.
"""

from __future__ import annotations

import hashlib
import itertools

import pytest

N_PERM = 7
SAMPLES = [0, 1, 2, 3]
# two 4x4 distance matrices in canonical-pair form (ua < ub)
X = {(0, 1): 0.2, (0, 2): 0.5, (0, 3): 0.9, (1, 2): 0.4, (1, 3): 0.8, (2, 3): 0.3}
Y = {(0, 1): 0.25, (0, 2): 0.45, (0, 3): 0.95, (1, 2): 0.35, (1, 3): 0.7, (2, 3): 0.5}


def _perm(k: int) -> dict[int, int]:
    by_md5 = sorted(
        SAMPLES,
        key=lambda s: (hashlib.md5(f"{k}:{s}".encode()).hexdigest(), s),
    )
    return dict(zip(sorted(SAMPLES), by_md5))


def _pearson(pairs, y_of):
    xs = [X[p] for p in pairs]
    ys = [y_of(p) for p in pairs]
    n = len(pairs)
    sx = sum(xs)
    sy = sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    return (n * sxy - sx * sy) / (
        ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
    )


def test_mantel_matches_hand_permutations(spark):
    from mmeds_meta_spark.operators.phylo import mantel_permutation_test

    pairs = sorted(X)  # the engine's pinned fold order
    r_obs = _pearson(pairs, lambda p: Y[p])
    hits = 0
    for k in range(1, N_PERM + 1):
        pi = _perm(k)
        r_k = _pearson(
            pairs, lambda p: Y[tuple(sorted((pi[p[0]], pi[p[1]])))]
        )
        if r_k >= r_obs:
            hits += 1
    expected_p = (hits + 1) / (N_PERM + 1)

    xdf = spark.createDataFrame(
        [(a, b, v) for (a, b), v in X.items()], "ua long, ub long, x double"
    )
    ydf = spark.createDataFrame(
        [(a, b, v) for (a, b), v in Y.items()], "ua long, ub long, y double"
    )
    row = mantel_permutation_test(xdf, ydf, n_perm=N_PERM).collect()[0]
    assert row.n_pairs == 6 and row.n_perm == N_PERM
    assert row.mantel_r == pytest.approx(r_obs, abs=1e-12)
    assert row.p_value == expected_p


def test_identity_permutation_would_always_hit(spark):
    """Sanity on the one-sided count: if Y is a strictly monotone function
    of X, the observed r is 1.0 and NO proper permutation of a
    non-degenerate Y can exceed it, so p is at most (hits+1)/(K+1) with
    hits counting only r_k == 1.0 ties."""
    from mmeds_meta_spark.operators.phylo import mantel_permutation_test

    xdf = spark.createDataFrame(
        [(a, b, v) for (a, b), v in X.items()], "ua long, ub long, x double"
    )
    y2 = spark.createDataFrame(
        [(a, b, 2.0 * v + 1.0) for (a, b), v in X.items()],
        "ua long, ub long, y double",
    )
    row = mantel_permutation_test(xdf, y2, n_perm=N_PERM).collect()[0]
    assert row.mantel_r == pytest.approx(1.0, abs=1e-12)
    assert 0.0 < row.p_value <= 1.0


def test_permutation_images_are_bijections():
    for k in range(1, 20):
        pi = _perm(k)
        assert sorted(pi.values()) == SAMPLES
    # not all identity: at least one k actually shuffles
    assert any(_perm(k) != {s: s for s in SAMPLES} for k in range(1, 20))


def test_all_permutations_reachable_small():
    """With 4 samples there are 24 permutations; the md5 family over many
    k values should hit a healthy variety (no structural bias)."""
    seen = {tuple(_perm(k)[s] for s in SAMPLES) for k in range(1, 200)}
    assert len(seen) >= 20  # 24 possible; md5 mixing should reach most
    assert len(seen) <= len(list(itertools.permutations(SAMPLES)))


def test_d4_permanova_matches_numpy_pseudo_f(spark):
    """The in-plan pseudo-F must agree with the collected-matrix numpy
    implementation (functions/permanova.py) on the same distances and
    the same user_id % 3 grouping; permutation families differ (md5 seed
    relation vs np RNG) so only the statistic is compared."""
    import pyspark.sql.functions as F

    from conftest import SF_CORRECT
    from mmeds_meta_spark.functions.permanova import permanova
    from mmeds_meta_spark.operators.diversity import d2_bray_curtis
    from mmeds_meta_spark.operators.phylo import d4_permanova

    bc = d2_bray_curtis(spark, SF_CORRECT)
    samples = (
        bc.select(F.col("ua").alias("s")).union(bc.select("ub")).distinct()
    )
    groups = samples.select("s", (F.col("s") % 3).alias("g"))
    ref = permanova(
        bc.select("ua", "ub", "bray_curtis"), groups, n_permutations=10, seed=7
    )
    row = d4_permanova(spark, SF_CORRECT, n_perm=11).collect()[0]
    assert row.n_samples == ref.n_samples
    assert row.n_groups == ref.n_groups == 3
    assert row.pseudo_f == pytest.approx(ref.pseudo_f, rel=1e-9)
    assert 0.0 < row.p_value <= 1.0
    assert row.n_perm == 11


def test_d10_anosim_matches_pandas_ranks(spark):
    """The in-plan Clarke R (two-phase distributed mid-rank) must agree
    with a driver-side pandas mid-rank computation on the same distances
    and the same user_id % 3 grouping."""
    import pandas as pd

    from conftest import SF_CORRECT
    from mmeds_meta_spark.operators.diversity import d2_bray_curtis
    from mmeds_meta_spark.operators.phylo import d10_anosim

    pdf = d2_bray_curtis(spark, SF_CORRECT).toPandas()
    ranks = pdf["bray_curtis"].rank(method="average")
    within = (pdf["ua"] % 3) == (pdf["ub"] % 3)
    m = len(pdf)
    r_expected = (
        ranks[~within].mean() - ranks[within].mean()
    ) / (m / 2.0)

    row = d10_anosim(spark, SF_CORRECT, n_perm=11).collect()[0]
    n_samples = len(set(pdf["ua"]) | set(pdf["ub"]))
    assert row.n_samples == n_samples
    assert row.n_groups == 3
    assert row.anosim_r == pytest.approx(r_expected, rel=1e-9)
    assert 0.0 < row.p_value <= 1.0
    assert row.n_perm == 11


def test_d11_alpha_gs_matches_pandas_kw(spark):
    """The in-plan Kruskal-Wallis H over the Shannon alpha vector must
    agree with a driver-side pandas mid-rank computation (tie-corrected
    H, groups = user_id % 3)."""
    from conftest import SF_CORRECT
    from mmeds_meta_spark.operators.diversity import d1_shannon_diversity
    from mmeds_meta_spark.operators.phylo import d11_alpha_group_significance

    pdf = d1_shannon_diversity(spark, SF_CORRECT).toPandas()
    ranks = pdf["shannon"].rank(method="average")
    g = pdf["user_id"] % 3
    n = len(pdf)
    sum_r2n = sum(
        ranks[g == gi].sum() ** 2 / (g == gi).sum() for gi in sorted(g.unique())
    )
    h_raw = 12.0 / (n * (n + 1)) * sum_r2n - 3.0 * (n + 1)
    t = pdf["shannon"].value_counts()
    tie = 1.0 - float((t**3 - t).sum()) / (n**3 - n)
    h_expected = h_raw / tie

    row = d11_alpha_group_significance(spark, SF_CORRECT, n_perm=11).collect()[0]
    assert row.n_samples == n
    assert row.n_groups == 3
    assert row.df == 2
    assert row.h_stat == pytest.approx(h_expected, abs=5.1e-7)  # 6-dp ROUND
    assert 0.0 < row.p_value <= 1.0
    assert row.n_perm == 11


def test_d4_pairwise_matches_restricted_full_permanova(spark):
    """Each pairwise row's pseudo-F must equal the collected-matrix numpy
    PERMANOVA run on the distances restricted to that pair's samples."""
    import pyspark.sql.functions as F

    from conftest import SF_CORRECT
    from mmeds_meta_spark.functions.permanova import permanova
    from mmeds_meta_spark.operators.diversity import d2_bray_curtis
    from mmeds_meta_spark.operators.phylo import d4_permanova_pairwise

    bc = d2_bray_curtis(spark, SF_CORRECT)
    rows = {
        (r.g1, r.g2): r
        for r in d4_permanova_pairwise(spark, SF_CORRECT, n_perm=7).collect()
    }
    assert set(rows) == {(0, 1), (0, 2), (1, 2)}
    for g1, g2 in rows:
        sub = bc.filter(
            (F.col("ua") % 3).isin(g1, g2) & (F.col("ub") % 3).isin(g1, g2)
        )
        samples = (
            sub.select(F.col("ua").alias("s")).union(sub.select("ub")).distinct()
        )
        groups = samples.select("s", (F.col("s") % 3).alias("g"))
        ref = permanova(
            sub.select("ua", "ub", "bray_curtis"), groups, n_permutations=5, seed=3
        )
        row = rows[(g1, g2)]
        assert row.n_samples == ref.n_samples
        assert row.pseudo_f == pytest.approx(ref.pseudo_f, rel=1e-9)
        assert 0.0 < row.p_value <= 1.0
        assert row.n_perm == 7
