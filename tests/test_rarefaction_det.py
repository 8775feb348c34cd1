"""Deterministic rarefaction (sources/feature_table.rarefy_deterministic)
— the oracle-checkable twin of the multinomial pandas_udf draw.

Invariants the multinomial draw also guarantees:
* every surviving (sample, iteration) holds EXACTLY ``depth`` reads;
* no feature is drawn beyond its original count;
* samples shallower than ``depth`` are dropped;
* the draw is a pure function of (inputs, depth, iterations, seed).

Plus the round-8 verdict's parity ask: ``alpha_over_rarefactions`` runs
unchanged on the deterministic path.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from mmeds_meta_spark.sources.feature_table import (
    alpha_over_rarefactions,
    rarefy_deterministic,
)


def _table(spark):
    rows = [
        # sample a: total 100 across 4 features
        ("a", "f1", 40), ("a", "f2", 30), ("a", "f3", 20), ("a", "f4", 10),
        # sample b: total 60, skewed
        ("b", "f1", 55), ("b", "f2", 3), ("b", "f3", 2),
        # sample c: too shallow for depth 50
        ("c", "f1", 20), ("c", "f2", 10),
    ]
    return spark.createDataFrame(rows, "sample_id string, feature_id string, count long")


def test_depth_exact_and_bounded(spark):
    out = rarefy_deterministic(_table(spark), depth=50, iterations=3).collect()
    samples = {r["sample_id"] for r in out}
    assert samples == {"a", "b"}  # c dropped (total 30 < 50)
    per = {}
    for r in out:
        per.setdefault((r["sample_id"], r["iteration"]), []).append(r)
    assert sorted({k[1] for k in per}) == [0, 1, 2]
    orig = {(r["sample_id"], r["feature_id"]): r["count"] for r in _table(spark).collect()}
    for (s, it), rows in per.items():
        assert sum(r["count"] for r in rows) == 50, (s, it)
        for r in rows:
            assert 0 < r["count"] <= orig[(s, r["feature_id"])]


def test_proportionality_floor(spark):
    # quotas are exact floors: sample a at depth 50 over (40,30,20,10)/100
    # -> quotas (20,15,10,5) sum to 50, remainder 0 -> NO md5 bonus at all
    out = rarefy_deterministic(_table(spark), depth=50, iterations=1).collect()
    a = {r["feature_id"]: r["count"] for r in out if r["sample_id"] == "a"}
    assert a == {"f1": 20, "f2": 15, "f3": 10, "f4": 5}


def test_deterministic_and_seed_sensitive(spark):
    t = _table(spark)
    one = sorted(map(tuple, rarefy_deterministic(t, depth=47, iterations=2).collect()))
    two = sorted(map(tuple, rarefy_deterministic(t, depth=47, iterations=2).collect()))
    assert one == two
    other = sorted(
        map(tuple, rarefy_deterministic(t, depth=47, iterations=2, seed=7).collect())
    )
    # remainder exists at depth 47 (quotas floor) -> seed moves the bonus
    assert one != other


def test_alpha_over_rarefactions_parity(spark):
    det = rarefy_deterministic(_table(spark), depth=50, iterations=3)
    alpha = alpha_over_rarefactions(det)
    rows = {r["sample_id"]: r for r in alpha.collect()}
    assert set(rows) == {"a", "b"}
    assert all(r["n_iterations"] == 3 for r in rows.values())
    # the allocation is iteration-independent only when remainder is 0
    # (sample a): its per-iteration alpha is constant
    assert rows["a"]["mean_observed"] == 4.0
    assert rows["a"]["mean_shannon"] > 0
