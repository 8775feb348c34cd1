"""d18 Kaplan-Meier: the Spark estimator must match a pure-Python
lifelines-style implementation exactly (third engine beside the DuckDB
oracle), and the curve must satisfy the estimator's invariants."""

from __future__ import annotations

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.stats import _KM_EVENT, d18_kaplan_meier


def _python_km(sf_dir: str):
    import duckdb

    rows = duckdb.sql(
        f"""
        SELECT user_id,
               MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS tn,
               MIN(CASE WHEN event_type = '{_KM_EVENT}' THEN epoch_us(ts) END) AS tp
        FROM '{sf_dir}/events.parquet' GROUP BY 1
        """
    ).fetchall()
    lives = [
        (((tp - t0) if tp is not None else (tn - t0)) // 3_600_000_000, tp is not None)
        for _, t0, tn, tp in rows
    ]
    risk: dict[int, list[int]] = {}
    for t, observed in lives:
        d, c = risk.setdefault(t, [0, 0])
        risk[t][0 if observed else 1] += 1
    total = len(lives)
    out = {}
    seen = 0
    s = 1.0
    for t in sorted(risk):
        d, c = risk[t]
        n_risk = total - seen
        s = s * (1.0 - d / n_risk)  # same fold order as both engines
        out[t] = (n_risk, d, c, s)
        seen += d + c
    return out


def test_km_matches_python_twin(spark):
    got = {
        r["t"]: (r["n_risk"], r["n_events"], r["n_censored"], r["survival"])
        for r in d18_kaplan_meier(spark, SF_SMOKE).collect()
    }
    assert got == _python_km(SF_SMOKE)


def test_km_invariants(spark):
    rows = sorted(
        d18_kaplan_meier(spark, SF_SMOKE).collect(), key=lambda r: r["t"]
    )
    assert rows
    # survival is non-increasing in t and stays within [0, 1]
    surv = [r["survival"] for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    # the at-risk count at the first time equals the full cohort and is
    # strictly decreasing thereafter
    n_risk = [r["n_risk"] for r in rows]
    assert n_risk[0] == sum(r["n_events"] + r["n_censored"] for r in rows)
    assert all(a > b for a, b in zip(n_risk, n_risk[1:]))


def test_logrank_matches_python_twin(spark):
    import duckdb

    from mmeds_meta_spark.operators.stats import (
        _KM_EVENT,
        d19_logrank_test,
    )

    rows = duckdb.sql(
        f"""
        SELECT user_id,
               MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS tn,
               MIN(CASE WHEN event_type = '{_KM_EVENT}' THEN epoch_us(ts) END) AS tp
        FROM '{SF_SMOKE}/events.parquet' GROUP BY 1
        """
    ).fetchall()
    lives = [
        (
            ((tp - t0) if tp is not None else (tn - t0)) // 3_600_000_000,
            tp is not None,
            u % 2 == 1,
        )
        for u, t0, tn, tp in rows
    ]
    byt: dict[int, list[int]] = {}
    for t, obs, g1 in lives:
        r = byt.setdefault(t, [0, 0, 0, 0])  # d, d1, a, a1
        r[0] += obs
        r[1] += obs and g1
        r[2] += 1
        r[3] += g1
    n_all = len(lives)
    n1_all = sum(1 for _, _, g1 in lives if g1)
    seen = seen1 = 0
    sde = sv = 0.0
    n_times = 0
    for t in sorted(byt):  # same ascending fold order as both engines
        d, d1, a, a1 = byt[t]
        n = n_all - seen
        n1 = n1_all - seen1
        if d > 0:
            n_times += 1
            sde += d1 - d * n1 / n
            if n > 1:
                sv += d * (n1 / n) * (1.0 - n1 / n) * ((n - d) / (n - 1))
        seen += a
        seen1 += a1
    chi2 = sde * sde / sv

    got = d19_logrank_test(spark, SF_SMOKE).collect()[0]
    assert got["n_times"] == n_times and got["df"] == 1
    assert got["chi2"] == round(chi2, 6)
    assert got["reject_h0"] == (chi2 > 3.841)


def test_nelson_aalen_matches_python_twin(spark):
    from mmeds_meta_spark.operators.stats import d20_nelson_aalen

    km = _python_km(SF_SMOKE)
    # rebuild the cumulative hazard from the same risk table, folding in
    # the same ascending order as both engines
    h = vh = 0.0
    want = {}
    for t in sorted(km):
        n_risk, d, c, _ = km[t]
        h += d / n_risk
        vh += d / (n_risk * n_risk)
        want[t] = (n_risk, d, c, h, vh)
    got = {
        r["t"]: (
            r["n_risk"],
            r["n_events"],
            r["n_censored"],
            r["cum_hazard"],
            r["hazard_var"],
        )
        for r in d20_nelson_aalen(spark, SF_SMOKE).collect()
    }
    assert got == want
    # hazard is non-decreasing; exp(-H) tracks below-or-near the KM curve
    hs = [want[t][3] for t in sorted(want)]
    assert all(a <= b for a, b in zip(hs, hs[1:]))


def test_prefix_fold_multiblock_exact_and_linear(spark):
    """functions/prefix_fold.py on a >BLOCK risk table: the blocked
    association must match a pure-Python twin folding the SAME tree
    bit-for-bit, and the cost must stay linear (a 10^4-row table runs
    in seconds, where the round-9 per-row collect_list re-fold was
    quadratic)."""
    import time

    from mmeds_meta_spark.functions.prefix_fold import BLOCK, prefix_fold

    n = 1001  # > 4 blocks at BLOCK=250, odd so the tail block is partial
    terms = [1.0 - 1.0 / (i + 3) for i in range(n)]
    df = spark.createDataFrame(
        [(i, terms[i]) for i in range(n)], "t long, term double"
    )
    got = {
        r["t"]: r["p"]
        for r in prefix_fold(df, "t", [("term", "p", "*", "1.0")]).collect()
    }

    # python twin of the SAME blocked tree
    blocks = [terms[i : i + BLOCK] for i in range(0, n, BLOCK)]
    outer = 1.0
    want = {}
    i = 0
    for b in blocks:
        acc = 1.0
        for x in b:
            acc = acc * x
            want[i] = outer * acc
            i += 1
        outer = outer * acc
    assert got == want

    # linearity probe: 10^4 distinct durations through the same fold
    big = spark.range(10_000).selectExpr(
        "id AS t", "1.0 - 1.0 / (id + 2.0) AS term"
    )
    t0 = time.time()
    out = prefix_fold(big, "t", [("term", "p", "*", "1.0")]).count()
    assert out == 10_000
    assert time.time() - t0 < 60  # quadratic would fold 5*10^7 growing arrays
