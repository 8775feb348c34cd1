"""w17_markov_absorption: pure-Python recomputation of the chain fit
and the 24-step absorption iteration."""

from __future__ import annotations

from collections import Counter, defaultdict

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.filters_misc import (
    _ABS_STATE,
    _ABS_STEPS,
    w17_markov_absorption,
)


def test_absorption_matches_pure_python(spark):
    from mmeds_meta_spark.functions.event_time import event_time_us

    raw = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    ev = sorted(
        raw.select(
            "user_id",
            "event_id",
            "event_type",
            event_time_us(raw.schema).alias("ts_us"),
        ).collect(),
        key=lambda r: (r.user_id, r.ts_us, r.event_id),
    )
    steps: Counter = Counter()
    by_user: defaultdict = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r.event_type)
    for seq in by_user.values():
        for a, b in zip(seq, seq[1:]):
            steps[(a, b)] += 1
    totals: Counter = Counter()
    for (a, _), n in steps.items():
        totals[a] += n
    trans = defaultdict(list)  # cur -> [(nxt, p)] in nxt order
    for (a, b), n in sorted(steps.items()):
        trans[a].append((b, n / totals[a]))
    states = sorted({a for a, _ in steps} | {b for _, b in steps})
    x = {s: 1.0 if s == _ABS_STATE else 0.0 for s in states}
    for _ in range(_ABS_STEPS):
        nxt = {}
        for s in states:
            if s == _ABS_STATE:
                nxt[s] = 1.0
                continue
            acc = 0.0
            for j, p in trans.get(s, []):  # nxt-ascending fold order
                acc += p * x[j]
            nxt[s] = acc
        x = nxt

    got = {r.state: r for r in w17_markov_absorption(spark, SF_SMOKE).collect()}
    assert set(got) == set(states)
    for s in states:
        assert got[s].n_out == len(trans.get(s, []))
        assert abs(got[s].p_convert - x[s]) < 5.1e-7  # operator rounds 6dp
    assert got[_ABS_STATE].p_convert == 1.0


def test_removal_effects_are_monotone_and_bounded(spark):
    """w18_markov_removal: deleting a channel only removes paths, so
    p_removed <= p_full always, and effects lie in [0, 1]."""
    from mmeds_meta_spark.operators.filters_misc import w18_markov_removal

    rows = w18_markov_removal(spark, SF_SMOKE).collect()
    assert rows, "fixture chain should have removable channels"
    for r in rows:
        assert r.p_removed <= r.p_full + 5.1e-7
        assert 0.0 <= r.removal_effect <= 1.0
