"""Round-8 operator invariants beyond the oracle gate:
dedup_cross_source_matrix and sample_epoch_plan."""

from __future__ import annotations

from conftest import SF_SMOKE

from mmeds_meta_spark.operators import registry

REG = registry()


def test_cross_source_matrix_shape_and_bounds(spark):
    rows = REG["dedup_cross_source_matrix"].spark(spark, SF_SMOKE).collect()
    sources = {r.source_a for r in rows} | {r.source_b for r in rows}
    n = len(sources)
    assert len(rows) == n * (n - 1) // 2, "every unordered source pair reports"
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 <= r.n_shared <= min(r.n_a, r.n_b)
        assert 0.0 <= r.vocab_jaccard <= 1.0
        # the jaccard is the stated integer ratio
        assert r.vocab_jaccard == round(r.n_shared / (r.n_a + r.n_b - r.n_shared), 6)


def test_epoch_plan_budget_and_determinism(spark):
    rows = REG["sample_epoch_plan"].spark(spark, SF_SMOKE).collect()
    total = sum(r.n_tokens for r in rows)
    t_target = 5 * total // 2
    planned = sum(r.planned_tokens for r in rows)
    # greedy prefix fill: within one doc's tokens of the target, never over
    assert planned <= t_target
    assert t_target - planned < max(r.n_tokens for r in rows)
    full = t_target // total
    assert {r.n_copies for r in rows} <= {full, full + 1}
    # per-doc arithmetic is consistent
    for r in rows:
        assert r.planned_tokens == r.n_tokens * r.n_copies
    # deterministic: a second invocation plans the identical copies
    again = {
        r.doc_id: r.n_copies
        for r in REG["sample_epoch_plan"].spark(spark, SF_SMOKE).collect()
    }
    assert again == {r.doc_id: r.n_copies for r in rows}


def test_mixture_plan_invariants(spark):
    rows = REG["pipeline_mixture_plan"].spark(spark, SF_SMOKE).collect()
    assert rows
    # weights form a distribution (6dp rounding tolerance)
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 0.0 <= r.top_overlap_containment <= 1.0
        assert 0 <= r.effective_tokens <= r.n_tokens
        # the discount is exactly the stated floor expression
        # (containment is rounded at 6dp for display only, so allow
        # one-token slack from the rounding)
        assert (
            abs(
                r.effective_tokens
                - int(r.n_tokens * (1 - r.top_overlap_containment))
            )
            <= max(1, int(r.n_tokens * 1e-5))
        )


def _parity(spark, duck_con, spec, sf):
    df = spec.spark(spark, sf)
    s_cols = [c.lower() for c in df.columns]
    rel = duck_con.sql(spec.oracle)
    d_cols = [c.lower() for c in rel.columns]
    assert sorted(s_cols) == sorted(d_cols)
    os_ = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    od_ = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    sn = sorted((tuple(tuple(r)[i] for i in os_) for r in df.collect()), key=repr)
    dn = sorted((tuple(r[i] for i in od_) for r in rel.fetchall()), key=repr)
    assert sn == dn
    return sn


def test_mixture_plan_single_source_degenerate(spark, tmp_path):
    """One source: no overlap pairs exist — both engines must emit one
    row with a NULL partner, zero containment, and weight 1.0."""
    import duckdb

    d = tmp_path / "onesrc"
    rows = [(i, f"tok{i} tok{i+1} tok{i+2}", "xx", "only", 10) for i in range(6)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    sn = _parity(spark, con, REG["pipeline_mixture_plan"], str(d))
    assert len(sn) == 1
    row = dict(zip(sorted(c.lower() for c in ["source","n_docs","n_tokens","n_vocab","top_overlap_source","top_overlap_containment","effective_tokens","mix_weight"]), sn[0]))
    assert row["mix_weight"] == 1.0
    assert row["top_overlap_source"] is None
    assert row["top_overlap_containment"] == 0.0


def test_diff_abundance_single_event_type(spark, tmp_path):
    """One feature, one class-constant value stream: KW is degenerate
    (all CLR values tie at 0) — both engines must agree on the NULL-H
    row instead of dividing by the zero tie denominator."""
    import duckdb

    d = tmp_path / "oneev"
    rows = [
        (i, f"2024-01-01 0{i % 10}:00:00", i % 6, "click", 1.0, "{}")
        for i in range(24)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'")
    sn = _parity(spark, con, REG["pipeline_diff_abundance"], str(d))
    assert len(sn) == 1  # the single feature reports exactly once


def test_cluster_split_never_straddles(spark):
    """The leakage-safety contract itself: every near-dup cluster's
    members land on ONE side, and the plain hash split on the same
    corpus demonstrably violates this (the reason the operator exists)."""
    rows = REG["sample_cluster_split"].spark(spark, SF_SMOKE).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.split_key, set()).add(r.split)
    assert all(len(v) == 1 for v in by_key.values())
    clustered = [r for r in rows if r.is_clustered]
    assert clustered, "fixture has near-dup clusters"
    # the naive per-doc split puts at least one cluster on both sides
    naive = {
        r.doc_id: r.split
        for r in REG["sample_hash_split"].spark(spark, SF_SMOKE).collect()
    }
    naive_by_cluster = {}
    for r in clustered:
        naive_by_cluster.setdefault(r.split_key, set()).add(naive[r.doc_id])
    assert any(len(v) > 1 for v in naive_by_cluster.values()), (
        "if the naive split never straddles, this corpus cannot "
        "demonstrate the operator's value"
    )
