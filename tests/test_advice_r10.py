"""Regression tests for the four round-10 ADVICE items.

1. d19 log-rank sv = 0 guard: degenerate cohorts (no events, or every
   event time with n_risk <= 1) must yield (chi2 NULL, reject_h0 false)
   on BOTH engines instead of engine-divergent 0/0 artifacts.
2. host-graph streamed-vs-batch equality qualified for duplicate
   doc_ids — covered by
   tests/test_streaming_host_graph.py::test_duplicate_doc_folds_once;
   here we pin the docstring qualification itself.
3. pipeline_curation_funnel no longer claims "no inter-stage
   materialization" (the domain-cap stage checkpoints a bounded keeper
   relation).
4. web_host_harmonic's scale narrative names the quadratic-closure
   caveat and the mitigation (frontier pruning / HyperBall sketches).
"""

from __future__ import annotations


def test_logrank_sv_zero_guard_spark(spark):
    from mmeds_meta_spark.operators.stats import logrank_from_lifetimes

    # every user censored -> zero events -> sde = sv = 0
    life = spark.createDataFrame(
        [(i, 0, (i + 1) * 3_600_000_000, None) for i in range(8)],
        "user_id long, t0 long, tn long, tp long",
    )
    row = logrank_from_lifetimes(life).collect()[0]
    assert row["chi2"] is None
    assert row["reject_h0"] is False
    assert row["n_times"] == 0


def test_logrank_sv_zero_guard_oracle():
    # the same degenerate cohort through the oracle SQL's final
    # expressions: DuckDB's IEEE 0/0 would yield NaN without the guard
    import duckdb

    got = duckdb.sql(
        """
        WITH sums AS (SELECT 0.0 AS sde, 0.0 AS sv, CAST(0 AS BIGINT) AS n_times)
        SELECT CASE WHEN sv > 0 THEN ROUND(sde * sde / sv, 6) END AS chi2,
               CASE WHEN sv > 0 THEN sde * sde / sv > 3.841 ELSE false END AS r
        FROM sums
        """
    ).fetchall()[0]
    assert got == (None, False)


def test_logrank_oracle_sql_carries_guard():
    from mmeds_meta_spark.operators.stats import _logrank_sql

    sql = _logrank_sql()
    assert "CASE WHEN sv > 0" in sql


def test_host_graph_docstring_qualifies_duplicate_docs():
    from mmeds_meta_spark.streaming import host_graph

    doc = host_graph.__doc__
    assert "doc_ids are unique across batches" in doc
    assert "folds to ONE edge contribution" in doc


def test_curation_funnel_docstring_admits_checkpoint():
    from mmeds_meta_spark.operators.pipeline import pipeline_curation_funnel

    doc = pipeline_curation_funnel.__doc__
    assert "no inter-stage materialization" not in doc
    assert "ONE bounded materialization" in doc


def test_harmonic_scale_narrative_names_mitigation():
    from mmeds_meta_spark.operators.web import web_host_harmonic

    doc = web_host_harmonic.__doc__
    assert "frontier pruning" in doc
    assert "HyperBall" in doc
