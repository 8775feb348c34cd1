"""Free pipeline instrumentation via ``DataFrame.observe``.

A curation pipeline wants per-stage survivor counts and byte volumes,
but computing them as separate aggregations re-scans the stage output
(the documented trade in ``pipeline_curation_funnel``, which re-reads
pruned columns per stage).  ``observe`` attaches the metrics to the ONE
action the pipeline already runs: Spark evaluates the aggregate
expressions inside the existing plan (an accumulator-backed
CollectMetrics node — no extra scan, no extra shuffle, no second job)
and hands the row back after the action completes.

Usage::

    obs = StageMetrics()
    df = obs.track(df, "after_quality", F.count(F.lit(1)).alias("n"),
                   F.sum("n_chars").alias("chars"))
    ... more transformations ...
    df.write.parquet(out)          # the pipeline's own action
    obs.get("after_quality")       # {'n': ..., 'chars': ...}

Constraints inherited from Spark: metrics are aggregates over the rows
that FLOW THROUGH the observed node during the action (lazy — ``get``
before an action raises), and each observation name must be unique per
DataFrame lineage.  Works on batch DataFrames; for streams use
``observe`` + a StreamingQueryListener instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


class StageMetrics:
    """Named ``Observation`` registry for a multi-stage pipeline."""

    def __init__(self) -> None:
        self._obs: dict[str, Observation] = {}

    def track(self, df: DataFrame, stage: str, *metrics: Column) -> DataFrame:
        """Attach aggregate ``metrics`` to ``df`` under ``stage``; returns
        the observed DataFrame to keep composing.  One plan, no re-scan."""
        if stage in self._obs:
            raise ValueError(f"stage {stage!r} already tracked")
        ob = Observation(stage)
        self._obs[stage] = ob
        return df.observe(ob, *metrics)

    def get(self, stage: str) -> dict:
        """Metrics for ``stage`` — call AFTER the pipeline's action ran."""
        return dict(self._obs[stage].get)

    def report(self) -> dict[str, dict]:
        """All stages' metrics (each blocks until its action completed)."""
        return {name: dict(ob.get) for name, ob in self._obs.items()}
