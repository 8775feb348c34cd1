"""Summary-stage inputs (FIXTURES §11-§13): DADA2 stats tables,
alpha-rarefaction CSVs, and the analysis config YAML.

These feed the reference's pandas summary blocks
(resources/summary_code.txt); here they land as long DataFrames ready for
the A10/A11/A12 aggregations.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# §11 — DADA2 stats table (+ A12 read-retention decomposition, table_py)
# ---------------------------------------------------------------------------

_DADA2_STAGES = ("input", "filtered", "denoised", "merged", "non-chimeric")


def read_dada2_stats(spark: SparkSession, path: str) -> DataFrame:
    """`sample-id, input, filtered, [merged,] non-chimeric` TSV with the
    '#q2:types' second row skipped (summary_code.txt reads skiprows=[1])."""
    df = spark.read.csv(path, sep="\t", header=True, inferSchema=False)
    df = df.filter(~F.col(df.columns[0]).startswith("#q2:types"))
    stages = [c for c in df.columns[1:] if c in _DADA2_STAGES]
    out = df.select(
        F.col(df.columns[0]).alias("sample_id"),
        *[F.col(c).cast("long").alias(c) for c in stages],
    )
    return out


def read_retention(stats: DataFrame) -> DataFrame:
    """A12 — stepwise differences input−filtered−…: one long row per
    (sample, stage) with reads retained and reads lost at that stage."""
    stages = [c for c in stats.columns if c != "sample_id"]
    pairs = list(zip(stages, stages[1:]))
    stack_items = ", ".join(
        f"'{b}', `{a}` - `{b}`, `{b}`" for a, b in pairs
    )
    return stats.selectExpr(
        "sample_id",
        f"stack({len(pairs)}, {stack_items}) AS (stage, reads_lost, reads_retained)",
    )


# ---------------------------------------------------------------------------
# §12 — alpha-rarefaction CSV: depth-<D>_iter-<I> columns → long + A10/A11
# ---------------------------------------------------------------------------

_DEPTH_RE = re.compile(r"^depth-(\d+)_iter-(\d+)$")


def read_alpha_rarefaction(
    spark: SparkSession, path: str, *, group_col: str | None = None
) -> DataFrame:
    """Melt `sample-id, depth-D_iter-I..., [metadata...]` into
    (sample_id, depth, iteration, value[, group])."""
    df = spark.read.csv(path, sep=",", header=True, inferSchema=False)
    id_col = df.columns[0]
    depth_cols = [(c, *_DEPTH_RE.match(c).groups()) for c in df.columns if _DEPTH_RE.match(c)]
    stack_items = ", ".join(f"{d}L, {i}L, CAST(`{c}` AS DOUBLE)" for c, d, i in depth_cols)
    stack = (
        f"stack({len(depth_cols)}, {stack_items}) AS (depth, iteration, value)"
    )
    keep = [F.col(id_col).alias("sample_id")] + (
        [F.col(group_col).alias("group")] if group_col else []
    )
    return df.select(*keep, F.expr(stack))


def alpha_summary(long_df: DataFrame, *, has_group: bool = False) -> DataFrame:
    """A10 then A11: mean over iterations per (sample, depth); if grouped,
    second stage mean ± SEM per (group, depth) — pandas ddof=1 SEM."""
    per_sample = long_df.groupBy(
        *(["sample_id", "depth"] + (["group"] if has_group else []))
    ).agg(F.avg("value").alias("mean_value"))
    if not has_group:
        return per_sample
    return per_sample.groupBy("group", "depth").agg(
        F.avg("mean_value").alias("group_mean"),
        (F.stddev_samp("mean_value") / F.sqrt(F.count("*"))).alias("group_sem"),
        F.count("*").alias("n_samples"),
    )


# ---------------------------------------------------------------------------
# §13 — analysis config YAML (util.py:323-407 load_config)
# ---------------------------------------------------------------------------

CONFIG_DEFAULTS = {
    "sampling_depth": 1000,
    "metadata": "all",
    "taxa_levels": "all",
    "alpha_metrics": ["shannon", "observed_features"],
    "beta_metrics": ["braycurtis"],
    "taxonomic_database": "greengenes",
    "sequencing_runs": "all",
}


def load_analysis_config(path: str | None, metadata_columns: list[str]) -> dict:
    """Parse the analysis-config YAML (flat keys; 'all' expands against the
    metadata columns / 7 taxa levels).  Defaults applied per the reference's
    workflow parameter sets."""
    cfg = dict(CONFIG_DEFAULTS)
    if path:
        import yaml  # PyYAML ships with pyspark's deps; gated import

        with open(path, encoding="utf-8") as f:
            user = yaml.safe_load(f) or {}
        cfg.update({k: v for k, v in user.items() if v is not None})
    if cfg["metadata"] == "all":
        cfg["metadata"] = list(metadata_columns)
    if cfg["taxa_levels"] == "all":
        cfg["taxa_levels"] = list(range(1, 8))
    cfg["sampling_depth"] = int(cfg["sampling_depth"])
    return cfg
