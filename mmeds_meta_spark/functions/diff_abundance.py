"""D5/D6 — native differential abundance (the reference shells out to
ANCOM-BC / LEfSe; rules/differential_abundance.smk:1-72).

v1 semantics (the documented fallback from SURVEY §2.10 D5): CLR
transform per sample, then per-feature Kruskal-Wallis across classes,
plus a LEfSe-flavored effect size (spread of per-class mean CLR).
Everything is DataFrame ops; the per-feature rank windows partition on
feature_id, so work distributes across features.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# chi-square upper-tail critical values at α=0.05 by df (KW H ~ χ²_{k-1})
_CHI2_05 = {1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.070}


def clr_transform(long_df: DataFrame) -> DataFrame:
    """Centered log-ratio per sample: log(count+1) − mean_sample(log(count+1)).
    The +1 pseudo-count mirrors the standard zero-handling."""
    lg = long_df.withColumn("__lg", F.log(F.col("count") + 1))
    means = lg.groupBy("sample_id").agg(F.avg("__lg").alias("__mlg"))
    return (
        lg.join(means, "sample_id")
        .withColumn("clr", F.col("__lg") - F.col("__mlg"))
        .drop("__lg", "__mlg")
    )


def differential_abundance(
    long_df: DataFrame, sample_meta: DataFrame, *, class_col: str
) -> DataFrame:
    """Per-feature KW H over CLR values across classes + effect size.

    Output: (feature_id, h_stat, df, significant, effect_size,
    top_class) — `significant` at α=0.05 via the χ² critical value,
    `effect_size` = max−min per-class mean CLR, `top_class` = class with
    the highest mean CLR (LEfSe's "which group is it enriched in").
    """
    clr = clr_transform(long_df).join(
        sample_meta.select("sample_id", class_col), "sample_id"
    )
    # tie-averaged ranks within each feature (rank×2 integer-exact)
    wf = Window.partitionBy("feature_id").orderBy("clr")
    wt = Window.partitionBy("feature_id", "clr")
    ranked = clr.withColumn("rmin", F.rank().over(wf)).withColumn(
        "t", F.count("*").over(wt)
    ).withColumn("rank2", 2 * F.col("rmin") + F.col("t") - 1)
    g = ranked.groupBy("feature_id", class_col).agg(
        F.sum("rank2").alias("rg2"),
        F.count("*").alias("ng"),
        F.avg("clr").alias("mean_clr"),
    )
    ties = (
        ranked.groupBy("feature_id", "clr")
        .agg(F.count("*").alias("tt"))
        .groupBy("feature_id")
        .agg(F.sum(F.col("tt") * F.col("tt") * F.col("tt") - F.col("tt")).alias("tie_sum"))
    )
    per_feature = (
        g.groupBy("feature_id")
        .agg(
            F.sum(F.col("rg2") * F.col("rg2") / F.col("ng") / 4).alias("sum_r2n"),
            F.sum("ng").alias("n"),
            F.count("*").alias("k"),
            (F.max("mean_clr") - F.min("mean_clr")).alias("effect_size"),
            F.max(F.struct(F.col("mean_clr"), F.col(class_col).alias("cls"))).alias("__top"),
        )
        .join(ties, "feature_id")
    )
    h = (
        (12.0 / (F.col("n") * (F.col("n") + 1)) * F.col("sum_r2n") - 3.0 * (F.col("n") + 1))
        / (1.0 - F.col("tie_sum") / (F.col("n") * F.col("n") * F.col("n") - F.col("n")))
    )
    crit = F.coalesce(
        *[F.when(F.col("k") - 1 == df, F.lit(v)) for df, v in _CHI2_05.items()],
        F.lit(float("inf")),
    )
    return per_feature.select(
        "feature_id",
        F.round(h, 6).alias("h_stat"),
        (F.col("k") - 1).cast("long").alias("df"),
        (h > crit).alias("significant"),
        F.round("effect_size", 6).alias("effect_size"),
        F.col("__top.cls").alias("top_class"),
    )
