"""Tree diversity metrics over a real branch-membership relation.

operators/phylo.py computes faith_pd / UniFrac on a synthetic md5-derived
branch relation; this module is the same relational algebra over a REAL
tree loaded by sources/newick.py — closing the gap to the reference's
fasttree artifacts (rules/process_sequencing_data.smk:72-89 produces the
tree, rules/diversity_analysis.smk:5-75 consumes it).

Inputs
    membership : (branch, length double, leaf, is_leaf_edge)  — small,
                 broadcast (one row per edge × descendant leaf).
    features   : (sample, feature, count)                     — the big,
                 distributed side; joined on feature == leaf.

All pairwise metrics use the cleared-rational decomposition (only shared
branches ever join; unshared mass comes from per-sample totals; ONE final
division) so the plan is an inverted-index join, never a dense matrix,
and — when branch lengths are integer-valued — every intermediate is an
exact integer in doubles (< 2^53), bit-identical across engines.  With
real fasttree float lengths the same code runs subject to ordinary FP
summation rounding.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def tree_cov(features: DataFrame, membership: DataFrame) -> DataFrame:
    """(sample, branch, len, cb, is_leaf_edge): per-sample branch coverage.

    cb = total abundance of the branch's descendant leaves in the sample.
    membership is broadcast — it is edges × depth rows regardless of data
    scale; the features side keeps its partitioning (join key = feature).
    """
    return (
        features.join(
            F.broadcast(membership), features["feature"] == membership["leaf"]
        )
        .groupBy("sample", "branch")
        .agg(
            F.sum("count").alias("cb"),
            F.first("length").alias("len"),
            F.first("is_leaf_edge").alias("is_leaf_edge"),
        )
    )


def faith_pd(cov: DataFrame) -> DataFrame:
    """Faith's PD: Σ branch length over branches with ≥1 present
    descendant.  Linear — one groupBy, no pairs."""
    return cov.groupBy("sample").agg(
        F.count("*").alias("n_branches"), F.sum("len").alias("pd")
    )


def unifrac_unweighted(cov: DataFrame) -> DataFrame:
    """(Ta + Tb − 2S)/(Ta + Tb − S): S from the branch-inverted-index
    join restricted to co-covered branches; T from per-sample totals."""
    present = cov.select("sample", "branch", "len").dropDuplicates(
        ["sample", "branch"]
    )
    tot = present.groupBy("sample").agg(F.sum("len").alias("t"))
    a = present.select(
        F.col("sample").alias("sa"), "branch", F.col("len").alias("la")
    )
    b = present.select(F.col("sample").alias("sb"), "branch")
    shared = (
        a.join(b, "branch")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.sum("la").alias("s"))
    )
    ta = tot.select(F.col("sample").alias("sa"), F.col("t").alias("ta"))
    tb = tot.select(F.col("sample").alias("sb"), F.col("t").alias("tb"))
    return (
        ta.join(tb, ta["sa"] < tb["sb"])
        .join(shared, ["sa", "sb"], "left")
        .fillna(0.0, subset=["s"])
        .select(
            "sa",
            "sb",
            ((F.col("ta") + F.col("tb") - 2 * F.col("s"))
             / (F.col("ta") + F.col("tb") - F.col("s"))).alias("unifrac_u"),
        )
    )


def unifrac_weighted(cov: DataFrame) -> DataFrame:
    """Σ_b len·|c_a/N_a − c_b/N_b| with the rationals cleared:
    (Σ_shared len·|c_a·N_b − c_b·N_a| + N_b·(W_a−SC_a) + N_a·(W_b−SC_b))
    / (N_a·N_b) — every term a product/sum (exact for integer lengths),
    one final division."""
    nt = (
        cov.filter("is_leaf_edge")
        .groupBy("sample")
        .agg(F.sum("cb").alias("n"))
    )
    wt = cov.groupBy("sample").agg(F.sum(F.col("len") * F.col("cb")).alias("w"))
    na = nt.select(F.col("sample").alias("sa"), F.col("n").alias("na"))
    nb = nt.select(F.col("sample").alias("sb"), F.col("n").alias("nb"))
    a = cov.select(
        F.col("sample").alias("sa"),
        "branch",
        F.col("len").alias("la"),
        F.col("cb").alias("ca"),
    )
    b = cov.select(F.col("sample").alias("sb"), "branch", F.col("cb").alias("cb2"))
    common = (
        a.join(b, "branch")
        .filter(F.col("sa") < F.col("sb"))
        .join(F.broadcast(na), "sa")
        .join(F.broadcast(nb), "sb")
        .groupBy("sa", "sb")
        .agg(
            F.sum(
                F.col("la")
                * F.abs(F.col("ca") * F.col("nb") - F.col("cb2") * F.col("na"))
            ).alias("ncommon"),
            F.sum(F.col("la") * F.col("ca")).alias("sca"),
            F.sum(F.col("la") * F.col("cb2")).alias("scb"),
        )
    )
    wa = wt.select(F.col("sample").alias("sa"), F.col("w").alias("wa"))
    wb = wt.select(F.col("sample").alias("sb"), F.col("w").alias("wb"))
    return (
        na.join(nb, na["sa"] < nb["sb"])
        .join(wa, "sa")
        .join(wb, "sb")
        .join(common, ["sa", "sb"], "left")
        .fillna(0.0, subset=["ncommon", "sca", "scb"])
        .select(
            "sa",
            "sb",
            (
                (
                    F.col("ncommon")
                    + F.col("nb") * (F.col("wa") - F.col("sca"))
                    + F.col("na") * (F.col("wb") - F.col("scb"))
                )
                / (F.col("na") * F.col("nb"))
            ).alias("unifrac_w"),
        )
    )
