"""Feature-table (OTU/ASV) sources and reshapes (SURVEY §1.4, §2.9).

Feature tables live LONG — (feature_id, sample_id, count) — per the
§1.4 Spark mapping; wide pivots happen only at the serialization edges.
At 100 TB the long form is the only one that scales: partitioned by
sample (or feature for taxonomic rollups), every operator below is a
groupBy/join, never a row-wise matrix walk.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

# ---------------------------------------------------------------------------
# wide TSV ↔ long  (extract_feature_table_tsv, rules/file_manipulation.smk)
# ---------------------------------------------------------------------------


def _melt_wide(wide: DataFrame) -> DataFrame:
    feature_col = wide.columns[0]
    samples = wide.columns[1:]
    stack_expr = ", ".join(f"'{s}', CAST(`{s}` AS DOUBLE)" for s in samples)
    return wide.selectExpr(
        f"`{feature_col}` AS feature_id",
        f"stack({len(samples)}, {stack_expr}) AS (sample_id, count)",
    )


def read_otu_wide(spark: SparkSession, path: str, *, sep: str = "\t") -> DataFrame:
    """Wide OTU TSV (feature id + one numeric column per sample) → long.
    The melt is a zero-shuffle `stack` generator over the sample columns."""
    return _melt_wide(spark.read.csv(path, sep=sep, header=True, inferSchema=False))


def read_otu_wide_lines(
    spark: SparkSession, lines: list[str], *, sep: str = "\t"
) -> DataFrame:
    """Same as :func:`read_otu_wide` but from in-memory text lines (qza
    payload extraction) — a parallelized dataset, so no driver-local temp
    file that executors on a real cluster could not read."""
    rdd = spark.sparkContext.parallelize(lines)
    return _melt_wide(spark.read.csv(rdd, sep=sep, header=True, inferSchema=False))


def long_to_wide(long_df: DataFrame) -> DataFrame:
    """(feature_id, sample_id, count) → wide, for writers only."""
    return long_df.groupBy("feature_id").pivot("sample_id").sum("count").na.fill(0.0)


# ---------------------------------------------------------------------------
# A13 — taxa collapse on real taxonomy strings (rules/taxonomy.smk:71-85)
# ---------------------------------------------------------------------------


def taxa_collapse(long_df: DataFrame, taxonomy: DataFrame, level: int) -> DataFrame:
    """Collapse features to taxonomy level L: truncate the '|'-separated
    lineage, sum counts.  ``taxonomy``: (feature_id, lineage)."""
    lin = taxonomy.withColumn(
        "taxon",
        F.array_join(F.slice(F.split(F.col("lineage"), r"\|"), 1, level), "|"),
    ).select("feature_id", "taxon")
    return (
        long_df.join(F.broadcast(lin), "feature_id")
        .groupBy("taxon", "sample_id")
        .agg(F.sum("count").alias("count"))
    )


# ---------------------------------------------------------------------------
# A14 — feature-table merge across runs (rules/process_sequencing_data.smk)
# ---------------------------------------------------------------------------


def merge_feature_tables(*tables: DataFrame) -> DataFrame:
    merged = tables[0]
    for t in tables[1:]:
        merged = merged.unionByName(t)
    return merged.groupBy("feature_id", "sample_id").agg(F.sum("count").alias("count"))


# ---------------------------------------------------------------------------
# F22 + R3 — LEfSe formatting (util.py:1698-1762 format_table_to_lefse)
# ---------------------------------------------------------------------------


def format_lefse(
    long_df: DataFrame,
    sample_meta: DataFrame,
    *,
    class_col: str,
    subclass_col: str | None = None,
    subject_col: str,
) -> DataFrame:
    """Relative abundances + metadata join, taxonomy delimiters swapped
    (';'→'|', ' '→'_'), samples with NULL class dropped — the long-form
    equivalent of the reference's transposed LEfSe table."""
    totals = long_df.groupBy("sample_id").agg(F.sum("count").alias("__tot"))
    rel = long_df.join(totals, "sample_id").withColumn(
        "rel_abundance", F.col("count") / F.col("__tot")
    )
    keep = [class_col, subject_col] + ([subclass_col] if subclass_col else [])
    meta = sample_meta.select("sample_id", *keep).filter(F.col(class_col).isNotNull())
    return (
        rel.join(meta, "sample_id")
        .withColumn(
            "taxon",
            F.regexp_replace(F.regexp_replace("feature_id", ";", "|"), " ", "_"),
        )
        .select("taxon", "sample_id", "rel_abundance", *keep)
    )


def write_lefse(df: DataFrame, path: str, *, class_col: str, subject_col: str,
                subclass_col: str | None = None) -> None:
    """Serialize to the reference's transposed layout: metadata rows first,
    then one row per taxon across sample columns."""
    samples = [r.sample_id for r in df.select("sample_id").distinct().orderBy("sample_id").collect()]
    meta_rows = {
        r["sample_id"]: r
        for r in df.select("sample_id", class_col, *([subclass_col] if subclass_col else []),
                           subject_col).distinct().collect()
    }
    wide = (
        df.groupBy("taxon").pivot("sample_id", samples).sum("rel_abundance").na.fill(0.0)
    ).orderBy("taxon")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\t".join(["class"] + [str(meta_rows[s][class_col]) for s in samples]) + "\n")
        if subclass_col:
            f.write("\t".join(["subclass"] + [str(meta_rows[s][subclass_col]) for s in samples]) + "\n")
        f.write("\t".join(["subject"] + [str(meta_rows[s][subject_col]) for s in samples]) + "\n")
        for row in wide.toLocalIterator():
            f.write("\t".join([row.taxon] + [repr(row[s]) for s in samples]) + "\n")


# ---------------------------------------------------------------------------
# QIIME mapping file (util.py:962-1012 create_qiime_from_mmeds)
# ---------------------------------------------------------------------------

QIIME_LEAD = ["#SampleID", "BarcodeSequence", "LinkerPrimerSequence", "MmedsSampleID"]


def write_qiime_mapping(df: DataFrame, path: str, *, sample_id_col: str,
                        barcode_col: str, linker_col: str) -> None:
    """Single-header wide TSV with the '#q2:types' second row (all
    categorical, mirroring the reference's writer)."""
    others = [c for c in df.columns if c not in (sample_id_col, barcode_col, linker_col)]
    out = df.select(
        F.col(sample_id_col).alias("#SampleID"),
        F.col(barcode_col).alias("BarcodeSequence"),
        F.col(linker_col).alias("LinkerPrimerSequence"),
        F.col(sample_id_col).alias("MmedsSampleID"),
        *[F.col(c) for c in others],
    )
    cols = out.columns
    with open(path, "w", encoding="utf-8") as f:
        f.write("\t".join(cols) + "\n")
        f.write("\t".join(["#q2:types"] + ["categorical"] * (len(cols) - 1)) + "\n")
        for row in out.toLocalIterator():
            f.write("\t".join("" if v is None else str(v) for v in row) + "\n")


# ---------------------------------------------------------------------------
# D1 — seeded rarefaction (multinomial downsample per sample/depth/iter)
# ---------------------------------------------------------------------------


def rarefy(
    long_df: DataFrame, *, depth: int, iterations: int, seed: int = 42
) -> DataFrame:
    """Rarefaction: for each (sample, iteration), draw ``depth`` reads
    without replacement from the sample's feature counts.

    Arrow-batched ``applyInPandas`` per sample — the one semantic Spark's
    built-ins can't express (a per-group multinomial draw).  The RNG seed
    is derived per (sample, depth, iteration) so results are reproducible
    under ANY partitioning (SURVEY §7 hard-part 6).  Output:
    (sample_id, iteration, feature_id, count)."""
    import pandas as pd

    def draw(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        (sample_id,) = key
        counts = pdf["count"].to_numpy().astype(np.int64)
        features = pdf["feature_id"].to_numpy()
        total = int(counts.sum())
        out = []
        for it in range(iterations):
            if total < depth:
                continue  # sample too shallow — dropped, as qiime does
            # stable per-(sample, depth, iter) seed: md5, NOT python hash()
            # (hash() is process-salted → would break cross-run determinism)
            import hashlib

            digest = hashlib.md5(
                f"{sample_id}|{depth}|{it}|{seed}".encode()
            ).digest()
            rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
            drawn = rng.multivariate_hypergeometric(counts, depth)
            nz = drawn > 0
            out.append(
                pd.DataFrame(
                    {
                        "sample_id": str(sample_id),
                        "iteration": it,
                        "feature_id": features[nz],
                        "count": drawn[nz].astype("float64"),
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {"sample_id": [], "iteration": [], "feature_id": [], "count": []}
            ).astype({"sample_id": str, "iteration": "int64", "feature_id": str, "count": "float64"})
        return pd.concat(out, ignore_index=True)

    return (
        long_df.withColumn("count", F.col("count").cast("double"))
        .groupBy("sample_id")
        .applyInPandas(
            draw, "sample_id string, iteration long, feature_id string, count double"
        )
    )


def rarefy_deterministic(
    long_df: DataFrame, *, depth: int, iterations: int, seed: int = 42
) -> DataFrame:
    """Deterministic rarefaction — the oracle-checkable twin of
    :func:`rarefy` (round-8 verdict #2): instead of a seeded multinomial
    draw, allocate ``depth`` reads per (sample, iteration) by integer
    proportional quotas plus an md5-greedy remainder — the exact
    technique ``sample_epoch_plan`` (operators/sampling.py) ships for
    data-constrained epoch planning:

    * quota_f = (depth * c_f) DIV total  — exact integer arithmetic,
      identical on both engines; quota_f < c_f whenever depth < total,
      so the allocation never over-draws a feature;
    * the remainder R = depth − Σ quota (R ≤ n_features − 1) goes +1 to
      the R features ranked first by md5(sample|iter|feature|seed).

    Every (sample, iteration) hits ``depth`` exactly; samples shallower
    than ``depth`` are dropped (as qiime does).  Pure DataFrame ops —
    one shuffle on (sample_id, iteration) for the two windows; no UDF,
    no RNG — so the draw itself is cross-engine gate-able
    (d1_rarefaction_det), unlike the multinomial pandas_udf."""
    tot = long_df.groupBy("sample_id").agg(
        F.expr("CAST(SUM(count) AS BIGINT)").alias("t")
    )
    base = (
        long_df.join(tot, "sample_id")
        .filter(F.col("t") >= depth)
        .select(
            "sample_id",
            "feature_id",
            F.col("count").cast("long").alias("c"),
            "t",
            F.explode(F.expr(f"sequence(0, {iterations - 1})")).alias("iteration"),
        )
    )
    q = base.select(
        "sample_id",
        "feature_id",
        F.col("iteration").cast("long").alias("iteration"),
        F.expr(f"CAST({depth} * c AS BIGINT) DIV t").alias("quota"),
        F.expr(
            "md5(concat(CAST(sample_id AS STRING), '|',"
            " CAST(iteration AS STRING), '|', CAST(feature_id AS STRING),"
            f" '|', '{seed}'))"
        ).alias("k"),
    )
    wrk = Window.partitionBy("sample_id", "iteration").orderBy("k", "feature_id")
    wall = Window.partitionBy("sample_id", "iteration")
    return (
        q.withColumn("rk", F.row_number().over(wrk))
        .withColumn("r", F.lit(depth) - F.sum("quota").over(wall))
        .select(
            "sample_id",
            "iteration",
            "feature_id",
            (
                F.col("quota")
                + F.when(F.col("rk") <= F.col("r"), F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("count"),
        )
        .filter(F.col("count") > 0)
    )


def alpha_over_rarefactions(rarefied: DataFrame) -> DataFrame:
    """Per (sample, iteration): observed features + Shannon; then the A10
    mean over iterations per sample."""
    per_iter = rarefied.groupBy("sample_id", "iteration").agg(
        F.count("*").alias("observed_features"),
        F.expr(
            "LN(SUM(count)) - SUM(count * LN(count)) / SUM(count)"
        ).alias("shannon"),
    )
    return per_iter.groupBy("sample_id").agg(
        F.avg("observed_features").alias("mean_observed"),
        F.avg("shannon").alias("mean_shannon"),
        F.count("*").alias("n_iterations"),
    )
