"""Incremental additions: aliquot / sample upload files (FIXTURES §5/§6;
reference database.py:623-718 add_aliquot/add_sample/add_subject and the
`test_aliquot_upload.tsv` format).

Each addition is one MERGE-shaped job: resolve the parent by natural key,
generate continuation ordinal IDs where missing (W1), assign surrogate
keys past the current max, append.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..normalize import Warehouse
from .ids import generate_aliquot_ids


def add_aliquots(wh: Warehouse, upload: DataFrame, *, user_id: int) -> DataFrame:
    """Aliquot upload: (StudyName, SpecimenID, AliquotWeight,
    AliquotWeightUnit[, AliquotID]) rows → new Aliquot dimension rows.

    Returns the appended rows (with generated ids) for the caller's
    ids-file (create_ids_file parity)."""
    spec = wh.table("Specimen").select("idSpecimen", "SpecimenID")
    study = wh.table("Study").select("idStudy", "StudyName")
    exp = wh.table("Experiment").select("idExperiment", "Study_idStudy")
    spec_full = (
        wh.table("Specimen")
        .join(exp, F.col("Experiment_idExperiment") == F.col("idExperiment"))
        .join(study, F.col("Study_idStudy") == F.col("idStudy"))
        .select("idSpecimen", "SpecimenID", "StudyName")
    )
    resolved = upload.join(spec_full, ["StudyName", "SpecimenID"], "inner")
    needs_id = "AliquotID" not in upload.columns
    if needs_id:
        resolved = generate_aliquot_ids(wh, resolved).withColumnRenamed(
            "generated_id", "AliquotID"
        )
    existing = wh.table("Aliquot")
    mx = existing.agg(F.max("idAliquot")).first()[0] or 0
    w = Window.orderBy("AliquotID")
    new_rows = (
        resolved.withColumn("idAliquot", (F.lit(mx) + F.row_number().over(w)).cast("int"))
        .withColumn("user_id", F.lit(user_id).cast("int"))
        .select(
            "idAliquot",
            F.col("idSpecimen").alias("Specimen_idSpecimen"),
            "user_id",
            "AliquotID",
            F.col("AliquotWeight").cast("decimal(18,9)"),
            F.col("AliquotWeightUnit").cast("string")
            if "AliquotWeightUnit" in resolved.columns
            else F.lit(None).cast("string").alias("AliquotWeightUnit"),
            F.lit(1).cast("int").alias("StorageLocation_idStorageLocation"),
        )
    )
    wh.append("Aliquot", new_rows)
    return new_rows


def add_samples(wh: Warehouse, upload: DataFrame, *, user_id: int) -> DataFrame:
    """Sample upload (FIXTURES §6): (StudyName, AliquotID, SampleWeight,
    SampleWeightUnit[, SampleID]) rows → new Sample dimension rows, IDs
    continuing per aliquot."""
    from .ids import generate_sample_ids

    ali = wh.table("Aliquot").select("idAliquot", "AliquotID")
    resolved = upload.join(ali, "AliquotID", "inner")
    if "SampleID" not in upload.columns:
        resolved = generate_sample_ids(wh, resolved).withColumnRenamed(
            "generated_id", "SampleID"
        )
    existing = wh.table("Sample")
    mx = existing.agg(F.max("idSample")).first()[0] or 0
    w = Window.orderBy("SampleID")
    new_rows = (
        resolved.withColumn("idSample", (F.lit(mx) + F.row_number().over(w)).cast("int"))
        .withColumn("user_id", F.lit(user_id).cast("int"))
        .select(
            "idSample",
            F.lit(1).cast("int").alias("SampleProtocol_idSampleProtocol"),
            F.col("idAliquot").alias("Aliquot_idAliquot"),
            "user_id",
            "SampleID",
            F.col("SampleWeight").cast("decimal(18,9)"),
            (
                F.col("SampleWeightUnit").cast("string")
                if "SampleWeightUnit" in resolved.columns
                else F.lit(None).cast("string")
            ).alias("SampleWeightUnit"),
            F.lit(1).cast("int").alias("StorageLocation_idStorageLocation"),
        )
    )
    wh.append("Sample", new_rows)
    return new_rows


def remaining_weight(wh: Warehouse) -> DataFrame:
    """F19 — the weight cascade as a recompute: specimen initial weight
    minus the sum of its aliquots' weights (sql/triggers.sql:5-18 without
    triggers)."""
    spec = wh.table("Specimen").select(
        "idSpecimen", "SpecimenID", "SpecimenWeight"
    )
    ali = (
        wh.table("Aliquot")
        .filter(F.col("idAliquot") > 1)
        .groupBy("Specimen_idSpecimen")
        .agg(F.sum("AliquotWeight").alias("__alloc"))
    )
    return (
        spec.join(ali, spec.idSpecimen == ali.Specimen_idSpecimen, "left")
        .select(
            "idSpecimen",
            "SpecimenID",
            "SpecimenWeight",
            (
                F.col("SpecimenWeight").cast("decimal(18,9)")
                - F.coalesce(F.col("__alloc"), F.lit(0).cast("decimal(18,9)"))
            ).alias("remaining_weight"),
        )
    )


def write_query_tsv(df: DataFrame, path: str) -> None:
    """S8 — the query page's `query.tsv` sink (server.py:1353-1359):
    header + tab-separated rows."""
    with open(path, "w", encoding="utf-8") as f:
        f.write("\t".join(df.columns) + "\n")
        for row in df.toLocalIterator():
            f.write("\t".join("" if v is None else str(v) for v in row) + "\n")
