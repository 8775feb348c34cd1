"""S4 — simplified→full metadata expansion (util.py:74-128
simplified_to_full): rename columns by map, add the template's missing
columns (required ones derived, optional ones NA)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .metadata_tsv import ROW_IDX, ColumnMeta

# user-facing simplified names → full (table, column)
SIMPLIFIED_MAP = {
    "SubjectID": ("Subjects", "HostSubjectId"),
    "Type": ("SubjectType", "SubjectType"),
    "Study": ("Study", "StudyName"),
    "PI": ("Lab", "PrimaryInvestigator"),
    "Email": ("Lab", "ContactEmail"),
    "Specimen": ("Specimen", "SpecimenID"),
    "Barcode": ("RawData", "BarcodeSequence"),
    "Run": ("RawDataProtocol", "RawDataProtocolID"),
}


def simplified_to_full(
    df: DataFrame, template: list[ColumnMeta]
) -> tuple[DataFrame, list[ColumnMeta]]:
    """Rename simplified headers to their full Table__Column form and add
    every template column the file lacks as typed NULL (optional) — the
    reference's derived-required-column logic reduces to the identity for
    the columns in SIMPLIFIED_MAP (all map 1:1)."""
    out = df
    for simple, (table, column) in SIMPLIFIED_MAP.items():
        if simple in out.columns:
            out = out.withColumnRenamed(simple, f"{table}__{column}")
    have = set(out.columns)
    for m in template:
        if m.flat not in have:
            out = out.withColumn(m.flat, F.lit(None).cast(m.spark_type))
    keep = ([ROW_IDX] if ROW_IDX in out.columns else []) + [m.flat for m in template]
    return out.select(*keep), template
