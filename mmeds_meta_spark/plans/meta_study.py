"""§3.2 step 5 — the meta-study pipeline: cohort query → per-study sample
subsets → union → ID uniquification → StudyName rewrite → split back into
subject/specimen frames ready for re-upload.

The reference does this through temp files and pandas
(util.py:1765-1784, 222-236); here it is one DataFrame job — the cohort
filter IS the subset (no file shuffling), the union is ``unionByName``,
and the uniquifier is a window.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..catalog import ANIMAL_TABLES, SUBJECT_TABLES
from ..sources.metadata_tsv import ROW_IDX, ColumnMeta, split_metadata
from .ids import uniquify_ids
from .query import MmedsSession


def build_meta_study(
    session: MmedsSession,
    where: str,
    *,
    joined_metadata: dict[str, DataFrame],
    new_study_name: str,
) -> DataFrame:
    """Materialize a meta-study cohort.

    ``joined_metadata``: StudyName → the study's joined (subject⋈specimen)
    metadata frame (what the reference fetches via the mongo docs' file
    paths — here the frames are handed in directly, S9's job).

    Steps (mirroring util.py:1765-1784 then 222-235):
    1. cohort RawDataIDs per study from MetaAnalysisView,
    2. per-study metadata subset via semi-join on RawDataID (P6),
    3. unionByName(allowMissingColumns=True) across studies (U1),
    4. uniquify RawDataID by row position (W2),
    5. StudyName rewritten to the meta-study's name.
    """
    cohort = session.query_meta_analysis(where)
    keep = cohort.select(F.explode("RawDataIDs").alias("RawDataID"))
    parts = []
    for study, meta_df in joined_metadata.items():
        subset = meta_df.join(
            F.broadcast(keep),
            meta_df["RawData__RawDataID"] == keep["RawDataID"],
            "left_semi",
        )
        parts.append(subset)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p, allowMissingColumns=True)
    merged = uniquify_ids(merged, "RawData__RawDataID", order_cols=[ROW_IDX])
    return merged.withColumn("Study__StudyName", F.lit(new_study_name))


def split_meta_study(
    merged: DataFrame, meta: list[ColumnMeta]
) -> tuple[DataFrame, DataFrame]:
    """Split the merged frame back into (subject, specimen) frames (U2),
    ready for a fresh import_study run."""
    subject = split_metadata(merged, meta, SUBJECT_TABLES | ANIMAL_TABLES)
    specimen_tables = {m.table for m in meta} - (SUBJECT_TABLES | ANIMAL_TABLES - {"SubjectType"})
    specimen = split_metadata(merged, meta, specimen_tables)
    return subject, specimen
