"""Scalar helpers (SURVEY §2.8): camel-casing, numeric tests, MIxS
column mapping, taxonomy delimiter swaps — all built-in column
expressions (no UDFs)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# F21 — MIxS ↔ MMEDS column mapping (reference config.py:819-860).
# Static rename maps; closed-world like the schema catalog.
MMEDS_TO_MIXS = {
    "Study__StudyName": "project_name",
    "CollectionSite__Latitude": "lat_lon.latitude",
    "CollectionSite__Longitude": "lat_lon.longitude",
    "CollectionSite__Depth": "depth",
    "CollectionSite__Elevation": "elev",
    "CollectionSite__Environment": "env_broad_scale",
    "CollectionSite__Biome": "env_local_scale",
    "CollectionSite__Material": "env_medium",
    "Specimen__SpecimenCollectionDate": "collection_date",
    "RawDataProtocols__SequencingMethod": "seq_meth",
    "RawDataProtocols__TargetGene": "target_gene",
}
MIXS_TO_MMEDS = {v: k for k, v in MMEDS_TO_MIXS.items()}


def to_mixs(df: DataFrame) -> DataFrame:
    """Rename MMEDS columns to their MIxS names where mapped."""
    out = df
    for mmeds, mixs in MMEDS_TO_MIXS.items():
        if mmeds in out.columns:
            out = out.withColumnRenamed(mmeds, mixs)
    return out


def from_mixs(df: DataFrame) -> DataFrame:
    out = df
    for mixs, mmeds in MIXS_TO_MMEDS.items():
        if mixs in out.columns:
            out = out.withColumnRenamed(mixs, mmeds)
    return out


def camel_case(col: Column | str) -> Column:
    """F4 — 'body site' → 'BodySite' (util.py:239-242): initcap each
    word, strip separators."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.initcap(F.regexp_replace(c, "[_-]", " ")), " ", "")


def is_numeric(col: Column | str) -> Column:
    """F5 — float-castable test (util.py:613-624)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double").isNotNull() & c.isNotNull()


def swap_taxonomy_delims(col: Column | str) -> Column:
    """F22 — ';'→'|' and spaces→underscores (util.py:1717-1722)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.regexp_replace(c, ";", "|"), " ", "_")
