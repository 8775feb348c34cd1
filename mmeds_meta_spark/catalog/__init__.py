"""Static schema catalog: the MMEDS 41-table snowflake as a closed world.

The reference introspects a live MySQL at import (`DESCRIBE` every table,
config.py:695-741); here the schema is a generated constant
(:mod:`.schema`) plus derived maps (:func:`column_table_map`,
:func:`metadata_columns`).  See SURVEY.md §1.2.
"""

from __future__ import annotations

from functools import lru_cache

import pyspark.sql.types as T

from .schema import COL_SIZES, JUNCTION_TABLES, PROTECTED_TABLES, TABLE_ORDER, TABLES

# Declared metadata types (row 3 of the 5-row header) → Spark types.
# Mirrors TYPE_MAP at reference config.py:751-761.
TYPE_MAP: dict[str, str] = {
    "Text": "string",
    "Text: Must be unique": "string",
    "Email": "string",
    "Web Address": "string",
    "Number": "double",
    "Decimal": "double",
    "Integer": "long",
    "Date": "date",
    "Time": "string",
}

#: tables whose rows belong to the human-subject file
SUBJECT_TABLES = {
    "Ethnicity",
    "Genotypes",
    "Heights",
    "ICDCode",
    "Illness",
    "IllnessBroadCategory",
    "IllnessCategory",
    "IllnessDetails",
    "Intervention",
    "Interventions",
    "Subjects",
    "SubjectType",
    "Weights",
}

#: tables whose rows belong to the animal-subject file
ANIMAL_TABLES = {
    "AnimalSubjects",
    "Chow",
    "ChowDates",
    "Facility",
    "Housing",
    "HousingDates",
    "Husbandry",
    "Species",
    "Strain",
    "SubjectType",
    "Vendor",
}


def is_id_col(col: str) -> bool:
    """Key-column convention: PK `id<Table>`, FK `<Table>_id<Table>`,
    ownership `user_id` (reference sql_builder.py:114-135)."""
    return col == "user_id" or col.startswith("id") or "_id" in col


@lru_cache(maxsize=1)
def column_table_map() -> dict[str, str]:
    """metadata column name → owning table (non-key columns only)."""
    out: dict[str, str] = {}
    for table, cols in TABLES.items():
        if "_has_" in table:
            continue
        for col in cols:
            if not is_id_col(col):
                out.setdefault(col, table)
    return out


def metadata_columns(table: str) -> list[str]:
    """The user-facing (non-key) columns of a table, in DDL order."""
    return [c for c in TABLES[table] if not is_id_col(c)]


def struct_type(table: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(col, _parse(dt), nullable)
            for col, (dt, nullable) in TABLES[table].items()
        ]
    )


def _parse(ddl: str) -> T.DataType:
    return T._parse_datatype_string(ddl)  # noqa: SLF001


def fk_parents(table: str) -> list[str]:
    """Parent tables referenced by `<Parent>_id<Parent>` FK columns."""
    out = []
    for col in TABLES[table]:
        if "_id" in col and col != "user_id" and "_has_" not in table:
            out.append(col.split("_id")[0])
    return out


__all__ = [
    "ANIMAL_TABLES",
    "COL_SIZES",
    "JUNCTION_TABLES",
    "PROTECTED_TABLES",
    "SUBJECT_TABLES",
    "TABLES",
    "TABLE_ORDER",
    "TYPE_MAP",
    "column_table_map",
    "fk_parents",
    "is_id_col",
    "metadata_columns",
    "struct_type",
]
