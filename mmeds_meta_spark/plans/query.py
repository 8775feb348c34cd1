"""Query entry points: the MmedsSession facade (replaces the reference's
CherryPy endpoints 1:1) with catalog-level row-level security.

RLS (reference sql/functions.sql:32-49 owner_check + protected_views.sql):
a row of a protected table is visible iff ``user_id ∈ {session user, 1}``
(1 = public).  The reference string-rewrites table names to
``protected_<T>`` (database.py:402-409); here non-admin sessions simply
get the FILTERED frame registered under the plain table name — catalog
substitution instead of SQL text surgery, so arbitrary ``spark.sql``
passes through Catalyst untouched.

``query_meta_analysis`` is §3.2: WHERE over MetaAnalysisView → DISTINCT
cohort keys → {study: [RawDataID…]}.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import PROTECTED_TABLES, TABLES
from ..normalize import Warehouse
from .views import build_views

PUBLIC_USER = 1

# P10 — the reference restricts meta-analysis WHERE clauses to flat
# comparisons joined by AND/OR; no BETWEEN/LIKE/IN (database.py:250-270).
_WHERE_SPLIT = re.compile(r"\s+(?:AND|OR)\s+", re.IGNORECASE)
_CLAUSE = re.compile(
    r"^\(?\s*([A-Za-z_][A-Za-z0-9_]*)\s*(?:=|!=|<>|<=|>=|<|>)\s*(.+?)\s*\)?$"
)


def extract_columns_from_where(where: str) -> list[str]:
    """Split a restricted WHERE string on AND/OR and return the referenced
    column names; raises ValueError on unsupported syntax — the
    reference's guard, kept as a pre-Catalyst sanity check so user-facing
    errors cite the clause, not an analyzer stack."""
    banned = re.search(r"\b(BETWEEN|LIKE|IN)\b", where, re.IGNORECASE)
    if banned:
        raise ValueError(f"Unsupported operator in WHERE clause: {banned.group(1)}")
    cols = []
    for clause in _WHERE_SPLIT.split(where):
        m = _CLAUSE.match(clause.strip())
        if not m:
            raise ValueError(f"Cannot parse WHERE clause: {clause!r}")
        cols.append(m.group(1))
    return cols


class MmedsSession:
    """Per-principal query session over a Warehouse."""

    def __init__(
        self,
        spark: SparkSession,
        wh: Warehouse,
        *,
        user_id: int = PUBLIC_USER,
        is_admin: bool = False,
    ):
        self.spark = spark
        self.wh = wh
        self.user_id = user_id
        self.is_admin = is_admin
        self._wh_version = wh.version
        self._register()

    # -- catalog-level RLS -------------------------------------------------

    def _rls(self, table: str, df: DataFrame) -> DataFrame:
        if self.is_admin or table not in PROTECTED_TABLES or "user_id" not in df.columns:
            return df
        return df.filter(
            F.col("user_id").isNull()
            | F.col("user_id").isin(self.user_id, PUBLIC_USER)
        )

    def _register(self) -> None:
        for table in TABLES:
            df = self._rls(table, self.wh.table(table))
            df.createOrReplaceTempView(table)
        build_views(self.wh)

    # -- S6/S7/P1/P2: raw SQL with id-column pruning ----------------------

    def execute(self, sql: str, *, filter_ids: bool = True) -> DataFrame:
        """database.py:392-433 — run SQL against the (RLS'd) catalog; drop
        surrogate-key columns from the result unless asked not to."""
        if self.wh.version != self._wh_version:
            # the warehouse was written since our views were resolved —
            # re-register so plans list the current parquet files
            self._wh_version = self.wh.version
            self._register()
        out = self.spark.sql(sql)
        if filter_ids:
            drop = [c for c in out.columns if "id" in c.lower() and (
                c.startswith("id") or "_id" in c or c == "user_id"
            )]
            out = out.drop(*drop)
        return out

    def get_table_contents(self, table: str) -> DataFrame:
        return self.execute(f"SELECT * FROM {table}")

    # -- §3.2: the flagship meta-analysis cohort query --------------------

    def query_meta_analysis(self, where: str, *extra_cols: str) -> DataFrame:
        """SELECT DISTINCT RawDataID, StudyName[, cols] FROM MetaAnalysisView
        WHERE <where> → one row per study with its sorted RawDataID list.
        The WHERE string passes the P10 syntax guard, then its columns are
        checked against the view before Catalyst sees it."""
        meta = self.spark.table("MetaAnalysisView")
        cols = extract_columns_from_where(where)
        unknown = [c for c in cols if c not in meta.columns]
        if unknown:
            raise ValueError(f"Unknown column(s) in WHERE clause: {unknown}")
        cohort = (
            meta.filter(F.expr(where))
            .select("RawDataID", "StudyName", *extra_cols)
            .distinct()
        )
        return cohort.groupBy("StudyName").agg(
            F.sort_array(F.collect_list("RawDataID")).alias("RawDataIDs")
        )

    def query_meta_analysis_dict(self, where: str) -> dict[str, list[str]]:
        """database.py:289-296 exact shape: {StudyName: [RawDataID, ...]}."""
        return {
            r["StudyName"]: list(r["RawDataIDs"])
            for r in self.query_meta_analysis(where).collect()
        }
