"""Set-based normalization of joined metadata into the 41-table snowflake.

Replaces the reference's per-row recursive SQLBuilder
(mmeds/database/sql_builder.py:103-171, metadata_uploader.py:211-426 —
O(rows × tables) point SELECTs) with one declarative pass per table in
``TABLE_ORDER``:

1. project the table's natural-key columns (+ already-resolved parent
   surrogate ids) out of the joined metadata frame,
2. ``dropDuplicates`` (the reference's ``seen`` cache, done by Catalyst),
3. null-safe ``left_anti`` against the existing dimension → genuinely new
   rows,
4. assign surrogate keys ``max(id) + dense_rank() over (natural order)``
   — deterministic under any partitioning (SURVEY §7 hard-part 1; key
   VALUES may differ from MySQL's insertion order, key TOPOLOGY is
   identical),
5. append, then null-safe equi-join the dimension back onto the metadata
   frame so children see their parent ids (replaces FK recursion J5/J6).

NULL semantics (§7 hard-part 2): every lookup uses ``eqNullSafe``; each
dimension carries the reference's id=1 all-NULL seed row
(sql/null_entries.sql:1-40), so a row with no values for a table resolves
to FK=1 instead of spawning rows — exactly the reference's convention.

At 100 TB: each table costs one partial-agg dedup shuffle + one anti-join
+ one attach join, all on natural-key columns (broadcast when the dim is
small — AQE decides from observed sizes).  The per-table MAX(id) is a
parquet-statistics read, not a scan.
"""

from __future__ import annotations

import os
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import (
    JUNCTION_TABLES,
    PROTECTED_TABLES,
    TABLES,
    TABLE_ORDER,
    is_id_col,
    struct_type,
)
from ..sources.metadata_tsv import SEP

_SKIP = {"ICDCode", "AdditionalMetaData"}  # no SQL table (catalog §1.2)


class MetaDataError(RuntimeError):
    """Raised when a user-data delete would orphan surviving rows —
    the parquet-store analogue of the reference's FK ``IntegrityError``
    re-raise (mmeds/database/database.py:566-572)."""


class Warehouse:
    """Parquet-backed table store with the null-seed-row convention."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        #: bumped on every write; sessions re-resolve their views when it
        #: moves (temp views pin a parquet file-listing snapshot)
        self.version = 0
        os.makedirs(path, exist_ok=True)

    def _file(self, name: str) -> str:
        return os.path.join(self.path, name)

    def exists(self, name: str) -> bool:
        return os.path.exists(self._file(name))

    def table(self, name: str) -> DataFrame:
        if self.exists(name):
            return self.spark.read.parquet(self._file(name))
        return self._empty(name)

    def _empty(self, name: str) -> DataFrame:
        df = self.spark.createDataFrame([], struct_type(name))
        if "_has_" in name:
            return df
        # id=1 all-NULL seed row; FKs point at the parents' seed rows
        vals = []
        for c in TABLES[name]:
            if c == f"id{name}":
                vals.append(1)
            elif "_id" in c and c != "user_id":
                vals.append(1)
            else:
                vals.append(None)
        seed_df = self.spark.createDataFrame([tuple(vals)], struct_type(name))
        return df.unionByName(seed_df)

    def overwrite(self, name: str, df: DataFrame) -> None:
        """Atomically replace a table's parquet with ``df`` (materialize to
        a sibling temp dir first — Spark cannot overwrite a path that feeds
        the plan being written)."""
        import shutil

        tmp = self._file(name) + "__rewrite_tmp"
        aligned = df.select(
            *[F.col(c).cast(f.dataType) for c, f in zip(TABLES[name], struct_type(name).fields)]
        )
        aligned.write.mode("overwrite").parquet(tmp)
        if self.exists(name):
            shutil.rmtree(self._file(name))
        os.rename(tmp, self._file(name))
        # drop Spark's cached file listing for the path — readers opened
        # before the swap would otherwise chase deleted part files
        self.spark.catalog.refreshByPath(self._file(name))
        self.version += 1

    def clear_user_data(self, user_id: int, *, verify_integrity: bool = True) -> dict[str, int]:
        """Delete every row owned by ``user_id`` across the protected +
        junction tables, child-tables-first, with per-table row-count
        accounting.

        Mirrors the reference's ``Database.clear_user_data``
        (mmeds/database/database.py:546-572): the table list is
        ``TABLE_ORDER`` filtered to ``PROTECTED_TABLES`` plus the junction
        tables, **reversed** so linking tables empty before the tables they
        link to; rows with NULL ``user_id`` (seed rows, shared dims) are
        never touched.  Returns ``{table: rows_removed}`` — the accounting
        the reference's test asserts (tests/unit/test_database.py:166-206).

        ``verify_integrity=True`` re-creates the FK ``IntegrityError``
        semantics parquet lacks: before dropping a parent table's rows it
        checks that no *surviving* child row still references a
        to-be-deleted id, raising :class:`MetaDataError` if one does (the
        reference surfaces exactly this as a re-raised IntegrityError).

        At 100 TB this is one pushed-filter scan + rewrite per protected
        table (on Delta/Iceberg it would be a ``DELETE WHERE user_id = ?``);
        the integrity probe is a broadcast semi-join of each child's
        surviving FK values against the (small, per-user) deleted-id set.
        """
        owned = F.col("user_id") == F.lit(user_id)
        surviving = F.coalesce(F.col("user_id") != F.lit(user_id), F.lit(True))
        tables = [t for t in TABLE_ORDER if t in PROTECTED_TABLES] + list(JUNCTION_TABLES)
        removed: dict[str, int] = {}
        # Phase 1 — account + verify, touching nothing.  The survivor
        # predicate is by ownership (not deletion state), so the check is
        # order-independent; running the whole phase up front gives the
        # all-or-nothing behavior of the reference's commit-at-end.
        for table in reversed(tables):
            if not self.exists(table):
                removed[table] = 0
                continue
            df = self.table(table)
            n_owned = df.filter(owned).count()
            removed[table] = n_owned
            if n_owned == 0 or not verify_integrity or "_has_" in table:
                continue
            id_col = f"id{table}"
            dead_ids = df.filter(owned).select(F.col(id_col).alias("__dead_id"))
            for child, cols in TABLES.items():
                if child == table:
                    continue
                fk_cols = [
                    c for c in cols if "_id" in c and c != "user_id" and _fk_parent(c) == table
                ]
                if not fk_cols or not self.exists(child):
                    continue
                child_df = self.table(child)
                if "user_id" in TABLES[child]:
                    child_df = child_df.filter(surviving)
                for fk in fk_cols:
                    dangling = child_df.join(
                        F.broadcast(dead_ids),
                        child_df[fk] == F.col("__dead_id"),
                        "left_semi",
                    )
                    if dangling.limit(1).count() > 0:
                        raise MetaDataError(
                            f"clear_user_data({user_id}): surviving rows in "
                            f"{child}.{fk} still reference {table} rows being deleted"
                        )
        # Phase 2 — rewrite, children first (the reference's reverse order).
        for table in reversed(tables):
            if removed.get(table):
                self.overwrite(table, self.table(table).filter(surviving))
        return removed

    def append(self, name: str, df: DataFrame) -> None:
        aligned = df.select(
            *[F.col(c).cast(f.dataType) for c, f in zip(TABLES[name], struct_type(name).fields)]
        )
        if not self.exists(name):
            base = self._empty(name)
            base.unionByName(aligned).write.mode("overwrite").parquet(self._file(name))
        else:
            aligned.write.mode("append").parquet(self._file(name))
        self.version += 1


# ---------------------------------------------------------------------------
# F1 — ICD-10 decomposition (util.py:575-610 parse_ICD_codes)
# ---------------------------------------------------------------------------

ICD_SOURCE = "ICDCode__ICDCode"


def parse_icd_codes(df: DataFrame) -> DataFrame:
    """ICD 'B20.XXXX' → FirstCharacter/Category/Details/Extension columns
    (stored verbatim incl. X-padding so the views' CONCAT reassembly
    reproduces the original code — the invariant of
    tests/unit/test_database.py:208-215)."""
    if ICD_SOURCE not in df.columns:
        return df
    code = F.col(ICD_SOURCE)
    return (
        df.withColumn("ICDCode__ICDFirstCharacter", F.substring(code, 1, 1))
        .withColumn("ICDCode__ICDCategory", F.substring(code, 2, 2))
        .withColumn("ICDCode__ICDDetails", F.substring(code, 5, 3))
        .withColumn("ICDCode__ICDExtension", F.substring(code, 8, 1))
    )


# ---------------------------------------------------------------------------
# the per-table normalization pass
# ---------------------------------------------------------------------------


def _flat_lookup(work_cols: list[str], table: str, column: str) -> str | None:
    """Find the metadata column feeding (table, column): the exact table
    prefix, else ONLY the legitimate cross-feed sources — user columns
    (AdditionalMetaData) and the parsed ICD extras.  An any-table suffix
    fallback is WRONG: e.g. `Sex` exists in both Subjects and
    AnimalSubjects, and borrowing across subject kinds mints phantom
    dimension rows (caught by the polymorphic-SubjectType test)."""
    exact = f"{table}{SEP}{column}"
    if exact in work_cols:
        return exact
    for source in ("AdditionalMetaData", "ICDCode"):
        cand = f"{source}{SEP}{column}"
        if cand in work_cols:
            return cand
    return None


def _fk_parent(col: str) -> str:
    """`<path>_id<Parent>` → Parent (handles Results.RawData_Sample_idSample)."""
    return col.rsplit("_id", 1)[1]


def _table_exprs(work: DataFrame, table: str) -> dict[str, F.Column]:
    """Column expressions feeding each of the table's natural/FK columns
    from the joined metadata frame."""
    spec = TABLES[table]
    id_col = f"id{table}"
    exprs: dict[str, F.Column] = {}
    for c, (dt, _null) in spec.items():
        if c == id_col or c == "user_id":
            continue
        if "_id" in c:
            parent = _fk_parent(c)
            attached = f"__id_{parent}"
            if attached in work.columns:
                exprs[c] = F.col(attached)
            else:
                exprs[c] = F.lit(1).cast(dt)  # unresolved parent → seed row
        else:
            flat = _flat_lookup(work.columns, table, c)
            exprs[c] = (F.col(flat) if flat else F.lit(None)).cast(dt)
    return exprs


def materialize_dim(wh: Warehouse, work: DataFrame, table: str, user_id: int) -> None:
    """Dedup-or-insert the table's new dimension rows (the write action)."""
    spec = TABLES[table]
    id_col = f"id{table}"
    exprs = _table_exprs(work, table)
    key_cols = list(exprs)
    cand = work.select(*[v.alias(k) for k, v in exprs.items()]).dropDuplicates()
    existing = wh.table(table)
    anti_cond = reduce(
        lambda a, b: a & b,
        [cand[k].eqNullSafe(existing[k]) for k in key_cols],
    )
    new = cand.join(existing, anti_cond, "left_anti")
    mx = existing.agg(F.max(id_col)).first()[0] or 0
    w = Window.orderBy(*key_cols)
    new_keyed = new.withColumn(id_col, (F.lit(mx) + F.dense_rank().over(w)).cast("int"))
    if "user_id" in spec:
        new_keyed = new_keyed.withColumn(
            "user_id", F.lit(user_id if table in PROTECTED_TABLES else None).cast("int")
        )
    wh.append(table, new_keyed)


def attach_dim(wh: Warehouse, work: DataFrame, table: str) -> DataFrame:
    """Null-safe join the materialized dimension back → ``__id_<table>``
    (lazy; no action)."""
    id_col = f"id{table}"
    exprs = _table_exprs(work, table)
    key_cols = list(exprs)
    dim = wh.table(table).select(
        F.col(id_col).alias(f"__id_{table}"),
        *[F.col(k).alias(f"__k_{k}") for k in key_cols],
    )
    join_cond = reduce(
        lambda a, b: a & b,
        [exprs[k].eqNullSafe(dim[f"__k_{k}"]) for k in key_cols],
    )
    return work.join(dim, join_cond, "left").drop(*[f"__k_{k}" for k in key_cols])


def normalize_table(
    wh: Warehouse, work: DataFrame, table: str, user_id: int
) -> DataFrame:
    """Normalize one table then attach its surrogate id (sequential form)."""
    materialize_dim(wh, work, table, user_id)
    return attach_dim(wh, work, table)


def fk_levels(tables: list[str]) -> list[list[str]]:
    """Group tables into FK-dependency levels: a table's level is one past
    its deepest parent — tables within a level share no edges and can be
    materialized CONCURRENTLY (Spark schedules jobs from threads)."""
    levels: dict[str, int] = {}

    def level(t: str) -> int:
        if t in levels:
            return levels[t]
        parents = [
            _fk_parent(c)
            for c in TABLES[t]
            if "_id" in c and c != "user_id"
        ]
        parents = [p for p in parents if p in TABLES and p != t]
        levels[t] = 1 + max((level(p) for p in parents), default=-1)
        return levels[t]

    for t in tables:
        level(t)
    out: dict[int, list[str]] = {}
    for t in tables:
        out.setdefault(levels[t], []).append(t)
    return [out[k] for k in sorted(out)]


def _junction_rows(wh: Warehouse, work: DataFrame, junction: str, user_id: int) -> None:
    """Junction tables = distinct key-pair projections (U5,
    metadata_uploader.py:377-426)."""
    cols = [c for c in TABLES[junction] if c != "user_id"]
    attached = [f"__id_{_fk_parent(c)}" for c in cols]
    if not all(a in work.columns for a in attached):
        return
    pairs = (
        work.select(*[F.col(a).alias(c) for a, c in zip(attached, cols)])
        .filter(reduce(lambda x, y: x & y, [F.col(c).isNotNull() for c in cols]))
        .dropDuplicates()
        .withColumn("user_id", F.lit(user_id).cast("int"))
    )
    existing = wh.table(junction)
    anti = reduce(
        lambda a, b: a & b, [pairs[c].eqNullSafe(existing[c]) for c in cols]
    )
    wh.append(junction, pairs.join(existing, anti, "left_anti"))


def import_study(
    wh: Warehouse,
    subject: DataFrame,
    specimen: DataFrame,
    *,
    user_id: int = 2,
    parallel: bool = True,
) -> DataFrame:
    """Full write path (§3.3): join subject ⋈ specimen, decompose ICD,
    normalize every table in FK-topological ``TABLE_ORDER``, then fill the
    junction tables.  Returns the joined frame with every ``__id_*``
    attached (useful for audits/tests)."""
    from concurrent.futures import ThreadPoolExecutor

    from ..sources.metadata_tsv import join_metadata

    work = parse_icd_codes(join_metadata(subject, specimen))
    tables = [t for t in TABLE_ORDER if t not in _SKIP and t in TABLES]
    # FK levels: materialize each level's dims concurrently (independent
    # Spark jobs from threads), then attach that level's ids lazily so the
    # next level's FK expressions resolve.  `work` is persisted at each
    # level boundary so the growing attach-join lineage is computed once
    # per level, not once per table job.
    cached: list[DataFrame] = []
    work = work.persist()
    cached.append(work)
    for level in fk_levels(tables):
        if len(level) == 1 or not parallel:
            for table in level:
                materialize_dim(wh, work, table, user_id)
        else:
            with ThreadPoolExecutor(max_workers=min(8, len(level))) as ex:
                list(ex.map(lambda t: materialize_dim(wh, work, t, user_id), level))
        for table in level:
            work = attach_dim(wh, work, table)
        work = work.persist()
        cached.append(work)
    for junction in JUNCTION_TABLES:
        _junction_rows(wh, work, junction, user_id)
    for df in cached[:-1]:
        df.unpersist()
    return work
