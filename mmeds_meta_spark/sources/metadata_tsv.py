"""The MMEDS 5-row-header metadata TSV (SURVEY §1.1, S1/S2).

Layout (reference util.py:312-320, test_files/*.tsv):

    row 0  table name      ─┐ two-level column key, flattened here to
    row 1  column name     ─┘ ``Table__Column``
    row 2  Required|Optional
    row 3  declared type (Text|Number|Decimal|Integer|Date|Time|Email|…)
    row 4  unit / length note
    row 5+ data; the literal string ``NA`` (and ONLY it) is null

Reader: the 5 header lines are read driver-side (they are the schema);
the data body is parsed distributed — ``spark.read.text`` →
``zipWithIndex`` line filter (the one legitimate RDD hop, since CSV offers
no skip-N-rows) → split → typed cast per the declared-type row.  Every
row keeps its 0-based data index ``__row_idx`` so validation diagnostics
can cite exact cells.

Writer (reference util.py:245-309 parity): columns sorted by
(table, column), the 3 meta rows re-emitted, nulls rendered ``NA``,
non-ASCII scrubbed.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from ..catalog import TYPE_MAP

ROW_IDX = "__row_idx"
SEP = "__"  # Table__Column flattening


@dataclass(frozen=True)
class ColumnMeta:
    table: str
    column: str
    required: bool
    declared_type: str
    unit: str

    @property
    def flat(self) -> str:
        return f"{self.table}{SEP}{self.column}"

    @property
    def spark_type(self) -> str:
        return TYPE_MAP.get(self.declared_type, "string")


def read_header(path: str) -> list[ColumnMeta]:
    """Parse the 5 header rows (driver-side — they ARE the schema).
    Mirrors load_*_template's nrows=3 read (util.py:140-163)."""
    with open(path, encoding="utf-8") as f:
        rows = [f.readline().rstrip("\n").split("\t") for _ in range(5)]
    tables, columns, required, types, units = rows
    return [
        ColumnMeta(
            table=tables[i],
            column=columns[i],
            required=required[i].strip() == "Required",
            declared_type=types[i].strip(),
            unit=units[i] if i < len(units) else "",
        )
        for i in range(len(columns))
    ]


def load_template(path: str) -> list[ColumnMeta]:
    """S3 — template readers (util.py:140-163 load_*_template read only
    the header rows; data is ignored)."""
    return read_header(path)


def read_metadata(
    spark: SparkSession, path: str, *, typed: bool = True
) -> tuple[DataFrame, list[ColumnMeta]]:
    """Load a metadata TSV → (DataFrame[__row_idx, Table__Column...], meta).

    ``typed=False`` keeps every column as raw string (what validation
    wants: it must see the pre-cast cell to diagnose failures);
    ``typed=True`` applies the declared types with ``try_cast`` (bad cells
    → null, exactly pandas' coerce) after mapping literal ``NA`` → null.
    """
    meta = read_header(path)
    n = len(meta)
    lines = (
        spark.read.text(path)
        .rdd.zipWithIndex()
        .filter(lambda pair: pair[1] >= 5)
        .map(lambda pair: _split_row(pair[0].value, pair[1] - 5, n))
    )
    schema = T.StructType(
        [T.StructField(ROW_IDX, T.LongType(), False)]
        + [T.StructField(m.flat, T.StringType(), True) for m in meta]
    )
    raw = spark.createDataFrame(lines, schema)
    # literal 'NA' (and only it) is null — keep_default_na=False parity
    cols = [F.nullif(F.col(m.flat), F.lit("NA")).alias(m.flat) for m in meta]
    df = raw.select(ROW_IDX, *cols)
    if typed:
        df = df.select(
            ROW_IDX,
            *[F.col(m.flat).try_cast(m.spark_type).alias(m.flat) for m in meta],
        )
    return df, meta


def _split_row(line: str, idx: int, n: int) -> tuple:
    cells = line.split("\t")
    cells = cells[:n] + [""] * (n - len(cells))
    return (idx, *cells)


def write_metadata(df: DataFrame, meta: list[ColumnMeta], path: str) -> None:
    """Serialize back to the 5-row-header TSV (util.py:245-309 parity):
    columns sorted by (table, column), nulls → 'NA', non-ASCII stripped.

    Metadata tables are small (they describe specimens, not reads), so the
    body is streamed through the driver; at warehouse scale the normalized
    Delta tables are the big artifacts, never this TSV."""
    order = sorted(range(len(meta)), key=lambda i: (meta[i].table, meta[i].column))
    ms = [meta[i] for i in order]
    out_cols = [
        F.coalesce(
            F.regexp_replace(F.col(m.flat).cast("string"), r"[^\x00-\x7F]", ""),
            F.lit("NA"),
        ).alias(m.flat)
        for m in ms
    ]
    body = df.orderBy(ROW_IDX).select(*out_cols)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\t".join(m.table for m in ms) + "\n")
        f.write("\t".join(m.column for m in ms) + "\n")
        f.write("\t".join("Required" if m.required else "Optional" for m in ms) + "\n")
        f.write("\t".join(m.declared_type for m in ms) + "\n")
        f.write("\t".join(m.unit for m in ms) + "\n")
        for row in body.toLocalIterator():
            f.write("\t".join(row) + "\n")


# ---------------------------------------------------------------------------
# J1/U2 — subject ⋈ specimen join and the inverse split (util.py:166-236)
# ---------------------------------------------------------------------------

SUBJECT_ID_COL = "Subjects__HostSubjectId"
ANIMAL_ID_COL = "AnimalSubjects__AnimalSubjectID"
SPECIMEN_LINK_COL = "AdditionalMetaData__SubjectIdCol"


def join_metadata(subject: DataFrame, specimen: DataFrame) -> DataFrame:
    """Outer-join subject and specimen frames on the subject identifier.

    The subject key is COALESCE(HostSubjectId, AnimalSubjectID) — the
    Spark-native form of the reference's ``bfill(axis=1).iloc[:,0]``
    (util.py:174-177) that makes 'mixed' human/animal files work.
    """
    id_cols = [c for c in (SUBJECT_ID_COL, ANIMAL_ID_COL) if c in subject.columns]
    subj = subject.withColumn(
        "__subject_key", F.coalesce(*[F.col(c).cast("string") for c in id_cols])
    ).drop(ROW_IDX)
    spec = specimen.withColumn(
        "__subject_key", F.col(SPECIMEN_LINK_COL).cast("string")
    )
    return (
        spec.join(subj, "__subject_key", "outer")
        .drop("__subject_key")
    )


def split_metadata(
    joined: DataFrame, meta: list[ColumnMeta], tables: set[str]
) -> DataFrame:
    """Project the columns belonging to ``tables`` (+ row idx), dedup —
    the subject/specimen split of util.py:185-236."""
    keep = [m.flat for m in meta if m.table in tables and m.flat in joined.columns]
    cols = ([ROW_IDX] if ROW_IDX in joined.columns else []) + keep
    return joined.select(*cols).dropDuplicates(keep)
