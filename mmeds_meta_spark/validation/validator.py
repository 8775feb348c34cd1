"""Validation rule engine.

Re-expresses the reference's per-cell loop (validate.py:276-314
``check_cell`` and friends) as ONE declarative pass: every per-cell rule
becomes a conditional struct in an array that is compacted and exploded —
so N rules over M columns cost a single narrow projection, not N×M jobs.
Aggregate rules (duplicates, outliers, rare categories, equal lengths,
start/end pairs) are window/join plans unioned onto the same diagnostic
schema.

Diagnostic rows: (row_idx, column, level, code, message); row_idx = -1
for file-level (header) diagnostics.  Codes follow the golden-corpus
filenames of the reference test suite (validate_error_<code>.tsv,
tests/unit/test_validate.py:50-106): empty_cell, whitespace,
cell_length, non_standard_na, invalid_type, future_date,
number_out_of_range, categorical_data, duplicate_value,
different_lengths, invalid_barcode_chars, invalid_icd_code,
start_end_date, missing_required_value, missing_required_column,
illegal_column, illegal_header, phi_header.

At scale: per-cell checks are narrow (no shuffle); each aggregate check
is one partial-agg shuffle on its grouping key.  Validation of a 100 TB
drop is embarrassingly parallel.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import reduce

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import COL_SIZES, TYPE_MAP, column_table_map
from ..sources.metadata_tsv import ROW_IDX, ColumnMeta

# reference validate.py:15 non-standard NA variants
NA_VARIANTS = ("n/a", "n.a.", "n_a", "na ", " na", "n a", "not applicable", "none")
DNA_ALPHABET = "GATC"
# reference validate.py:17-22 HIPAA/PHI header blocklist (semantic parity)
PHI_HEADERS = {
    "SocialSecurityNumber",
    "MedicalRecordNumber",
    "AccountNumber",
    "LicenseNumber",
    "FullFaceImage",
    "PhoneNumber",
    "FaxNumber",
    "EmailAddress",
    "IPAddress",
}
ILLEGAL_HEADER_CHARS = r"[/\\ *?,.]"

DIAG_SCHEMA = T.StructType(
    [
        T.StructField("row_idx", T.LongType(), False),
        T.StructField("column", T.StringType(), False),
        T.StructField("level", T.StringType(), False),
        T.StructField("code", T.StringType(), False),
        T.StructField("message", T.StringType(), False),
    ]
)


@dataclass(frozen=True)
class Diagnostic:
    row_idx: int
    column: str
    level: str
    code: str
    message: str

    def as_tsv(self) -> str:
        # the reference's `row\tcol\tmessage` contract (util.py:683+)
        return f"{self.row_idx}\t{self.column}\t{self.message}"


def _diag(cond, column: str, level: str, code: str, message) -> F.Column:
    msg = message if isinstance(message, F.Column) else F.lit(message)
    return F.when(
        cond,
        F.struct(
            F.col(ROW_IDX).alias("row_idx"),
            F.lit(column).alias("column"),
            F.lit(level).alias("level"),
            F.lit(code).alias("code"),
            msg.alias("message"),
        ),
    )


class Validator:
    """Validate a raw (untyped) metadata frame against its header meta."""

    def __init__(self, spark: SparkSession, df: DataFrame, meta: list[ColumnMeta]):
        self.spark = spark
        self.df = df
        self.meta = meta

    # -- file-level (header) checks: driver-side, schema-only ------------

    def header_diagnostics(self) -> list[Diagnostic]:
        out: list[Diagnostic] = []
        known = column_table_map()
        seen: set[str] = set()
        for m in self.meta:
            if m.column in PHI_HEADERS:
                out.append(
                    Diagnostic(-1, m.flat, "error", "phi_header",
                               f"PHI/HIPAA-protected header '{m.column}' is not allowed")
                )
            if m.column in seen or m.column.endswith(".1"):
                out.append(
                    Diagnostic(-1, m.flat, "error", "illegal_header",
                               f"Duplicated header '{m.column}'")
                )
            seen.add(m.column)
            if m.column == "" or m.column.replace(".", "").isdigit():
                out.append(
                    Diagnostic(-1, m.flat, "error", "illegal_header",
                               f"Numeric or empty header '{m.column}'")
                )
            if m.table != "AdditionalMetaData" and m.table in {"", None}:
                out.append(
                    Diagnostic(-1, m.flat, "error", "illegal_column",
                               f"Column '{m.column}' missing table assignment")
                )
            if (
                m.table not in {"AdditionalMetaData"}
                and m.column not in known
                and m.table in known.values()
            ):
                out.append(
                    Diagnostic(-1, m.flat, "warning", "illegal_column",
                               f"Unknown column '{m.column}' for table '{m.table}'")
                )
            if m.table == "AdditionalMetaData" and re.search(ILLEGAL_HEADER_CHARS, m.column):
                out.append(
                    Diagnostic(-1, m.flat, "error", "illegal_header",
                               f"Illegal character in header '{m.column}'")
                )
        return out

    def missing_required_columns(self, template: list[ColumnMeta]) -> list[Diagnostic]:
        have = {(m.table, m.column) for m in self.meta}
        return [
            Diagnostic(-1, t.flat, "error", "missing_required_column",
                       f"Required column '{t.table}.{t.column}' is missing")
            for t in template
            if t.required and (t.table, t.column) not in have
        ]

    # -- per-cell checks: ONE narrow pass --------------------------------

    def cell_diagnostics(self) -> DataFrame:
        checks: list[F.Column] = []
        for m in self.meta:
            c = F.col(m.flat)
            limit = COL_SIZES.get(m.column)
            checks.append(_diag(c == "", m.flat, "error", "empty_cell", "Empty cell"))
            checks.append(
                _diag(
                    c.isNotNull() & (c != F.trim(c)),
                    m.flat, "error", "whitespace", "Leading/trailing whitespace",
                )
            )
            checks.append(
                _diag(
                    F.lower(c).isin(*NA_VARIANTS),
                    m.flat, "warning", "non_standard_na",
                    F.concat(F.lit("Non-standard NA value '"), c, F.lit("'")),
                )
            )
            if limit:
                checks.append(
                    _diag(
                        F.length(c) > limit,
                        m.flat, "error", "cell_length",
                        F.concat(F.lit(f"Value exceeds {limit} character limit: '"), c, F.lit("'")),
                    )
                )
            spark_type = TYPE_MAP.get(m.declared_type, "string")
            if spark_type != "string":
                checks.append(
                    _diag(
                        c.isNotNull() & (c != "NA") & c.try_cast(spark_type).isNull(),
                        m.flat, "error", "invalid_type",
                        F.concat(
                            F.lit(f"Value not a valid {m.declared_type}: '"), c, F.lit("'")
                        ),
                    )
                )
            if m.declared_type == "Date":
                checks.append(
                    _diag(
                        c.try_cast("date") > F.current_date(),
                        m.flat, "error", "future_date",
                        F.concat(F.lit("Date in the future: '"), c, F.lit("'")),
                    )
                )
            if m.required:
                checks.append(
                    _diag(c.isNull(), m.flat, "error", "missing_required_value",
                          "Required value missing")
                )
            if m.column == "BarcodeSequence":
                checks.append(
                    _diag(
                        c.isNotNull()
                        & (F.regexp_replace(c, f"[{DNA_ALPHABET}]", "") != ""),
                        m.flat, "error", "invalid_barcode_chars",
                        F.concat(F.lit("Non-GATC characters in barcode '"), c, F.lit("'")),
                    )
                )
            if m.declared_type == "Email":
                checks.append(
                    _diag(
                        c.isNotNull()
                        & ~c.rlike(r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"),
                        m.flat, "error", "invalid_email",
                        F.concat(F.lit("Invalid email address '"), c, F.lit("'")),
                    )
                )
            if m.declared_type == "Web Address":
                checks.append(
                    _diag(
                        c.isNotNull() & ~c.rlike(r"^https?://\S+$"),
                        m.flat, "error", "invalid_web_address",
                        F.concat(F.lit("Invalid web address '"), c, F.lit("'")),
                    )
                )
            # ICD codes are validated against the ICD-10-CM dictionary in
            # aggregate_diagnostics (broadcast anti-join, util.py:553-572
            # X-padded prefix semantics) — a format regex alone would accept
            # well-formed but nonexistent codes the reference rejects.
        arr = F.array_compact(F.array(*checks))
        return self.df.select(F.explode(arr).alias("d")).select("d.*")

    # -- aggregate checks -------------------------------------------------

    def aggregate_diagnostics(self) -> DataFrame:
        parts: list[DataFrame] = []
        run_col = next(
            (m.flat for m in self.meta if m.column == "RawDataProtocolID"), None
        )
        # F2 — ICD dictionary membership (mmeds/util.py:553-572,
        # validate.py:199-212): broadcast anti-join against the ICD-10-CM
        # (prefix, suffix) relation; every known prefix admits the XXXX
        # wildcard suffix.  One broadcast join per ICD column — at 100 TB
        # the 17k-code dimension broadcasts to every executor once.
        icd_cols = [m for m in self.meta if m.column == "ICDCode"]
        if icd_cols:
            from .golden import _icd_dim

            dim = _icd_dim(self.spark)
            for m in icd_cols:
                c = F.col(m.flat)
                cells = self.df.filter(c.isNotNull()).select(
                    ROW_IDX,
                    c.alias("__v"),
                    F.split_part(c, F.lit("."), F.lit(1)).alias("pre"),
                    F.when(
                        F.size(F.split(c, r"\.")) == 2,
                        F.split_part(c, F.lit("."), F.lit(2)),
                    ).alias("suf"),
                )
                parts.append(
                    cells.join(F.broadcast(dim), ["pre", "suf"], "left_anti")
                    .select(
                        self._mk(m.flat, "error", "invalid_icd_code",
                                 F.concat(F.lit("Invalid ICD-10 code '"),
                                          F.col("__v"), F.lit("'")))
                    )
                )
        for m in self.meta:
            c = F.col(m.flat)
            # duplicate detection for unique-typed columns (validate.py:421-426)
            if m.declared_type == "Text: Must be unique" or m.column in (
                "HostSubjectId",
                "AnimalSubjectID",
            ):
                w = Window.partitionBy(m.flat)
                parts.append(
                    self.df.withColumn("__n", F.count("*").over(w))
                    .filter(c.isNotNull() & (F.col("__n") > 1))
                    .select(self._mk(m.flat, "error", "duplicate_value",
                                     F.concat(F.lit("Duplicated value '"), c, F.lit("'"))))
                )
            # barcode uniqueness within sequencing run + equal lengths
            if m.column == "BarcodeSequence":
                keys = [run_col, m.flat] if run_col else [m.flat]
                w = Window.partitionBy(*keys)
                parts.append(
                    self.df.withColumn("__n", F.count("*").over(w))
                    .filter(c.isNotNull() & (F.col("__n") > 1))
                    .select(self._mk(m.flat, "error", "duplicate_value",
                                     F.concat(F.lit("Duplicate barcode in run '"), c, F.lit("'"))))
                )
                modal = (
                    self.df.filter(c.isNotNull())
                    .groupBy(F.length(c).alias("__len"))
                    .agg(F.count("*").alias("__lc"))
                    .orderBy(F.col("__lc").desc(), F.col("__len"))
                    .limit(1)
                    .select("__len")
                )
                parts.append(
                    self.df.crossJoin(F.broadcast(modal))
                    .filter(c.isNotNull() & (F.length(c) != F.col("__len")))
                    .select(self._mk(m.flat, "error", "different_lengths",
                                     F.concat(F.lit("Barcode length differs: '"), c, F.lit("'"))))
                )
            # numeric outliers handled in one batched pass below
            # rare categories (validate.py:153-166, pandas sample σ on counts)
            if m.declared_type == "Text" and m.table != "AdditionalMetaData":
                counts = (
                    self.df.filter(c.isNotNull())
                    .groupBy(m.flat)
                    .agg(F.count("*").alias("__cnt"))
                )
                st = counts.agg(
                    F.avg("__cnt").alias("__mu"), F.stddev_samp("__cnt").alias("__sd")
                )
                rare = (
                    counts.crossJoin(F.broadcast(st))
                    .filter(
                        (F.col("__cnt") < F.col("__mu") - F.col("__sd"))
                        & (F.col("__cnt") < 3)
                    )
                    .select(m.flat)
                )
                parts.append(
                    self.df.join(rare, m.flat)
                    .select(self._mk(m.flat, "warning", "categorical_data",
                                     F.concat(F.lit("Rare category '"), c, F.lit("'"))))
                )
        # numeric outliers (validate.py:137-151, numpy pop σ): ALL numeric
        # columns share ONE aggregate pass (partial-agg, no global window)
        # + one broadcast crossJoin — the scalable form of per-column stats.
        num_cols = [
            m for m in self.meta if m.declared_type in ("Number", "Decimal", "Integer")
        ]
        if num_cols:
            aggs = []
            for m in num_cols:
                x = F.col(m.flat).try_cast("double")
                aggs.append(F.avg(x).alias(f"__mu_{m.flat}"))
                aggs.append(F.stddev_pop(x).alias(f"__sd_{m.flat}"))
            stats = self.df.agg(*aggs)
            enriched = self.df.crossJoin(F.broadcast(stats))
            for m in num_cols:
                c = F.col(m.flat)
                x = c.try_cast("double")
                mu, sd = F.col(f"__mu_{m.flat}"), F.col(f"__sd_{m.flat}")
                parts.append(
                    enriched.filter(x.isNotNull() & (F.abs(x - mu) > 2 * sd))
                    .select(self._mk(m.flat, "warning", "number_out_of_range",
                                     F.concat(F.lit("Value more than 2σ from mean: '"), c, F.lit("'"))))
                )
        # StartDate ≤ EndDate pairs within each table (validate.py:365-377)
        by_prefix: dict[tuple[str, str], dict[str, str]] = {}
        for m in self.meta:
            if m.column.endswith("StartDate"):
                by_prefix.setdefault((m.table, m.column[:-9]), {})["start"] = m.flat
            elif m.column.endswith("EndDate"):
                by_prefix.setdefault((m.table, m.column[:-7]), {})["end"] = m.flat
        for (_, _), pair in by_prefix.items():
            if "start" in pair and "end" in pair:
                s, e = F.col(pair["start"]), F.col(pair["end"])
                parts.append(
                    self.df.filter(
                        s.try_cast("date").isNotNull()
                        & e.try_cast("date").isNotNull()
                        & (e.try_cast("date") < s.try_cast("date"))
                    ).select(self._mk(pair["end"], "error", "start_end_date",
                                      F.concat(F.lit("EndDate precedes StartDate: '"), e, F.lit("'"))))
                )
        if not parts:
            return self.spark.createDataFrame([], DIAG_SCHEMA)
        return reduce(DataFrame.unionByName, parts)

    def _mk(self, column: str, level: str, code: str, message: F.Column) -> F.Column:
        return F.struct(
            F.col(ROW_IDX).alias("row_idx"),
            F.lit(column).alias("column"),
            F.lit(level).alias("level"),
            F.lit(code).alias("code"),
            message.alias("message"),
        ).alias("d")

    # -- entry point ------------------------------------------------------

    def run(self, template: list[ColumnMeta] | None = None) -> DataFrame:
        header = self.header_diagnostics()
        if template:
            header += self.missing_required_columns(template)
        header_df = self.spark.createDataFrame(
            [(d.row_idx, d.column, d.level, d.code, d.message) for d in header],
            DIAG_SCHEMA,
        )
        agg_df = self.aggregate_diagnostics()
        if "d" in agg_df.columns:
            agg_df = agg_df.select("d.*")
        return (
            header_df.unionByName(self.cell_diagnostics())
            .unionByName(agg_df)
            .orderBy("row_idx", "column", "code")
        )


def validate_file(
    spark: SparkSession, path: str, template: list[ColumnMeta] | None = None
) -> DataFrame:
    """Load + validate one metadata TSV → diagnostics DataFrame."""
    from ..sources.metadata_tsv import read_metadata

    df, meta = read_metadata(spark, path, typed=False)
    return Validator(spark, df, meta).run(template)
