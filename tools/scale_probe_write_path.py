"""Scale-probe the write path: import_study + clear_user_data at ~10⁶ rows.

The normalize/delete path has pytest coverage at fixture scale (6 rows);
this probe generates a million-row synthetic metadata upload DIRECTLY as
typed DataFrames (the exact shape ``read_metadata(typed=True)`` yields —
``__row_idx`` + ``Table__Column`` flat columns), runs the full
``import_study`` write path twice (FK-level-parallel and sequential),
asserts the two warehouses hold IDENTICAL contents table-by-table, then
times ``clear_user_data``.  Results go into SCALE_NOTES.md.

Generation is distributed (``spark.range`` + column expressions — no
driver-side TSV materialization); cardinalities exercise the real shapes:
10⁶ unique subjects/specimens (the big dims + junctions), low-cardinality
dims (Ethnicity/Genotypes/Interventions/Lab/Study...) that hit the
dedup-or-insert MAX(id)+1 path, and per-subject ICD codes that flow
through parse_icd_codes.

Usage: python tools/scale_probe_write_path.py [n_rows]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from mmeds_meta_spark.session import get_spark  # noqa: E402


def synth_subject(spark: SparkSession, n: int) -> DataFrame:
    """Typed subject frame: every column read_metadata would produce for
    tests/fixtures.py's SUBJECT_COLS, at n rows / n unique subjects."""
    return spark.range(n).select(
        F.col("id").alias("__row_idx"),
        F.expr("ELEMENT_AT(ARRAY('Basque','Sami','Ainu'), CAST(id % 3 AS INT) + 1)").alias(
            "Ethnicity__Ethnicity"
        ),
        F.expr("CONCAT('GT-', id % 2)").alias("Genotypes__Genotype"),
        F.expr("CAST(1.5 + 0.05 * (id % 10) AS DOUBLE)").alias("Heights__Height"),
        F.expr("DATE'2019-03-04'").alias("Heights__HeightDateCollected"),
        F.expr(
            "ELEMENT_AT(ARRAY('B20.XXXX','J45.XXXX','E11.9XXX','I10.XXXX'),"
            " CAST(id % 4 AS INT) + 1)"
        ).alias("ICDCode__ICDCode"),
        F.lit("stable").alias("Illness__IllnessNotes"),
        F.expr("DATE'2019-06-01'").alias("Illness__IllnessEndDate"),
        F.expr("CAST(id % 97 AS STRING)").alias("Illness__IllnessInstanceID"),
        F.expr("DATE'2019-05-01'").alias("Illness__IllnessStartDate"),
        F.lit("none noted").alias("Intervention__InterventionNotes"),
        F.expr("DATE'2019-07-02'").alias("Intervention__InterventionEndDate"),
        F.expr("DATE'2019-07-01'").alias("Intervention__InterventionStartDate"),
        F.expr("CONCAT('IVC-', id % 5)").alias("Interventions__InterventionCode"),
        F.expr(
            "ELEMENT_AT(ARRAY('Hydration','Exercise','Diet','Sleep','Fasting'),"
            " CAST(id % 5 AS INT) + 1)"
        ).alias("Interventions__InterventionName"),
        F.lit("Lifestyle").alias("Interventions__InterventionType"),
        F.expr("CAST(1940 + id % 70 AS DOUBLE)").alias("Subjects__BirthYear"),
        F.expr("CONCAT('HS-', LPAD(CAST(id AS STRING), 8, '0'))").alias(
            "Subjects__HostSubjectId"
        ),
        F.lit("Lunar").alias("Subjects__Nationality"),
        F.expr("IF(id % 2 = 1, 'F', 'M')").alias("Subjects__Sex"),
        F.lit("Human").alias("SubjectType__SubjectType"),
        F.expr("CAST(50 + id % 60 AS DOUBLE)").alias("Weights__Weight"),
        F.expr("DATE'2019-03-04'").alias("Weights__WeightDateCollected"),
    )


def synth_specimen(spark: SparkSession, n: int) -> DataFrame:
    """Typed specimen frame: one specimen per subject (SubjectIdCol links
    back to HS-xxxxxxxx)."""
    return spark.range(n).select(
        F.col("id").alias("__row_idx"),
        F.lit("lab@example.org").alias("Lab__ContactEmail"),
        F.lit("Ada Contact").alias("Lab__ContactName"),
        F.lit("Dr. PI").alias("Lab__PrimaryInvestigator"),
        F.expr(
            "CONCAT(ELEMENT_AT(ARRAY('GATTACAG','CATTACAG','TATTACAG','AATTACAG'),"
            " CAST(id % 4 AS INT) + 1), LPAD(CAST(id % 9973 AS STRING), 4, '0'))"
        ).alias("RawData__BarcodeSequence"),
        F.lit("GATCGATC").alias("RawData__LinkerPrimerSequence"),
        F.expr("CONCAT('RD-', LPAD(CAST(id AS STRING), 8, '0'))").alias(
            "RawData__RawDataID"
        ),
        F.lit("ok").alias("RawData__RawDataNotes"),
        F.expr("CONCAT('RDP-', id % 3)").alias("RawDataProtocol__RawDataProtocolID"),
        F.expr("CONCAT('RSP-', id % 3)").alias(
            "ResultsProtocol__ResultsProtocolID"
        ),
        F.expr("CONCAT('SP-', id % 3)").alias("SampleProtocol__SampleProtocolID"),
        F.expr("CONCAT('SPEC-', LPAD(CAST(id AS STRING), 8, '0'))").alias(
            "Specimen__SpecimenID"
        ),
        F.expr("DATE'2019-08-01'").alias("Specimen__SpecimenCollectionDate"),
        F.lit("10:30:00").alias("Specimen__SpecimenCollectionTime"),
        F.expr("CAST(1 + id % 7 AS DOUBLE)").alias("Specimen__SpecimenWeight"),
        F.lit("Gram").alias("Specimen__SpecimenWeightUnit"),
        F.lit("ScaleProbeStudy").alias("Study__StudyName"),
        F.lit("Cohort").alias("Study__StudyType"),
        F.expr("CONCAT('EXP-', id % 4)").alias("Experiment__ExperimentName"),
        F.expr("CONCAT('ALQ-', LPAD(CAST(id AS STRING), 8, '0'))").alias(
            "Aliquot__AliquotID"
        ),
        F.expr("CAST(0.5 + (id % 3) * 0.25 AS DOUBLE)").alias(
            "Aliquot__AliquotWeight"
        ),
        F.expr("CONCAT('SMP-', LPAD(CAST(id AS STRING), 8, '0'))").alias(
            "Sample__SampleID"
        ),
        F.expr("CAST(0.1 + (id % 5) * 0.1 AS DOUBLE)").alias("Sample__SampleWeight"),
        F.expr(
            "ELEMENT_AT(ARRAY('Gut','Skin','Oral'), CAST(id % 3 AS INT) + 1)"
        ).alias("BodySite__SpecimenBodySite"),
        F.lit("Stool").alias("Type__SpecimenType"),
        F.expr("CONCAT('HS-', LPAD(CAST(id AS STRING), 8, '0'))").alias(
            "AdditionalMetaData__SubjectIdCol"
        ),
        F.expr("CAST(id % 30 AS LONG)").alias("AdditionalMetaData__DaysSinceStart"),
    )


def table_digest(df: DataFrame) -> tuple[int, str]:
    """(row_count, order-insensitive md5-of-rows digest) for content
    comparison between two warehouses."""
    cols = sorted(df.columns)
    hashed = df.select(
        F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])).alias("h")
    )
    row = hashed.agg(
        F.count("*").alias("n"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list("h")))).alias("d"),
    ).collect()[0]
    return row.n, row.d


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("scale-probe-write")
    spark.sparkContext.setLogLevel("ERROR")

    from mmeds_meta_spark.normalize import Warehouse, import_study

    subject = synth_subject(spark, n).localCheckpoint()
    specimen = synth_specimen(spark, n).localCheckpoint()

    tmp = tempfile.mkdtemp(prefix="scale_probe_wh_")
    results: dict[str, float] = {}
    try:
        wh_par = Warehouse(spark, f"{tmp}/par")
        t0 = time.time()
        import_study(wh_par, subject, specimen, user_id=2, parallel=True)
        results["import_parallel_sec"] = round(time.time() - t0, 1)

        wh_seq = Warehouse(spark, f"{tmp}/seq")
        t0 = time.time()
        import_study(wh_seq, subject, specimen, user_id=2, parallel=False)
        results["import_sequential_sec"] = round(time.time() - t0, 1)

        from mmeds_meta_spark.catalog import TABLE_ORDER
        from mmeds_meta_spark.normalize.normalizer import _SKIP, JUNCTION_TABLES, TABLES

        tables = [t for t in TABLE_ORDER if t not in _SKIP and t in TABLES] + list(
            JUNCTION_TABLES
        )
        mismatches = []
        for t in tables:
            np_, dp = table_digest(wh_par.table(t))
            ns_, ds = table_digest(wh_seq.table(t))
            status = "OK" if (np_, dp) == (ns_, ds) else "MISMATCH"
            if status != "OK":
                mismatches.append(t)
            print(f"{status:9s} {t:24s} rows par={np_} seq={ns_}")
        assert not mismatches, f"parallel != sequential for: {mismatches}"

        t0 = time.time()
        deleted = wh_par.clear_user_data(2)
        results["clear_user_data_sec"] = round(time.time() - t0, 1)
        results["rows_deleted"] = sum(deleted.values())
        spd = results["import_sequential_sec"] / results["import_parallel_sec"]
        print(
            f"\nn={n}  import parallel={results['import_parallel_sec']}s "
            f"sequential={results['import_sequential_sec']}s "
            f"(speedup {spd:.2f}x)  "
            f"clear_user_data={results['clear_user_data_sec']}s "
            f"({results['rows_deleted']} rows)"
        )
        print("parallel == sequential contents: VERIFIED for", len(tables), "tables")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
