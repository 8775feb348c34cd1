"""Meta-study pipeline + hierarchical ID generation end-to-end."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from fixtures import write_specimen, write_subject

from mmeds_meta_spark.normalize import Warehouse, import_study
from mmeds_meta_spark.plans import MmedsSession
from mmeds_meta_spark.plans.ids import generate_aliquot_ids, uniquify_ids
from mmeds_meta_spark.plans.meta_study import build_meta_study
from mmeds_meta_spark.sources.metadata_tsv import ROW_IDX, join_metadata, read_metadata


@pytest.fixture(scope="module")
def study(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("meta")
    subject, _ = read_metadata(spark, str(write_subject(tmp)))
    specimen, smeta = read_metadata(spark, str(write_specimen(tmp)))
    wh = Warehouse(spark, str(tmp / "wh"))
    import_study(wh, subject, specimen, user_id=2)
    joined = join_metadata(subject, specimen)
    return wh, joined, smeta


def test_build_meta_study(spark, study):
    wh, joined, _ = study
    session = MmedsSession(spark, wh, user_id=2)
    merged = build_meta_study(
        session,
        "PrimaryInvestigator = 'Grace Hopper'",
        joined_metadata={"StudyAlpha": joined},
        new_study_name="MetaStudy1",
    )
    rows = merged.collect()
    assert len(rows) == 6
    ids = sorted(r["RawData__RawDataID"] for r in rows)
    assert ids == [f"RD-{i:03d}_0" for i in range(6)]  # uniquified
    assert {r["Study__StudyName"] for r in rows} == {"MetaStudy1"}


def test_meta_study_empty_cohort(spark, study):
    wh, joined, _ = study
    session = MmedsSession(spark, wh, user_id=2)
    merged = build_meta_study(
        session,
        "PrimaryInvestigator = 'Nobody'",
        joined_metadata={"StudyAlpha": joined},
        new_study_name="MetaStudy2",
    )
    assert merged.count() == 0


def test_generate_aliquot_ids(spark, study):
    wh, _, _ = study
    new = (
        wh.table("Specimen")
        .filter(F.col("idSpecimen") > 1)
        .select("idSpecimen", "SpecimenID")
        .limit(3)
    )
    out = generate_aliquot_ids(wh, new)
    rows = out.collect()
    assert len(rows) == 3
    for r in rows:
        # each specimen already has 1 aliquot from the upload → ordinal 2
        assert r.generated_id == f"{r.SpecimenID}-Aliquot2"


def test_uniquify_duplicate_ids(spark):
    df = spark.createDataFrame(
        [(0, "X"), (1, "X"), (2, "Y")], f"{ROW_IDX} long, RawDataID string"
    )
    out = uniquify_ids(df, "RawDataID", order_cols=[ROW_IDX])
    got = sorted(r.RawDataID for r in out.collect())
    assert got == ["X_0", "X_1", "Y_0"]
