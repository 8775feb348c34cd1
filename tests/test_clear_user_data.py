"""User-data deletion (reference: mmeds/database/database.py:546-599,
accounting test mmeds/tests/unit/test_database.py:166-206).

Upload two users' studies into one warehouse, clear one, and assert
(a) per-table rows removed == that user's row counts (the reference's
accounting invariant), (b) the surviving user's query results are
byte-identical before/after, (c) a second clear removes nothing, and
(d) a delete that would orphan a surviving user's FK raises MetaDataError
without mutating the store (the reference's IntegrityError re-raise).
"""

from __future__ import annotations

import pytest

from fixtures import specimen_rows, subject_rows, write_specimen, write_subject

from mmeds_meta_spark.catalog import JUNCTION_TABLES, PROTECTED_TABLES, TABLE_ORDER
from mmeds_meta_spark.normalize import MetaDataError, Warehouse, import_study
from mmeds_meta_spark.plans import MmedsSession
from mmeds_meta_spark.sources.metadata_tsv import read_metadata

ACCOUNTED = [t for t in TABLE_ORDER if t in PROTECTED_TABLES] + list(JUNCTION_TABLES)


def _beta_subject_rows():
    rows = subject_rows()
    for i, r in enumerate(rows):
        r["HostSubjectId"] = f"HB-{i:03d}"
        r["IllnessInstanceID"] = f"B{i}"
    return rows


def _beta_specimen_rows(*, pi: str = "Margaret Hamilton"):
    rows = specimen_rows()
    for i, r in enumerate(rows):
        r.update(
            {
                "PrimaryInvestigator": pi,
                "StudyName": "StudyBeta",
                "ExperimentName": "ExpB",
                "RawDataID": f"BRD-{i:03d}",
                "RawDataProtocolID": "BRUN-1",
                "ResultsProtocolID": f"BRESP-{i:03d}",
                "SampleProtocolID": f"BSAMP-{i:03d}",
                "SpecimenID": f"BSP-{i:03d}",
                "AliquotID": f"BSP-{i:03d}-Aliquot1",
                "SampleID": f"BSP-{i:03d}-Sample1",
                "SubjectIdCol": f"HB-{i % 6:03d}",
            }
        )
    return rows


def _import(spark, wh, tmp, subj_rows, spec_rows, user_id):
    tmp.mkdir(parents=True, exist_ok=True)
    subj_p = write_subject(tmp, rows=subj_rows)
    spec_p = write_specimen(tmp, rows=spec_rows)
    subject, _ = read_metadata(spark, str(subj_p))
    specimen, _ = read_metadata(spark, str(spec_p))
    import_study(wh, subject, specimen, user_id=user_id)


@pytest.fixture(scope="module")
def two_user_wh(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wh_clear")
    wh = Warehouse(spark, str(tmp / "warehouse"))
    _import(spark, wh, tmp / "a", subject_rows(), specimen_rows(), user_id=2)
    _import(spark, wh, tmp / "b", _beta_subject_rows(), _beta_specimen_rows(), user_id=3)
    return wh


def test_clear_user_accounting_and_isolation(spark, two_user_wh):
    wh = two_user_wh
    before_total = {t: wh.table(t).count() for t in ACCOUNTED}
    before_user3 = {
        t: wh.table(t).filter("user_id = 3").count() for t in ACCOUNTED
    }
    # user 3 actually owns rows in the spine tables
    for t in ("Subjects", "Specimen", "RawData", "Study", "Aliquot", "Sample"):
        assert before_user3[t] > 0, t
    survivor = MmedsSession(spark, wh, user_id=2)
    baseline = sorted(
        map(tuple, survivor.execute("SELECT * FROM Specimen").collect()), key=repr
    )
    baseline_meta = survivor.query_meta_analysis_dict(
        "PrimaryInvestigator = 'Grace Hopper'"
    )

    removed = wh.clear_user_data(3)

    # (a) the reference's accounting invariant, per table
    for t in ACCOUNTED:
        assert removed[t] == before_user3[t], t
        assert wh.table(t).count() == before_total[t] - before_user3[t], t
        assert wh.table(t).filter("user_id = 3").count() == 0, t
    # (b) survivor's results byte-identical
    after = sorted(
        map(tuple, survivor.execute("SELECT * FROM Specimen").collect()), key=repr
    )
    assert after == baseline
    assert (
        survivor.query_meta_analysis_dict("PrimaryInvestigator = 'Grace Hopper'")
        == baseline_meta
    )
    # the cleared user sees only null-seed rows now
    gone = MmedsSession(spark, wh, user_id=3)
    got = gone.execute("SELECT SpecimenID FROM Specimen").collect()
    assert all(r.SpecimenID is None for r in got)
    # (c) idempotent
    assert all(v == 0 for v in wh.clear_user_data(3).values())


def test_clear_user_orphan_raises(spark, tmp_path_factory):
    """User 3 shares user 2's Lab row (same PI/contact → dedup-or-insert
    reuses it, owned by user 2).  Clearing user 2 must raise and leave the
    store untouched — parquet's stand-in for the FK IntegrityError path."""
    tmp = tmp_path_factory.mktemp("wh_orphan")
    wh = Warehouse(spark, str(tmp / "warehouse"))
    _import(spark, wh, tmp / "a", subject_rows(), specimen_rows(), user_id=2)
    _import(
        spark,
        wh,
        tmp / "b",
        _beta_subject_rows(),
        _beta_specimen_rows(pi="Grace Hopper"),
        user_id=3,
    )
    before = {t: wh.table(t).count() for t in ACCOUNTED}
    with pytest.raises(MetaDataError, match="Lab"):
        wh.clear_user_data(2)
    # all-or-nothing: nothing was rewritten
    assert {t: wh.table(t).count() for t in ACCOUNTED} == before
    # without integrity verification the delete proceeds (caller's choice)
    removed = wh.clear_user_data(2, verify_integrity=False)
    assert removed["Lab"] == 1
