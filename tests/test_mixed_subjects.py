"""Mixed human/animal metadata file (reference util.py:166-182: the
bfill-coalesce subject key; config.py:605-620 mixed table sets)."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from fixtures import (
    ANIMAL_COLS,
    SPECIMEN_COLS,
    SUBJECT_COLS,
    _write,
    animal_rows,
    specimen_rows,
    subject_rows,
)

from mmeds_meta_spark.normalize import Warehouse, import_study
from mmeds_meta_spark.plans import MmedsSession
from mmeds_meta_spark.sources.metadata_tsv import join_metadata, read_metadata


@pytest.fixture(scope="module")
def mixed(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mixed")
    # union of human+animal columns; one subject-id kind per row
    cols = SUBJECT_COLS + [c for c in ANIMAL_COLS if c[1] != "SubjectType"]
    hrows = subject_rows(3)
    arows = animal_rows(2)
    rows = []
    for r in hrows:
        rows.append(r)  # AnimalSubjectID absent → NA
    for r in arows:
        rows.append(r)  # HostSubjectId absent → NA
    subj_p = _write(tmp / "mixed_subject.tsv", cols, rows)
    srows = specimen_rows(5)
    links = ["HS-000", "HS-001", "HS-002", "AS-000", "AS-001"]
    for i, r in enumerate(srows):
        r["SubjectIdCol"] = links[i]
        r["StudyName"] = "StudyMixed"
        r["RawDataID"] = f"MRD-{i:03d}"
        r["SpecimenID"] = f"MSP-{i:03d}"
        r["ResultsProtocolID"] = f"MRESP-{i:03d}"
        r["SampleProtocolID"] = f"MSAMP-{i:03d}"
    spec_p = _write(tmp / "mixed_specimen.tsv", SPECIMEN_COLS, srows)
    subject, _ = read_metadata(spark, str(subj_p))
    specimen, _ = read_metadata(spark, str(spec_p))
    wh = Warehouse(spark, str(tmp / "wh"))
    import_study(wh, subject, specimen, user_id=3)
    return wh, subject, specimen


def test_coalesced_join_links_both_kinds(spark, mixed):
    _, subject, specimen = mixed
    joined = join_metadata(subject, specimen)
    got = {
        r["AdditionalMetaData__SubjectIdCol"]: (
            r["Subjects__HostSubjectId"],
            r["AnimalSubjects__AnimalSubjectID"],
        )
        for r in joined.collect()
    }
    assert got["HS-001"] == ("HS-001", None)
    assert got["AS-000"] == (None, "AS-000")
    assert len(got) == 5


def test_mixed_import_populates_both_kinds(spark, mixed):
    wh, _, _ = mixed
    assert wh.table("Subjects").filter(F.col("HostSubjectId").isNotNull()).count() == 3
    assert wh.table("AnimalSubjects").filter(F.col("AnimalSubjectID").isNotNull()).count() == 2
    st = wh.table("SubjectType").filter("idSubjectType > 1")
    assert st.filter("SubjectType = 'Human'").count() > 0
    assert st.filter("SubjectType = 'Animal'").count() > 0


def test_mixed_meta_query(spark, mixed):
    wh, _, _ = mixed
    s = MmedsSession(spark, wh, user_id=3)
    res = s.query_meta_analysis_dict("StudyName = 'StudyMixed'")
    assert res == {"StudyMixed": [f"MRD-{i:03d}" for i in range(5)]}
    # human-attribute filter → only human-linked specimens
    hres = s.query_meta_analysis_dict("Nationality = 'Lunar'")
    assert set(hres.get("StudyMixed", [])) == {"MRD-000", "MRD-001", "MRD-002"}
