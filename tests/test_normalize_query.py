"""End-to-end write path + query layer, mirroring the reference's
round-trip tests (tests/unit/test_database.py:70-164):

* after import, every metadata row is findable in every one of its tables
  via null-safe natural-key lookup,
* junction pairs exist,
* the ICD decomposition reassembles to the original code,
* query_meta_analysis returns {study: [RawDataIDs]},
* RLS hides other users' rows, admin sees everything.
"""

from __future__ import annotations

import pytest

from fixtures import write_specimen, write_subject

from mmeds_meta_spark.normalize import Warehouse, import_study
from mmeds_meta_spark.plans import MmedsSession
from mmeds_meta_spark.sources.metadata_tsv import read_metadata


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wh")
    subj_p = write_subject(tmp)
    spec_p = write_specimen(tmp)
    subject, _ = read_metadata(spark, str(subj_p))
    specimen, _ = read_metadata(spark, str(spec_p))
    wh = Warehouse(spark, str(tmp / "warehouse"))
    work = import_study(wh, subject, specimen, user_id=2)
    return wh, work


def test_dimension_rows_created(spark, warehouse):
    wh, _ = warehouse
    # 6 subjects + seed row
    assert wh.table("Subjects").count() == 7
    assert wh.table("Study").filter("StudyName = 'StudyAlpha'").count() == 1
    assert wh.table("Lab").filter("PrimaryInvestigator = 'Grace Hopper'").count() == 1
    # 3 ethnicities + seed
    assert wh.table("Ethnicity").count() == 4
    assert wh.table("Specimen").count() == 7
    assert wh.table("RawData").count() == 7


def test_every_row_findable_nullsafe(spark, warehouse):
    wh, work = warehouse
    # work carries __id_<T> for every normalized table; none may be null
    for t in ("Lab", "Study", "Experiment", "Subjects", "Specimen", "RawData",
              "Aliquot", "Sample", "SubjectType", "Heights", "Weights",
              "Illness", "Intervention"):
        n_null = work.filter(work[f"__id_{t}"].isNull()).count()
        assert n_null == 0, f"unresolved FK into {t}"


def test_junction_pairs(spark, warehouse):
    wh, _ = warehouse
    pairs = wh.table("Subjects_has_Ethnicity")
    assert pairs.count() == 6  # one per subject
    # each pair references existing dims
    subs = wh.table("Subjects").select("idSubjects")
    assert pairs.join(subs, pairs.Subjects_idSubjects == subs.idSubjects).count() == 6


def test_icd_reassembly(spark, warehouse):
    wh, _ = warehouse
    st = MmedsSession(spark, wh, user_id=2)
    codes = [r.ICDCode for r in spark.table("SubjectTable").select("ICDCode").distinct().collect()]
    assert codes == ["B20.XXXX"]  # reassembled = original fixture code


def test_meta_analysis_query(spark, warehouse):
    wh, _ = warehouse
    st = MmedsSession(spark, wh, user_id=2)
    result = st.query_meta_analysis_dict("PrimaryInvestigator = 'Grace Hopper'")
    assert result == {
        "StudyAlpha": [f"RD-{i:03d}" for i in range(6)]
    }
    assert st.query_meta_analysis_dict("PrimaryInvestigator = 'Nobody'") == {}


def test_rls_hides_other_users(spark, warehouse):
    wh, _ = warehouse
    mine = MmedsSession(spark, wh, user_id=2)
    n_mine = mine.execute("SELECT SpecimenID FROM Specimen").count()
    assert n_mine == 7  # 6 rows + seed (null user_id rows stay visible)
    other = MmedsSession(spark, wh, user_id=99)
    got = other.execute("SELECT SpecimenID FROM Specimen").collect()
    assert all(r.SpecimenID is None for r in got)  # only the null seed row
    admin = MmedsSession(spark, wh, user_id=99, is_admin=True)
    assert admin.execute("SELECT SpecimenID FROM Specimen").count() == 7


def test_execute_drops_id_columns(spark, warehouse):
    wh, _ = warehouse
    st = MmedsSession(spark, wh, user_id=2)
    out = st.execute("SELECT * FROM Study")
    assert "idStudy" not in out.columns
    assert "Lab_idLab" not in out.columns
    assert "user_id" not in out.columns
    assert "StudyName" in out.columns


def test_import_idempotent(spark, warehouse, tmp_path):
    wh, _ = warehouse
    n_subj = wh.table("Subjects").count()
    subj_p = write_subject(tmp_path)
    spec_p = write_specimen(tmp_path)
    subject, _ = read_metadata(spark, str(subj_p))
    specimen, _ = read_metadata(spark, str(spec_p))
    import_study(wh, subject, specimen, user_id=2)
    # re-importing identical metadata creates NO new dimension rows
    assert wh.table("Subjects").count() == n_subj
    assert wh.table("Study").filter("StudyName = 'StudyAlpha'").count() == 1


def test_parallel_import_equals_sequential(spark, tmp_path):
    """Level-parallel materialization (independent Spark jobs from
    threads) must produce a warehouse identical to the sequential order
    — surrogate-key assignment is deterministic (max(id) + dense_rank
    over natural keys), so concurrency cannot reorder ids.  Also clocks
    both paths; the parallel one should not be slower beyond noise."""
    import time

    from mmeds_meta_spark.catalog import TABLES

    results = {}
    for mode, flag in (("par", True), ("seq", False)):
        d = tmp_path / mode
        d.mkdir()
        subj_p = write_subject(d)
        spec_p = write_specimen(d)
        subject, _ = read_metadata(spark, str(subj_p))
        specimen, _ = read_metadata(spark, str(spec_p))
        wh = Warehouse(spark, str(d / "warehouse"))
        t0 = time.monotonic()
        import_study(wh, subject, specimen, user_id=2, parallel=flag)
        results[mode] = (wh, time.monotonic() - t0)
    wh_p, t_par = results["par"]
    wh_s, t_seq = results["seq"]
    for table in TABLES:
        rows_p = sorted(map(tuple, wh_p.table(table).collect()), key=repr)
        rows_s = sorted(map(tuple, wh_s.table(table).collect()), key=repr)
        assert rows_p == rows_s, f"divergent contents in {table}"
    # wall-time: informational (local[8] + tiny fixture; the win shows in
    # job-scheduling overlap, not guaranteed on a noisy box)
    print(f"parallel={t_par:.1f}s sequential={t_seq:.1f}s")
