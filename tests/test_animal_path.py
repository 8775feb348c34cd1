"""Animal-subject path: polymorphic SubjectType (§7 hard-part 3), the
AnimalSubjectTable view, and a human+animal MetaAnalysisView coexisting."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from fixtures import (
    write_animal_specimen,
    write_animal_subject,
    write_specimen,
    write_subject,
)

from mmeds_meta_spark.normalize import Warehouse, import_study
from mmeds_meta_spark.plans import MmedsSession
from mmeds_meta_spark.sources.metadata_tsv import read_metadata


@pytest.fixture(scope="module")
def zoo(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("zoo")
    wh = Warehouse(spark, str(tmp / "wh"))
    # human study
    hs, _ = read_metadata(spark, str(write_subject(tmp)))
    hp, _ = read_metadata(spark, str(write_specimen(tmp)))
    import_study(wh, hs, hp, user_id=2)
    # animal study
    zs, _ = read_metadata(spark, str(write_animal_subject(tmp)))
    zp, _ = read_metadata(spark, str(write_animal_specimen(tmp)))
    import_study(wh, zs, zp, user_id=2)
    return wh


def test_animal_dimensions_created(spark, zoo):
    wh = zoo
    assert wh.table("AnimalSubjects").filter(F.col("AnimalSubjectID").isNotNull()).count() == 4
    assert wh.table("Species").filter(F.col("SpeciesName") == "Mus musculus").count() == 1
    assert wh.table("Chow").filter(F.col("ProductCode") == "SD-01").count() == 1


def test_polymorphic_subject_type(spark, zoo):
    wh = zoo
    st = wh.table("SubjectType").filter(F.col("idSubjectType") > 1)
    human = st.filter(F.col("SubjectType") == "Human")
    animal = st.filter(F.col("SubjectType") == "Animal")
    # humans link Subjects and not AnimalSubjects; animals the inverse
    # (FKs default to the null-seed row id=1 rather than NULL)
    assert human.filter(
        (F.col("Subjects_idSubjects") > 1) & (F.col("AnimalSubjects_idAnimalSubjects") <= 1)
    ).count() == human.count() > 0
    assert animal.filter(
        (F.col("AnimalSubjects_idAnimalSubjects") > 1) & (F.col("Subjects_idSubjects") <= 1)
    ).count() == animal.count() > 0


def test_animal_subject_table_view(spark, zoo):
    wh = zoo
    MmedsSession(spark, wh, user_id=2)
    view = spark.table("AnimalSubjectTable").filter(F.col("AnimalSubjectID").isNotNull())
    rows = view.collect()
    assert {r.AnimalSubjectID for r in rows} == {f"AS-{i:03d}" for i in range(4)}
    r0 = next(r for r in rows if r.AnimalSubjectID == "AS-000")
    assert r0.SpeciesName == "Mus musculus" and r0.SexAnimal == "M"


def test_meta_analysis_spans_both_kinds(spark, zoo):
    wh = zoo
    s = MmedsSession(spark, wh, user_id=2)
    result = s.query_meta_analysis_dict("PrimaryInvestigator = 'Grace Hopper'")
    assert set(result) == {"StudyAlpha", "StudyZoo"}
    assert result["StudyZoo"] == [f"ZRD-{i:03d}" for i in range(4)]
    # animal-only filter finds only the zoo study
    animal_only = s.query_meta_analysis_dict("SpeciesName = 'Mus musculus'")
    assert set(animal_only) == {"StudyZoo"}
