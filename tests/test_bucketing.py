"""BucketedWarehouse: same contents as the plain layout, and the spine
joins it exists for (Specimen⋈Aliquot co-location) plan with NO exchange —
the bucket files carry the partitioning, so a 100 TB spine join never
re-shuffles the child side.  Re-registration proves the layout is durable:
the catalog entry is session-scoped but the on-disk bucketing is not."""

from __future__ import annotations

import pytest

from fixtures import write_specimen, write_subject

from mmeds_meta_spark.normalize import Warehouse, import_study
from mmeds_meta_spark.normalize.bucketing import BucketedWarehouse
from mmeds_meta_spark.sources.metadata_tsv import read_metadata

SPINE = ["Specimen", "Aliquot", "Sample", "RawData", "Results", "Subjects", "Study"]


@pytest.fixture(scope="module")
def warehouses(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bucketed")
    subject, _ = read_metadata(spark, str(write_subject(tmp)))
    specimen, _ = read_metadata(spark, str(write_specimen(tmp)))
    plain = Warehouse(spark, str(tmp / "plain"))
    import_study(plain, subject, specimen, user_id=2)
    bucketed = BucketedWarehouse(spark, str(tmp / "bucketed"), database="wh_test", buckets=4)
    import_study(bucketed, subject, specimen, user_id=2)
    return plain, bucketed


def test_contents_match_plain_layout(spark, warehouses):
    plain, bucketed = warehouses
    for t in SPINE:
        a = sorted(map(tuple, plain.table(t).collect()))
        b = sorted(map(tuple, bucketed.table(t).collect()))
        assert a == b, t


def test_spine_join_has_no_exchange(spark, warehouses):
    _, bucketed = warehouses
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        al, sp = bucketed.table("Aliquot"), bucketed.table("Specimen")
        j = al.join(sp, al["Specimen_idSpecimen"] == sp["idSpecimen"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_reregistration_survives_catalog_loss(spark, warehouses):
    _, bucketed = warehouses
    before = sorted(map(tuple, bucketed.table("Aliquot").collect()))
    spark.sql("DROP TABLE wh_test.`Aliquot`")
    reopened = BucketedWarehouse(
        spark, bucketed.path, database="wh_test", buckets=4
    )
    assert sorted(map(tuple, reopened.table("Aliquot").collect())) == before
    # and the re-attached table still bucket-joins exchange-free
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        al, sp = reopened.table("Aliquot"), reopened.table("Specimen")
        plan = (
            al.join(sp, al["Specimen_idSpecimen"] == sp["idSpecimen"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
