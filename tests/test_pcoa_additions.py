"""PCoA ordination + aliquot addition write path + weight cascade + S8 sink."""

from __future__ import annotations

import numpy as np
import pytest

import pyspark.sql.functions as F

from fixtures import write_specimen, write_subject

from mmeds_meta_spark.functions.pcoa import pcoa
from mmeds_meta_spark.normalize import Warehouse, import_study
from mmeds_meta_spark.plans.additions import add_aliquots, remaining_weight, write_query_tsv
from mmeds_meta_spark.sources.metadata_tsv import read_metadata


def test_pcoa_recovers_line_geometry(spark):
    # 4 points on a line at 0, 1, 2, 3 → distances are |i−j|; PCoA must
    # put all variance on axis 1 and preserve gaps
    rows = []
    for i in range(4):
        for j in range(i + 1, 4):
            rows.append((f"s{i}", f"s{j}", float(j - i)))
    d = spark.createDataFrame(rows, "ua string, ub string, distance double")
    res = pcoa(d, n_axes=3)
    assert res.explained[0] == pytest.approx(1.0, abs=1e-9)
    axis1 = sorted(res.coordinates[:, 0])
    gaps = np.diff(axis1)
    assert np.allclose(gaps, 1.0, atol=1e-9)


def test_pcoa_max_samples_guard(spark):
    # 4 samples → 6 pairs; max_samples=3 allows only 3 → must raise, not
    # build the dense matrix (the collect itself is capped via limit)
    rows = [(f"s{i}", f"s{j}", 1.0) for i in range(4) for j in range(i + 1, 4)]
    d = spark.createDataFrame(rows, "ua string, ub string, distance double")
    with pytest.raises(ValueError, match="max_samples"):
        pcoa(d, max_samples=3)
    from mmeds_meta_spark.functions.permanova import permanova

    g = spark.createDataFrame(
        [(f"s{i}", "a" if i < 2 else "b") for i in range(4)],
        "sample_id string, group string",
    )
    with pytest.raises(ValueError, match="max_samples"):
        permanova(d, g, max_samples=3)


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("adds")
    subject, _ = read_metadata(spark, str(write_subject(tmp)))
    specimen, _ = read_metadata(spark, str(write_specimen(tmp)))
    wh = Warehouse(spark, str(tmp / "wh"))
    import_study(wh, subject, specimen, user_id=2)
    return wh


def test_add_aliquots_generates_ids_and_appends(spark, warehouse):
    wh = warehouse
    n_before = wh.table("Aliquot").count()
    upload = spark.createDataFrame(
        [
            ("StudyAlpha", "SP-000", 1.25, "g"),
            ("StudyAlpha", "SP-001", 2.5, "g"),
        ],
        "StudyName string, SpecimenID string, AliquotWeight double, AliquotWeightUnit string",
    )
    new = add_aliquots(wh, upload, user_id=2)
    got = {r.AliquotID for r in new.collect()}
    # each specimen already had 1 aliquot from the upload → ordinal 2
    assert got == {"SP-000-Aliquot2", "SP-001-Aliquot2"}
    assert wh.table("Aliquot").count() == n_before + 2
    # surrogate ids continue past the previous max, unique
    ids = [r.idAliquot for r in wh.table("Aliquot").collect()]
    assert len(ids) == len(set(ids))


def test_remaining_weight_cascade(spark, warehouse):
    wh = warehouse
    rem = {r.SpecimenID: r for r in remaining_weight(wh).collect() if r.SpecimenID}
    r0 = rem["SP-000"]
    # fixture: SpecimenWeight=10, import aliquot 2.5 + added 1.25
    assert float(r0.SpecimenWeight) == 10.0
    assert float(r0.remaining_weight) == pytest.approx(10.0 - 2.5 - 1.25)


def test_write_query_tsv(spark, tmp_path, warehouse):
    wh = warehouse
    from mmeds_meta_spark.plans import MmedsSession

    s = MmedsSession(spark, wh, user_id=2)
    out = s.execute("SELECT StudyName, StudyType FROM Study WHERE StudyName IS NOT NULL")
    p = tmp_path / "query.tsv"
    write_query_tsv(out, str(p))
    lines = p.read_text().splitlines()
    assert lines[0] == "StudyName\tStudyType"
    assert lines[1] == "StudyAlpha\tLongitudinal"


def test_add_samples_generates_ids(spark, warehouse):
    from mmeds_meta_spark.plans.additions import add_samples

    wh = warehouse
    n_before = wh.table("Sample").count()
    upload = spark.createDataFrame(
        [("StudyAlpha", "SP-000-Aliquot1", 0.5, "g")],
        "StudyName string, AliquotID string, SampleWeight double, SampleWeightUnit string",
    )
    new = add_samples(wh, upload, user_id=2)
    rows = new.collect()
    assert len(rows) == 1
    # the aliquot already carries 1 sample from the import → ordinal 2
    assert rows[0].SampleID == "SP-000-Aliquot1-Sample2"
    assert wh.table("Sample").count() == n_before + 1


def test_pcoa_power_matches_numpy_eigh(spark):
    """The in-plan power-iteration PCoA must agree with the collected-
    matrix numpy eigendecomposition on the same Bray-Curtis block:
    same top-2 eigenvalues and, up to sign (fixed by the smallest
    sample's loading), the same coordinates."""
    from conftest import SF_CORRECT
    from mmeds_meta_spark.operators.diversity import d2_bray_curtis, d2_pcoa_power

    bc = d2_bray_curtis(spark, SF_CORRECT).select(
        "ua", "ub", F.col("bray_curtis").alias("distance")
    )
    ref = pcoa(bc, n_axes=2)
    out = {r.sample: r for r in d2_pcoa_power(spark, SF_CORRECT).collect()}
    assert set(out) == set(ref.sample_ids)

    row0 = out[ref.sample_ids[0]]
    assert row0.eig1 == pytest.approx(ref.eigenvalues[0], rel=1e-4)
    assert row0.eig2 == pytest.approx(ref.eigenvalues[1], rel=1e-3)
    for axis, attr in ((0, "pc1"), (1, "pc2")):
        got = np.array([getattr(out[s], attr) for s in ref.sample_ids])
        want = ref.coordinates[:, axis]
        # numpy's eigenvector sign is arbitrary; align before comparing
        if np.dot(got, want) < 0:
            want = -want
        assert np.allclose(got, want, atol=5e-3), f"axis {axis} mismatch"
