"""F4/F5/F21/F22 scalar helpers + extra validation mutation coverage."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from fixtures import specimen_rows, subject_rows, write_specimen, write_subject

from mmeds_meta_spark.functions.scalars import (
    camel_case,
    from_mixs,
    is_numeric,
    swap_taxonomy_delims,
    to_mixs,
)
from mmeds_meta_spark.validation import validate_file


def test_camel_case_and_numeric(spark):
    df = spark.createDataFrame(
        [("body site", "12.5"), ("sample_weight", "abc"), ("chow-dates", "")],
        "name string, val string",
    )
    rows = df.select(
        camel_case("name").alias("cc"), is_numeric("val").alias("num")
    ).collect()
    assert [r.cc for r in rows] == ["BodySite", "SampleWeight", "ChowDates"]
    assert [r.num for r in rows] == [True, False, False]


def test_mixs_round_trip(spark):
    df = spark.createDataFrame([("S", 1.0)], "Study__StudyName string, CollectionSite__Depth double")
    m = to_mixs(df)
    assert m.columns == ["project_name", "depth"]
    back = from_mixs(m)
    assert back.columns == ["Study__StudyName", "CollectionSite__Depth"]


def test_swap_taxonomy_delims(spark):
    df = spark.createDataFrame([("k__Bacteria;p__Firmicutes sp",)], "t string")
    assert df.select(swap_taxonomy_delims("t").alias("o")).first().o == (
        "k__Bacteria|p__Firmicutes_sp"
    )


def test_outlier_and_rare_warnings(spark, tmp_path):
    rows = subject_rows()
    rows[3]["Weight"] = "500"  # way beyond the 60-65 cluster → 2σ outlier
    p = write_subject(tmp_path, rows=rows)
    diags = validate_file(spark, str(p)).collect()
    assert any(
        d.code == "number_out_of_range" and d.row_idx == 3 and "Weight" in d.column
        and d.level == "warning"
        for d in diags
    )


def test_non_standard_na_variants(spark, tmp_path):
    for i, variant in enumerate(["n/a", "Not Applicable", "NONE"]):
        rows = specimen_rows()
        rows[i]["SpecimenWeightUnit"] = variant
        p = write_specimen(tmp_path, rows=rows)
        diags = validate_file(spark, str(p)).collect()
        assert any(
            d.code == "non_standard_na" and d.row_idx == i for d in diags
        ), variant


def test_template_loader(tmp_path):
    from mmeds_meta_spark.sources.metadata_tsv import load_template

    meta = load_template(str(write_subject(tmp_path)))
    assert len(meta) == 22 and meta[0].table == "Ethnicity"
