"""Feature-table analytics: wide↔long, collapse, merge, LEfSe format,
QIIME mapping writer, seeded rarefaction."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from mmeds_meta_spark.sources.feature_table import (
    alpha_over_rarefactions,
    format_lefse,
    long_to_wide,
    merge_feature_tables,
    rarefy,
    read_otu_wide,
    taxa_collapse,
    write_lefse,
    write_qiime_mapping,
)


@pytest.fixture(scope="module")
def long_ft(spark):
    rows = []
    for s in ("S1", "S2", "S3"):
        for i, f in enumerate(("OTU_a", "OTU_b", "OTU_c", "OTU_d")):
            rows.append((f, s, float(10 * (i + 1) + (ord(s[-1]) - 48))))
    return spark.createDataFrame(rows, "feature_id string, sample_id string, count double")


def test_wide_round_trip(spark, tmp_path, long_ft):
    wide = long_to_wide(long_ft)
    p = tmp_path / "otu.tsv"
    cols = wide.columns
    with open(p, "w") as f:
        f.write("\t".join(["OTU_id"] + cols[1:]) + "\n")
        for r in wide.orderBy("feature_id").collect():
            f.write("\t".join([r.feature_id] + [str(r[c]) for c in cols[1:]]) + "\n")
    back = read_otu_wide(spark, str(p))
    assert back.count() == long_ft.count()
    orig = {(r.feature_id, r.sample_id): r["count"] for r in long_ft.collect()}
    for r in back.collect():
        assert orig[(r.feature_id, r.sample_id)] == r["count"]


def test_taxa_collapse(spark, long_ft):
    tax = spark.createDataFrame(
        [
            ("OTU_a", "k__B|p__F|c__X"),
            ("OTU_b", "k__B|p__F|c__Y"),
            ("OTU_c", "k__B|p__G|c__Z"),
            ("OTU_d", "k__A|p__H|c__W"),
        ],
        "feature_id string, lineage string",
    )
    collapsed = taxa_collapse(long_ft, tax, level=2)
    got = {(r.taxon, r.sample_id): r["count"] for r in collapsed.collect()}
    # OTU_a + OTU_b share k__B|p__F → counts sum
    s1 = got[("k__B|p__F", "S1")]
    expected = sum(
        r["count"] for r in long_ft.collect()
        if r.sample_id == "S1" and r.feature_id in ("OTU_a", "OTU_b")
    )
    assert s1 == expected
    assert ("k__B|p__G", "S2") in got and ("k__A|p__H", "S3") in got


def test_merge_feature_tables(spark, long_ft):
    merged = merge_feature_tables(long_ft, long_ft)
    got = {(r.feature_id, r.sample_id): r["count"] for r in merged.collect()}
    for r in long_ft.collect():
        assert got[(r.feature_id, r.sample_id)] == 2 * r["count"]


def test_format_and_write_lefse(spark, tmp_path, long_ft):
    meta = spark.createDataFrame(
        [("S1", "case", "su1"), ("S2", "control", "su2"), ("S3", None, "su3")],
        "sample_id string, condition string, subject string",
    )
    lefse = format_lefse(long_ft, meta, class_col="condition", subject_col="subject")
    # S3 has NULL class → dropped
    assert lefse.filter(F.col("sample_id") == "S3").count() == 0
    # relative abundances sum to 1 per sample
    sums = lefse.groupBy("sample_id").agg(F.sum("rel_abundance").alias("s")).collect()
    for r in sums:
        assert r.s == pytest.approx(1.0)
    out = tmp_path / "lefse.tsv"
    write_lefse(lefse, str(out), class_col="condition", subject_col="subject")
    lines = out.read_text().splitlines()
    assert lines[0].split("\t") == ["class", "case", "control"]
    assert lines[1].split("\t") == ["subject", "su1", "su2"]
    assert len(lines) == 2 + 4  # meta rows + 4 taxa


def test_write_qiime_mapping(spark, tmp_path):
    df = spark.createDataFrame(
        [("R1", "GATC", "GGGG", "gut"), ("R2", "CATG", "GGGG", "skin")],
        "RawDataID string, BarcodeSequence string, LinkerPrimerSequence string, BodySite string",
    )
    p = tmp_path / "map.tsv"
    write_qiime_mapping(
        df, str(p), sample_id_col="RawDataID", barcode_col="BarcodeSequence",
        linker_col="LinkerPrimerSequence",
    )
    lines = p.read_text().splitlines()
    assert lines[0].split("\t")[:4] == ["#SampleID", "BarcodeSequence", "LinkerPrimerSequence", "MmedsSampleID"]
    assert lines[1].split("\t")[0] == "#q2:types"
    assert set(lines[1].split("\t")[1:]) == {"categorical"}
    assert len(lines) == 4


def test_rarefy_deterministic_and_depth_exact(spark, long_ft):
    r1 = rarefy(long_ft, depth=30, iterations=3, seed=7)
    r2 = rarefy(long_ft, depth=30, iterations=3, seed=7)
    a = sorted(map(tuple, r1.collect()))
    b = sorted(map(tuple, r2.collect()))
    assert a == b  # seeded → identical under re-execution
    # each (sample, iteration) draw sums exactly to depth
    sums = r1.groupBy("sample_id", "iteration").agg(F.sum("count").alias("s")).collect()
    assert sums and all(r.s == 30.0 for r in sums)
    alpha = alpha_over_rarefactions(r1)
    assert alpha.count() == 3
    row = alpha.first()
    assert row.n_iterations == 3 and row.mean_observed <= 4


def test_rarefy_drops_shallow_samples(spark):
    shallow = spark.createDataFrame(
        [("OTU_a", "S9", 3.0), ("OTU_b", "S9", 2.0)],
        "feature_id string, sample_id string, count double",
    )
    assert rarefy(shallow, depth=30, iterations=2).count() == 0
