"""S11 — qza artifact ingestion (zip layout per QIIME2; reference
extracts with unzip + biom convert, extract_feature_table.sh)."""

from __future__ import annotations

import zipfile

import pytest

from mmeds_meta_spark.sources.qza import (
    QzaPayloadError,
    list_data_files,
    read_qza_feature_table,
    read_qza_tree,
    write_qza,
)


def test_qza_tree_roundtrip(spark, tmp_path):
    p = str(tmp_path / "rooted_tree.qza")
    write_qza(p, "tree.nwk", "((A:1,B:2)x:4,(C:3)y:5);\n")
    mem = read_qza_tree(spark, p)
    assert mem.count() == 6
    assert {r.leaf for r in mem.collect()} == {"A", "B", "C"}


def test_qza_feature_table_with_biom_banner(spark, tmp_path):
    p = str(tmp_path / "asv_table.qza")
    tsv = (
        "# Constructed from biom file\n"
        "#OTU ID\ts1\ts2\n"
        "f1\t3\t0\n"
        "f2\t1\t5\n"
    )
    write_qza(p, "feature-table.tsv", tsv)
    long = read_qza_feature_table(spark, p)
    got = {(r.feature_id, r.sample_id): r["count"] for r in long.collect()}
    assert got == {
        ("f1", "s1"): 3.0,
        ("f1", "s2"): 0.0,
        ("f2", "s1"): 1.0,
        ("f2", "s2"): 5.0,
    }


def test_qza_biom_payload_raises_with_instruction(spark, tmp_path):
    p = str(tmp_path / "table.qza")
    write_qza(p, "feature-table.biom", b"\x89HDF\r\n")
    with pytest.raises(QzaPayloadError, match="biom convert"):
        read_qza_feature_table(spark, p)


def test_reference_artifact_is_listable():
    """The reference repo ships real .qza artifacts — the zip layout this
    reader assumes must hold on them."""
    ref = "/root/reference/test_files/test_snakemake/lefse_failure/tables/taxa_table_L7.qza"
    try:
        names = list_data_files(ref)
    except (FileNotFoundError, zipfile.BadZipFile):
        pytest.skip("reference artifact unavailable")
    assert names, "no data members found"
    assert all("/data/" in n for n in names)
