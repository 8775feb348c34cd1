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


def test_qza_real_reference_biom_parses(spark):
    """The reference ships real h5py-written biom 2.1 artifacts — the
    minimal HDF5 reader must ingest one end-to-end (chunked + deflate
    arrays, vlen-string ids via the global heap)."""
    import pytest as _pytest

    ref = "/root/reference/test_files/test_snakemake/lefse/tables/taxa_table_L6.qza"
    try:
        open(ref, "rb").close()
    except OSError:
        _pytest.skip("reference artifact unavailable")
    from mmeds_meta_spark.sources.biom import biom_to_long_rows
    from mmeds_meta_spark.sources.hdf5_min import H5File
    from mmeds_meta_spark.sources.qza import read_data_bytes

    blob = read_data_bytes(ref, ".biom")
    f = H5File(blob)
    rows = biom_to_long_rows(blob)
    assert len(f.dataset("observation/ids")) == 228
    assert len(f.dataset("sample/ids")) == 91
    assert len(rows) == 2419
    # the CSC (sample-major) half must total identically to the CSR half
    assert sum(f.dataset("sample/matrix/data")) == sum(r[2] for r in rows)
    df = read_qza_feature_table(spark, ref)
    assert df.columns == ["feature_id", "sample_id", "count"]
    assert df.count() == 2419


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


def test_biom_hdf5_roundtrip(spark, tmp_path):
    """biom 2.1 HDF5 payloads parse without the biom CLI: fixture built
    with the minimal writer, read back through the qza path, and equal to
    the same table ingested as TSV."""
    from mmeds_meta_spark.sources.biom import (
        biom_to_long_rows,
        read_biom_hdf5,
        write_biom_fixture,
    )
    from mmeds_meta_spark.sources.qza import read_qza_feature_table, write_qza

    rows = [
        ("OTU_1", "S1", 4.0),
        ("OTU_1", "S3", 2.0),
        ("OTU_2", "S2", 7.5),
        ("OTU_3", "S1", 1.0),
        ("OTU_3", "S2", 3.0),
        ("OTU_3", "S3", 9.0),
    ]
    blob = write_biom_fixture(rows)
    # driver-side decode is exact
    assert sorted(biom_to_long_rows(blob)) == sorted(rows)
    # DataFrame path
    got = sorted(map(tuple, read_biom_hdf5(spark, blob).collect()))
    assert got == sorted(rows)
    # end-to-end through a qza artifact carrying feature-table.biom
    qza = tmp_path / "table.qza"
    write_qza(str(qza), "feature-table.biom", blob)
    via_qza = sorted(map(tuple, read_qza_feature_table(spark, str(qza)).collect()))
    assert via_qza == sorted(rows)


def test_hdf5_min_scalar_types(tmp_path):
    """The minimal HDF5 writer/reader round-trips ints, floats and
    strings, including nested groups and empty datasets."""
    from mmeds_meta_spark.sources.hdf5_min import H5File, H5Writer

    w = H5Writer()
    w.add("a/ints", [0, -5, 2**40, 7])
    w.add("a/b/floats", [1.5, -2.25, 0.0])
    w.add("names", ["alpha", "b", "gamma_x"])
    w.add("empty", [])
    f = H5File(w.tobytes())
    assert f.dataset("a/ints") == [0, -5, 2**40, 7]
    assert f.dataset("a/b/floats") == [1.5, -2.25, 0.0]
    assert f.dataset("names") == ["alpha", "b", "gamma_x"]
    assert f.dataset("empty") == []
    assert f.keys() == ["a", "empty", "names"]
    assert f.keys("a") == ["b", "ints"]
