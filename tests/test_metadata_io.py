"""5-row-header reader/writer + join/split round-trips (SURVEY §1.1, S1/S2,
J1/U2; reference invariants tests/unit/test_util.py:177-203)."""

from __future__ import annotations

import datetime

import pytest

from fixtures import write_specimen, write_subject

from mmeds_meta_spark.sources.metadata_tsv import (
    ROW_IDX,
    join_metadata,
    read_header,
    read_metadata,
    split_metadata,
    write_metadata,
)


@pytest.fixture()
def subject_path(tmp_path):
    return write_subject(tmp_path)


@pytest.fixture()
def specimen_path(tmp_path):
    return write_specimen(tmp_path)


def test_read_header(subject_path):
    meta = read_header(str(subject_path))
    assert len(meta) == 22
    host = next(m for m in meta if m.column == "HostSubjectId")
    assert host.table == "Subjects" and host.required and host.declared_type == "Text"
    assert meta[2].spark_type == "double"  # Heights.Height Number


def test_read_metadata_typed(spark, subject_path):
    df, meta = read_metadata(spark, str(subject_path))
    rows = df.orderBy(ROW_IDX).collect()
    assert len(rows) == 6
    r0 = rows[0]
    assert r0[ROW_IDX] == 0
    assert r0["Heights__Height"] == pytest.approx(1.5)
    assert r0["Heights__HeightDateCollected"] == datetime.date(2019, 3, 4)
    assert r0["Subjects__HostSubjectId"] == "HS-000"


def test_na_literal_is_null_only_na(spark, tmp_path):
    from fixtures import subject_rows, write_subject

    rows = subject_rows()
    rows[1]["Nationality"] = "NA"      # null
    rows[2]["Nationality"] = "n/a"     # NOT null (keep_default_na=False parity)
    p = write_subject(tmp_path, rows=rows)
    df, _ = read_metadata(spark, str(p), typed=False)
    vals = {r[ROW_IDX]: r["Subjects__Nationality"] for r in df.collect()}
    assert vals[1] is None
    assert vals[2] == "n/a"


def test_write_read_round_trip(spark, tmp_path, subject_path):
    df, meta = read_metadata(spark, str(subject_path), typed=False)
    out = tmp_path / "rewritten.tsv"
    write_metadata(df, meta, str(out))
    meta2 = read_header(str(out))
    # writer sorts columns by (table, column)
    assert [m.flat for m in meta2] == sorted(
        (m.flat for m in meta), key=lambda f: tuple(f.split("__"))
    )
    df2, _ = read_metadata(spark, str(out), typed=False)
    assert df2.count() == df.count()
    a = {tuple(sorted(r.asDict().items())) for r in df.collect()}
    b = {tuple(sorted(r.asDict().items())) for r in df2.collect()}
    assert a == b


def test_join_and_split_round_trip(spark, subject_path, specimen_path):
    subj, smeta = read_metadata(spark, str(subject_path), typed=False)
    spec, pmeta = read_metadata(spark, str(specimen_path), typed=False)
    joined = join_metadata(subj, spec)
    assert joined.count() == 6  # 1:1 subject↔specimen here
    # every specimen row found its subject
    assert joined.filter(joined["Subjects__HostSubjectId"].isNull()).count() == 0
    back = split_metadata(joined, smeta, {m.table for m in smeta})
    assert back.dropDuplicates(["Subjects__HostSubjectId"]).count() == 6
