"""Validation-rule conformance, modeled on the reference's golden-file
corpus (tests/unit/test_validate.py:50-106): each case mutates one cell
and asserts the expected diagnostic code fires at that (row, column)."""

from __future__ import annotations

import pytest

from fixtures import write_specimen, write_subject

from mmeds_meta_spark.validation import validate_file


def _codes(spark, path):
    diags = validate_file(spark, str(path)).collect()
    return [(d.row_idx, d.column, d.level, d.code) for d in diags]


def _has(codes, code, row=None, col_contains=None, level=None):
    for r, c, lv, cd in codes:
        if cd != code:
            continue
        if row is not None and r != row:
            continue
        if col_contains and col_contains not in c:
            continue
        if level and lv != level:
            continue
        return True
    return False


def test_clean_file_has_no_errors(spark, tmp_path):
    p = write_subject(tmp_path)
    codes = _codes(spark, p)
    assert not [c for c in codes if c[2] == "error"], codes


@pytest.mark.parametrize(
    ("mutate", "code", "column_part"),
    [
        ({"row": 2, "set": {"HeightDateCollected": "2077-01-01"}}, "future_date", "HeightDateCollected"),
        ({"row": 1, "set": {"Height": "tall"}}, "invalid_type", "Height"),
        ({"row": 3, "set": {"Nationality": " Lunar"}}, "whitespace", "Nationality"),
        ({"row": 0, "set": {"Nationality": ""}}, "empty_cell", "Nationality"),
        ({"row": 4, "set": {"Nationality": "n/a"}}, "non_standard_na", "Nationality"),
        ({"row": 2, "set": {"HostSubjectId": "HS-001"}}, "duplicate_value", "HostSubjectId"),
        ({"row": 1, "set": {"ICDCode": "ZZZZZ"}}, "invalid_icd_code", "ICDCode"),
        # well-formed but nonexistent prefix: only the dictionary join can
        # reject this (a format regex accepts it)
        ({"row": 2, "set": {"ICDCode": "A97.XXXX"}}, "invalid_icd_code", "ICDCode"),
        ({"row": 0, "set": {"HostSubjectId": "NA"}}, "missing_required_value", "HostSubjectId"),
        (
            {"row": 3, "set": {"IllnessEndDate": "2019-04-01", "IllnessStartDate": "2019-05-01"}},
            "start_end_date",
            "IllnessEndDate",
        ),
        ({"row": 2, "set": {"Ethnicity": "x" * 60}}, "cell_length", "Ethnicity"),
    ],
)
def test_subject_mutations(spark, tmp_path, mutate, code, column_part):
    p = write_subject(tmp_path, mutate=mutate)
    codes = _codes(spark, p)
    assert _has(codes, code, row=mutate["row"], col_contains=column_part), (
        code,
        [c for c in codes if c[0] == mutate["row"]],
    )


@pytest.mark.parametrize(
    ("mutate", "code", "column_part"),
    [
        ({"row": 1, "set": {"BarcodeSequence": "GATTAXAG"}}, "invalid_barcode_chars", "BarcodeSequence"),
        ({"row": 2, "set": {"BarcodeSequence": "GATTACAG"}}, "duplicate_value", "BarcodeSequence"),
        ({"row": 0, "set": {"BarcodeSequence": "GATTACAGGG"}}, "different_lengths", "BarcodeSequence"),
        ({"row": 4, "set": {"ResultsProtocolID": "RESP-000"}}, "duplicate_value", "ResultsProtocolID"),
    ],
)
def test_specimen_mutations(spark, tmp_path, mutate, code, column_part):
    p = write_specimen(tmp_path, mutate=mutate)
    codes = _codes(spark, p)
    assert _has(codes, code, col_contains=column_part), (
        code,
        [c for c in codes if column_part in c[1]],
    )


def test_duplicate_barcode_ok_across_runs(spark, tmp_path):
    from fixtures import specimen_rows

    rows = specimen_rows()
    # same barcode in different sequencing runs is legal (validate.py:222-252)
    rows[5]["BarcodeSequence"] = rows[0]["BarcodeSequence"]  # row0 RUN-1, row5 RUN-2
    p = write_specimen(tmp_path, rows=rows)
    codes = _codes(spark, p)
    assert not _has(codes, "duplicate_value", col_contains="BarcodeSequence"), codes


def test_missing_required_column_detected(spark, tmp_path):
    from fixtures import SUBJECT_COLS, _write, subject_rows
    from mmeds_meta_spark.sources.metadata_tsv import read_header

    cols = [c for c in SUBJECT_COLS if c[1] != "HostSubjectId"]
    p = _write(tmp_path / "nosubj.tsv", cols, subject_rows())
    template_path = write_subject(tmp_path)
    template = read_header(str(template_path))
    diags = validate_file(spark, str(p), template=template).collect()
    assert any(
        d.code == "missing_required_column" and "HostSubjectId" in d.column for d in diags
    )


def test_phi_header_blocked(spark, tmp_path):
    from fixtures import SUBJECT_COLS, _write, subject_rows

    cols = SUBJECT_COLS + [("AdditionalMetaData", "SocialSecurityNumber", False, "Text", "")]
    rows = subject_rows()
    for r in rows:
        r["SocialSecurityNumber"] = "000-00-0000"
    p = _write(tmp_path / "phi.tsv", cols, rows)
    codes = _codes(spark, p)
    assert _has(codes, "phi_header", row=-1)
