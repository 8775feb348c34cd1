"""The reference's verbatim golden validation corpus.

Drives /root/reference/test_files/validation_files/ exactly as the
reference's own suites do:

* filename-driven files (``{type}_validate_{error|warning}_<msg>.tsv``):
  the expected phrase must appear in the FIRST error/warning and every
  message must be ``row\tcol\tMessage`` with numeric row/col
  (mmeds/tests/unit/test_validate.py:50-106);
* the generated mutation families (``*_column_tests/{subject,specimen}``,
  450 TSVs): validation must complete without raising
  (mmeds/tests/metadata/test_error_metadata.py:48-94) — run here as ONE
  batched Spark validation per family.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from mmeds_meta_spark.validation.golden import (
    validate_mapping_file,
    validate_mapping_files,
)

CORPUS = Path("/root/reference/test_files/validation_files")
TEST_FILES = Path("/root/reference/test_files")

pytestmark = pytest.mark.skipif(
    not CORPUS.exists(), reason="reference corpus not available"
)


def _expected_phrase(name: str) -> str:
    # test_validate.py:59 — ' '.join(name.split('.')[0].split('_')[3:])
    return " ".join(name.split(".")[0].split("_")[3:])


def _check_format(msg: str) -> None:
    parts = msg.split("\t")
    assert len(parts) == 3, msg
    assert parts[0].strip("-").isnumeric(), msg
    assert parts[1].strip("-").isnumeric(), msg


def _header_hash(path: str) -> str:
    with open(path, "rb") as f:
        return repr([f.readline() for _ in range(5)])


def _grouped_validate(spark, files, study, metadata_type, subject_ids):
    """Batch same-header files into one validate_mapping_files call each."""
    groups: dict[str, list[str]] = {}
    for p in files:
        groups.setdefault(_header_hash(p), []).append(p)
    out: dict[str, tuple] = {}
    for batch in groups.values():
        out.update(
            validate_mapping_files(spark, batch, study, metadata_type, subject_ids, "human")
        )
    return out


def _error_files(metadata_type: str) -> list[str]:
    return sorted(str(p) for p in CORPUS.glob(f"{metadata_type}_validate_error*"))


def _warning_files(metadata_type: str) -> list[str]:
    return sorted(str(p) for p in CORPUS.glob(f"{metadata_type}_validate_warning*"))


@pytest.fixture(scope="module")
def subject_results(spark):
    return _grouped_validate(
        spark, _error_files("subject") + _warning_files("subject"),
        "Validate_Study", "subject", None,
    )


@pytest.fixture(scope="module")
def subject_ids(spark, subject_results):
    # test_validate.py:69 — subjects come from the first subject file
    first = sorted(CORPUS.glob("subject_validate_error*"))[0]
    return subject_results[str(first)][2]


@pytest.fixture(scope="module")
def specimen_results(spark, subject_ids):
    return _grouped_validate(
        spark, _error_files("specimen") + _warning_files("specimen"),
        "Validate_Study", "specimen", subject_ids,
    )


@pytest.mark.parametrize("name", [Path(p).name for p in _error_files("subject")])
def test_subject_error_files(subject_results, name):
    errors, _, _ = subject_results[str(CORPUS / name)]
    expected = _expected_phrase(name)
    assert errors, f"no errors for {name} (expected '{expected}')"
    assert expected in errors[0].lower(), f"{name}: first error {errors[0]!r}"
    _check_format(errors[0])


@pytest.mark.parametrize("name", [Path(p).name for p in _error_files("specimen")])
def test_specimen_error_files(specimen_results, name):
    errors, _, _ = specimen_results[str(CORPUS / name)]
    expected = _expected_phrase(name)
    assert errors, f"no errors for {name} (expected '{expected}')"
    assert expected in errors[0].lower(), f"{name}: first error {errors[0]!r}"
    _check_format(errors[0])


@pytest.mark.parametrize(
    "name",
    [Path(p).name for p in _warning_files("subject") + _warning_files("specimen")],
)
def test_warning_files(subject_results, specimen_results, name):
    results = subject_results if name.startswith("subject") else specimen_results
    _, warnings, _ = results[str(CORPUS / name)]
    expected = _expected_phrase(name)
    assert warnings, f"no warnings for {name}"
    assert expected in warnings[0].lower(), f"{name}: first warning {warnings[0]!r}"
    _check_format(warnings[0])


@pytest.fixture(scope="module")
def short_subject_ids(spark):
    # test_error_metadata.py:56 — good subjects from TEST_SUBJECT_SHORT
    _, _, subjects = validate_mapping_file(
        spark, str(TEST_FILES / "test_subject_short.tsv"),
        "Short_Study", "subject", None, "human",
    )
    return subjects


@pytest.mark.parametrize(
    "family",
    ["blank_column_tests", "date_column_tests", "na_column_tests",
     "number_column_tests", "other_column_tests"],
)
@pytest.mark.parametrize("typ", ["subject", "specimen"])
def test_generated_mutation_families(spark, short_subject_ids, family, typ):
    """One batched Spark validation per (family, type): every file must
    validate without raising and report format-legal diagnostics."""
    files = sorted(str(p) for p in (CORPUS / family / typ).glob("*.tsv"))
    assert files
    results = validate_mapping_files(
        spark, files,
        "Good_Study22" if typ == "subject" else "Short_Study",
        typ,
        None if typ == "subject" else short_subject_ids,
        "human",
    )
    assert set(results) == set(files)
    for path, (errors, warnings, _) in results.items():
        for msg in errors + warnings:
            _check_format(msg)
