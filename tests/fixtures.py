"""Synthetic MMEDS-format metadata fixtures (own data, reference format).

Layout follows FIXTURES.md / SURVEY §1.1: 5 header rows then data; 'NA'
for nulls.  Values are invented here — nothing is copied from the
reference's test files.
"""

from __future__ import annotations

from pathlib import Path

SUBJECT_COLS = [
    # (table, column, required, type, unit)
    ("Ethnicity", "Ethnicity", False, "Text", "Limit 45 Characters"),
    ("Genotypes", "Genotype", False, "Text", "Limit 180 Characters"),
    ("Heights", "Height", False, "Number", "Meters"),
    ("Heights", "HeightDateCollected", False, "Date", "Year-Month-Day"),
    ("ICDCode", "ICDCode", False, "Text", "Limit 8 Characters"),
    ("Illness", "IllnessNotes", False, "Text", "Limit 256 Characters"),
    ("Illness", "IllnessEndDate", False, "Date", "Year-Month-Day"),
    ("Illness", "IllnessInstanceID", False, "Text", "Limit 256 Characters"),
    ("Illness", "IllnessStartDate", False, "Date", "Year-Month-Day"),
    ("Intervention", "InterventionNotes", False, "Text", "Limit 256 characters"),
    ("Intervention", "InterventionEndDate", False, "Date", "Year-Month-Day"),
    ("Intervention", "InterventionStartDate", False, "Date", "Year-Month-Day"),
    ("Interventions", "InterventionCode", False, "Text", "Limit 45 Characters"),
    ("Interventions", "InterventionName", False, "Text", "Limit 45 Characters"),
    ("Interventions", "InterventionType", False, "Text", "Limit 45 Characters"),
    ("Subjects", "BirthYear", False, "Number", "Year"),
    ("Subjects", "HostSubjectId", True, "Text", "Limit 256 Characters"),
    ("Subjects", "Nationality", False, "Text", "Limit 45 Characters"),
    ("Subjects", "Sex", False, "Text", "Limit 45 Characters"),
    ("SubjectType", "SubjectType", True, "Text", "Human or Animal"),
    ("Weights", "Weight", False, "Number", "Kilogram"),
    ("Weights", "WeightDateCollected", False, "Date", "Year-Month-Day"),
]

SPECIMEN_COLS = [
    ("Lab", "ContactEmail", True, "Email", "Limit 45 Characters"),
    ("Lab", "ContactName", True, "Text", "Limit 45 Characters"),
    ("Lab", "PrimaryInvestigator", True, "Text", "Limit 45 Characters"),
    ("RawData", "BarcodeSequence", True, "Text", "GATC only"),
    ("RawData", "LinkerPrimerSequence", True, "Text", "GATC only"),
    ("RawData", "RawDataID", True, "Text", "Limit 45 Characters"),
    ("RawData", "RawDataNotes", True, "Text", "Limit 256 Characters"),
    ("RawDataProtocol", "RawDataProtocolID", True, "Text", "Limit 45 Characters"),
    ("ResultsProtocol", "ResultsProtocolID", True, "Text: Must be unique", "Limit 45 Characters"),
    ("SampleProtocol", "SampleProtocolID", True, "Text: Must be unique", "Limit 45 Characters"),
    ("Specimen", "SpecimenID", True, "Text", "Limit 45 Characters"),
    ("Specimen", "SpecimenCollectionDate", False, "Date", "Year-Month-Day"),
    ("Specimen", "SpecimenCollectionTime", False, "Time", "HH:MM:SS"),
    ("Specimen", "SpecimenWeight", False, "Number", "Gram"),
    ("Specimen", "SpecimenWeightUnit", False, "Text", "Limit 45 Characters"),
    ("Study", "StudyName", True, "Text", "Limit 45 Characters"),
    ("Study", "StudyType", False, "Text", "Limit 45 Characters"),
    ("Experiment", "ExperimentName", False, "Text", "Limit 45 Characters"),
    ("Aliquot", "AliquotID", False, "Text", "Limit 45 Characters"),
    ("Aliquot", "AliquotWeight", False, "Number", "Gram"),
    ("Sample", "SampleID", False, "Text", "Limit 45 Characters"),
    ("Sample", "SampleWeight", False, "Number", "Gram"),
    ("BodySite", "SpecimenBodySite", False, "Text", "Limit 45 Characters"),
    ("Type", "SpecimenType", False, "Text", "Limit 45 Characters"),
    ("AdditionalMetaData", "SubjectIdCol", True, "Text", "Limit 256 Characters"),
    ("AdditionalMetaData", "DaysSinceStart", False, "Integer", "Days"),
]


def _write(path: Path, cols, rows) -> Path:
    lines = [
        "\t".join(c[0] for c in cols),
        "\t".join(c[1] for c in cols),
        "\t".join("Required" if c[2] else "Optional" for c in cols),
        "\t".join(c[3] for c in cols),
        "\t".join(c[4] for c in cols),
    ]
    for row in rows:
        lines.append("\t".join(str(row.get(c[1], "NA")) for c in cols))
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return path


def subject_rows(n: int = 6, *, mutate: dict | None = None) -> list[dict]:
    rows = []
    for i in range(n):
        rows.append(
            {
                "Ethnicity": ["Basque", "Sami", "Ainu"][i % 3],
                "Genotype": f"GT-{i % 2}",
                "Height": f"{1.5 + 0.05 * i:.2f}",
                "HeightDateCollected": "2019-03-04",
                "ICDCode": "B20.XXXX",
                "IllnessNotes": "stable",
                "IllnessEndDate": "2019-06-01",
                "IllnessInstanceID": str(i),
                "IllnessStartDate": "2019-05-01",
                "InterventionNotes": "none noted",
                "InterventionEndDate": "2019-07-02",
                "InterventionStartDate": "2019-07-01",
                "InterventionCode": "IVC-1",
                "InterventionName": "Hydration",
                "InterventionType": "Lifestyle",
                "BirthYear": str(1960 + i),
                "HostSubjectId": f"HS-{i:03d}",
                "Nationality": "Lunar",
                "Sex": "F" if i % 2 else "M",
                "SubjectType": "Human",
                "Weight": str(60 + i),
                "WeightDateCollected": "2019-03-04",
            }
        )
    if mutate:
        rows[mutate.get("row", 0)].update(mutate["set"])
    return rows


def specimen_rows(n: int = 6, *, mutate: dict | None = None) -> list[dict]:
    barcodes = ["GATTACAG", "CATTACAG", "TATTACAG", "AATTACAG", "GGTTACAG", "GCTTACAG"]
    rows = []
    for i in range(n):
        rows.append(
            {
                "ContactEmail": "pi@example.org",
                "ContactName": "Ada Example",
                "PrimaryInvestigator": "Grace Hopper",
                "BarcodeSequence": barcodes[i % len(barcodes)],
                "LinkerPrimerSequence": "GGGGATTT",
                "RawDataID": f"RD-{i:03d}",
                "RawDataNotes": "ok",
                "RawDataProtocolID": "RUN-1" if i < 3 else "RUN-2",
                "ResultsProtocolID": f"RESP-{i:03d}",
                "SampleProtocolID": f"SAMP-{i:03d}",
                "SpecimenID": f"SP-{i:03d}",
                "SpecimenCollectionDate": "2019-04-01",
                "SpecimenCollectionTime": "10:30:00",
                "SpecimenWeight": str(10 + i),
                "SpecimenWeightUnit": "g",
                "StudyName": "StudyAlpha",
                "StudyType": "Longitudinal",
                "ExperimentName": "Exp1",
                "AliquotID": f"SP-{i:03d}-Aliquot1",
                "AliquotWeight": "2.5",
                "SampleID": f"SP-{i:03d}-Sample1",
                "SampleWeight": "1.0",
                "SpecimenBodySite": "gut",
                "SpecimenType": "stool",
                "SubjectIdCol": f"HS-{i % 6:03d}",
                "DaysSinceStart": str(i * 7),
            }
        )
    if mutate:
        rows[mutate.get("row", 0)].update(mutate["set"])
    return rows


def write_subject(tmpdir: Path, *, rows=None, mutate=None) -> Path:
    return _write(tmpdir / "subject.tsv", SUBJECT_COLS, rows or subject_rows(mutate=mutate))


def write_specimen(tmpdir: Path, *, rows=None, mutate=None) -> Path:
    return _write(tmpdir / "specimen.tsv", SPECIMEN_COLS, rows or specimen_rows(mutate=mutate))
