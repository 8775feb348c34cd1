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


ANIMAL_COLS = [
    ("AnimalSubjects", "AnimalSubjectID", True, "Text", "Limit 45 Characters"),
    ("AnimalSubjects", "BirthDate", False, "Date", "Year-Month-Day"),
    ("AnimalSubjects", "AnimalWeight", False, "Decimal", "Gram"),
    ("AnimalSubjects", "Sex", False, "Text", "Limit 45 Characters"),
    ("SubjectType", "SubjectType", True, "Text", "Human or Animal"),
    ("Facility", "FacilityName", False, "Text", "Limit 45 Characters"),
    ("Facility", "FacilityLocation", False, "Text", "Limit 45 Characters"),
    ("Vendor", "VendorName", False, "Text", "Limit 45 Characters"),
    ("Vendor", "VendorLocation", False, "Text", "Limit 45 Characters"),
    ("Vendor", "VendorStrainInfo", False, "Text", "Limit 45 Characters"),
    ("Strain", "StrainName", False, "Text", "Limit 45 Characters"),
    ("Strain", "StrainProducer", False, "Text", "Limit 45 Characters"),
    ("Strain", "StrainID", False, "Text", "Limit 45 Characters"),
    ("Species", "SpeciesName", False, "Text", "Limit 45 Characters"),
    ("Husbandry", "BreedingProgram", False, "Text", "Limit 45 Characters"),
    ("Husbandry", "LightDarkCycle", False, "Text", "Limit 45 Characters"),
    ("Husbandry", "Temperature", False, "Decimal", "Celsius"),
    ("Husbandry", "EnvironmentalEnrichment", False, "Text", "Limit 45 Characters"),
    ("Housing", "TypeOfFacility", False, "Text", "Limit 45 Characters"),
    ("Housing", "TypeOfBedding", False, "Text", "Limit 45 Characters"),
    ("Housing", "TypeOfHousing", False, "Text", "Limit 45 Characters"),
    ("Housing", "NumberOfCageCompanions", False, "Integer", "Count"),
    ("Housing", "TankShape", False, "Text", "Limit 45 Characters"),
    ("Housing", "TankMaterial", False, "Text", "Limit 45 Characters"),
    ("Housing", "TankID", False, "Text", "Limit 45 Characters"),
    ("HousingDates", "HousingStartDate", False, "Date", "Year-Month-Day"),
    ("HousingDates", "HousingEndDate", False, "Date", "Year-Month-Day"),
    ("ChowDates", "ChowStartDate", False, "Date", "Year-Month-Day"),
    ("ChowDates", "ChowEndDate", False, "Date", "Year-Month-Day"),
    ("Chow", "Company", False, "Text", "Limit 45 Characters"),
    ("Chow", "ProductName", False, "Text", "Limit 45 Characters"),
    ("Chow", "ProductCode", False, "Text", "Limit 45 Characters"),
]


def animal_rows(n: int = 4) -> list[dict]:
    rows = []
    for i in range(n):
        rows.append(
            {
                "AnimalSubjectID": f"AS-{i:03d}",
                "BirthDate": "2021-06-01",
                "AnimalWeight": f"{20 + i}.5",
                "Sex": "F" if i % 2 else "M",
                "SubjectType": "Animal",
                "FacilityName": "Vivarium-1",
                "FacilityLocation": "Basement",
                "VendorName": "LabStock",
                "VendorLocation": "Remote",
                "VendorStrainInfo": "wild-type",
                "StrainName": "WT-A",
                "StrainProducer": "LabStock",
                "StrainID": "ST-1",
                "SpeciesName": "Mus musculus",
                "BreedingProgram": "inbred",
                "LightDarkCycle": "12:12",
                "Temperature": "22.5",
                "EnvironmentalEnrichment": "wheel",
                "TypeOfFacility": "SPF",
                "TypeOfBedding": "chip",
                "TypeOfHousing": "cage",
                "NumberOfCageCompanions": str(2 + i % 2),
                "TankShape": "NA",
                "TankMaterial": "NA",
                "TankID": "NA",
                "HousingStartDate": "2021-06-15",
                "HousingEndDate": "2021-12-15",
                "ChowStartDate": "2021-06-15",
                "ChowEndDate": "2021-12-15",
                "Company": "ChowCo",
                "ProductName": "StandardDiet",
                "ProductCode": "SD-01",
            }
        )
    return rows


def specimen_rows_for_animals(n: int = 4) -> list[dict]:
    rows = specimen_rows(n)
    for i, r in enumerate(rows):
        r["SubjectIdCol"] = f"AS-{i:03d}"
        r["StudyName"] = "StudyZoo"
        r["RawDataID"] = f"ZRD-{i:03d}"
        r["SpecimenID"] = f"ZSP-{i:03d}"
        r["ResultsProtocolID"] = f"ZRESP-{i:03d}"
        r["SampleProtocolID"] = f"ZSAMP-{i:03d}"
        r["AliquotID"] = f"ZSP-{i:03d}-Aliquot1"
        r["SampleID"] = f"ZSP-{i:03d}-Sample1"
    return rows


def write_animal_subject(tmpdir: Path, *, rows=None) -> Path:
    return _write(tmpdir / "animal_subject.tsv", ANIMAL_COLS, rows or animal_rows())


def write_animal_specimen(tmpdir: Path, *, rows=None) -> Path:
    return _write(
        tmpdir / "animal_specimen.tsv", SPECIMEN_COLS, rows or specimen_rows_for_animals()
    )


def write_subject(tmpdir: Path, *, rows=None, mutate=None) -> Path:
    return _write(tmpdir / "subject.tsv", SUBJECT_COLS, rows or subject_rows(mutate=mutate))


def write_specimen(tmpdir: Path, *, rows=None, mutate=None) -> Path:
    return _write(tmpdir / "specimen.tsv", SPECIMEN_COLS, rows or specimen_rows(mutate=mutate))
