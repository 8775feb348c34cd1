"""Golden test for the pheniqs config writer (sources/pheniqs.py vs
reference util.py:1051-1114 make_pheniqs_config).

The golden below is the PARSED form of the reference generator's output
for this mapping file, derived line-by-line from its string templates
(the reference's backslash-continuation whitespace sits outside JSON
string literals except in the template comment, where the injected
indent spaces are reproduced verbatim), so ``json.loads(ours) ==
json.loads(reference's)``.
"""

from __future__ import annotations

import json

from mmeds_meta_spark.sources.pheniqs import make_pheniqs_config

ODIR = "/proj/run1/demux"


def _golden():
    def sample(name, b1, b2):
        return {
            "LB": name,
            "barcode": [b1, b2],
            "output": [
                f"{ODIR}/{name}_S1_L001_R1_001.fastq.gz",
                f"{ODIR}/{name}_S1_L001_R2_001.fastq.gz",
            ],
        }

    return {
        # util.py:1062 '"input": [R1, I1, I2, R2]' via the %s order at
        # :1070 (reads_forward, barcodes_forward, barcodes_reverse,
        # reads_reverse); :1062 '"output": [ "output_all.fastq" ]'
        "input": ["r1.fastq.gz", "i1.fastq.gz", "i2.fastq.gz", "r2.fastq.gz"],
        "output": ["output_all.fastq"],
        # util.py:1063-1065: global transform comment (with the 4 indent
        # spaces the backslash continuation injects after 'the ') and
        # tokens 0::/3::
        "template": {
            "transform": {
                "comment": (
                    "This global transform directive specifies the     segments "
                    "that will be written to output as the biological sequences "
                    "of interest, this represents all of R1 and R2."
                ),
                "token": ["0::", "3::"],
            }
        },
        # util.py:1066-1068: sample decoder — barcode tokens 1::8/2::8,
        # pamld, 0.95 confidence, 0.05 noise; :1073-1074 per-sample
        # codec entries '@{name}' with LB/barcode/output; :1109-1111
        # undetermined fallback inside "sample"
        "sample": {
            "transform": {"token": ["1::8", "2::8"]},
            "algorithm": "pamld",
            "confidence threshold": 0.95,
            "noise": 0.05,
            "codec": {
                "@s1": sample("s1", "CTCGACTT", "ATCGTACG"),
                "@s2": sample("s2", "GGAATTCC", "TTGGCCAA"),
            },
            "undetermined": {
                "output": [
                    f"{ODIR}/undetermined_S1_L001_R1_001.fastq.gz",
                    f"{ODIR}/undetermined_S1_L001_R2_001.fastq.gz",
                ]
            },
        },
    }


def test_pheniqs_config_matches_reference_golden(spark):
    mapping = spark.createDataFrame(
        [("s1", "CTCGACTT", "ATCGTACG"), ("s2", "GGAATTCC", "TTGGCCAA")],
        "sample_id string, fwd_bc string, rev_bc string",
    )
    text = make_pheniqs_config(
        mapping,
        "r1.fastq.gz",
        "r2.fastq.gz",
        "i1.fastq.gz",
        "i2.fastq.gz",
        ODIR,
    )
    assert json.loads(text) == _golden()


def test_pheniqs_config_feeds_demux_mapping(spark):
    # round-trip: the same mapping relation drives BOTH the config
    # writer and the demux-validation pass — the config's codec barcodes
    # are exactly the mapping the validator checks against
    from mmeds_meta_spark.operators.demux import synth_mapping
    from tests.conftest import SF_SMOKE

    mapping = synth_mapping(spark, SF_SMOKE)
    cfg = json.loads(
        make_pheniqs_config(
            mapping, "r1.gz", "r2.gz", "i1.gz", "i2.gz", ODIR
        )
    )
    rows = {r["sample_id"]: (r["fwd_bc"], r["rev_bc"]) for r in mapping.collect()}
    codec = cfg["sample"]["codec"]
    assert len(codec) == len(rows)
    for name, (b1, b2) in rows.items():
        assert codec[f"@{name}"]["barcode"] == [b1, b2]
