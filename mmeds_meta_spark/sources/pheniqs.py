"""Pheniqs demultiplexer config generation (reference
``mmeds/util.py:1051-1114`` ``make_pheniqs_config``).

The reference string-templates an ``output.json`` for the pheniqs
``mux`` call (``rules/demux_denoise.smk:22-31``) from the qiime mapping
file: four input files (R1, I1, I2, R2), the global template transform
(tokens ``0::``/``3::`` — both biological segments), the sample decoder
(tokens ``1::8``/``2::8`` — the two 8-base barcode segments, PAMLD at
0.95 confidence / 0.05 noise), one codec entry per sample, and the
undetermined fallback.

Engine twin: the mapping relation is a bounded dimension, so the
barcodes collect to the driver and the config is built as a plain dict
→ ``json.dumps`` (the reference's hand-rolled string concatenation is
replicated semantically, not textually: its backslash-continuation
whitespace artifacts sit outside JSON string literals, so both
serializations PARSE to the same object — pinned by the golden test,
tests/test_pheniqs_config.py).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame


def make_pheniqs_config(
    mapping: DataFrame,
    reads_forward: str,
    reads_reverse: str,
    barcodes_forward: str,
    barcodes_reverse: str,
    o_directory: str,
    *,
    sample_col: str = "sample_id",
    fwd_col: str = "fwd_bc",
    rev_col: str = "rev_bc",
) -> str:
    """Build the pheniqs ``output.json`` text from a mapping relation.

    ``mapping`` is (sample_id, fwd_bc, rev_bc) — the same bounded
    relation the demux-validation pass consumes (operators/demux.py).
    Samples are emitted in ascending sample_id order (the reference
    preserves mapping-file row order; pass a pre-sorted single-partition
    relation to reproduce a specific order — the codec is a JSON object,
    so member order is semantically irrelevant to pheniqs).
    """
    rows = (
        mapping.select(sample_col, fwd_col, rev_col)
        .orderBy(sample_col)
        .collect()
    )
    codec: dict[str, dict] = {}
    for r in rows:
        name, b1, b2 = r[sample_col], r[fwd_col], r[rev_col]
        codec[f"@{name}"] = {
            "LB": name,
            "barcode": [b1, b2],
            "output": [
                f"{o_directory}/{name}_S1_L001_R1_001.fastq.gz",
                f"{o_directory}/{name}_S1_L001_R2_001.fastq.gz",
            ],
        }
    config = {
        "input": [reads_forward, barcodes_forward, barcodes_reverse, reads_reverse],
        "output": ["output_all.fastq"],
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
        "sample": {
            "transform": {"token": ["1::8", "2::8"]},
            "algorithm": "pamld",
            "confidence threshold": 0.95,
            "noise": 0.05,
            "codec": codec,
            "undetermined": {
                "output": [
                    f"{o_directory}/undetermined_S1_L001_R1_001.fastq.gz",
                    f"{o_directory}/undetermined_S1_L001_R2_001.fastq.gz",
                ]
            },
        },
    }
    return json.dumps(config, indent="\t")
