"""S13 demux validation (operators/demux.py): the engine twin of the
reference's strip_error_barcodes / validate_demultiplex QC
(util.py:1126-1400).  Covers the real FASTQ path end-to-end (pheniqs
headers through the DataSource), the strip semantics read by read, the
zero-read-sample report, and the synthetic gate workload's invariants.
"""

from __future__ import annotations

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.demux import (
    demux_reads_from_fastq,
    demux_strip,
    demux_validate,
    s13_demux_validate,
    synth_mapping,
    synth_reads,
)

MAPPING = [
    # sample_id, fwd_bc, rev_bc (the mapping file's truth)
    ("sampleA", "CTCGACTT", "ATCGTACG"),
    ("sampleB", "GGAATTCC", "TTGGCCAA"),
    ("ghost", "AAAAAAAA", "CCCCCCCC"),  # no reads land for this sample
]

# per-read: (sample file, assigned fwd, assigned rev, total edit errors)
READS = [
    ("sampleA", "CTCGACTT", "ATCGTACG", 0),  # exact
    ("sampleA", "CTCGACTA", "ATCGTACG", 1),  # 1 fwd error -> kept
    ("sampleA", "CTCGACTA", "ATCGTACC", 2),  # 1 fwd + 1 rev -> stripped
    ("sampleB", "GGAATTCC", "TTGGCCAA", 0),
    ("sampleB", "GGAATTCC", "TTGGCCTT", 2),  # 2 rev errors -> stripped
]


def _write_fastq_run(tmp_path):
    d = tmp_path / "demuxed"
    d.mkdir()
    per_file: dict[str, list[str]] = {}
    for i, (sample, fwd, rev, _) in enumerate(READS):
        per_file.setdefault(f"{sample}_1.fastq", []).append(
            f"@M00914:50:0-J:1:1101:{i}:1663 1:N:0:{fwd}-{rev}\n"
            "TACCGTACCCGTTACG\n+\nABBBBBBBBBBBBBBB\n"
        )
    for name, recs in per_file.items():
        (d / name).write_text("".join(recs))
    return str(d)


def test_fastq_path_end_to_end(spark, tmp_path):
    from mmeds_meta_spark.sources.fastq_datasource import register_fastq_source

    register_fastq_source(spark)
    run = _write_fastq_run(tmp_path)
    reads = demux_reads_from_fastq(spark.read.format("fastq").load(run))
    mapping = spark.createDataFrame(
        MAPPING, "sample_id string, fwd_bc string, rev_bc string"
    )
    got = {r["sample_id"]: r for r in demux_validate(reads, mapping).collect()}
    assert set(got) == {"sampleA", "sampleB", "ghost"}
    a, b, g = got["sampleA"], got["sampleB"], got["ghost"]
    assert (a["n_reads"], a["n_exact"], a["n_kept"], a["n_stripped"]) == (3, 1, 2, 1)
    assert (b["n_reads"], b["n_exact"], b["n_kept"], b["n_stripped"]) == (2, 1, 1, 1)
    assert (g["n_reads"], g["n_exact"], g["n_kept"], g["n_stripped"]) == (0, 0, 0, 0)
    assert a["share_ppm"] == 3 * 1_000_000 // 5
    assert g["share_ppm"] == 0


def test_strip_keeps_exactly_the_within_allowance_reads(spark):
    reads = spark.createDataFrame(
        [(s, f, r) for s, f, r, _ in READS], "sample_id string, fwd string, rev string"
    )
    mapping = spark.createDataFrame(
        MAPPING, "sample_id string, fwd_bc string, rev_bc string"
    )
    kept = demux_strip(reads, mapping, num_allowed_errors=1).collect()
    want_kept = sum(1 for *_, e in READS if e <= 1)
    assert len(kept) == want_kept
    # allowance 0 keeps only exact reads; allowance 2 keeps everything
    assert (
        demux_strip(reads, mapping, num_allowed_errors=0).count()
        == sum(1 for *_, e in READS if e == 0)
    )
    assert demux_strip(reads, mapping, num_allowed_errors=2).count() == len(READS)


def test_synth_gate_workload_invariants(spark):
    out = {r["sample_id"]: r for r in s13_demux_validate(spark, SF_SMOKE).collect()}
    n_samples = synth_mapping(spark, SF_SMOKE).count()
    n_reads_total = synth_reads(spark, SF_SMOKE).count()
    assert len(out) == n_samples
    assert sum(r["n_reads"] for r in out.values()) == n_reads_total
    for r in out.values():
        assert r["n_exact"] <= r["n_kept"] <= r["n_reads"]
        assert r["n_kept"] + r["n_stripped"] == r["n_reads"]
    # the error injection really exercises all three classes
    assert sum(r["n_stripped"] for r in out.values()) > 0
    assert sum(r["n_exact"] for r in out.values()) > 0
    assert any(r["n_kept"] > r["n_exact"] for r in out.values())


def test_write_demultiplexed_fastq_roundtrip(spark, tmp_path):
    # strip -> per-sample partitioned sink -> read back: every kept read
    # lands under its sample's partition as a well-formed 4-line record
    from mmeds_meta_spark.sources.fastq import write_demultiplexed_fastq
    from mmeds_meta_spark.sources.fastq_datasource import register_fastq_source

    register_fastq_source(spark)
    run = _write_fastq_run(tmp_path)
    fastq = spark.read.format("fastq").load(run)
    # attach sample/fwd/rev to the raw rows: the same narrow expressions
    # demux_reads_from_fastq uses, kept beside header/seq/qual for the sink
    enriched = fastq.selectExpr(
        "file", "record_id", "header", "seq", "qual",
        r"regexp_extract(file, '([^/]+)_[12]\\.(fastq|fq)$', 1) AS sample_id",
        r"regexp_extract(header, ':0:([ACGTN]+)-([ACGTN]+)$', 1) AS fwd",
        r"regexp_extract(header, ':0:([ACGTN]+)-([ACGTN]+)$', 2) AS rev",
    )
    mapping = spark.createDataFrame(
        MAPPING, "sample_id string, fwd_bc string, rev_bc string"
    )
    kept = demux_strip(enriched, mapping, num_allowed_errors=1)
    out = str(tmp_path / "stripped")
    write_demultiplexed_fastq(kept, out)

    back = spark.read.text(out + "/sample_id=sampleA")
    recs = [r["value"] for r in back.collect()]
    text = "\n".join(recs)
    # sampleA kept 2 of 3 reads (one stripped at 2 errors)
    assert text.count("@M00914") == 2
    lines = text.split("\n")
    assert len(lines) % 4 == 0
    assert all(lines[i].startswith("@") for i in range(0, len(lines), 4))
    assert all(lines[i] == "+" for i in range(2, len(lines), 4))
