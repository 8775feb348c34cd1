"""FASTQ Python DataSource: per-file partitions, framed records."""

from __future__ import annotations


def _write_fastq(path, reads, start=0):
    with open(path, "w") as f:
        for i, (bc, seq) in enumerate(reads, start):
            f.write(f"@read{i}\n{bc}{seq}\n+\n{'I' * (len(bc) + len(seq))}\n")


def test_fastq_source_reads_directory(spark, tmp_path):
    from mmeds_meta_spark.sources.fastq_datasource import register_fastq_source

    d = tmp_path / "run"
    d.mkdir()
    _write_fastq(d / "lane1.fastq", [("GATTACAG", "TTTT"), ("CATTACAG", "CCCC")])
    _write_fastq(d / "lane2.fastq", [("GATTACAT", "GGGG")], start=2)
    (d / "notes.txt").write_text("ignore me")

    register_fastq_source(spark)
    df = spark.read.format("fastq").load(str(d))
    rows = sorted(df.collect(), key=lambda r: (r.file, r.record_id))
    assert [r.header for r in rows] == ["read0", "read1", "read2"]
    assert [r.seq for r in rows] == ["GATTACAGTTTT", "CATTACAGCCCC", "GATTACATGGGG"]
    assert all(len(r.qual) == len(r.seq) for r in rows)
    # file-granular partitions: two fastq files -> two partitions
    assert df.rdd.getNumPartitions() == 2


def test_parse_barcodes_via_source_matches_line_scan(spark, tmp_path):
    from mmeds_meta_spark.sources.fastq import parse_barcodes
    from mmeds_meta_spark.sources.fastq_datasource import register_fastq_source

    import pyspark.sql.functions as F

    p = tmp_path / "reads.fastq"
    reads = [("GATTACAG", "AAAA")] * 3 + [("CATTACAG", "TTTT")] * 2
    _write_fastq(p, reads)

    register_fastq_source(spark)
    via_source = (
        spark.read.format("fastq")
        .load(str(p))
        .select(F.substring("seq", 1, 8).alias("barcode"))
        .groupBy("barcode")
        .agg(F.count("*").alias("n_reads"))
    )
    got = {r.barcode: r.n_reads for r in via_source.collect()}
    want = {r.barcode: r.n_reads for r in parse_barcodes(spark, str(p)).collect()}
    assert got == want == {"GATTACAG": 3, "CATTACAG": 2}


def test_truncated_after_plus_and_double_at_header(spark, tmp_path):
    """A file ending after '+' (qual missing) drops the trailing record;
    a header starting '@@' keeps its second '@' (strip exactly one)."""
    from mmeds_meta_spark.sources.fastq_datasource import register_fastq_source

    p = tmp_path / "trunc.fastq"
    p.write_text("@@weird/1\nACGT\n+\nIIII\n@read1\nGGCC\n+\n")  # no qual line
    register_fastq_source(spark)
    rows = spark.read.format("fastq").load(str(p)).collect()
    assert len(rows) == 1
    assert rows[0].header == "@weird/1"
    assert rows[0].seq == "ACGT" and rows[0].qual == "IIII"


def test_empty_qual_line_is_zero_length_record_not_eof(spark, tmp_path):
    """A bare '\\n' qual line (zero-length read after adapter trimming) is a
    valid empty record and must NOT terminate parsing of the file — only a
    true EOF ('' from readline) stops the frame loop."""
    from mmeds_meta_spark.sources.fastq_datasource import register_fastq_source

    p = tmp_path / "zero_len.fastq"
    p.write_text(
        "@read0\nACGT\n+\nIIII\n"
        "@read1\n\n+\n\n"          # zero-length read: empty seq + empty qual
        "@read2\nGGCC\n+\nJJJJ\n"
    )
    register_fastq_source(spark)
    rows = sorted(
        spark.read.format("fastq").load(str(p)).collect(), key=lambda r: r.record_id
    )
    assert [r.header for r in rows] == ["read0", "read1", "read2"]
    assert rows[1].seq == "" and rows[1].qual == ""
    assert rows[2].seq == "GGCC" and rows[2].qual == "JJJJ"
