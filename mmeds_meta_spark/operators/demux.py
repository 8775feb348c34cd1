"""S13 — demultiplex validation: per-read barcode-vs-mapping-file QC.

Engine twin of the reference's post-demux QC half (the demux EXECUTOR —
pheniqs/DADA2 — is out of engine scope per SURVEY D7):

* ``strip_error_barcodes`` / ``get_stripped_file_content``
  (reference ``mmeds/util.py:1126-1242``): every demultiplexed read
  carries the barcode pair pheniqs assigned in its header
  (``@...:0:FWD-REV``); reads whose Levenshtein distance to the
  mapping file's (BarcodeSequence, BarcodeSequenceR) for their sample
  exceeds ``num_allowed_errors`` are stripped.
* ``validate_demultiplex`` / ``create_barcode_mapfile`` /
  ``parse_barcodes`` (``util.py:1245-1400``): checks that the mapping
  file's barcodes actually appear in the demultiplexed output and what
  proportion of all reads they represent.
* Driven by ``mmeds/snakemake/rules/demux_denoise.smk:33-47``
  (``strip_error_barcodes.py --num-allowed-errors 1``).

The reference streams one gzipped file at a time through a regex +
python-Levenshtein loop; here the reads relation (from the FASTQ
DataSource — ``sources/fastq_datasource.py`` — or any (sample_id, fwd,
rev) frame) joins the BROADCAST mapping relation (samples are a
bounded dimension), the distance is the JVM ``levenshtein`` expression,
and the per-sample report is ONE partial-aggregated shuffle on
sample_id.  At 100 TB of reads: an embarrassingly parallel scan, one
broadcast, one bounded shuffle — no Python in the hot path.

The registry entry synthesizes a deterministic demux workload from the
parquet tables (samples from ``supplier``, reads from ``documents``,
barcodes + injected errors keyed off doc_id) so the DuckDB gate
verifies the full distance/strip/share semantics cross-engine on every
document.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..testdata import table as _t
from . import QuerySpec

_ALLOWED_ERRORS = 1  # demux_denoise.smk:44 --num-allowed-errors 1


# ---------------------------------------------------------------------------
# generic relations API
# ---------------------------------------------------------------------------


def demux_validate(
    reads: DataFrame, mapping: DataFrame, *, num_allowed_errors: int = _ALLOWED_ERRORS
) -> DataFrame:
    """Per-sample demux QC report.

    ``reads``: (sample_id, fwd, rev) — the barcode pair the demuxer
    assigned to each read (header-parsed on the real FASTQ path).
    ``mapping``: (sample_id, fwd_bc, rev_bc) — the mapping file's truth.

    Output per mapping-file sample (zero-read samples kept — a sample
    whose barcodes never appear is exactly what validate_demultiplex
    exists to catch): n_reads, n_exact, n_kept (distance ≤ allowed),
    n_stripped, share_ppm (reads per million of the whole run —
    integer, so the report is order-free exact).

    Join shape: the reads-side join is INNER so the broadcast hint is
    honored (Spark cannot build a BroadcastHashJoin on the preserved
    side of a RightOuter join — a ``reads ⟖ broadcast(mapping)`` form
    silently degrades to a full shuffle of the reads corpus on
    sample_id).  Zero-read samples come back via a second,
    bounded-⋈-bounded left join of the |samples|-row aggregate onto
    mapping, with counts coalesced to 0 — identical output, and the
    corpus-side scan stays shuffle-free up to the partial agg.
    """
    j = reads.join(F.broadcast(mapping), "sample_id")
    d = j.withColumn(
        "dist", F.expr("levenshtein(fwd, fwd_bc) + levenshtein(rev, rev_bc)")
    )
    per_seen = d.groupBy("sample_id").agg(
        F.count("fwd").cast("long").alias("n_reads"),
        F.expr("CAST(SUM(CASE WHEN dist = 0 THEN 1 ELSE 0 END) AS BIGINT)").alias(
            "n_exact"
        ),
        F.expr(
            f"CAST(SUM(CASE WHEN dist <= {num_allowed_errors} THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("n_kept"),
        F.expr(
            f"CAST(SUM(CASE WHEN dist > {num_allowed_errors} THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("n_stripped"),
    )
    per = mapping.select("sample_id").join(
        F.broadcast(per_seen), "sample_id", "left"
    ).select(
        "sample_id",
        *[
            F.coalesce(F.col(c), F.lit(0).cast("long")).alias(c)
            for c in ("n_reads", "n_exact", "n_kept", "n_stripped")
        ],
    )
    # run total via an unpartitioned window over the BOUNDED per-sample
    # relation (|samples| rows) — an agg + crossJoin-back would re-execute
    # the per-sample aggregation's whole upstream a second time
    return per.select(
        "sample_id",
        "n_reads",
        "n_exact",
        "n_kept",
        "n_stripped",
        F.expr(
            "n_reads * 1000000 div GREATEST(CAST(SUM(n_reads) OVER ()"
            " AS BIGINT), 1)"
        ).alias("share_ppm"),
    )


def demux_strip(
    reads: DataFrame, mapping: DataFrame, *, num_allowed_errors: int = _ALLOWED_ERRORS
) -> DataFrame:
    """The stripping half (util.py:1199-1242): the kept reads relation —
    every column of ``reads`` whose barcode pair is within
    ``num_allowed_errors`` of its sample's mapping-file pair.  A pure
    filter after the broadcast mapping join; writing the result back
    per sample is the sink's job (the reference writes per-sample
    gzipped FASTQ)."""
    return (
        reads.join(F.broadcast(mapping), "sample_id")
        .filter(
            F.expr("levenshtein(fwd, fwd_bc) + levenshtein(rev, rev_bc)")
            <= num_allowed_errors
        )
        .drop("fwd_bc", "rev_bc")
    )


def demux_reads_from_fastq(fastq: DataFrame, *, with_uid: bool = False) -> DataFrame:
    """(sample_id, fwd, rev) from the FASTQ DataSource's rows: the
    pheniqs header pattern ``@...:0:FWD-REV`` (util.py:1219 regex) and
    the reference's ``{sample}_{1|2}.fastq`` filename template
    (util.py:1133 filename_template).  ``with_uid`` adds the read's
    stable identity ``read_uid = file ':' record_id`` (the streaming
    twin's set-union membership key, streaming/demux.py)."""
    cols = [
        F.regexp_extract("file", r"([^/]+)_[12]\.(fastq|fq)$", 1).alias("sample_id"),
        F.regexp_extract("header", r":0:([ACGTN]+)-([ACGTN]+)$", 1).alias("fwd"),
        F.regexp_extract("header", r":0:([ACGTN]+)-([ACGTN]+)$", 2).alias("rev"),
    ]
    if with_uid:
        cols.append(
            F.expr("concat(file, ':', CAST(record_id AS STRING))").alias("read_uid")
        )
    return fastq.select(*cols)


# ---------------------------------------------------------------------------
# deterministic synthetic demux workload (both engines)
# ---------------------------------------------------------------------------

# Barcodes are 8-mers derived from md5 hex (portable across engines) via
# translate; errors are base substitutions (A<->C, G<->T flips) injected
# at doc_id-keyed positions: ~1/7 of reads get one forward-barcode error
# (kept at the default allowance), ~1/13 additionally a second forward
# error and ~1/11 a reverse error — reads crossing the total-distance
# allowance are stripped.  All pure narrow string expressions.


def _bc_expr(tag: str, key: str) -> str:
    return (
        f"translate(substr(md5(concat('{tag}', CAST({key} AS STRING))), 1, 8),"
        f" '0123456789abcdef', 'ACGTACGTACGTACGT')"
    )


def _sub_expr(b: str, p: str) -> str:
    """Substitute position ``p`` (1-based) of ``b`` with a different base
    (A<->C, G<->T via translate)."""
    return (
        f"concat(substr({b}, 1, {p} - 1),"
        f" translate(substr({b}, {p}, 1), 'ACGT', 'CATG'),"
        f" substr({b}, {p} + 1))"
    )


def _synth_reads_exprs(d: str) -> tuple[str, str, str]:
    """(sample_key, fwd_observed, rev_observed) SQL exprs (valid on both
    engines) for read ``d`` of the synthetic workload; sample_key joins
    the supplier-derived mapping via ``s_suppkey = d % n_samples`` (the
    driver's supplier keys are 0..N-1 contiguous at every SF)."""
    fwd_true = _bc_expr("F", f"{d} % __NS__")
    rev_true = _bc_expr("R", f"{d} % __NS__")
    fwd1 = (
        f"CASE WHEN {d} % 7 = 0 THEN {_sub_expr(fwd_true, f'({d} % 8) + 1')}"
        f" ELSE {fwd_true} END"
    )
    fwd2 = (
        f"CASE WHEN {d} % 13 = 0 THEN {_sub_expr(fwd1, f'(({d} * 3) % 8) + 1')}"
        f" ELSE {fwd1} END"
    )
    rev1 = (
        f"CASE WHEN {d} % 11 = 0 THEN {_sub_expr(rev_true, f'({d} % 8) + 1')}"
        f" ELSE {rev_true} END"
    )
    return f"{d} % __NS__", fwd2, rev1


def synth_mapping(spark: SparkSession, sf: str) -> DataFrame:
    return _t(spark, sf, "supplier").select(
        F.expr("concat('S', CAST(s_suppkey AS STRING))").alias("sample_id"),
        F.expr(_bc_expr("F", "s_suppkey")).alias("fwd_bc"),
        F.expr(_bc_expr("R", "s_suppkey")).alias("rev_bc"),
    )


def synth_reads(spark: SparkSession, sf: str) -> DataFrame:
    ns = _t(spark, sf, "supplier").count()  # bounded dim; one count
    key, fwd, rev = (
        e.replace("__NS__", str(ns)) for e in _synth_reads_exprs("doc_id")
    )
    return _t(spark, sf, "documents").select(
        F.expr(f"concat('S', CAST({key} AS STRING))").alias("sample_id"),
        F.expr(fwd).alias("fwd"),
        F.expr(rev).alias("rev"),
    )


def s13_demux_validate(spark: SparkSession, sf: str) -> DataFrame:
    """The gated entry: validation report over the synthetic workload."""
    return demux_validate(synth_reads(spark, sf), synth_mapping(spark, sf))


def _s13_sql() -> str:
    key, fwd, rev = _synth_reads_exprs("doc_id")
    return f"""
WITH ns AS (
  SELECT COUNT(*) AS n FROM supplier
), mapping AS (
  SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS sample_id,
         {_bc_expr("F", "s_suppkey")} AS fwd_bc,
         {_bc_expr("R", "s_suppkey")} AS rev_bc
  FROM supplier
), reads AS (
  SELECT 'S' || CAST({key.replace("__NS__", "(SELECT n FROM ns)")} AS VARCHAR)
           AS sample_id,
         {fwd.replace("__NS__", "(SELECT n FROM ns)")} AS fwd,
         {rev.replace("__NS__", "(SELECT n FROM ns)")} AS rev
  FROM documents
), dists AS (
  SELECT m.sample_id,
         levenshtein(r.fwd, m.fwd_bc) + levenshtein(r.rev, m.rev_bc) AS dist
  FROM mapping m LEFT JOIN reads r USING (sample_id)
), per AS (
  SELECT sample_id,
         CAST(COUNT(dist) AS BIGINT) AS n_reads,
         CAST(SUM(CASE WHEN dist = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
         CAST(SUM(CASE WHEN dist <= {_ALLOWED_ERRORS} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
         CAST(SUM(CASE WHEN dist > {_ALLOWED_ERRORS} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_stripped
  FROM dists GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_reads) AS BIGINT) AS n_total FROM per
)
SELECT sample_id, n_reads, n_exact, n_kept, n_stripped,
       n_reads * 1000000 // GREATEST(n_total, 1) AS share_ppm
FROM per CROSS JOIN tot
"""


QUERIES: dict[str, QuerySpec] = {
    "s13_demux_validate": QuerySpec(
        s13_demux_validate,
        _s13_sql(),
        "S13 demux validation (reference util.py:1126-1242 "
        "strip_error_barcodes/get_stripped_file_content, util.py:1285-1400 "
        "create_barcode_mapfile/validate_demultiplex, demux_denoise.smk:33-47): "
        "per-sample matched/kept/stripped barcode QC as one broadcast join + "
        "one bounded shuffle",
    ),
}
