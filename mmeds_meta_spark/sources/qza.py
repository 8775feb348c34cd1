"""QIIME2 ``.qza``/``.qzv`` artifact reader (SURVEY §2.1 S11).

A qza artifact is a plain zip archive laid out ``<uuid>/data/<payload>``
plus provenance; the reference shells out to ``unzip`` + ``biom convert``
(``extract_feature_table.sh``: unzip -j, biom → TSV, then ``sed '1d;2s/^#//'``
to drop the "# Constructed from biom file" banner and unquote the header)
and extracts tree artifacts the same way (rules/file_manipulation.smk:1-14,
rules/process_sequencing_data.smk:72-89).

This module does the unzip with stdlib ``zipfile`` — no shell, no temp
litter — and hands payloads to the matching engine reader:

* ``.nwk`` (rooted/unrooted tree) → ``sources.newick.read_newick``
* ``.tsv``/``.txt`` tabular payloads (feature tables exported as TSV,
  taxonomy tables, stats) → the wide-TSV feature-table reader
* ``feature-table.biom`` (HDF5) → the in-repo minimal pure-Python HDF5
  reader (``sources/biom.py`` / ``sources/hdf5_min.py``) — where the
  reference shells out to the ``biom`` CLI, this engine parses the
  container directly.

Extraction is driver-side (artifacts are metadata-scale, not corpus-
scale); the returned DataFrames are ordinary distributed frames.
"""

from __future__ import annotations

import io
import zipfile

from pyspark.sql import DataFrame, SparkSession


class QzaPayloadError(ValueError):
    pass


def list_data_files(qza_path: str) -> list[str]:
    """Member names under ``*/data/`` in artifact order."""
    with zipfile.ZipFile(qza_path) as z:
        return [
            n
            for n in z.namelist()
            if "/data/" in n and not n.endswith("/")
        ]


def read_data_bytes(qza_path: str, suffix: str) -> bytes:
    """The first ``*/data/*<suffix>`` payload, as bytes."""
    with zipfile.ZipFile(qza_path) as z:
        for n in z.namelist():
            if "/data/" in n and n.endswith(suffix):
                return z.read(n)
    raise QzaPayloadError(f"no */data/*{suffix} member in {qza_path}")


def read_qza_tree(spark: SparkSession, qza_path: str) -> DataFrame:
    """rooted_tree.qza / unrooted tree artifact → the branch-membership
    relation (sources/newick.py)."""
    from .newick import read_newick

    return read_newick(spark, read_data_bytes(qza_path, ".nwk").decode())


def read_qza_feature_table(spark: SparkSession, qza_path: str) -> DataFrame:
    """TSV-payload feature-table artifact → long (feature_id, sample_id,
    count).

    Applies the reference's post-extract normalization
    (``extract_feature_table.sh``): drop a leading ``# Constructed from
    biom file`` banner line and strip the ``#`` off the ``#OTU ID``
    header.  A ``feature-table.biom`` payload (HDF5) is parsed with the
    minimal in-repo HDF5 reader (where the reference shells out to
    ``biom convert``).
    """
    names = list_data_files(qza_path)
    tsv = [n for n in names if n.endswith((".tsv", ".txt"))]
    if not tsv:
        if any(n.endswith(".biom") for n in names):
            # HDF5 biom payload: parse directly with the in-repo minimal
            # HDF5 reader (sources/biom.py) — the reference needs the
            # `biom convert` CLI here; we do not
            from .biom import read_biom_hdf5

            return read_biom_hdf5(spark, read_data_bytes(qza_path, ".biom"))
        raise QzaPayloadError(f"no tabular payload in {qza_path}: {names}")
    text = read_data_bytes(qza_path, tsv[0].rsplit("/", 1)[-1]).decode()
    lines = text.splitlines()
    if lines and lines[0].startswith("# Constructed from biom file"):
        lines = lines[1:]
    if lines and lines[0].startswith("#"):
        lines[0] = lines[0][1:]
    from .feature_table import read_otu_wide_lines

    # hand the normalized text to the wide reader as an in-memory dataset
    # (no driver-local temp file — executors on a multi-node cluster could
    # not read one, and nothing is left behind on disk)
    return read_otu_wide_lines(spark, lines)


def write_qza(
    path: str, payload_name: str, payload: bytes | str, *, artifact_uuid: str = "0" * 32
) -> None:
    """Minimal qza writer (test fixtures + round-trips): zip with the
    ``<uuid>/data/<payload>`` layout QIIME2 uses."""
    data = payload.encode() if isinstance(payload, str) else payload
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(f"{artifact_uuid}/metadata.yaml", "uuid: " + artifact_uuid + "\n")
        z.writestr(f"{artifact_uuid}/data/{payload_name}", io.BytesIO(data).getvalue())
