"""biom 2.1 (HDF5) feature-table ingestion — closes SURVEY §2.1 S11.

The biom 2.1 spec stores the sparse feature table twice (CSR by
observation and CSC by sample); the observation-major half is:

* ``/observation/ids``            — feature id per matrix row
* ``/sample/ids``                 — sample id per matrix column
* ``/observation/matrix/data``    — non-zero values
* ``/observation/matrix/indices`` — column index per value
* ``/observation/matrix/indptr``  — row start offsets (len = rows+1)

The reference shells out to ``biom convert --to-tsv``
(mmeds/summary.py:83-91, extract_feature_table.sh); here the HDF5
container is parsed directly with the in-repo minimal reader
(:mod:`.hdf5_min`) — no native library, no subprocess.  Parsing is
driver-side (artifacts are metadata-scale); the output is the same long
(feature_id, sample_id, count) frame every feature-table operator takes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .hdf5_min import H5File

LONG_SCHEMA = "feature_id string, sample_id string, count double"


def biom_to_long_rows(data: bytes) -> list[tuple[str, str, float]]:
    """Decode a biom 2.1 HDF5 byte string to long rows (driver-side)."""
    f = H5File(data)
    obs_ids = f.dataset("observation/ids")
    sample_ids = f.dataset("sample/ids")
    vals = f.dataset("observation/matrix/data")
    indices = f.dataset("observation/matrix/indices")
    indptr = f.dataset("observation/matrix/indptr")
    if len(indptr) != len(obs_ids) + 1:
        raise ValueError(
            f"biom indptr length {len(indptr)} != rows+1 ({len(obs_ids) + 1})"
        )
    rows: list[tuple[str, str, float]] = []
    for r, fid in enumerate(obs_ids):
        for k in range(indptr[r], indptr[r + 1]):
            rows.append((fid, sample_ids[indices[k]], float(vals[k])))
    return rows


def read_biom_hdf5(spark: SparkSession, data_or_path: bytes | str) -> DataFrame:
    """biom 2.1 HDF5 (bytes or file path) → long (feature_id, sample_id,
    count) DataFrame."""
    if isinstance(data_or_path, str):
        with open(data_or_path, "rb") as fh:
            data = fh.read()
    else:
        data = data_or_path
    return spark.createDataFrame(biom_to_long_rows(data), LONG_SCHEMA)


def write_biom_fixture(
    rows: list[tuple[str, str, float]],
) -> bytes:
    """Build a biom-2.1-shaped HDF5 byte string from long rows (test
    fixtures; uses the minimal writer — fixed-size ascii ids, contiguous
    int64/float64 arrays)."""
    from .hdf5_min import H5Writer

    obs = sorted({r[0] for r in rows})
    samp = sorted({r[1] for r in rows})
    obs_ix = {o: i for i, o in enumerate(obs)}
    samp_ix = {s: i for i, s in enumerate(samp)}
    by_row: dict[int, list[tuple[int, float]]] = {}
    for fid, sid, v in rows:
        by_row.setdefault(obs_ix[fid], []).append((samp_ix[sid], v))
    data: list[float] = []
    indices: list[int] = []
    indptr = [0]
    for r in range(len(obs)):
        for c, v in sorted(by_row.get(r, [])):
            indices.append(c)
            data.append(float(v))
        indptr.append(len(data))
    w = H5Writer()
    w.add("observation/ids", obs)
    w.add("sample/ids", samp)
    w.add("observation/matrix/data", data)
    w.add("observation/matrix/indices", indices)
    w.add("observation/matrix/indptr", indptr)
    return w.tobytes()
