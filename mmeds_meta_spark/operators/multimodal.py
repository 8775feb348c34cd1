"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_image_batch`` raises ``NotImplementedError`` unless a
deterministic fake decoder is requested.  Everything Spark-side — schema,
batching, partitioning, UDF signature — is real and tested
(tests/test_multimodal.py).

At 100 TB: binary payloads ride in their own parquet column (column
pruning keeps metadata-only queries from touching bytes); decode fans out
per input split with ``mapInPandas`` (Arrow batches, no per-row pickling);
frame-sampling/resize emit one row per artifact so downstream joins stay
relational.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from ..testdata import table as _t
from . import QuerySpec

# ---------------------------------------------------------------------------
# media schema + synthesis (documents.text → fake payload bytes)
# ---------------------------------------------------------------------------

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def media_table(spark: SparkSession, sf: str) -> DataFrame:
    """Synthesize an opaque-binary media table from documents (the testdata
    carries no real blobs).  payload = utf-8 bytes of the text."""
    d = _t(spark, sf, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )


# ---------------------------------------------------------------------------
# decode step — Arrow-batched mapInPandas; real plumbing, stubbed codec
# ---------------------------------------------------------------------------


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for a codec: derives dims/intensity from the
    bytes themselves, so tests can assert exact values."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + (n % 48)
    channels = 1 + (n % 3)
    mean_intensity = (sum(payload[:64]) % 2560) / 10.0
    return width, height, channels, mean_intensity


def _pil_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Real-codec branch of the decode seam: Pillow, imported lazily on
    the executor so environments without it still run the fake path.
    mean_intensity = band-averaged pixel mean, matching the fake codec's
    single-scalar contract."""
    import io

    from PIL import Image, ImageStat

    with Image.open(io.BytesIO(payload)) as im:
        width, height = im.size
        bands = im.getbands()
        mean = ImageStat.Stat(im).mean
    return width, height, len(bands), sum(mean) / len(mean)


def _pnm_parse(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse a binary PNM image (P5 grayscale / P6 RGB, maxval ≤ 255 —
    the netpbm formats, public spec) → (width, height, channels,
    raster).  Pure Python, no codec library: this is the REAL branch of
    the codec seam that runs in environments without Pillow/ffmpeg.
    Raises ValueError on anything that is not a well-formed ≤8-bit
    binary PNM (the caller's quarantine stance decides what to do)."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM (P5/P6) payload")
    channels = 3 if payload[:2] == b"P6" else 1
    pos, fields = 2, []
    while len(fields) < 3:
        # skip whitespace and '#' comment lines between header tokens
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    width, height, maxval = fields
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported PNM maxval {maxval}")
    pos += 1  # exactly ONE whitespace byte separates header from raster
    raster = payload[pos : pos + width * height * channels]
    if len(raster) < width * height * channels:
        raise ValueError("truncated PNM raster")
    return width, height, channels, raster


def _pnm_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Real pure-Python codec branch: exact integer-sum mean over the
    raster (deterministic — no float accumulation order)."""
    width, height, channels, raster = _pnm_parse(payload)
    return width, height, channels, sum(raster) / len(raster)


def _pnm_resize(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor PNM resize, numpy-vectorized, re-encoded to the
    same P5/P6 format.  Index arithmetic is exact integers
    (floor(i·src/dst)), so the output bytes are deterministic."""
    import numpy as np

    w0, h0, channels, raster = _pnm_parse(payload)
    a = np.frombuffer(raster, dtype=np.uint8).reshape(h0, w0, channels)
    ys = (np.arange(height) * h0) // height
    xs = (np.arange(width) * w0) // width
    out = a[ys][:, xs]
    magic = b"P6" if channels == 3 else b"P5"
    return magic + f"\n{width} {height}\n255\n".encode("ascii") + out.tobytes()


def encode_pnm(width: int, height: int, pixels: bytes) -> bytes:
    """Test/fixture helper: wrap raw raster bytes as P6 (len = w·h·3)
    or P5 (len = w·h)."""
    channels = len(pixels) // (width * height)
    magic = b"P6" if channels == 3 else b"P5"
    return magic + f"\n{width} {height}\n255\n".encode("ascii") + pixels


def decode_media(
    df: DataFrame, *, use_fake_codec: bool = False, codec: str | None = None
) -> DataFrame:
    """Decode binary payloads → typed metadata rows via ``mapInPandas``.

    ``codec``: ``"fake"`` (deterministic byte-derived stand-in),
    ``"pnm"`` (REAL pure-Python netpbm P5/P6 decoder — runs in this
    environment with no codec library; round 12), ``"pil"`` (real
    Pillow decoder — any image format Pillow reads; imports lazily on
    the executor), or ``None`` — the documented stub seam: the returned
    plan raises ``NotImplementedError`` at execution time where a codec
    plugs in.  ``use_fake_codec=True`` is the legacy spelling of
    ``codec="fake"``.  The Spark-side contract (schema, Arrow batch
    shape, binary-in/typed-out) is identical for every branch.
    """
    import pandas as pd

    if use_fake_codec and codec is None:
        codec = "fake"

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        if codec == "fake":
            decode = _fake_decode
        elif codec == "pil":
            decode = _pil_decode
        elif codec == "pnm":
            decode = _pnm_decode
        else:

            def decode(payload: bytes) -> tuple[int, int, int, float]:
                raise NotImplementedError(
                    "media codecs unavailable in this environment; pass "
                    "codec='fake'/'pnm'/'pil' or plug a real decoder here"
                )

        for pdf in it:
            decoded = [decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_channels": [d[2] for d in decoded],
                    "mean_intensity": [d[3] for d in decoded],
                }
            )

    return df.select("media_id", "payload").mapInPandas(batches, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    *,
    use_fake_codec: bool = False,
    codec: str | None = None,
) -> DataFrame:
    """Resize plumbing (payload → payload): Arrow-batched ``mapInPandas``
    with the same codec seam as :func:`decode_media`.  ``codec="fake"``
    truncates/cycles the byte stream to exactly width×height bytes so
    tests can assert output sizes and determinism; ``codec="pnm"``
    (round 12) is a REAL nearest-neighbor resampler over the netpbm
    P5/P6 formats (numpy-vectorized, exact integer index arithmetic —
    deterministic output bytes, re-decodable by decode_media);
    ``None`` keeps the stub seam where PIL/ffmpeg plugs in.  The
    Spark-side contract (schema, batch shape, binary-in/binary-out)
    is identical for every branch."""
    import pandas as pd

    if use_fake_codec and codec is None:
        codec = "fake"

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            if codec == "fake":
                n = width * height
                # empty payloads pad with NUL so the output is ALWAYS
                # exactly width*height bytes (b'' * k is empty — the
                # contract would silently break on zero-length media)
                out = [
                    bytes(((p or b"\x00") * (n // max(len(p), 1) + 1))[:n])
                    for p in map(bytes, pdf["payload"])
                ]
            elif codec == "pnm":
                out = [
                    _pnm_resize(bytes(p), width, height) for p in pdf["payload"]
                ]
            else:
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "pass codec='fake'/'pnm' or plug a real resizer here"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": width,
                    "height": height,
                    "payload": out,
                }
            )

    return df.select("media_id", "payload").mapInPandas(batches, RESIZED_SCHEMA)


FEATURE_CHARS = "aeio "  # deterministic char-frequency feature basis

FEATURE_SCHEMA = T.StructType(
    [T.StructField("media_id", T.LongType()), T.StructField("n_bytes", T.LongType())]
    + [
        T.StructField(f"f_{c.strip() or 'sp'}", T.DoubleType())
        for c in FEATURE_CHARS
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``: each
    feature is an exact integer ratio (byte-count / payload length), so
    the Python-side result bit-matches a SQL oracle — the Arrow batch
    boundary does not break the engine's exactness discipline."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            payloads = [bytes(p) for p in pdf["payload"]]
            ns = [len(p) for p in payloads]
            cols = {
                "media_id": pdf["media_id"].values,
                "n_bytes": ns,
            }
            for c in FEATURE_CHARS:
                key = f"f_{c.strip() or 'sp'}"
                cols[key] = [
                    p.count(c.encode()) / n if n else 0.0
                    for p, n in zip(payloads, ns)
                ]
            yield pd.DataFrame(cols)

    return df.select("media_id", "payload").mapInPandas(batches, FEATURE_SCHEMA)


def multimodal_feature_extract(spark: SparkSession, sf: str) -> DataFrame:
    """queries() surface for the Arrow-batched feature extractor."""
    return extract_features(media_table(spark, sf))


def _feature_sql() -> str:
    # character counts via the length-difference trick; the documents
    # fixture is ASCII so char counts == byte counts.
    feats = ",\n       ".join(
        "CAST(length(text) - length(replace(text, '{c}', '')) AS DOUBLE)"
        " / octet_length(CAST(text AS BLOB)) AS f_{k}".format(
            c=c, k=c.strip() or "sp"
        )
        for c in FEATURE_CHARS
    )
    return f"""
SELECT doc_id AS media_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       {feats}
FROM documents
"""


def sample_frames(df: DataFrame, every_n_bytes: int = 100) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled offset —
    pure-relational explode of a generated offset sequence (no UDF)."""
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("n_bytes") - 1, F.lit(every_n_bytes))).alias(
            "frame_offset"
        ),
    )


# ---------------------------------------------------------------------------
# queries() entry — metadata path (column pruning means payloads stay unread)
# ---------------------------------------------------------------------------


def multimodal_meta_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Typed-metadata profile of the media table + payload checksum: the
    query pattern that must NOT decode (and with real parquet layout, not
    even read) the payload bytes for its aggregates — checksum column
    excepted here to prove byte-level parity."""
    m = media_table(spark, sf)
    return m.groupBy("media_type").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.min(F.md5("payload")).alias("min_payload_md5"),
    )


_META_SQL = """
WITH media AS (
  SELECT doc_id AS media_id, CAST(text AS BLOB) AS payload,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
              WHEN doc_id % 3 = 1 THEN 'audio/wav'
              ELSE 'video/mp4' END AS media_type,
         CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
  FROM documents
)
SELECT media_type, COUNT(*) AS n_media,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       MIN(md5(CAST(payload AS VARCHAR))) AS min_payload_md5
FROM media GROUP BY media_type
"""


# ---------------------------------------------------------------------------
# frame-hash near-dup — the video-dedup pipeline shape, end to end
# ---------------------------------------------------------------------------

_FRAME_W = 64  # frame window (chars of the decoded payload)
_FRAME_S = 48  # stride
_FRAME_TAU = 0.5  # near-dup if ≥ 50% of the smaller side's frames match


def multimodal_frame_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Video near-dup by frame fingerprints: sample fixed-stride frames
    from each video payload, md5 each frame, and flag media pairs whose
    shared-frame count covers ≥ τ of the smaller side — the standard
    video-dedup pipeline (sample → per-frame hash → inverted-index
    overlap), here with the decode step as a deterministic relational
    window over the payload (a real codec slots into the same frames
    relation via decode_media/sample_frames).

    Physical shape at 100 TB: frame explode is a narrow map bounded by
    payload_len/stride rows; pair generation is an inverted-index join
    on the frame hash (only matching frames meet — no media×media
    space); the overlap agg is one partial-agg shuffle on the pair.
    containment-vs-smaller-side catches clipped/extended copies that a
    symmetric ratio misses.  All md5/substr/integer — oracle-exact."""
    m = media_table(spark, sf).filter(F.col("media_type") == "video/mp4")
    decoded = m.select(
        "media_id", F.decode("payload", "utf-8").alias("txt")
    ).withColumn("n_chars", F.length("txt"))
    frames = (
        decoded.filter(F.col("n_chars") >= _FRAME_W)
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_chars") - _FRAME_W, F.lit(_FRAME_S)
                )
            ).alias("off"),
            "txt",
        )
        .select(
            "media_id",
            F.md5(F.expr(f"substring(txt, off + 1, {_FRAME_W})")).alias("fh"),
        )
        .distinct()
    )
    sizes = frames.groupBy("media_id").agg(F.count("*").alias("n_frames"))
    a = frames.select(F.col("media_id").alias("ma"), "fh")
    b = frames.select(F.col("media_id").alias("mb"), "fh")
    common = (
        a.join(b, "fh")
        .filter(F.col("ma") < F.col("mb"))
        .groupBy("ma", "mb")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("media_id").alias("ma"), F.col("n_frames").alias("na"))
    sb = sizes.select(F.col("media_id").alias("mb"), F.col("n_frames").alias("nb"))
    return (
        common.join(sa, "ma")
        .join(sb, "mb")
        .filter(
            2 * F.col("n_common") >= F.least("na", "nb")  # τ = 1/2, integer-exact
        )
        .select(
            "ma",
            "mb",
            F.col("n_common").cast("long").alias("n_common"),
            F.col("na").cast("long").alias("n_frames_a"),
            F.col("nb").cast("long").alias("n_frames_b"),
            (F.col("n_common").cast("double") / F.least("na", "nb")).alias(
                "containment"
            ),
        )
    )


_FRAME_DEDUP_SQL = f"""
WITH vid AS (
  SELECT doc_id AS media_id, text AS txt, length(text) AS n_chars
  FROM documents WHERE doc_id % 3 = 2
), frames AS (
  SELECT DISTINCT media_id,
         md5(substr(txt, CAST(o AS INTEGER) + 1, {_FRAME_W})) AS fh
  FROM (SELECT media_id, txt, UNNEST(range(0, n_chars - {_FRAME_W} + 1, {_FRAME_S})) AS o
        FROM vid WHERE n_chars >= {_FRAME_W})
), sizes AS (
  SELECT media_id, COUNT(*) AS n_frames FROM frames GROUP BY media_id
), common AS (
  SELECT a.media_id AS ma, b.media_id AS mb, COUNT(*) AS n_common
  FROM frames a JOIN frames b ON a.fh = b.fh AND a.media_id < b.media_id
  GROUP BY 1, 2
)
SELECT c.ma, c.mb, CAST(c.n_common AS BIGINT) AS n_common,
       CAST(sa.n_frames AS BIGINT) AS n_frames_a,
       CAST(sb.n_frames AS BIGINT) AS n_frames_b,
       CAST(c.n_common AS DOUBLE) / LEAST(sa.n_frames, sb.n_frames) AS containment
FROM common c
JOIN sizes sa ON sa.media_id = c.ma
JOIN sizes sb ON sb.media_id = c.mb
WHERE 2 * c.n_common >= LEAST(sa.n_frames, sb.n_frames)
"""
# Spark sequence(0, n-W, S) inclusive-stop == DuckDB range(0, n-W+1, S)
# exclusive-stop: identical offset sets.


QUERIES: dict[str, QuerySpec] = {
    "multimodal_frame_dedup": QuerySpec(
        multimodal_frame_dedup,
        _FRAME_DEDUP_SQL,
        "LLM-pipeline multimodal (video near-dup via frame fingerprints, SimHash-style banding — "
        "sample → hash → inverted-index containment)",
    ),
    "multimodal_meta_profile": QuerySpec(
        multimodal_meta_profile, _META_SQL, "LLM-pipeline multimodal (binary columns + typed metadata, LAION 2022-style corpus profile)"
    ),
    "multimodal_feature_extract": QuerySpec(
        multimodal_feature_extract,
        _feature_sql(),
        "LLM-pipeline multimodal (Arrow-batched mapInPandas feature extraction over LAION 2022-style binary columns, exact ratios)",
    ),
}
