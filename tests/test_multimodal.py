"""The multimodal plumbing must be real even where the codec is stubbed:
schema, Arrow batch shape, deterministic fake decode, and the stub seam."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.multimodal import (
    DECODED_SCHEMA,
    FEATURE_CHARS,
    RESIZED_SCHEMA,
    _fake_decode,
    decode_media,
    extract_features,
    media_table,
    resize_media,
    sample_frames,
)


def test_media_table_schema(spark):
    m = media_table(spark, SF_SMOKE)
    assert [f.name for f in m.schema.fields] == ["media_id", "payload", "media_type", "n_bytes"]
    row = m.orderBy("media_id").first()
    assert isinstance(bytes(row.payload), bytes)
    assert row.n_bytes == len(row.payload)


def test_decode_media_fake_codec(spark):
    m = media_table(spark, SF_SMOKE).limit(20)
    out = decode_media(m, use_fake_codec=True)
    assert out.schema == DECODED_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    src = {r.media_id: bytes(r.payload) for r in m.collect()}
    assert rows.keys() == src.keys()
    for mid, payload in src.items():
        w, h, c, mi = _fake_decode(payload)
        r = rows[mid]
        assert (r.width, r.height, r.n_channels) == (w, h, c)
        assert r.mean_intensity == pytest.approx(mi)


def test_decode_media_stub_raises(spark):
    m = media_table(spark, SF_SMOKE).limit(1)
    with pytest.raises(Exception, match="NotImplementedError|media codecs unavailable"):
        decode_media(m).collect()


def test_sample_frames(spark):
    m = media_table(spark, SF_SMOKE).limit(5)
    frames = sample_frames(m, every_n_bytes=50)
    got = frames.groupBy("media_id").count().collect()
    sizes = {r.media_id: r.n_bytes for r in m.collect()}
    for r in got:
        expected = (sizes[r.media_id] - 1) // 50 + 1
        assert r["count"] == expected


def test_resize_media_fake_codec(spark):
    m = media_table(spark, SF_SMOKE).limit(10)
    out = resize_media(m, 8, 6, use_fake_codec=True)
    assert out.schema == RESIZED_SCHEMA
    rows = out.collect()
    assert len(rows) == 10
    for r in rows:
        assert (r.width, r.height) == (8, 6)
        assert len(bytes(r.payload)) == 48
    # deterministic: same input -> same resized bytes
    again = {r.media_id: bytes(r.payload) for r in resize_media(m, 8, 6, use_fake_codec=True).collect()}
    assert {r.media_id: bytes(r.payload) for r in rows} == again


def test_resize_media_stub_raises(spark):
    m = media_table(spark, SF_SMOKE).limit(1)
    with pytest.raises(Exception, match="NotImplementedError|media codecs unavailable"):
        resize_media(m, 4, 4).collect()


def test_extract_features_exact_ratios(spark):
    m = media_table(spark, SF_SMOKE).limit(20)
    out = {r.media_id: r for r in extract_features(m).collect()}
    for r in m.collect():
        p = bytes(r.payload)
        got = out[r.media_id]
        assert got.n_bytes == len(p)
        for c in FEATURE_CHARS:
            key = f"f_{c.strip() or 'sp'}"
            assert got[key] == p.count(c.encode()) / len(p)

def test_resize_media_empty_payload(spark):
    # b'' * k is always empty — the empty payload must still come back as
    # exactly width*height (NUL-padded) bytes
    m = spark.createDataFrame([(1, bytearray(b"")), (2, bytearray(b"ab"))], "media_id LONG, payload BINARY")
    rows = {r.media_id: bytes(r.payload) for r in resize_media(m, 4, 3, use_fake_codec=True).collect()}
    assert rows[1] == b"\x00" * 12
    assert rows[2] == (b"ab" * 6)[:12]
    assert all(len(p) == 12 for p in rows.values())


def test_decode_media_real_pillow_codec(spark):
    """Proves the decode seam against a REAL decoder where Pillow exists
    (skipped in codec-free containers): tiny solid-color PNGs round-trip
    through the same mapInPandas plan as the fake codec, with exact
    dims/bands/mean."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    from mmeds_meta_spark.operators.multimodal import MEDIA_SCHEMA, decode_media

    def png(w, h, rgb):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), rgb).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, png(5, 3, (10, 20, 30)), "image/png", 0),
        (2, png(2, 7, (255, 0, 0)), "image/png", 0),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_media(df, codec="pil").collect()}
    assert (got[1].width, got[1].height, got[1].n_channels) == (5, 3, 3)
    assert got[1].mean_intensity == pytest.approx((10 + 20 + 30) / 3)
    assert (got[2].width, got[2].height, got[2].n_channels) == (2, 7, 3)
    assert got[2].mean_intensity == pytest.approx(255 / 3)


# ------------------------------------------------ pure-Python PNM codec

def test_pnm_decode_hand_built():
    """Round 12: the REAL codec branch that needs no library — binary
    netpbm P5/P6 with comment-tolerant header parsing, exact integer
    mean."""
    from mmeds_meta_spark.operators.multimodal import _pnm_decode, encode_pnm

    p6 = b"P6\n# a comment line\n2 2\n255\n" + bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]
    )
    w, h, c, mean = _pnm_decode(p6)
    assert (w, h, c) == (2, 2, 3)
    assert mean == sum([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]) / 12
    p5 = encode_pnm(3, 1, bytes([10, 20, 30]))
    assert _pnm_decode(p5) == (3, 1, 1, 20.0)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a binary PNM"):
        _pnm_decode(b"JFIF....")
    with _pytest.raises(ValueError, match="truncated"):
        _pnm_decode(b"P5\n4 4\n255\nxy")


def test_decode_media_pnm_end_to_end(spark):
    from mmeds_meta_spark.operators.multimodal import encode_pnm

    rows = [
        (1, encode_pnm(2, 2, bytes(range(12)))),          # P6 2x2
        (2, encode_pnm(4, 1, bytes([0, 100, 200, 255]))), # P5 4x1
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in decode_media(df, codec="pnm").collect()}
    assert (got[1].width, got[1].height, got[1].n_channels) == (2, 2, 3)
    assert got[1].mean_intensity == sum(range(12)) / 12
    assert (got[2].width, got[2].height, got[2].n_channels) == (4, 1, 1)
    assert got[2].mean_intensity == (0 + 100 + 200 + 255) / 4


def test_resize_media_pnm_nearest_neighbor(spark):
    """4x4 P5 gradient -> 2x2: nearest-neighbor picks rows/cols 0 and 2
    (floor(i*4/2)); the output is a re-decodable P5 with exact bytes."""
    from mmeds_meta_spark.operators.multimodal import _pnm_decode, encode_pnm

    grad = bytes(range(16))  # 4x4: row r, col c -> 4r + c
    df = spark.createDataFrame(
        [(7, encode_pnm(4, 4, grad))], "media_id long, payload binary"
    )
    (row,) = resize_media(df, 2, 2, codec="pnm").collect()
    assert (row.width, row.height) == (2, 2)
    w, h, c, raster_mean = _pnm_decode(bytes(row.payload))
    assert (w, h, c) == (2, 2, 1)
    assert bytes(row.payload).endswith(bytes([0, 2, 8, 10]))
    # round-trip through the decode operator on the resized payload
    (d,) = decode_media(
        spark.createDataFrame(
            [(7, bytes(row.payload))], "media_id long, payload binary"
        ),
        codec="pnm",
    ).collect()
    assert (d.width, d.height, d.mean_intensity) == (2, 2, (0 + 2 + 8 + 10) / 4)


def test_pnm_resize_identity_property():
    """Resizing to the source dimensions is the identity (nearest-
    neighbor indices floor(i*n/n) = i) — over arbitrary small rasters."""
    from hypothesis import given, settings, strategies as st

    from mmeds_meta_spark.operators.multimodal import _pnm_resize, encode_pnm

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(1, 8),
        h=st.integers(1, 8),
        chan=st.sampled_from([1, 3]),
        data=st.data(),
    )
    def check(w, h, chan, data):
        raster = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=w * h * chan, max_size=w * h * chan
                )
            )
        )
        p = encode_pnm(w, h, raster)
        assert _pnm_resize(p, w, h).endswith(raster)

    check()
