"""Real PNG decode (stages/media.py): pure stdlib zlib + filter reversal.

PNG is DEFLATE plus five per-row byte filters — nothing about it needs an
external codec library, so unlike JPEG/MP3/H.264 (still env-gated) the
repo decodes it for real. Pinned here: encoder/decoder round-trips for
every supported color type, HAND-COMPUTED filtered scanlines for each
filter type (Sub/Up/Average/Paeth — the bytes below were filtered by
hand, not by the encoder under test), error gates, and the DecodeMedia
feature path over a PNG payload.
"""

import struct
import zlib

import numpy as np
import pytest

from pdf_extraction_tests_ray.stages.media import (
    DecodeMedia,
    decode_png,
    encode_png,
)

_MAGIC = b"\x89PNG\r\n\x1a\n"


def _raw_png(w, h, ctype, raster):
    def chunk(cid, body):
        return (
            len(body).to_bytes(4, "big") + cid + body
            + zlib.crc32(cid + body).to_bytes(4, "big")
        )

    return (
        _MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raster))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_all_color_types():
    rng = np.random.default_rng(0)
    for shape in [(5, 7), (5, 7, 3), (4, 4, 4), (3, 9, 2)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        back = decode_png(encode_png(img))
        want = img[:, :, None] if img.ndim == 2 else img
        assert np.array_equal(back, want), shape


def test_png_sub_and_up_filters_hand_computed():
    # 2x2 gray. Row 0 uses Sub: raw [10, 250] stores [10, (250-10)=240].
    # Row 1 uses Up: raw [20, 5] stores [(20-10)=10, (5-250)%256=11].
    raster = bytes([1, 10, 240]) + bytes([2, 10, 11])
    got = decode_png(_raw_png(2, 2, 0, raster))[:, :, 0]
    assert got.tolist() == [[10, 250], [20, 5]]


def test_png_average_and_paeth_filters_hand_computed():
    # 2x2 gray. Row 0 Average: raw [100, 30] -> stored [100, (30-50)%256=236]
    # (x0: pred 0; x1: floor((left 100 + up 0)/2) = 50).
    # Row 1 Paeth over prev [100, 30]: x0 pred=b=100 (raw 90 -> 246);
    # x1 a=90 b=30 c=100 -> p=20, |p-b| smallest -> pred=30 (raw 200 -> 170).
    raster = bytes([3, 100, 236]) + bytes([4, 246, 170])
    got = decode_png(_raw_png(2, 2, 0, raster))[:, :, 0]
    assert got.tolist() == [[100, 30], [90, 200]]


def test_png_error_gates():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF....")
    # 16-bit depth
    bad = _raw_png(1, 1, 0, b"\x00\x00\x00")
    bad = bad.replace(struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0),
                      struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0))
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(bad)
    # unknown interlace method (2)
    bad = _raw_png(1, 1, 0, b"\x00\x00").replace(
        struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0),
        struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 2),
    )
    with pytest.raises(ValueError, match="interlace"):
        decode_png(bad)


def _adam7_raster(img: np.ndarray) -> bytes:
    """Hand-weave the Adam7 raster: seven filter-0 sub-images in spec
    pass order — built independently of the decoder under test."""
    h, w = img.shape[:2]
    img3 = img if img.ndim == 3 else img[:, :, None]
    out = bytearray()
    for x0, y0, dx, dy in ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                           (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)):
        sub = img3[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for row in sub:
            out += b"\x00" + row.tobytes()
    return bytes(out)


def test_png_adam7_interlaced_gray_and_rgb():
    rng = np.random.default_rng(13)
    for shape in [(11, 9), (16, 16), (3, 21, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        ctype = 0 if img.ndim == 2 else 2
        h, w = img.shape[:2]
        payload = _raw_png(w, h, ctype, _adam7_raster(img))
        payload = payload.replace(
            struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0),
            struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1),
        )
        got = decode_png(payload)
        want = img[:, :, None] if img.ndim == 2 else img
        assert np.array_equal(got, want), shape


def test_decode_media_real_handles_png():
    """DecodeMedia(fake=False) on a PNG payload: dims + pooled-grid feature
    equal the same image shipped as PPM (shared gray conversion)."""
    import pyarrow as pa

    from pdf_extraction_tests_ray.stages.media import MEDIA_SCHEMA

    grad = ((np.arange(8)[:, None] + np.arange(12)[None, :]) % 256).astype(np.uint8)
    rgb = np.stack([grad, 255 - grad, grad // 2], axis=-1)
    png_payload = encode_png(rgb)
    ppm_payload = b"P6\n12 8\n255\n" + rgb.tobytes()
    batch = pa.Table.from_arrays(
        [
            pa.array(["d1", "d2"], pa.string()),
            pa.array(["m://1", "m://2"], pa.string()),
            pa.array(["image", "image"], pa.string()),
            pa.array([png_payload, ppm_payload], pa.binary()),
            pa.array(["{}", "{}"], pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )
    out = DecodeMedia(fake=False)(batch)
    assert out.column("width").to_pylist() == [12, 12]
    assert out.column("height").to_pylist() == [8, 8]
    f_png, f_ppm = out.column("feature").to_pylist()
    assert f_png == f_ppm  # identical pixels -> identical pooled feature
