"""BMP decode + G.711 mu-law WAV expansion (stages/media.py), pure numpy."""

import numpy as np
import pytest

from pdf_extraction_tests_ray.stages.media import (
    DecodeMedia,
    _mulaw_expand,
    decode_bmp,
    encode_bmp,
)


def test_bmp_roundtrip_exact_rgb():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)  # odd width: padding
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_8bit_paletted_hand_built():
    """2x2 8-bit BMP with a 2-entry palette, bottom-up, hand-laid bytes."""
    pal = bytes([0, 0, 255, 0]) + bytes([255, 0, 0, 0])  # idx0 red, idx1 blue (BGRA)
    # bottom row first: [1, 0]; top row: [0, 1]; stride 4
    raster = bytes([1, 0, 0, 0]) + bytes([0, 1, 0, 0])
    data_off = 14 + 40 + len(pal)
    hdr = (
        b"BM" + (data_off + len(raster)).to_bytes(4, "little") + b"\x00" * 4
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + (2).to_bytes(4, "little", signed=True) + (2).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(raster).to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 2
        + (2).to_bytes(4, "little")  # 2 palette colors
        + (0).to_bytes(4, "little")
    )
    got = decode_bmp(hdr + pal + raster)
    red, blue = [255, 0, 0], [0, 0, 255]
    assert got.tolist() == [[red, blue], [blue, red]]


def test_bmp_error_gates():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"GIF87a..")


def test_mulaw_expansion_hand_values():
    # 0xFF encodes +0; 0x7F encodes -0 (ITU G.711 inverted-byte convention)
    assert _mulaw_expand(np.array([0xFF, 0x7F], np.uint8)).tolist() == [0, 0]
    # 0x80: (~0x80)&0xFF = 0x7F -> sign 0, exp 7, mant 15
    # -> ((2*15+33)<<7)-33 = 8031 -> *4 = 32124, the published G.711 max
    assert _mulaw_expand(np.array([0x80], np.uint8)).tolist() == [32124]
    assert _mulaw_expand(np.array([0x00], np.uint8)).tolist() == [-32124]


def test_mulaw_wav_through_decode_media():
    """8-bit mu-law WAV (fmt code 7): DecodeMedia expands and reports the
    same frame count a PCM16 encoding of the expanded signal would."""
    import pyarrow as pa

    from pdf_extraction_tests_ray.stages.media import MEDIA_SCHEMA

    ulaw = np.array([0xFF, 0x80, 0x00, 0xFF, 0x90, 0x10] * 50, np.uint8)
    hdr = (
        b"RIFF" + (36 + len(ulaw)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (7).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
        + b"data" + len(ulaw).to_bytes(4, "little")
    )
    batch = pa.Table.from_arrays(
        [
            pa.array(["d1"], pa.string()),
            pa.array(["m://ulaw"], pa.string()),
            pa.array(["audio"], pa.string()),
            pa.array([hdr + ulaw.tobytes()], pa.binary()),
            pa.array(["{}"], pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )
    out = DecodeMedia(fake=False)(batch)
    assert out.column("n_frames").to_pylist() == [len(ulaw)]
    assert out.column("width").to_pylist() == [1]  # channels
    assert out.column("height").to_pylist() == [8000]  # sample rate
