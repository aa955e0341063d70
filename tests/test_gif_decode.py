"""GIF codec (stages/gifcodec.py): pure-python LZW, lossless.

Equality tests (not tolerances — GIF is lossless): gray round-trips,
multi-frame animation, LZW code-size growth + 4096-entry table reset,
hand-built interlaced payload, and the DecodeMedia video path (n_frames
from the image-block count).
"""

import numpy as np
import pytest

from pdf_extraction_tests_ray.stages.gifcodec import decode_gif, encode_gif


def test_gray_roundtrip_exact():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    frames, n = decode_gif(encode_gif(img))
    assert n == 1 and frames.shape == (1, 13, 21, 3)
    for ch in range(3):  # gray ramp palette: all channels equal the index
        assert np.array_equal(frames[0, :, :, ch], img)


def test_multiframe_animation():
    rng = np.random.default_rng(4)
    clip = rng.integers(0, 256, size=(5, 9, 16), dtype=np.uint8)
    frames, n = decode_gif(encode_gif(clip))
    assert n == 5
    for k in range(5):
        assert np.array_equal(frames[k, :, :, 0], clip[k])


def test_lzw_table_reset_and_code_growth():
    """80x120 noise forces >4096 LZW entries -> clear-code reset mid-frame."""
    rng = np.random.default_rng(6)
    big = rng.integers(0, 256, size=(80, 120), dtype=np.uint8)
    frames, _ = decode_gif(encode_gif(big))
    assert np.array_equal(frames[0, :, :, 0], big)


def test_interlaced_frame_hand_built():
    """Set the interlace flag and store rows in pass order (8/8 from 0,
    8/8 from 4, 4/4 from 2, 2/2 from 1) — the decoder must un-weave them."""
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(10, 7), dtype=np.uint8)
    order = (
        list(range(0, 10, 8)) + list(range(4, 10, 8))
        + list(range(2, 10, 4)) + list(range(1, 10, 2))
    )
    woven = img[order]
    payload = bytearray(encode_gif(woven))
    # image descriptor starts right after header+LSD+GCT: 13 + 256*3
    desc = 13 + 768
    assert payload[desc] == 0x2C
    payload[desc + 9] |= 0x40  # interlace flag
    frames, _ = decode_gif(bytes(payload))
    assert np.array_equal(frames[0, :, :, 0], img)


def test_extensions_are_skipped():
    """A GCE extension block between LSD and the image must be ignored."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    payload = bytearray(encode_gif(img))
    desc = 13 + 768
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    payload[desc:desc] = gce
    frames, n = decode_gif(bytes(payload))
    assert n == 1 and np.array_equal(frames[0, :, :, 0], img)


def test_error_gates():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError, match="no image blocks"):
        decode_gif(b"GIF87a" + b"\x08\x00\x08\x00\x00\x00\x00" + b"\x3b")


def test_decode_media_real_handles_gif_video():
    import pyarrow as pa

    from pdf_extraction_tests_ray.stages.media import MEDIA_SCHEMA, DecodeMedia

    clip = np.stack(
        [((np.arange(12)[:, None] + np.arange(20)[None, :] + 9 * k) % 256).astype(np.uint8)
         for k in range(4)]
    )
    batch = pa.Table.from_arrays(
        [
            pa.array(["d1"], pa.string()),
            pa.array(["m://clip"], pa.string()),
            pa.array(["video"], pa.string()),
            pa.array([encode_gif(clip)], pa.binary()),
            pa.array(["{}"], pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )
    out = DecodeMedia(fake=False)(batch)
    assert out.column("width").to_pylist() == [20]
    assert out.column("height").to_pylist() == [12]
    assert out.column("n_frames").to_pylist() == [4]


def test_fast_lzw_decode_matches_scalar_twin_exactly():
    """The chunked/slice-table LZW decoder is pinned byte-identical to the
    retained per-byte reference twin across compressibility regimes, table
    resets (>4096 entries), small alphabets and non-8 min code sizes."""
    from pdf_extraction_tests_ray.stages.gifcodec import (
        _lzw_decode,
        _lzw_decode_scalar,
        _lzw_encode,
    )

    rng = np.random.default_rng(17)
    images = [
        rng.integers(0, 256, size=(13, 21), dtype=np.uint8),  # noisy
        rng.integers(0, 256, size=(80, 120), dtype=np.uint8),  # table reset
        np.zeros((40, 40), np.uint8),  # maximally compressible
        (np.arange(64 * 64).reshape(64, 64) % 256).astype(np.uint8),
        rng.integers(0, 4, size=(50, 50), dtype=np.uint8),  # tiny alphabet
    ]
    for img in images:
        data = _lzw_encode(8, img.reshape(-1).tolist())
        fast = list(_lzw_decode(8, data, img.size))
        slow = _lzw_decode_scalar(8, data, img.size)
        assert fast == slow
    seq = rng.integers(0, 4, size=400).tolist()
    data = _lzw_encode(2, seq)
    assert list(_lzw_decode(2, data, 400)) == _lzw_decode_scalar(2, data, 400)
