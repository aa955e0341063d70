"""Baseline JPEG codec (stages/jpegcodec.py): pure-numpy Huffman + DCT.

The decoder's LOSSLESS half (entropy decode, de-zigzag, dequant, IDCT,
rounding) is pinned BIT-EXACTLY against an independent numpy recompute
from the encoder's own quantized coefficients; the lossy half (quantize,
chroma subsample) is pinned by tolerance round-trips on smooth images —
tight bounds there catch systematic errors (wrong table, wrong level
shift, swapped chroma) that tolerance on noisy images would mask.
"""

import numpy as np
import pytest

from pdf_extraction_tests_ray.stages.jpegcodec import (
    QT_LUMA,
    dct8x8,
    decode_jpeg,
    encode_jpeg,
    idct8x8,
)


def test_gray_decode_is_bit_exact_reconstruction():
    """decode(encode(img)) equals the independent dequant+IDCT recompute
    from the quantized coefficients — the decoder adds zero extra error."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    qt = QT_LUMA.reshape(8, 8)
    exp = np.zeros((16, 24))
    for by in range(2):
        for bx in range(3):
            blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(float) - 128.0
            q = np.round(dct8x8(blk) / qt)
            exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.round(idct8x8(q * qt) + 128.0), 0, 255
            )
    got = decode_jpeg(encode_jpeg(img))[:, :, 0]
    assert np.array_equal(got, exp.astype(np.uint8))


def test_flat_image_is_lossless():
    flat = np.full((16, 16), 130, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat))[:, :, 0], flat)


def test_smooth_gray_roundtrip_tight():
    img = ((np.add.outer(np.arange(24), np.arange(40)) * 3) % 200 + 20).astype(np.uint8)
    back = decode_jpeg(encode_jpeg(img))[:, :, 0]
    err = np.abs(back.astype(int) - img.astype(int))
    assert err.max() <= 8 and err.mean() < 2.5


def test_smooth_color_roundtrip_both_samplings():
    h, w = 24, 32
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [(80 + yy * 2), (100 + xx), (60 + yy + xx)], axis=-1
    ).astype(np.uint8)
    for subsample, max_tol in ((False, 8), (True, 12)):
        back = decode_jpeg(encode_jpeg(rgb, subsample=subsample))
        err = np.abs(back.astype(int) - rgb.astype(int))
        assert err.max() <= max_tol, (subsample, err.max())
        assert err.mean() < 3.0, (subsample, err.mean())


def test_odd_dimensions_and_padding():
    """Dims not multiples of the MCU size: encoder pads, decoder crops."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(13, 19), dtype=np.uint8)
    back = decode_jpeg(encode_jpeg(img))
    assert back.shape == (13, 19, 1)
    grad = ((np.arange(11)[:, None] * 5 + np.arange(21)[None, :] * 3) % 256).astype(np.uint8)
    rgb = np.stack([grad, grad, grad], axis=-1)
    back = decode_jpeg(encode_jpeg(rgb, subsample=True))
    assert back.shape == (11, 21, 3)


def test_restart_intervals_change_nothing():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    a = decode_jpeg(encode_jpeg(img))
    b = decode_jpeg(encode_jpeg(img, restart_interval=2))
    assert np.array_equal(a, b)
    grad = ((np.arange(20)[:, None] * 3 + np.arange(36)[None, :] * 2) % 200 + 20).astype(np.uint8)
    rgb = np.stack([grad, grad // 2 + 40, 255 - grad], axis=-1)
    c = decode_jpeg(encode_jpeg(rgb, subsample=True))
    d = decode_jpeg(encode_jpeg(rgb, subsample=True, restart_interval=1))
    assert np.array_equal(c, d)


def test_byte_stuffing_roundtrip():
    """An image whose entropy stream contains 0xFF bytes must unstuff
    correctly; white noise reliably produces them."""
    rng = np.random.default_rng(5)  # this seed's stream contains 0xFF bytes
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    payload = encode_jpeg(img)
    assert b"\xff\x00" in payload  # stuffing actually exercised
    assert decode_jpeg(payload).shape == (32, 32, 1)


def test_error_gates():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    # lossless marker (SOF3) refused by name; SOF2 is now SUPPORTED
    img = np.full((8, 8), 99, np.uint8)
    payload = bytearray(encode_jpeg(img))
    payload[payload.index(b"\xff\xc0") + 1] = 0xC3
    with pytest.raises(ValueError, match="baseline .SOF0. and progressive"):
        decode_jpeg(bytes(payload))


def test_progressive_decodes_bit_identical_to_baseline_sibling():
    """encode_jpeg_progressive uses the same quantized coefficients as
    encode_jpeg, so a fully transmitted progressive payload must decode
    BIT-IDENTICALLY to the baseline payload of the same image — this
    covers all four scan kinds (DC/AC x first/refine), EOB runs,
    correction-bit buffering, spectral bands and both chroma samplings."""
    from pdf_extraction_tests_ray.stages.jpegcodec import encode_jpeg_progressive

    rng = np.random.default_rng(23)

    def color(h, w):
        base = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        return np.stack([base, 255 - base, np.roll(base, 2, 0)], axis=-1)

    cases = [
        (rng.integers(0, 256, size=(24, 40), dtype=np.uint8), {}),
        (color(32, 32), {}),
        (color(17, 31), {}),  # odd dims: AC scans cover the UNPADDED raster
        (color(13, 19), {"subsample": False}),
        (np.full((16, 16), 130, np.uint8), {}),  # flat: all-EOB AC scans
        (np.full((1, 1), 7, np.uint8), {}),
        # smooth gradient: long multi-block EOB runs with correction bits
        (((np.add.outer(np.arange(64), np.arange(80)) // 6) % 200 + 20).astype(np.uint8), {}),
    ]
    for img, kw in cases:
        a = decode_jpeg(encode_jpeg(img, **kw))
        b = decode_jpeg(encode_jpeg_progressive(img, **kw))
        assert a.shape == b.shape
        assert np.array_equal(a, b), (img.shape, kw)


def test_progressive_sof2_marker_and_scan_script():
    """The progressive payload really is SOF2 with the 6-scan script
    (2 DC + 2 bands x first/refine per component)."""
    from pdf_extraction_tests_ray.stages.jpegcodec import encode_jpeg_progressive

    img = np.stack([np.full((16, 16), 80, np.uint8)] * 3, axis=-1)
    payload = encode_jpeg_progressive(img)
    assert b"\xff\xc2" in payload and b"\xff\xc0" not in payload
    assert payload.count(b"\xff\xda") == 2 + 2 * 2 * 3  # DC scans + AC per band/comp


def test_fast_scan_decode_matches_scalar_twin_bit_exactly():
    """The vectorized scan decoder (LUT Huffman + stacked IDCT/scatter) is
    pinned bit-identical to the retained per-bit/per-block reference twin
    across samplings, restart intervals, odd dims and noisy streams."""
    from pdf_extraction_tests_ray.stages.jpegcodec import _decode_scan_scalar

    rng = np.random.default_rng(11)

    def img(h, w, color):
        base = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        if not color:
            return base
        return np.stack([base, 255 - base, np.roll(base, 2, 0)], axis=-1)

    cases = [
        encode_jpeg(img(24, 40, False)),
        encode_jpeg(img(32, 32, True), subsample=True),
        encode_jpeg(img(17, 31, True), subsample=True),
        encode_jpeg(img(13, 19, True), subsample=False),
        encode_jpeg(img(24, 24, True), subsample=True, restart_interval=2),
        encode_jpeg(img(16, 48, False), restart_interval=1),
        encode_jpeg(img(1, 1, False)),
    ]
    for payload in cases:
        fast = decode_jpeg(payload)
        slow = decode_jpeg(payload, scan_impl=_decode_scan_scalar)
        assert fast.shape == slow.shape
        assert np.array_equal(fast, slow)


def test_decode_media_real_handles_jpeg():
    import pyarrow as pa

    from pdf_extraction_tests_ray.stages.media import MEDIA_SCHEMA, DecodeMedia

    grad = ((np.arange(16)[:, None] * 2 + np.arange(24)[None, :]) % 200 + 20).astype(np.uint8)
    rgb = np.stack([grad, 255 - grad, grad // 2], axis=-1)
    batch = pa.Table.from_arrays(
        [
            pa.array(["d1"], pa.string()),
            pa.array(["m://jpg"], pa.string()),
            pa.array(["image"], pa.string()),
            pa.array([encode_jpeg(rgb)], pa.binary()),
            pa.array(["{}"], pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )
    out = DecodeMedia(fake=False)(batch)
    assert out.column("width").to_pylist() == [24]
    assert out.column("height").to_pylist() == [16]
    feat = np.array(out.column("feature").to_pylist()[0])
    # pooled grid of the decoded image tracks the source image's grid
    src_gray = rgb.astype(np.float32).mean(axis=2)
    ref = DecodeMedia(fake=False)._pooled_grid(src_gray)
    assert np.abs(feat - ref).max() < 0.02


def test_progressive_restart_intervals_change_nothing():
    """Progressive + DRI: every scan kind resets (DC pred, EOB run, bit
    position) at RSTn boundaries; output stays bit-identical to the
    baseline sibling at any interval."""
    from pdf_extraction_tests_ray.stages.jpegcodec import encode_jpeg_progressive

    rng = np.random.default_rng(31)
    base = rng.integers(0, 256, size=(33, 47), dtype=np.uint8)
    rgb = np.stack([base, 255 - base, np.roll(base, 2, 0)], axis=-1)
    smooth = ((np.add.outer(np.arange(64), np.arange(80)) // 6) % 200 + 20).astype(np.uint8)
    for img, kw in [(rgb, {}), (base, {}), (smooth, {})]:
        want = decode_jpeg(encode_jpeg(img, **kw))
        for dri in (1, 2, 3):
            got = decode_jpeg(encode_jpeg_progressive(img, restart_interval=dri, **kw))
            assert np.array_equal(want, got), dri
