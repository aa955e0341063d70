"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media travel as ``binary`` columns with metadata; decode / feature-extract
/ resize / frame-sample run as actor-pool ``map_batches`` stages.
``DecodeMedia(fake=False)`` REALLY decodes the formats that need no codec
library — binary PGM (P5) / PPM (P6) images (the format the repo's own
layout-overlay sink emits, stages/render.py), PCM16 WAV audio, **PNG**
(DEFLATE via stdlib ``zlib`` + the five per-row byte filters reversed in
:func:`decode_png`, sequential AND Adam7-interlaced), **baseline JPEG** (pure-numpy Huffman + dequant +
IDCT, ``stages.jpegcodec`` — bit-exactness against an independent
reconstruction pinned in tests) **GIF** (pure-python LZW,
``stages.gifcodec`` — lossless, multi-frame: the real ``video`` payload),
**BMP** (8/24-bit uncompressed) and **G.711 mu-law WAV** (vectorized ITU
expansion)
— with a pooled feature vector (4x4 grid of mean intensities for images,
segment RMS energies for audio).
Baseline (SOF0) AND progressive (SOF2) JPEG both decode for real —
``jpegcodec`` implements all four progressive scan kinds (DC/AC x
first/refine with EOB runs) and pins a fully-transmitted progressive
payload bit-identical to its baseline sibling. MP3/H.264 still need
external libraries absent from this container: those payloads raise a
``ValueError`` naming the sniffed magic, and the deterministic
``fake=True`` decoder remains for plumbing tests/benches over arbitrary
bytes.

Media table schema::

    media: doc_id:string, media_ref:string, media_type:string,
           payload:binary, meta:string (json)
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("media_type", pa.string()),  # 'image' | 'audio' | 'video'
        ("payload", pa.binary()),
        ("meta", pa.string()),
    ]
)

DECODED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("media_type", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("feature", pa.list_(pa.float32())),  # pooled feature vector
    ]
)


def synth_media_table(doc_ids, refs, types, seed: int = 99, codec: str = "fake") -> pa.Table:
    """Deterministic payloads for tests/bench (seeded by ref).

    ``codec='fake'`` emits opaque random bytes (plumbing-only path);
    ``codec='real'`` emits genuinely decodable payloads — PGM/PPM/PNG/JPEG
    gradients for image rows, multi-frame grayscale GIFs for video rows,
    PCM16 WAV tones for audio rows — so ``DecodeMedia(fake=False)``
    exercises every real parser end-to-end."""
    payloads, metas = [], []
    for r, t in zip(refs, types):
        rng = np.random.default_rng(
            np.random.SeedSequence([seed, int.from_bytes(hashlib.md5(r.encode()).digest()[:4], "big")])
        )
        if codec == "real":
            if t == "audio":
                n = int(rng.integers(200, 2000))
                rate = int(rng.choice([8000, 16000]))
                if rng.random() < 0.3:  # G.711 mu-law leg (fmt code 7)
                    ulaw = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
                    hdr = (
                        b"RIFF" + (36 + len(ulaw)).to_bytes(4, "little") + b"WAVE"
                        + b"fmt " + (16).to_bytes(4, "little")
                        + (7).to_bytes(2, "little") + (1).to_bytes(2, "little")
                        + rate.to_bytes(4, "little")
                        + rate.to_bytes(4, "little")
                        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
                        + b"data" + len(ulaw).to_bytes(4, "little")
                    )
                    payloads.append(hdr + ulaw)
                    metas.append(json.dumps({"codec": "wav-ulaw", "type": t}))
                    continue
                pcm = (
                    (np.sin(np.arange(n) * float(rng.uniform(0.05, 0.5))) * 12000)
                    .astype("<i2")
                    .tobytes()
                )
                hdr = (
                    b"RIFF" + (36 + len(pcm)).to_bytes(4, "little") + b"WAVE"
                    + b"fmt " + (16).to_bytes(4, "little")
                    + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
                    + rate.to_bytes(4, "little")
                    + (rate * 2).to_bytes(4, "little")
                    + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
                    + b"data" + len(pcm).to_bytes(4, "little")
                )
                payloads.append(hdr + pcm)
                metas.append(json.dumps({"codec": "wav", "type": t}))
            elif t == "video":
                # real multi-frame payload: grayscale animated GIF (LZW)
                from .gifcodec import encode_gif

                w, h = int(rng.integers(16, 48)), int(rng.integers(16, 48))
                nf = int(rng.integers(2, 7))
                base = (np.arange(h)[:, None] + np.arange(w)[None, :]) % 256
                clip = np.stack(
                    [((base + 13 * k) % 256).astype(np.uint8) for k in range(nf)]
                )
                payloads.append(encode_gif(clip))
                metas.append(json.dumps({"codec": "gif", "type": t, "frames": nf}))
            else:
                w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
                # 0=pgm, 1=ppm, 2=png, 3=baseline jpeg, 4=progressive jpeg
                kind = int(rng.integers(0, 5))
                grad = (
                    (np.arange(h)[:, None] + np.arange(w)[None, :]) % 256
                ).astype(np.uint8)
                if kind == 1:
                    img = np.stack([grad, 255 - grad, grad // 2], axis=-1)
                    head = b"P6\n%d %d\n255\n" % (w, h)
                    payloads.append(head + img.tobytes())
                    metas.append(json.dumps({"codec": "ppm", "type": t}))
                elif kind == 2:
                    img = np.stack([grad, 255 - grad, grad // 2], axis=-1)
                    payloads.append(encode_png(img))
                    metas.append(json.dumps({"codec": "png", "type": t}))
                elif kind == 3:
                    from .jpegcodec import encode_jpeg

                    img = np.stack([grad, 255 - grad, grad // 2], axis=-1)
                    payloads.append(encode_jpeg(img))
                    metas.append(json.dumps({"codec": "jpeg", "type": t}))
                elif kind == 4:
                    from .jpegcodec import encode_jpeg_progressive

                    img = np.stack([grad, 255 - grad, grad // 2], axis=-1)
                    payloads.append(encode_jpeg_progressive(img))
                    metas.append(json.dumps({"codec": "jpeg_progressive", "type": t}))
                else:
                    head = b"P5\n%d %d\n255\n" % (w, h)
                    payloads.append(head + grad.tobytes())
                    metas.append(json.dumps({"codec": "pgm", "type": t}))
            continue
        payloads.append(rng.integers(0, 256, size=int(rng.integers(256, 2048)), dtype=np.uint8).tobytes())
        metas.append(json.dumps({"codec": "fake", "type": t}))
    return pa.Table.from_arrays(
        [
            pa.array(list(doc_ids), pa.string()),
            pa.array(list(refs), pa.string()),
            pa.array(list(types), pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(metas, pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )


def decode_pnm_gray(payload: bytes) -> np.ndarray:
    """Binary PGM (P5) / PPM (P6) -> float32 grayscale array (h, w):
    header tokens (with '#' comments), then the raw sample buffer.
    Matches the P5 files the repo's layout-overlay sink writes
    (stages/render.py); P6 grays as the unweighted RGB mean. Shared by
    DecodeMedia and the glyph OCR backend (stages/ocr.py)."""
    toks, i, n = [], 2, len(payload)
    while len(toks) < 3 and i < n:
        c = payload[i]
        if c in b" \t\r\n":
            i += 1
        elif c == ord("#"):
            while i < n and payload[i] not in b"\r\n":
                i += 1
        else:
            j = i
            while j < n and payload[j] not in b" \t\r\n":
                j += 1
            toks.append(int(payload[i:j]))
            i = j
    i += 1  # single whitespace byte after maxval
    w, h, maxval = toks
    if maxval > 255:
        raise ValueError("16-bit PNM samples not supported")
    ch = 3 if payload[:2] == b"P6" else 1
    buf = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=i)
    return buf.reshape(h, w, ch).astype(np.float32).mean(axis=2)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed BMP (BITMAPINFOHEADER, 8-bit paletted or 24-bit BGR)
    -> uint8 RGB array (h, w, 3). Rows are 4-byte aligned and stored
    bottom-up (top-down when height is negative). Pure numpy."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError("BMP core-header variant not supported")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    planes = int.from_bytes(payload[26:28], "little")
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if planes != 1 or comp != 0:
        raise ValueError(f"only uncompressed single-plane BMP supported (compression={comp})")
    top_down = h < 0
    h = abs(h)
    if bpp == 24:
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(payload, np.uint8, stride * h, data_off).reshape(h, stride)
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        rgb = bgr[:, :, ::-1]
    elif bpp == 8:
        n_colors = int.from_bytes(payload[46:50], "little") or 256
        pal = np.frombuffer(
            payload, np.uint8, n_colors * 4, 14 + hdr_size
        ).reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRA -> RGB
        stride = (w + 3) & ~3
        rows = np.frombuffer(payload, np.uint8, stride * h, data_off).reshape(h, stride)
        rgb = pal[rows[:, :w]]
    else:
        raise ValueError(f"only 8/24-bit BMP supported, got {bpp}-bit")
    return np.ascontiguousarray(rgb if top_down else rgb[::-1])


def encode_bmp(img: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BMP writer (gray or RGB uint8) for
    fixtures/tests."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for y in range(h - 1, -1, -1):
        row = img[y, :, ::-1].tobytes()  # RGB -> BGR
        raster += row + b"\x00" * (stride - len(row))
    data_off = 14 + 40
    size = data_off + len(raster)
    hdr = (
        b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True) + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(raster).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return hdr + bytes(raster)


def _mulaw_expand(u: np.ndarray) -> np.ndarray:
    """G.711 mu-law byte -> linear int16 (vectorized ITU expansion):
    invert the byte, split sign/exponent/mantissa, undo the +33 bias."""
    u = (~u) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant.astype(np.int32) << 1) + 33) << exp) - 33
    out = np.where(sign != 0, -mag, mag)
    return (out * 4).astype(np.int16)  # scale to 16-bit range


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# Adam7 pass origins/strides: (x0, y0, dx, dy), spec order
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, offset: int, h: int, stride: int, bpp: int) -> tuple:
    """Reverse ``h`` filtered scanlines of ``stride`` bytes starting at
    ``offset`` in ``raw``; returns (rows array (h, stride), bytes consumed).
    Sub/Average/Paeth have an along-the-row prefix dependency, so those
    rows decode with a Python inner loop — correct first, and media
    batches are small by design (batch BYTES bound worker heap)."""
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        base = offset + y * (stride + 1)
        ftype = raw[base]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=base + 1).copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ftype == 2:  # Up (no intra-row dependency: vectorized)
            row += prev
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (row[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = row
        prev = row
    return out, h * (stride + 1)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> uint8 array (h, w, channels), pure stdlib.

    PNG is zlib DEFLATE plus five per-scanline byte filters (None / Sub /
    Up / Average / Paeth) — nothing needs an external codec. Supported:
    bit depth 8, color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA),
    both raster layouts (sequential and Adam7 interlace — seven
    sub-images, each with its own filtered scanlines, scattered onto the
    output grid); palette raises (needs PLTE handling)."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, n = 8, len(payload)
    ihdr = None
    idat = []
    while pos + 8 <= n:
        size = int.from_bytes(payload[pos : pos + 4], "big")
        cid = payload[pos + 4 : pos + 8]
        if cid == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload[pos + 8 : pos + 21])
        elif cid == b"IDAT":
            idat.append(payload[pos + 8 : pos + 8 + size])
        elif cid == b"IEND":
            break
        pos += 12 + size  # length + id + crc
    if ihdr is None or not idat:
        raise ValueError("PNG payload missing IHDR/IDAT chunks")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported, got depth {depth}")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype} (palette needs PLTE)")
    raw = zlib.decompress(b"".join(idat))
    if not interlace:
        stride = w * channels
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG raster size mismatch")
        rows, _ = _png_unfilter(raw, 0, h, stride, channels)
        return rows.reshape(h, w, channels)
    if interlace != 1:
        raise ValueError(f"unknown PNG interlace method {interlace}")
    out = np.zeros((h, w, channels), dtype=np.uint8)
    offset = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        rows, used = _png_unfilter(raw, offset, ph, pw * channels, channels)
        offset += used
        out[y0::dy, x0::dx] = rows.reshape(ph, pw, channels)
    if offset != len(raw):
        raise ValueError("PNG interlaced raster size mismatch")
    return out


def encode_png(img: np.ndarray) -> bytes:
    """Minimal filter-0 PNG writer (gray / gray+alpha / RGB / RGBA uint8)
    — used by the fixture generator so the real decoder has genuinely
    compressed payloads to chew on, and by tests for round-trips."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(cid, body):
        return (
            len(body).to_bytes(4, "big")
            + cid
            + body
            + zlib.crc32(cid + body).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raster = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raster)) + chunk(b"IEND", b"")
    )


class _NativeImaging:
    """Thin adapter over PIL.Image, isolated so (a) the import gate fires
    at ACTOR CONSTRUCTION, never mid-batch (the tesseract/lance gate
    pattern), and (b) tests can inject a PIL-shaped shim and drive the
    whole native codepath in environments without Pillow."""

    def __init__(self, module=None):
        if module is None:
            try:
                from PIL import Image  # type: ignore
            except ImportError as e:
                raise ImportError(
                    "DecodeMedia(backend='native') needs Pillow (PIL), which "
                    "is not importable here — install Pillow or use "
                    "backend='pure' (or 'auto', which falls back silently)"
                ) from e
            module = Image
        self._Image = module

    def decode_first_frame(self, payload: bytes):
        """payload -> ((h, w, ch) uint8 array of frame 0, n_frames)."""
        import io

        img = self._Image.open(io.BytesIO(payload))
        n_frames = int(getattr(img, "n_frames", 1))
        if getattr(img, "mode", "") in ("P", "CMYK", "YCbCr"):
            img = img.convert("RGB")
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr.astype(np.uint8, copy=False), n_frames


class DecodeMedia:
    """Actor-pool decode stage. Small ``batch_size`` is mandatory: payload
    rows are megabytes at real scale — batch bytes, not row count, bound
    worker heap (SURVEY.md §7.3.6).

    ``backend`` (round-5 VERDICT #1 — the import-gated real-codec path):

    * ``"pure"`` — the repo's pure-numpy/stdlib codecs (PGM/PPM, PNG,
      baseline+progressive JPEG, GIF, BMP; always available, bit-pinned
      in tests). ~3.9 Mpx/s/core on JPEG — the 100-TB constant-factor
      note in VERDICT r4.
    * ``"native"`` — decode IMAGE payloads through Pillow/libjpeg
      (imported once per actor in ``__init__``; raises ImportError at
      construction when Pillow is absent, never mid-batch). Gray rules
      mirror the pure codecs per format, so lossless formats produce
      IDENTICAL features; JPEG may differ by ±1/255 per pixel (IDCT is
      not bit-specified across decoders). WAV stays on the shared
      stdlib path in both backends — PCM16/mu-law are exact numpy
      already; libsndfile would add nothing.
    * ``"auto"`` (default) — native when Pillow imports, else pure.

    ``imaging_module`` injects a PIL-shaped module (tests drive the
    native path with a shim built on the pure codecs; a real Pillow
    environment runs the same code against libjpeg/libpng)."""

    def __init__(
        self,
        fake: bool = False,
        feature_dim: int = 16,
        backend: str = "auto",
        imaging_module=None,
    ):
        self.fake = fake
        self.feature_dim = feature_dim
        self._imaging = None
        if not fake:
            if backend == "native":
                self._imaging = _NativeImaging(imaging_module)
            elif backend == "auto":
                try:
                    self._imaging = _NativeImaging(imaging_module)
                except ImportError:
                    self._imaging = None
            elif backend != "pure":
                raise ValueError(
                    f"unknown DecodeMedia backend {backend!r}: "
                    "expected 'auto', 'native' or 'pure'"
                )

    def _decode_real(self, payload: bytes, media_type: str):
        """Decode via the selected backend; see class docstring."""
        is_image = (
            payload[:2] in (b"P5", b"P6")
            or payload[:8] == _PNG_MAGIC
            or payload[:2] == b"\xff\xd8"
            or payload[:6] in (b"GIF87a", b"GIF89a")
            or payload[:2] == b"BM"
        )
        if is_image and self._imaging is not None:
            return self._decode_native_image(payload)
        if payload[:2] in (b"P5", b"P6"):
            return self._decode_pnm(payload)
        if payload[:8] == _PNG_MAGIC:
            return self._decode_png(payload)
        if payload[:2] == b"\xff\xd8":
            return self._decode_jpeg(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return self._decode_gif(payload)
        if payload[:2] == b"BM":
            return self._decode_bmp(payload)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return self._decode_wav(payload)
        raise ValueError(
            f"cannot decode media payload with magic {payload[:4]!r}: "
            "binary PGM/PPM, PNG, baseline+progressive JPEG, GIF, BMP and "
            "PCM16/mu-law WAV decode without external libraries in this "
            "environment; route other codecs (MP3/H.264) through a real "
            "codec build of _decode_real"
        )

    def _decode_native_image(self, payload: bytes):
        """Native (Pillow) image decode, mirroring each format's gray
        convention so lossless-format features equal the pure backend's
        bit for bit: PNG excludes alpha from the mean; PNM/JPEG/GIF/BMP
        mean over all decoded channels (palette modes convert to RGB,
        matching the pure decoders' palette expansion)."""
        arr, n_frames = self._imaging.decode_first_frame(payload)
        if payload[:8] == _PNG_MAGIC:
            color_ch = {1: 1, 2: 1, 3: 3, 4: 3}[arr.shape[2]]
            gray = arr[:, :, :color_ch].astype(np.float32).mean(axis=2)
        else:
            gray = arr.astype(np.float32).mean(axis=2)
        if payload[:6] not in (b"GIF87a", b"GIF89a"):
            n_frames = 1  # stills: Pillow may expose APNG-style frames
        h, w = gray.shape
        return w, h, n_frames, self._pooled_grid(gray)

    def _decode_jpeg(self, payload: bytes):
        from .jpegcodec import decode_jpeg

        px = decode_jpeg(payload)  # (h, w, 1|3) uint8
        gray = px.astype(np.float32).mean(axis=2)
        h, w = gray.shape
        return w, h, 1, self._pooled_grid(gray)

    def _decode_bmp(self, payload: bytes):
        px = decode_bmp(payload)
        gray = px.astype(np.float32).mean(axis=2)
        h, w = gray.shape
        return w, h, 1, self._pooled_grid(gray)

    def _decode_gif(self, payload: bytes):
        """GIF: n_frames = image-block count (the real multi-frame payload
        for the video media type); feature from the FIRST frame."""
        from .gifcodec import decode_gif

        frames, n_frames = decode_gif(payload)
        gray = frames[0].astype(np.float32).mean(axis=2)
        h, w = gray.shape
        return w, h, n_frames, self._pooled_grid(gray)

    def _decode_png(self, payload: bytes):
        rgba = decode_png(payload)
        # gray like _decode_pnm: unweighted mean over COLOR channels
        # (alpha excluded — it is opacity, not intensity)
        color_ch = {1: 1, 2: 1, 3: 3, 4: 3}[rgba.shape[2]]
        gray = rgba[:, :, :color_ch].astype(np.float32).mean(axis=2)
        h, w = gray.shape
        return w, h, 1, self._pooled_grid(gray)

    def _pooled_grid(self, gray: np.ndarray) -> np.ndarray:
        """4x4 grid of mean intensities in [0,1] -> 16-dim feature (padded/
        truncated to feature_dim)."""
        h, w = gray.shape
        ys = np.linspace(0, h, 5).astype(int)
        xs = np.linspace(0, w, 5).astype(int)
        feat = np.empty(16, dtype=np.float32)
        k = 0
        for i in range(4):
            for j in range(4):
                cell = gray[ys[i]: max(ys[i + 1], ys[i] + 1),
                            xs[j]: max(xs[j + 1], xs[j] + 1)]
                feat[k] = float(cell.mean()) / 255.0
                k += 1
        out = np.zeros(self.feature_dim, dtype=np.float32)
        out[: min(16, self.feature_dim)] = feat[: self.feature_dim]
        return out

    def _decode_pnm(self, payload: bytes):
        gray = decode_pnm_gray(payload)
        h, w = gray.shape
        return w, h, 1, self._pooled_grid(gray)

    def _decode_wav(self, payload: bytes):
        """PCM16 WAV: walk RIFF chunks for fmt/data; n_frames = samples per
        channel; (width, height) carry (channels, sample_rate); feature =
        RMS energy of 16 equal segments, normalized to [0,1]."""
        pos, n = 12, len(payload)
        channels = rate = bits = fmt_code = None
        data = None
        while pos + 8 <= n:
            cid = payload[pos: pos + 4]
            size = int.from_bytes(payload[pos + 4: pos + 8], "little")
            body = payload[pos + 8: pos + 8 + size]
            if cid == b"fmt ":
                fmt_code = int.from_bytes(body[0:2], "little")
                channels = int.from_bytes(body[2:4], "little")
                rate = int.from_bytes(body[4:8], "little")
                bits = int.from_bytes(body[14:16], "little")
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if channels is None or data is None:
            raise ValueError("WAV payload missing fmt/data chunks")
        if fmt_code == 7:
            # G.711 mu-law (WAVE_FORMAT_MULAW): 8-bit companded samples —
            # the expansion formula is pure arithmetic, decoded exactly
            if bits != 8:
                raise ValueError(f"mu-law WAV must be 8-bit, got {bits}-bit")
            samples = _mulaw_expand(np.frombuffer(data, dtype=np.uint8))
        elif fmt_code != 1:
            # ADPCM/extensible/etc. data would silently misdecode as PCM
            raise ValueError(
                f"only WAVE_FORMAT_PCM (1) and MULAW (7) supported, got format {fmt_code}"
            )
        elif bits != 16:
            raise ValueError(f"only PCM16 WAV supported, got {bits}-bit")
        else:
            samples = np.frombuffer(data, dtype="<i2")
        frames = len(samples) // channels
        mono = (
            samples[: frames * channels]
            .reshape(frames, channels)
            .astype(np.float32)
            .mean(axis=1)
        )
        seg = np.array_split(mono, 16) if frames else [np.zeros(1, np.float32)] * 16
        feat16 = np.array(
            [float(np.sqrt(np.mean(s * s))) / 32768.0 if len(s) else 0.0 for s in seg],
            dtype=np.float32,
        )
        out = np.zeros(self.feature_dim, dtype=np.float32)
        out[: min(16, self.feature_dim)] = feat16[: self.feature_dim]
        return channels, rate, frames, out

    def _decode_fake(self, payload: bytes, media_type: str):
        h = hashlib.blake2b(payload, digest_size=16).digest()
        rng = np.random.default_rng(np.frombuffer(h, dtype=np.uint32))
        w = int(rng.integers(64, 1920))
        ht = int(rng.integers(64, 1080))
        frames = 1 if media_type == "image" else int(rng.integers(2, 64))
        feat = rng.standard_normal(self.feature_dim).astype(np.float32)
        return w, ht, frames, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = self._decode_fake if self.fake else self._decode_real
        widths, heights, frames, feats = [], [], [], []
        for payload, mtype in zip(
            batch.column("payload").to_pylist(), batch.column("media_type").to_pylist()
        ):
            w, h, f, feat = decode(payload, mtype)
            widths.append(w)
            heights.append(h)
            frames.append(f)
            feats.append(feat)
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("media_ref"),
                batch.column("media_type"),
                pa.array(widths, pa.int32()),
                pa.array(heights, pa.int32()),
                pa.array(frames, pa.int32()),
                pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            ],
            schema=DECODED_SCHEMA,
        )


class ResizeImages:
    """Resize stage stub: recomputes target dims (aspect-preserving); the
    pixel work is the stubbed part."""

    def __init__(self, max_side: int = 512):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w = batch.column("width").to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch.column("height").to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        return batch.append_column(
            "resized_width", pa.array((w * scale).round().astype(np.int32))
        ).append_column("resized_height", pa.array((h * scale).round().astype(np.int32)))


class SampleFrames:
    """Frame-sampling stage stub: deterministic uniform frame indices."""

    def __init__(self, n_samples: int = 8):
        self.n = n_samples

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx_lists = []
        for nf in batch.column("n_frames").to_pylist():
            if nf <= self.n:
                idx_lists.append(list(range(nf)))
            else:
                idx_lists.append(np.linspace(0, nf - 1, self.n).astype(int).tolist())
        return batch.append_column("frame_indices", pa.array(idx_lists, pa.list_(pa.int32())))


def decode_pipeline(
    media_ds,
    fake: bool = True,
    concurrency=(1, 4),
    batch_size: int = 16,
    backend: str = "auto",
    imaging_module=None,
):
    """media table -> decoded features -> resize -> frame samples."""
    out = media_ds.map_batches(
        DecodeMedia,
        fn_constructor_kwargs={
            "fake": fake,
            "backend": backend,
            "imaging_module": imaging_module,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    out = out.map_batches(
        ResizeImages, batch_format="pyarrow", batch_size=256, concurrency=concurrency
    )
    return out.map_batches(
        SampleFrames, batch_format="pyarrow", batch_size=256, concurrency=concurrency
    )
