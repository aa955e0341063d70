"""Pure-python GIF (87a/89a) codec — no external libraries.

GIF is LZW over palette indices: LOSSLESS, so unlike JPEG the round-trip
is exact and the decoder gets equality tests, not tolerances. Decoder
covers global/local color tables, multiple image blocks (animation —
the real multi-frame payload for the ``video`` media type), Adam-style
row interlace, variable code sizes and the 4096-entry table reset;
extensions (GCE/comments/app) are skipped — transparency composites as
the palette color, which is the right call for feature extraction.
The companion grayscale :func:`encode_gif` (256-level gray ramp palette)
gives fixtures/tests genuinely LZW-coded payloads.
"""

from __future__ import annotations

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytearray:
    """Fast LZW decode. Two ideas over the per-byte reference walk
    (:func:`_lzw_decode_scalar`, kept as the tests' twin):

    1. The LSB-first bitstream unpacks to a numpy bit array ONCE and code
       fields extract in vectorized chunks sized to the next deterministic
       width-change boundary ((1 << code_size) - table_len), so a chunk
       never spans a width change; only clear/EOI codes — unpredictable
       by position — cut a chunk short.
    2. The string table is stored as (offset, length) SLICES INTO THE
       OUTPUT buffer: every new LZW entry is prev + first_char(entry),
       which is exactly the contiguous bytes the decoder just wrote at
       out[outlen - len(prev) : outlen + 1]. Table growth is two int
       appends; emission is one C-level bytearray slice copy — no Python
       per-pixel work and no string building at all."""
    clear = 1 << min_code_size
    eoi = clear + 1
    first_dyn = clear + 2  # first dynamically assigned code
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), bitorder="little")
    nbits = len(bits)
    out = bytearray()
    outlen = 0
    started = False  # initial clear code seen
    cs = min_code_size + 1
    n = first_dyn  # table size (including root + clear/eoi pseudo-entries)
    offs: list = []  # per dynamic code: offset of its string in `out`
    lens: list = []  # per dynamic code: its length
    prev_len = 0  # 0 <=> no previous emission (right after clear)
    p = 0
    while p + cs <= nbits and outlen < n_pixels:
        chunk_cs = cs
        if not started:
            k = 1  # must read the initial clear code alone
        else:
            # codes until the width grows; at cs == 12 the table freezes
            k = ((1 << cs) - n) if cs < 12 else 4096
            k = max(k, 1)
        k = min(k, (nbits - p) // chunk_cs, n_pixels - outlen + 1)
        if k <= 0:
            break
        window = bits[p : p + k * chunk_cs].reshape(k, chunk_cs).astype(np.uint32)
        codes = (window << np.arange(chunk_cs, dtype=np.uint32)).sum(axis=1).tolist()
        consumed = k
        limit = (1 << cs) if cs < 12 else 0  # 0: table frozen, no width check
        offs_append = offs.append
        lens_append = lens.append
        for j, code in enumerate(codes):
            # branch order: root and dynamic codes are the hot cases;
            # clear/EOI live between them (clear <= code < first_dyn)
            if code < clear:
                # root (single-byte) code; its byte IS the code
                if not started:
                    raise ValueError("GIF LZW stream missing initial clear code")
                if prev_len:
                    # register prev + first_char(entry): contiguous in
                    # `out` once this emission's first byte lands
                    offs_append(outlen - prev_len)
                    lens_append(prev_len + 1)
                    n += 1
                out.append(code)
                prev_len = 1
                outlen += 1
            elif code >= first_dyn:
                if code < n:
                    e_off = offs[code - first_dyn]
                    e_len = lens[code - first_dyn]
                    if prev_len:
                        offs_append(outlen - prev_len)
                        lens_append(prev_len + 1)
                        n += 1
                    out += out[e_off : e_off + e_len]
                elif code == n and prev_len:
                    # the K+1 case: entry = prev + prev[0]
                    e_len = prev_len + 1
                    po = outlen - prev_len
                    offs_append(po)
                    lens_append(e_len)
                    n += 1
                    out += out[po:outlen]
                    out.append(out[po])
                else:
                    raise ValueError("corrupt GIF LZW code")
                prev_len = e_len
                outlen += e_len
            elif code == clear:
                started = True
                cs = min_code_size + 1
                n = first_dyn
                offs.clear()
                lens.clear()
                prev_len = 0
                consumed = j + 1  # re-chunk at the (possibly new) width
                break
            else:  # EOI
                return out
            if outlen >= n_pixels:
                return out
            if n == limit:
                cs += 1
                consumed = j + 1  # chunk was sized to end exactly here
                break
        p += consumed * chunk_cs
    return out


def _lzw_decode_scalar(min_code_size: int, data: bytes, n_pixels: int) -> list:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = []
    table = None
    code_size = prev = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while True:
            if table is None:
                need = min_code_size + 1
            else:
                need = code_size
            if nbits < need:
                break
            code = acc & ((1 << need) - 1)
            acc >>= need
            nbits -= need
            if code == clear:
                table = [[i] for i in range(clear)] + [None, None]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if table is None:
                raise ValueError("GIF LZW stream missing initial clear code")
            if prev is None:
                out.extend(table[code])
                prev = code
                continue
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = table[prev] + [table[prev][0]]
            else:
                raise ValueError("corrupt GIF LZW code")
            out.extend(entry)
            table.append(table[prev] + [entry[0]])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
            prev = code
            if len(out) >= n_pixels:
                return out
    return out


_DEINTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes):
    """GIF -> (frames: uint8 (n, h, w, 3), n_frames). Lossless palette
    lookup; frames composited onto the logical screen (disposal ignored:
    each frame replaces its own rectangle on the previous canvas)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:, :] = gct[payload[11] % len(gct)]
    frames = []
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
        x0 = int.from_bytes(payload[pos + 1 : pos + 3], "little")
        y0 = int.from_bytes(payload[pos + 3 : pos + 5], "little")
        fw = int.from_bytes(payload[pos + 5 : pos + 7], "little")
        fh = int.from_bytes(payload[pos + 7 : pos + 9], "little")
        lflags = payload[pos + 9]
        pos += 10
        ct = gct
        if lflags & 0x80:
            n = 2 << (lflags & 7)
            ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF frame has no color table")
        mcs = payload[pos]
        pos += 1
        chunks = []
        while payload[pos] != 0:
            ln = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(mcs, b"".join(chunks), fw * fh)
        if len(idx) < fw * fh:
            raise ValueError("GIF frame pixel data truncated")
        arr = (
            np.frombuffer(bytes(idx[: fw * fh]), dtype=np.uint8)
            .astype(np.int32)
            .reshape(fh, fw)
        )
        if lflags & 0x40:  # interlaced: reorder rows (one fancy-index scatter)
            order = np.concatenate(
                [np.arange(start, fh, step) for start, step in _DEINTERLACE]
            )
            de = np.empty_like(arr)
            de[order] = arr
            arr = de
        canvas[y0 : y0 + fh, x0 : x0 + fw] = ct[arr % len(ct)]
        frames.append(canvas.copy())
    if not frames:
        raise ValueError("GIF payload has no image blocks")
    return np.stack(frames), len(frames)


def _lzw_encode(min_code_size: int, indices) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    codes = []
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    codes.append((clear, code_size))
    cur = ()
    for px in indices:
        cand = cur + (px,)
        if cand in table:
            cur = cand
            continue
        codes.append((table[cur], code_size))
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            codes.append((clear, code_size))
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        cur = (px,)
    if cur:
        codes.append((table[cur], code_size))
    codes.append((eoi, code_size))
    acc = nbits = 0
    out = bytearray()
    for code, cs in codes:
        acc |= code << nbits
        nbits += cs
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(frames: np.ndarray) -> bytes:
    """Grayscale GIF87a writer: frames (n, h, w) or (h, w) uint8; the
    palette is the 256-level gray ramp, so encode/decode is LOSSLESS."""
    if frames.ndim == 2:
        frames = frames[None]
    n, h, w = frames.shape
    out = bytearray(b"GIF87a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | 0x07, 0, 0])  # GCT present, 256 entries
    for i in range(256):
        out += bytes([i, i, i])
    for f in frames:
        out += b"\x2c" + b"\x00\x00\x00\x00" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
        out += bytes([8])  # LZW min code size
        data = _lzw_encode(8, f.reshape(-1).tolist())
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def _selfcheck():  # pragma: no cover - manual smoke entry
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    frames, n = decode_gif(encode_gif(img))
    assert n == 1 and frames.shape == (1, 13, 21, 3)
    assert np.array_equal(frames[0, :, :, 0], img), "gray round-trip"
    assert np.array_equal(frames[0, :, :, 1], img)
    # multi-frame
    clip = rng.integers(0, 256, size=(5, 9, 16), dtype=np.uint8)
    frames, n = decode_gif(encode_gif(clip))
    assert n == 5
    for k in range(5):
        assert np.array_equal(frames[k, :, :, 0], clip[k]), k
    # big image to exercise code-size growth + table reset (>4096 entries)
    big = rng.integers(0, 256, size=(80, 120), dtype=np.uint8)
    frames, n = decode_gif(encode_gif(big))
    assert np.array_equal(frames[0, :, :, 0], big), "big round-trip"
    print("ALL OK")
