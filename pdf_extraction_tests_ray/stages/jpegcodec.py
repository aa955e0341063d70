"""Pure-numpy JPEG (JFIF) codec — no external libraries.

JPEG is Huffman entropy coding + zigzag + uniform quantization + the 8x8
type-II DCT + (for color) YCbCr with optional 2x2 chroma subsampling:
all of it is arithmetic numpy covers, so — like PNG (media.decode_png) —
the repo decodes it for real rather than env-gating it. Scope: 8-bit
baseline sequential (SOF0) AND progressive (SOF2: spectral selection +
successive approximation, all four scan kinds of ITU-T81 G.2, EOB runs,
restart intervals), grayscale and YCbCr 4:4:4 / 4:2:0, 0xFF00 byte
unstuffing. Arithmetic coding, lossless (SOF3), 12-bit precision and
16-bit quant tables raise with a named error.

The companion encoders :func:`encode_jpeg` (standard ITU-T81 Annex K
tables, ~Q50) and :func:`encode_jpeg_progressive` (6-scan script over the
SAME quantized coefficients) exist so fixtures/tests have genuinely
entropy-coded payloads; tests pin the decoder BIT-EXACTLY against an
independent numpy recompute of dequant+IDCT from the encoder's own
quantized coefficients (the lossless half of the codec), pin progressive
== baseline decode, plus tolerance round-trips for the lossy half.

Decode is vectorized everywhere the format allows: the entropy stream is
unstuffed/segmented with numpy up front, Huffman symbols resolve through a
16-bit-peek lookup table over a precomputed 32-bit sliding-window list
(one list index + shift + mask per symbol, no per-bit reads), and ALL
per-block numpy work (de-zigzag, dequant, IDCT, plane scatter) happens
once per component over a (nblocks, 8, 8) stack after the — inherently
sequential — symbol walk. Only the symbol walk itself remains a Python
loop, at a handful of local-variable ops per coefficient.
"""

from __future__ import annotations

import numpy as np

# ---- shared tables -------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int32)

# ITU-T81 Annex K quant tables (luma, chroma)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68,109,103, 77,
    24, 35, 55, 64, 81,104,113, 92,
    49, 64, 78, 87,103,121,120,101,
    72, 92, 95, 98,112,100,103, 99], dtype=np.int32)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# Annex K Huffman specs: (bits[1..16], values)
HUFF_DC_LUMA = ([0,1,5,1,1,1,1,1,1,0,0,0,0,0,0,0], list(range(12)))
HUFF_DC_CHROMA = ([0,3,1,1,1,1,1,1,1,1,1,0,0,0,0,0], list(range(12)))
HUFF_AC_LUMA = (
    [0,2,1,3,3,2,4,3,5,5,4,4,0,0,1,0x7D],
    [0x01,0x02,0x03,0x00,0x04,0x11,0x05,0x12,0x21,0x31,0x41,0x06,0x13,0x51,0x61,
     0x07,0x22,0x71,0x14,0x32,0x81,0x91,0xA1,0x08,0x23,0x42,0xB1,0xC1,0x15,0x52,
     0xD1,0xF0,0x24,0x33,0x62,0x72,0x82,0x09,0x0A,0x16,0x17,0x18,0x19,0x1A,0x25,
     0x26,0x27,0x28,0x29,0x2A,0x34,0x35,0x36,0x37,0x38,0x39,0x3A,0x43,0x44,0x45,
     0x46,0x47,0x48,0x49,0x4A,0x53,0x54,0x55,0x56,0x57,0x58,0x59,0x5A,0x63,0x64,
     0x65,0x66,0x67,0x68,0x69,0x6A,0x73,0x74,0x75,0x76,0x77,0x78,0x79,0x7A,0x83,
     0x84,0x85,0x86,0x87,0x88,0x89,0x8A,0x92,0x93,0x94,0x95,0x96,0x97,0x98,0x99,
     0x9A,0xA2,0xA3,0xA4,0xA5,0xA6,0xA7,0xA8,0xA9,0xAA,0xB2,0xB3,0xB4,0xB5,0xB6,
     0xB7,0xB8,0xB9,0xBA,0xC2,0xC3,0xC4,0xC5,0xC6,0xC7,0xC8,0xC9,0xCA,0xD2,0xD3,
     0xD4,0xD5,0xD6,0xD7,0xD8,0xD9,0xDA,0xE1,0xE2,0xE3,0xE4,0xE5,0xE6,0xE7,0xE8,
     0xE9,0xEA,0xF1,0xF2,0xF3,0xF4,0xF5,0xF6,0xF7,0xF8,0xF9,0xFA],
)
HUFF_AC_CHROMA = (
    [0,2,1,2,4,4,3,4,7,5,4,4,0,1,2,0x77],
    [0x00,0x01,0x02,0x03,0x11,0x04,0x05,0x21,0x31,0x06,0x12,0x41,0x51,0x07,0x61,
     0x71,0x13,0x22,0x32,0x81,0x08,0x14,0x42,0x91,0xA1,0xB1,0xC1,0x09,0x23,0x33,
     0x52,0xF0,0x15,0x62,0x72,0xD1,0x0A,0x16,0x24,0x34,0xE1,0x25,0xF1,0x17,0x18,
     0x19,0x1A,0x26,0x27,0x28,0x29,0x2A,0x35,0x36,0x37,0x38,0x39,0x3A,0x43,0x44,
     0x45,0x46,0x47,0x48,0x49,0x4A,0x53,0x54,0x55,0x56,0x57,0x58,0x59,0x5A,0x63,
     0x64,0x65,0x66,0x67,0x68,0x69,0x6A,0x73,0x74,0x75,0x76,0x77,0x78,0x79,0x7A,
     0x82,0x83,0x84,0x85,0x86,0x87,0x88,0x89,0x8A,0x92,0x93,0x94,0x95,0x96,0x97,
     0x98,0x99,0x9A,0xA2,0xA3,0xA4,0xA5,0xA6,0xA7,0xA8,0xA9,0xAA,0xB2,0xB3,0xB4,
     0xB5,0xB6,0xB7,0xB8,0xB9,0xBA,0xC2,0xC3,0xC4,0xC5,0xC6,0xC7,0xC8,0xC9,0xCA,
     0xD2,0xD3,0xD4,0xD5,0xD6,0xD7,0xD8,0xD9,0xDA,0xE2,0xE3,0xE4,0xE5,0xE6,0xE7,
     0xE8,0xE9,0xEA,0xF2,0xF3,0xF4,0xF5,0xF6,0xF7,0xF8,0xF9,0xFA],
)


def _dct_matrix():
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m = c * np.sqrt(2 / 8)
    m[0] /= np.sqrt(2)
    return m  # forward: M @ block @ M.T


_DCTM = _dct_matrix()


def idct8x8(coef: np.ndarray) -> np.ndarray:
    return _DCTM.T @ coef @ _DCTM


def dct8x8(block: np.ndarray) -> np.ndarray:
    return _DCTM @ block @ _DCTM.T


# ---- Huffman helpers -----------------------------------------------------


def _build_decode_table(bits, values):
    """code (int, length) -> value, via canonical Huffman assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, values):
    dec = _build_decode_table(bits, values)
    return {v: (ln, code) for (ln, code), v in dec.items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing
    and RSTn awareness."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 2
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
                # marker (RST or EOI): stop feeding real bits
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self):
        """Skip to just after the next RST marker (restart interval)."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _decode_huff(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---- fast entropy-decode machinery ----------------------------------------

_LUT_CACHE: dict = {}


def _build_decode_lut(bits, values) -> list:
    """16-bit-peek Huffman LUT: lut[next16bits] = (value << 5) | codelen.

    Baseline codes are <= 16 bits, so one peek fully resolves any symbol;
    entries reachable by no code stay 0 (codelen 0 == invalid stream).
    Returned as a plain Python list — CPython list indexing is several
    times faster than numpy scalar extraction in the symbol loop."""
    key = (tuple(bits), tuple(values))
    got = _LUT_CACHE.get(key)
    if got is not None:
        return got
    lut = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            lut[lo : lo + (1 << (16 - length))] = (values[k] << 5) | length
            code += 1
            k += 1
        code <<= 1
    out = lut.tolist()
    _LUT_CACHE[key] = out
    return out


def _entropy_segments(data: bytes) -> list:
    """Split scan data at RSTn markers and unstuff 0xFF00 -> 0xFF, all via
    numpy over the marker positions (0xFF bytes are rare — ~0.4% of an
    entropy stream — so the per-marker Python loop is off the hot path).
    Returns a list of np.uint8 arrays, one per restart segment, with the
    trailing EOI (and anything after it) dropped."""
    arr = np.frombuffer(data, dtype=np.uint8)
    n = len(arr)
    ffs = np.flatnonzero(arr == 0xFF)
    segs = []
    parts = []
    start = 0  # next unconsumed byte
    end = n
    for f in ffs.tolist():
        if f < start:
            continue  # already consumed (e.g. the 0x00 of a stuffing pair)
        if f + 1 >= n:
            end = f  # dangling 0xFF at the very end: not real data
            break
        nxt = arr[f + 1]
        if nxt == 0x00:  # stuffed data byte: keep the 0xFF, drop the 0x00
            parts.append(arr[start : f + 1])
            start = f + 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker: close the segment
            parts.append(arr[start:f])
            segs.append(np.concatenate(parts) if len(parts) != 1 else parts[0])
            parts = []
            start = f + 2
        else:  # any other marker (EOI / next-scan SOS / DHT...): scan ends
            end = f
            break
    parts.append(arr[start:end])
    segs.append(np.concatenate(parts) if len(parts) != 1 else parts[0])
    return segs


def _segment_words(seg: np.ndarray) -> list:
    """Per-BYTE-offset big-endian 32-bit windows over the segment (zero
    padded), as a Python list: peeking any <=16-bit field at bit position
    p is ``(words[p >> 3] >> (shift - (p & 7))) & mask`` — no per-bit
    reads, no numpy scalar overhead in the symbol loop."""
    padded = np.concatenate([seg, np.zeros(8, dtype=np.uint8)]).astype(np.uint32)
    w = (padded[:-3] << 24) | (padded[1:-2] << 16) | (padded[2:-1] << 8) | padded[3:]
    return w.tolist()


# ---- decoder -------------------------------------------------------------


def _ecs_end(payload: bytes, start: int) -> int:
    """First byte index at/after ``start`` holding a REAL marker (0xFF
    followed by anything but 0x00 stuffing or RSTn) — the end of an
    entropy-coded segment in a multi-scan (progressive) stream."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    n = len(arr)
    for f in (np.flatnonzero(arr[start:] == 0xFF) + start).tolist():
        if f + 1 >= n:
            return n
        nxt = arr[f + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            continue
        return f
    return n


def decode_jpeg(payload: bytes, scan_impl=None) -> np.ndarray:
    """Decode a baseline (SOF0) or progressive (SOF2) JFIF payload to
    (h, w, 1|3) uint8. ``scan_impl`` lets tests route a baseline payload
    through :func:`_decode_scan_scalar`, the independent reference twin
    the default fast path is pinned bit-identical to."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt = {}
    huff_dc, huff_ac = {}, {}
    frame = None
    progressive = False
    restart_interval = 0
    prog_scans = []  # (scan comps, Ss, Se, Ah, Al, restart_interval, ecs bytes)
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue
        size = int.from_bytes(payload[pos : pos + 2], "big")
        body = payload[pos + 2 : pos + size]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tab = np.zeros(64, dtype=np.int32)
                tab[ZIGZAG] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                qt[tq] = tab.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(body[i + 17 : i + 17 + cnt])
                # keep the raw spec: the fast path builds a 16-bit LUT,
                # the scalar reference twin builds a (length, code) dict
                (huff_dc if tc == 0 else huff_ac)[th] = (bits, vals)
                i += 17 + cnt
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = body[0], int.from_bytes(body[1:3], "big"), int.from_bytes(body[3:5], "big"), body[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0) and progressive (SOF2) JPEG supported")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan.append({"cs": cs, "td": tt >> 4, "ta": tt & 0xF})
            ecs_start = pos + size
            if not progressive:
                return (scan_impl or _decode_scan)(
                    payload[ecs_start:], frame, scan, qt, huff_dc, huff_ac, restart_interval
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            end = _ecs_end(payload, ecs_start)
            # snapshot the table SPECS now: later DHT segments may redefine ids
            for s in scan:
                s["dc_spec"] = huff_dc.get(s["td"]) if ss == 0 and (ahal >> 4) == 0 else None
                s["ac_spec"] = huff_ac.get(s["ta"]) if ss > 0 else None
            prog_scans.append(
                (scan, ss, se, ahal >> 4, ahal & 0xF, restart_interval, payload[ecs_start:end])
            )
            pos = end - size  # `pos += size` below lands exactly on the marker
        pos += size
    if progressive and prog_scans:
        return _decode_progressive(frame, prog_scans, qt)
    raise ValueError("JPEG payload has no SOS scan")


def _finish_planes(out_planes, ncomp):
    """Shared colorspace tail: gray passthrough or YCbCr -> RGB."""
    if ncomp == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_scan(data, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    """Fast scan decode: sequential symbol walk over precomputed 32-bit
    windows + 16-bit-peek Huffman LUTs; everything per-block (de-zigzag,
    dequant, IDCT, plane scatter) vectorized per component afterwards.
    Bit-identical to :func:`_decode_scan_scalar` (pinned in tests)."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    nmcu = mcux * mcuy
    ncomp = len(comps)
    by_id = {s["cs"]: s for s in scan}

    # per-MCU block schedule: component index repeated v*h times, with the
    # component's DC/AC LUTs resolved once
    dluts, aluts = [], []
    sched = []
    for ci, c in enumerate(comps):
        s = by_id[c["id"]]
        dluts.append(_build_decode_lut(*huff_dc[s["td"]]))
        aluts.append(_build_decode_lut(*huff_ac[s["ta"]]))
        sched.extend([ci] * (c["v"] * c["h"]))

    dc_lists = [[] for _ in range(ncomp)]  # absolute DC per block
    pos_lists = [[] for _ in range(ncomp)]  # block_idx*64 + zigzag index
    val_lists = [[] for _ in range(ncomp)]
    blkcnt = [0] * ncomp

    segs = _entropy_segments(data)
    words = _segment_words(segs[0])
    seg_i = 0
    p = 0  # bit position within the current segment
    pred = [0] * ncomp
    try:
        for mcu in range(nmcu):
            if restart_interval and mcu and mcu % restart_interval == 0:
                seg_i += 1
                words = _segment_words(segs[seg_i])
                p = 0
                pred = [0] * ncomp
            for ci in sched:
                dlut = dluts[ci]
                # DC: one 16-bit peek resolves the size symbol
                e = dlut[(words[p >> 3] >> (16 - (p & 7))) & 0xFFFF]
                ln = e & 31
                if ln == 0:
                    raise ValueError("invalid JPEG Huffman code")
                t = e >> 5
                p += ln
                if t:
                    v = (words[p >> 3] >> (32 - (p & 7) - t)) & ((1 << t) - 1)
                    p += t
                    if v < (1 << (t - 1)):
                        v += 1 - (1 << t)
                    pred[ci] += v
                dc_lists[ci].append(pred[ci])
                bi = blkcnt[ci]
                blkcnt[ci] = bi + 1
                base = bi << 6
                pl = pos_lists[ci]
                vl = val_lists[ci]
                alut = aluts[ci]
                k = 1
                while k < 64:
                    e = alut[(words[p >> 3] >> (16 - (p & 7))) & 0xFFFF]
                    ln = e & 31
                    if ln == 0:
                        raise ValueError("invalid JPEG Huffman code")
                    rs = e >> 5
                    p += ln
                    if rs == 0:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += rs >> 4
                    if k > 63:
                        raise ValueError("bad JPEG coefficient run")
                    sz = rs & 15
                    v = (words[p >> 3] >> (32 - (p & 7) - sz)) & ((1 << sz) - 1)
                    p += sz
                    if v < (1 << (sz - 1)):
                        v += 1 - (1 << sz)
                    pl.append(base + k)
                    vl.append(v)
                    k += 1
    except IndexError:
        raise ValueError("truncated JPEG scan") from None

    # vectorized per component: de-zigzag -> dequant -> IDCT -> scatter
    out_planes = []
    for ci, c in enumerate(comps):
        nb = blkcnt[ci]
        cf = np.zeros(nb * 64, dtype=np.float64)
        if pos_lists[ci]:
            cf[np.asarray(pos_lists[ci], dtype=np.int64)] = val_lists[ci]
        cf = cf.reshape(nb, 64)
        cf[:, 0] = dc_lists[ci]
        nat = np.zeros((nb, 64), dtype=np.float64)
        nat[:, ZIGZAG] = cf
        blocks = nat.reshape(nb, 8, 8) * qt[c["tq"]]
        px = _DCTM.T @ blocks @ _DCTM + 128.0
        cv, chh = c["v"], c["h"]
        plane = (
            px.reshape(mcuy, mcux, cv, chh, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcuy * cv * 8, mcux * chh * 8)
        )
        ry, rx = vmax // cv, hmax // chh
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])
    return _finish_planes(out_planes, ncomp)


def _decode_progressive(frame, scans, qt):
    """Progressive (SOF2) decode: every scan deposits into per-component
    zigzag coefficient arrays (Python lists in raster block order — list
    indexing beats numpy scalars in the sequential walk); dequant + IDCT +
    scatter run vectorized ONCE at the end over the final coefficients.
    Implements all four scan kinds of ITU-T81 G.2: DC first (interleaved
    or single), DC refine (raw bit per block), AC first (with EOB runs)
    and AC refine (correction bits + newly-significant +/-1<<Al), plus
    restart intervals via the shared segment machinery."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    ncomp = len(comps)
    cid2ci = {c["id"]: i for i, c in enumerate(comps)}
    bwp = [mcux * c["h"] for c in comps]  # padded blocks per plane row
    bhp = [mcuy * c["v"] for c in comps]
    # non-interleaved scans cover the UNPADDED component raster (T.81 A.2.2):
    # ceil(component_extent / 8) where extent = ceil(image_extent * samp / max)
    bw_u, bh_u = [], []
    for c in comps:
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        bw_u.append(-(-cw // 8))
        bh_u.append(-(-ch // 8))
    cf = [[0] * (bwp[i] * bhp[i] * 64) for i in range(ncomp)]

    try:
        for scan, ss, se, ah, al, dri, ecs in scans:
            segs = _entropy_segments(ecs)
            seg_i = 0
            words = _segment_words(segs[0])
            p = 0
            if ss == 0:  # ---- DC scan ----
                if se != 0:
                    raise ValueError("progressive DC scan must have Se == 0")
                members = [cid2ci[s["cs"]] for s in scan]
                dluts = {}
                if ah == 0:
                    for s in scan:
                        dluts[cid2ci[s["cs"]]] = _build_decode_lut(*s["dc_spec"])
                pred = [0] * ncomp
                interleaved = len(scan) > 1
                if interleaved:
                    units = mcuy * mcux
                else:
                    ci0 = members[0]
                    units = bh_u[ci0] * bw_u[ci0]
                for u in range(units):
                    if dri and u and u % dri == 0:
                        seg_i += 1
                        words = _segment_words(segs[seg_i])
                        p = 0
                        pred = [0] * ncomp
                    if interleaved:
                        my, mx = divmod(u, mcux)
                        blocks = []
                        for ci in members:
                            cv, chh = comps[ci]["v"], comps[ci]["h"]
                            for by in range(cv):
                                for bx in range(chh):
                                    blocks.append(
                                        (ci, ((my * cv + by) * bwp[ci] + mx * chh + bx) << 6)
                                    )
                    else:
                        ci0 = members[0]
                        by, bx = divmod(u, bw_u[ci0])
                        blocks = [(ci0, (by * bwp[ci0] + bx) << 6)]
                    for ci, base in blocks:
                        cfl = cf[ci]
                        if ah == 0:  # DC first
                            e = dluts[ci][(words[p >> 3] >> (16 - (p & 7))) & 0xFFFF]
                            ln = e & 31
                            if ln == 0:
                                raise ValueError("invalid JPEG Huffman code")
                            t = e >> 5
                            p += ln
                            if t:
                                v = (words[p >> 3] >> (32 - (p & 7) - t)) & ((1 << t) - 1)
                                p += t
                                if v < (1 << (t - 1)):
                                    v += 1 - (1 << t)
                                pred[ci] += v
                            cfl[base] = pred[ci] << al
                        else:  # DC refine: one raw bit
                            bit = (words[p >> 3] >> (31 - (p & 7))) & 1
                            p += 1
                            if bit:
                                cfl[base] |= 1 << al
            else:  # ---- AC scan: single component (T.81 B.2.3) ----
                if len(scan) != 1:
                    raise ValueError("progressive AC scan must be non-interleaved")
                ci = cid2ci[scan[0]["cs"]]
                alut = _build_decode_lut(*scan[0]["ac_spec"])
                cfl = cf[ci]
                bw0 = bw_u[ci]
                units = bh_u[ci] * bw0
                eobrun = 0
                p1 = 1 << al
                m1 = -p1
                for u in range(units):
                    if dri and u and u % dri == 0:
                        seg_i += 1
                        words = _segment_words(segs[seg_i])
                        p = 0
                        eobrun = 0
                    by, bx = divmod(u, bw0)
                    base = (by * bwp[ci] + bx) << 6
                    if ah == 0:  # AC first
                        if eobrun:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            e = alut[(words[p >> 3] >> (16 - (p & 7))) & 0xFFFF]
                            ln = e & 31
                            if ln == 0:
                                raise ValueError("invalid JPEG Huffman code")
                            rs = e >> 5
                            p += ln
                            r = rs >> 4
                            s = rs & 15
                            if s == 0:
                                if r != 15:  # EOBn
                                    eobrun = (1 << r) - 1
                                    if r:
                                        eobrun += (
                                            words[p >> 3] >> (32 - (p & 7) - r)
                                        ) & ((1 << r) - 1)
                                        p += r
                                    break
                                k += 16  # ZRL
                            else:
                                k += r
                                if k > se:
                                    raise ValueError("bad JPEG coefficient run")
                                v = (words[p >> 3] >> (32 - (p & 7) - s)) & ((1 << s) - 1)
                                p += s
                                if v < (1 << (s - 1)):
                                    v += 1 - (1 << s)
                                cfl[base + k] = v << al
                                k += 1
                    else:  # AC refine (ITU-T81 G.2 / Figure G.7 semantics)
                        k = ss
                        if eobrun == 0:
                            while k <= se:
                                e = alut[(words[p >> 3] >> (16 - (p & 7))) & 0xFFFF]
                                ln = e & 31
                                if ln == 0:
                                    raise ValueError("invalid JPEG Huffman code")
                                rs = e >> 5
                                p += ln
                                r = rs >> 4
                                s = rs & 15
                                if s:
                                    if s != 1:
                                        raise ValueError("bad AC refinement size")
                                    bit = (words[p >> 3] >> (31 - (p & 7))) & 1
                                    p += 1
                                    val = p1 if bit else m1
                                else:
                                    if r != 15:  # EOBn
                                        eobrun = 1 << r
                                        if r:
                                            eobrun += (
                                                words[p >> 3] >> (32 - (p & 7) - r)
                                            ) & ((1 << r) - 1)
                                            p += r
                                        break
                                    val = 0  # ZRL: pass 16 zero-history coefs
                                # advance over r zero-history coefficients,
                                # refining every nonzero coefficient passed
                                while k <= se:
                                    c = cfl[base + k]
                                    if c:
                                        bit = (words[p >> 3] >> (31 - (p & 7))) & 1
                                        p += 1
                                        if bit and not (c & p1):
                                            cfl[base + k] = c + (p1 if c >= 0 else m1)
                                    else:
                                        if r == 0:
                                            break
                                        r -= 1
                                    k += 1
                                if val and k <= se:
                                    cfl[base + k] = val
                                k += 1
                        if eobrun:
                            # EOB-run block: still refine its nonzero coefs
                            while k <= se:
                                c = cfl[base + k]
                                if c:
                                    bit = (words[p >> 3] >> (31 - (p & 7))) & 1
                                    p += 1
                                    if bit and not (c & p1):
                                        cfl[base + k] = c + (p1 if c >= 0 else m1)
                                k += 1
                            eobrun -= 1
    except IndexError:
        raise ValueError("truncated JPEG scan") from None

    out_planes = []
    for ci, c in enumerate(comps):
        nb = bwp[ci] * bhp[ci]
        cfarr = np.asarray(cf[ci], dtype=np.float64).reshape(nb, 64)
        nat = np.zeros((nb, 64), dtype=np.float64)
        nat[:, ZIGZAG] = cfarr
        blocks = nat.reshape(nb, 8, 8) * qt[c["tq"]]
        px = _DCTM.T @ blocks @ _DCTM + 128.0
        plane = (
            px.reshape(bhp[ci], bwp[ci], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bhp[ci] * 8, bwp[ci] * 8)
        )
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])
    return _finish_planes(out_planes, ncomp)


def _decode_scan_scalar(data, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    """Reference twin: the original per-bit/per-block walk. Kept (and
    exercised by tests) as an independent implementation the fast path is
    pinned bit-identical against."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    dc_tabs = {th: _build_decode_table(*bv) for th, bv in huff_dc.items()}
    ac_tabs = {th: _build_decode_table(*bv) for th, bv in huff_ac.items()}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    br = _BitReader(data)
    pred = [0] * len(comps)
    by_id = {s["cs"]: s for s in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_to_marker()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                s = by_id[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        t = _decode_huff(br, dc_tabs[s["td"]])
                        diff = _extend(br.read_bits(t), t)
                        pred[ci] += diff
                        coef = np.zeros(64, dtype=np.int32)
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, ac_tabs[s["ta"]])
                            r, sz = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r
                            coef[k] = _extend(br.read_bits(sz), sz)
                            k += 1
                        # de-zigzag then dequant in natural order
                        nat = np.zeros(64, dtype=np.float64)
                        nat[ZIGZAG] = coef
                        nat = nat.reshape(8, 8) * qt[c["tq"]]
                        px = idct8x8(nat) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    # upsample + crop
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    return _finish_planes(out_planes, len(comps))


# ---- encoder -------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1s


def _csize(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _encoder_planes(img: np.ndarray, subsample: bool):
    """Shared encoder front half: color transform, optional 4:2:0 chroma
    downsample, MCU padding. Returns (h, w, gray, samp, qts, padded,
    mcux, mcuy)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    gray = ch == 1
    img = img.astype(np.float64)
    if gray:
        planes = [img[:, :, 0]]
        samp = [(1, 1)]
        qts = [0]
    else:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            def ds(p):
                ph, pw = p.shape
                ph2, pw2 = (ph // 2) * 2, (pw // 2) * 2
                p2 = p[:ph2, :pw2]
                out = p2.reshape(ph2 // 2, 2, pw2 // 2, 2).mean(axis=(1, 3))
                # edge rows/cols if odd dims
                if ph % 2 or pw % 2:
                    oh, ow = -(-ph // 2), -(-pw // 2)
                    full = np.empty((oh, ow))
                    full[: out.shape[0], : out.shape[1]] = out
                    if pw % 2:
                        full[: out.shape[0], -1] = p[:ph2, -1].reshape(-1, 2).mean(axis=1)
                    if ph % 2:
                        full[-1, : out.shape[1]] = p[-1, :pw2].reshape(-1, 2).mean(axis=1)
                    if ph % 2 and pw % 2:
                        full[-1, -1] = p[-1, -1]
                    return full
                return out
            planes = [y, ds(cb), ds(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qts = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        pw, ph = mcux * 8 * sh, mcuy * 8 * sv
        pp = np.empty((ph, pw))
        ah, aw = min(p.shape[0], ph), min(p.shape[1], pw)
        pp[:ah, :aw] = p[:ah, :aw]
        if aw < pw:
            pp[:ah, aw:] = pp[:ah, aw - 1 : aw]
        if ah < ph:
            pp[ah:, :] = pp[ah - 1 : ah, :]
        padded.append(pp)
    return h, w, gray, samp, qts, padded, mcux, mcuy


def encode_jpeg(img: np.ndarray, subsample: bool = True, restart_interval: int = 0) -> bytes:
    """Baseline JFIF encoder: gray (h,w) or RGB (h,w,3); standard Annex K
    tables at quality ~50; 4:2:0 when subsample else 4:4:4."""
    h, w, gray, samp, qts, padded, mcux, mcuy = _encoder_planes(img, subsample)
    planes = padded
    qtabs = {0: QT_LUMA.reshape(8, 8), 1: QT_CHROMA.reshape(8, 8)}
    enc_dc = {0: _build_encode_table(*HUFF_DC_LUMA), 1: _build_encode_table(*HUFF_DC_CHROMA)}
    enc_ac = {0: _build_encode_table(*HUFF_AC_LUMA), 1: _build_encode_table(*HUFF_AC_CHROMA)}

    bw = _BitWriter()
    pred = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * len(planes)
            mcu_count += 1
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                tq = qts[ci]
                tdc, tac = (0, 0) if ci == 0 else ((1, 1) if not gray else (0, 0))
                for by in range(sv):
                    for bx in range(sh):
                        y0, x0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coef = dct8x8(block)
                        q = np.round(coef / qtabs[tq]).astype(np.int64)
                        zz = q.reshape(-1)[ZIGZAG]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        t = _csize(diff)
                        ln, code = enc_dc[tdc][t]
                        bw.write(code, ln)
                        if t:
                            v = diff if diff >= 0 else diff + (1 << t) - 1
                            bw.write(v & ((1 << t) - 1), t)
                        run = 0
                        last_nz = 0
                        for k in range(1, 64):
                            if zz[k]:
                                last_nz = k
                        for k in range(1, last_nz + 1):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run >= 16:
                                ln, code = enc_ac[tac][0xF0]
                                bw.write(code, ln)
                                run -= 16
                            sz = _csize(v)
                            ln, code = enc_ac[tac][(run << 4) | sz]
                            bw.write(code, ln)
                            vv = v if v >= 0 else v + (1 << sz) - 1
                            bw.write(vv & ((1 << sz) - 1), sz)
                            run = 0
                        if last_nz < 63:
                            ln, code = enc_ac[tac][0x00]
                            bw.write(code, ln)
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    for tq in sorted(set(qts)):
        zz = qtabs[tq].reshape(-1)[ZIGZAG].astype(np.uint8)
        out += seg(0xDB, bytes([tq]) + zz.tobytes())
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([len(planes)])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, qts[ci]])
    out += seg(0xC0, sof)
    specs = [(0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA)]
    if not gray:
        specs += [(0x01, HUFF_DC_CHROMA), (0x11, HUFF_AC_CHROMA)]
    for tcth, (bits, vals) in specs:
        out += seg(0xC4, bytes([tcth]) + bytes(bits) + bytes(vals))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---- progressive encoder ---------------------------------------------------

# Progressive AC scans need EOBn symbols (run<<4 | 0 for run 1..14) that the
# baseline Annex K AC tables deliberately omit, so progressive scans use a
# complete generic AC table instead: all 256 symbols, 128 at 8 bits + 128 at
# 9 bits (Kraft sum 0.75 — a valid canonical table; fixtures favor
# simplicity over compression).
HUFF_AC_PROG = ([0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0], list(range(256)))


def encode_jpeg_progressive(
    img: np.ndarray, subsample: bool = True, restart_interval: int = 0
) -> bytes:
    """Progressive (SOF2) JFIF encoder with BOTH spectral selection and
    successive approximation, so every decoder scan kind is exercised:

      1. DC first   (all comps, Ah=0 Al=1)   4. AC first  6-63, Al=1
      2. DC refine  (all comps, Ah=1 Al=0)   5. AC refine 1-5,  Ah=1 Al=0
      3. AC first   1-5,  Al=1               6. AC refine 6-63, Ah=1 Al=0
      (AC scans per component, non-interleaved as T.81 requires)

    Same quant tables and per-block quantized coefficients as
    :func:`encode_jpeg`, so a fully transmitted progressive payload decodes
    BIT-IDENTICALLY to its baseline sibling (pinned in tests). Follows the
    libjpeg encoding discipline for EOB runs and buffered correction bits
    (ITU-T81 G.1.2.2-G.1.2.3)."""
    h, w, gray, samp, qts, padded, mcux, mcuy = _encoder_planes(img, subsample)
    qtabs = {0: QT_LUMA.reshape(8, 8), 1: QT_CHROMA.reshape(8, 8)}
    ncomp = len(padded)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    # quantized coefficients per component: (nbh*nbw, 64) zigzag order,
    # PLANE RASTER block order; per-block DCT exactly as the baseline
    # encoder computes it, so both encoders quantize identically
    zz, bwp, bhp, bw_u, bh_u = [], [], [], [], []
    for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
        nbh, nbw = p.shape[0] // 8, p.shape[1] // 8
        qt = qtabs[qts[ci]]
        arr = np.empty((nbh * nbw, 64), dtype=np.int64)
        for by in range(nbh):
            for bx in range(nbw):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                q = np.round(dct8x8(block) / qt).astype(np.int64)
                arr[by * nbw + bx] = q.reshape(-1)[ZIGZAG]
        zz.append(arr)
        bwp.append(nbw)
        bhp.append(nbh)
        cw = -(-(w * sh) // hmax)
        ch2 = -(-(h * sv) // vmax)
        bw_u.append(-(-cw // 8))
        bh_u.append(-(-ch2 // 8))

    enc_dc = {0: _build_encode_table(*HUFF_DC_LUMA), 1: _build_encode_table(*HUFF_DC_CHROMA)}
    enc_ac_prog = _build_encode_table(*HUFF_AC_PROG)

    rst_state = [0]  # RSTn modulo counter, shared across a scan

    def emit_restart(bw) -> None:
        bw.flush()
        bw.out += bytes([0xFF, 0xD0 + rst_state[0]])
        rst_state[0] = (rst_state[0] + 1) % 8

    def dc_scan(al: int, refine: bool) -> bytes:
        bw = _BitWriter()
        rst_state[0] = 0
        pred = [0] * ncomp
        if ncomp > 1:  # interleaved over MCUs: one restart unit per MCU
            units = []
            for my in range(mcuy):
                for mx in range(mcux):
                    blocks = []
                    for ci, (sh, sv) in enumerate(samp):
                        for by in range(sv):
                            for bx in range(sh):
                                blocks.append((ci, (my * sv + by) * bwp[ci] + mx * sh + bx))
                    units.append(blocks)
        else:  # single-component scan: unpadded raster, one unit per block
            units = [
                [(0, by * bwp[0] + bx)] for by in range(bh_u[0]) for bx in range(bw_u[0])
            ]
        for u, blocks in enumerate(units):
            if restart_interval and u and u % restart_interval == 0:
                emit_restart(bw)
                pred = [0] * ncomp
            for ci, bidx in blocks:
                dc = int(zz[ci][bidx, 0])
                if refine:
                    bw.write((dc >> al) & 1, 1)
                    continue
                v = dc >> al  # floor shift; the refine bit restores exactly
                diff = v - pred[ci]
                pred[ci] = v
                t = _csize(diff)
                ln, code = enc_dc[0 if ci == 0 else 1][t]
                bw.write(code, ln)
                if t:
                    bw.write((diff if diff >= 0 else diff + (1 << t) - 1) & ((1 << t) - 1), t)
        bw.flush()
        return bytes(bw.out)

    def emit_sym(bw, sym):
        ln, code = enc_ac_prog[sym]
        bw.write(code, ln)

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        bw = _BitWriter()
        eobrun = 0

        def flush_eobrun():
            nonlocal eobrun
            if eobrun:
                nbits = eobrun.bit_length() - 1
                emit_sym(bw, nbits << 4)
                if nbits:
                    bw.write(eobrun & ((1 << nbits) - 1), nbits)
                eobrun = 0

        rst_state[0] = 0
        for u in range(bh_u[ci] * bw_u[ci]):
            by, bx = divmod(u, bw_u[ci])
            if restart_interval and u and u % restart_interval == 0:
                flush_eobrun()
                emit_restart(bw)
            vals = zz[ci][by * bwp[ci] + bx, ss : se + 1].tolist()
            tvals = [(v >> al) if v >= 0 else -((-v) >> al) for v in vals]
            if not any(tvals):
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eobrun()
                continue
            flush_eobrun()
            r = 0
            for t in tvals:
                if t == 0:
                    r += 1
                    continue
                while r > 15:
                    emit_sym(bw, 0xF0)  # ZRL
                    r -= 16
                sz = _csize(t)
                emit_sym(bw, (r << 4) | sz)
                bw.write((t if t >= 0 else t + (1 << sz) - 1) & ((1 << sz) - 1), sz)
                r = 0
            if r > 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eobrun()
        flush_eobrun()
        bw.flush()
        return bytes(bw.out)

    def ac_refine_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        bw = _BitWriter()
        eobrun = 0
        be_bits: list = []  # correction bits pending behind an EOB run

        def flush_eobrun():
            nonlocal eobrun
            if eobrun:
                nbits = eobrun.bit_length() - 1
                emit_sym(bw, nbits << 4)
                if nbits:
                    bw.write(eobrun & ((1 << nbits) - 1), nbits)
                eobrun = 0
            for b in be_bits:
                bw.write(b, 1)
            be_bits.clear()

        rst_state[0] = 0
        for u in range(bh_u[ci] * bw_u[ci]):
            by, bx = divmod(u, bw_u[ci])
            if restart_interval and u and u % restart_interval == 0:
                flush_eobrun()
                emit_restart(bw)
            vals = zz[ci][by * bwp[ci] + bx, ss : se + 1].tolist()
            absvals = [(v if v >= 0 else -v) >> al for v in vals]
            eob = -1  # index (into the band) of the last newly-significant
            for i, t in enumerate(absvals):
                if t == 1:
                    eob = i
            r = 0
            br_bits: list = []
            for i, t in enumerate(absvals):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob:
                    flush_eobrun()
                    emit_sym(bw, 0xF0)
                    r -= 16
                    for b in br_bits:
                        bw.write(b, 1)
                    br_bits = []
                if t > 1:  # history-nonzero: buffer its correction bit
                    br_bits.append(t & 1)
                    continue
                flush_eobrun()
                emit_sym(bw, (r << 4) | 1)
                bw.write(1 if vals[i] >= 0 else 0, 1)
                for b in br_bits:
                    bw.write(b, 1)
                br_bits = []
                r = 0
            if r > 0 or br_bits:
                eobrun += 1
                be_bits.extend(br_bits)
                if eobrun == 0x7FFF:
                    flush_eobrun()
        flush_eobrun()
        bw.flush()
        return bytes(bw.out)

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    for tq in sorted(set(qts)):
        zzq = qtabs[tq].reshape(-1)[ZIGZAG].astype(np.uint8)
        out += seg(0xDB, bytes([tq]) + zzq.tobytes())
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, qts[ci]])
    out += seg(0xC2, sof)
    specs = [(0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_PROG)]
    if not gray:
        specs += [(0x01, HUFF_DC_CHROMA), (0x11, HUFF_AC_PROG)]
    for tcth, (bits, vals) in specs:
        out += seg(0xC4, bytes([tcth]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))

    def sos(comps_td_ta, ss, se, ah, al):
        body = bytes([len(comps_td_ta)])
        for cid, td, ta in comps_td_ta:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    all_comps = [(ci + 1, 0 if ci == 0 else 1, 0 if ci == 0 else 1) for ci in range(ncomp)]
    # 1-2: DC first then refine (interleaved when ncomp > 1)
    out += sos(all_comps, 0, 0, 0, 1) + dc_scan(1, refine=False)
    out += sos(all_comps, 0, 0, 1, 0) + dc_scan(0, refine=True)
    bands = [(1, 5), (6, 63)]
    # 3-4: AC first per band per component
    for ss, se in bands:
        for ci in range(ncomp):
            ta = 0 if ci == 0 else 1
            out += sos([(ci + 1, 0, ta)], ss, se, 0, 1) + ac_first_scan(ci, ss, se, 1)
    # 5-6: AC refine per band per component
    for ss, se in bands:
        for ci in range(ncomp):
            ta = 0 if ci == 0 else 1
            out += sos([(ci + 1, 0, ta)], ss, se, 1, 0) + ac_refine_scan(ci, ss, se, 0)
    out += b"\xff\xd9"
    return bytes(out)


def _selfcheck():  # pragma: no cover - manual smoke entry
    rng = np.random.default_rng(1)
    # gray smooth image round-trip
    x = np.arange(24)
    img = ((np.add.outer(x, np.arange(40)) * 3) % 200 + 20).astype(np.uint8)
    back = decode_jpeg(encode_jpeg(img))[:, :, 0]
    err = np.abs(back.astype(int) - img.astype(int))
    print("gray maxerr", err.max(), "meanerr", err.mean())
    # color 4:2:0
    grad = ((np.arange(17)[:, None] + np.arange(31)[None, :]) * 5 % 220 + 10).astype(np.uint8)
    rgb = np.stack([grad, 255 - grad, grad // 2 + 30], axis=-1)
    back = decode_jpeg(encode_jpeg(rgb))
    err = np.abs(back.astype(int) - rgb.astype(int))
    print("color 4:2:0 maxerr", err.max(), "meanerr", err.mean())
    # color 4:4:4
    back = decode_jpeg(encode_jpeg(rgb, subsample=False))
    err = np.abs(back.astype(int) - rgb.astype(int))
    print("color 4:4:4 maxerr", err.max(), "meanerr", err.mean())
    # flat image should be near-exact
    flat = np.full((16, 16), 130, np.uint8)
    back = decode_jpeg(encode_jpeg(flat))[:, :, 0]
    print("flat maxerr", np.abs(back.astype(int) - 130).max())
