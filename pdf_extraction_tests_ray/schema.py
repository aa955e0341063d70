"""Arrow schemas, the span-offset codec, and deterministic geometry.

The input table shape is fixed by BASELINE.json ``input_hint``::

    documents_spans:
      doc_id : string
      spans  : list<struct<kind:string, text:string, media_ref:string,
                           offset:int32>>

``offset`` packs geometry: ``page * 1_000_000 + y_scaled * 1_000 + x_bucket``
with ``page in [1, 999]``, ``y_scaled in [0, 999]``, ``x_bucket in [0, 999]``
(FIXTURES.md §1). Scaled units are reference pixels / ``SCALE`` so the
reference's absolute thresholds (a 300-DPI ~2550x3300 px page; e.g. "y < 300"
at v10A.R:254) apply verbatim after decoding: ``y_px = y_scaled * SCALE``.

Width/height are not stored: they are derived deterministically from
``(kind, len(text))`` by :func:`derive_extent` — the corpus generator
(fixtures.py) and the document logic (doclogic/) share this one formula, so
both sides see identical geometry (FIXTURES.md §1). ``x_bucket`` encodes the
x *center* bucket; the left edge is ``x_center - w/2``.

The output schema carries the north-rule invariant column ``spans`` with
``order`` replacing ``offset`` (SURVEY.md §1.2), plus the per-document
scalars mirroring the reference summary list (v10A.R:728-743).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# constants

SCALE = 3.3  # scaled coordinate unit -> reference pixels (FIXTURES.md §1)

PAGE_MOD = 1_000_000
Y_MOD = 1_000

# DocLayout-YOLO class vocabulary (v10A.R:100-111, v10A.R:116). Our compact
# span kinds map onto it; 'text' is the reference's "plain text".
KIND_TEXT = "text"
KIND_TITLE = "title"
KIND_ABANDON = "abandon"
KIND_FIGURE = "figure"
KIND_TABLE = "table"
KIND_CAPTION = "caption"
TEXTUAL_KINDS = (KIND_TEXT, KIND_TITLE, KIND_ABANDON, KIND_CAPTION)
MEDIA_KINDS = (KIND_FIGURE, KIND_TABLE)

SPAN_STRUCT_IN = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

SPAN_STRUCT_OUT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("order", pa.int32()),
    ]
)

INPUT_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("spans", pa.list_(SPAN_STRUCT_IN))]
)

# Per-doc scalars mirror the reference summary list (v10A.R:728-743):
# title/authors/abstract/main_text (+ cleaned variants collapsed into the
# primary columns by the deterministic path), document_format, boundaries.
OUTPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT_OUT)),
        ("title", pa.string()),
        ("authors", pa.string()),
        ("abstract", pa.string()),
        ("main_text", pa.string()),
        ("document_format", pa.string()),
        ("boundary_start", pa.int32()),
        ("boundary_end", pa.int32()),
        ("total_pages", pa.int32()),
        ("total_text_regions", pa.int32()),
    ]
)


# ---------------------------------------------------------------------------
# offset codec (vectorized)

def pack_offset(page, y_scaled, x_bucket):
    """``(page, y_scaled, x_bucket) -> offset`` (int32, vectorized)."""
    page = np.asarray(page, dtype=np.int64)
    y = np.asarray(y_scaled, dtype=np.int64)
    x = np.asarray(x_bucket, dtype=np.int64)
    if np.any((y < 0) | (y >= Y_MOD)) or np.any((x < 0) | (x >= Y_MOD)):
        raise ValueError("y_scaled/x_bucket out of [0, 999]")
    if np.any((page < 1) | (page >= PAGE_MOD // Y_MOD)):
        raise ValueError("page out of [1, 999]")
    return (page * PAGE_MOD + y * Y_MOD + x).astype(np.int32)


def unpack_offset(offset):
    """``offset -> (page, y_scaled, x_bucket)`` int32 arrays."""
    o = np.asarray(offset, dtype=np.int64)
    page = o // PAGE_MOD
    rem = o % PAGE_MOD
    return (
        page.astype(np.int32),
        (rem // Y_MOD).astype(np.int32),
        (rem % Y_MOD).astype(np.int32),
    )


# ---------------------------------------------------------------------------
# deterministic geometry derivation (shared generator <-> logic formula)

_CPL = 80  # characters per rendered line
_CHAR_W = 12.0  # px per character (300 DPI-ish)
_LINE_H = 55.0  # px line height

_MEDIA_EXTENT = {KIND_FIGURE: (900.0, 600.0), KIND_TABLE: (1000.0, 500.0)}


def derive_extent(kinds, text_lens):
    """Deterministic ``(w, h)`` in reference pixels from (kind, len(text)).

    Text-like spans: ``w = CHAR_W * min(len, CPL)``,
    ``h = LINE_H * ceil(len / CPL)`` — so the reference's area thresholds
    (boxed-abstract ``area > 30000`` v10A.R:307, substantial ``w*h > 1000``
    v10A.R:546) discriminate short labels from paragraph blocks. Media spans
    get fixed per-kind extents. Shared by fixtures.py and doclogic (the two
    must never diverge — FIXTURES.md §1).
    """
    kinds = np.asarray(kinds, dtype=object)
    lens = np.asarray(text_lens, dtype=np.int64)
    w = _CHAR_W * np.minimum(np.maximum(lens, 1), _CPL)
    h = _LINE_H * np.maximum(1, np.ceil(lens / _CPL))
    for mk, (mw, mh) in _MEDIA_EXTENT.items():
        m = kinds == mk
        w[m] = mw
        h[m] = mh
    return w.astype(np.float64), h.astype(np.float64)


def decode_geometry(kinds, texts, offsets):
    """Decode spans into the reference's pixel-space geometry arrays.

    Returns dict of numpy arrays: page, y (top), x (left), w, h, x_center,
    area — the columns of the reference's region tibble (v10A.R:166-180
    ``(page,x,y,w,h,...)`` plus the derived features of v10A.R:230-236).
    """
    page, y_s, x_b = unpack_offset(offsets)
    text_lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    w, h = derive_extent(kinds, text_lens)
    y = y_s.astype(np.float64) * SCALE
    x_center = x_b.astype(np.float64) * SCALE
    x = x_center - w / 2.0
    return {
        "page": page,
        "y": y,
        "x": x,
        "w": w,
        "h": h,
        "x_center": x_center,
        "area": w * h,
    }
