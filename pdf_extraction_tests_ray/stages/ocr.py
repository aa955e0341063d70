"""A2/A3 — OCR + image-preprocessing ACTOR stage (v10A.R:31, 139-160).

The reference OCRs one grayscale ROI per detected layout box
(``pytesseract::image_to_string`` per box, cv2 crop+grayscale before it)
and, like the layout model, re-creates the engine per document
(v10A.R:20-31). Ray-native shape: :class:`OcrRegions` is a callable class
for ``map_batches(..., concurrency=N)`` — the OCR engine handle and the
image-preprocessing module are per-actor state loaded ONCE in
``__init__``; ``__call__`` runs the per-ROI loop over a batch of
(payload, boxes) rows.

Three backends: ``backend='glyph'`` is a REAL optical recognizer (pure
numpy) for pages rendered in the module's 5x7 bitmap font — render +
recognize round-trip exactly, pinned in tests; ``backend='tesseract'``
is the arbitrary-raster path (pytesseract+cv2 absent in this container,
so construction raises a clear error — never mid-batch); ``fake=True``
substitutes a deterministic payload+box-hash transcription for
plumbing-only tests. The plumbing (Arrow box-list decode, per-ROI loop,
output layout, batch sizing for fat binary rows) is shared by all three.

Input table schema::

    ocr_jobs: doc_id:string, media_ref:string, payload:binary,
              boxes:list<struct<x:int32, y:int32, w:int32, h:int32>>

Output: one row per (payload, box): doc_id, media_ref, box_index, x/y/w/h,
text — ready to join back into the span stream by (doc_id, media_ref).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_BOX_STRUCT = pa.struct(
    [("x", pa.int32()), ("y", pa.int32()), ("w", pa.int32()), ("h", pa.int32())]
)

OCR_INPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("payload", pa.binary()),
        ("boxes", pa.list_(_BOX_STRUCT)),
    ]
)

OCR_OUTPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("box_index", pa.int32()),
        ("x", pa.int32()),
        ("y", pa.int32()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("text", pa.string()),
    ]
)

# --------------------------------------------------------------------------
# 5x7 bitmap font + glyph OCR backend — a REAL optical recognizer for
# pages rendered with this font (pure numpy, no engine libraries):
# rendering writes glyph bitmaps into a PGM page, recognition crops the
# ROI, segments the fixed 6x8 cell grid and matches each 5x7 cell
# pattern against the font table. Round-trip exactness is pinned in
# tests; tesseract remains the documented path for arbitrary rasters.

_FONT_5X7 = {
    "A": "01110 10001 10001 11111 10001 10001 10001",
    "B": "11110 10001 10001 11110 10001 10001 11110",
    "C": "01110 10001 10000 10000 10000 10001 01110",
    "D": "11110 10001 10001 10001 10001 10001 11110",
    "E": "11111 10000 10000 11110 10000 10000 11111",
    "F": "11111 10000 10000 11110 10000 10000 10000",
    "G": "01110 10001 10000 10111 10001 10001 01111",
    "H": "10001 10001 10001 11111 10001 10001 10001",
    "I": "01110 00100 00100 00100 00100 00100 01110",
    "J": "00111 00010 00010 00010 00010 10010 01100",
    "K": "10001 10010 10100 11000 10100 10010 10001",
    "L": "10000 10000 10000 10000 10000 10000 11111",
    "M": "10001 11011 10101 10101 10001 10001 10001",
    "N": "10001 11001 10101 10011 10001 10001 10001",
    "O": "01110 10001 10001 10001 10001 10001 01110",
    "P": "11110 10001 10001 11110 10000 10000 10000",
    "Q": "01110 10001 10001 10001 10101 10010 01101",
    "R": "11110 10001 10001 11110 10100 10010 10001",
    "S": "01111 10000 10000 01110 00001 00001 11110",
    "T": "11111 00100 00100 00100 00100 00100 00100",
    "U": "10001 10001 10001 10001 10001 10001 01110",
    "V": "10001 10001 10001 10001 10001 01010 00100",
    "W": "10001 10001 10001 10101 10101 11011 10001",
    "X": "10001 01010 00100 00100 00100 01010 10001",
    "Y": "10001 01010 00100 00100 00100 00100 00100",
    "Z": "11111 00001 00010 00100 01000 10000 11111",
    " ": "00000 00000 00000 00000 00000 00000 00000",
}
_CELL_W, _CELL_H = 6, 8  # 5x7 glyph + 1px spacing


def _glyph_array(ch: str) -> np.ndarray:
    rows = _FONT_5X7[ch].split(" ")
    return np.array([[c == "1" for c in r] for r in rows], dtype=bool)


def render_glyph_page(lines: list, pad: int = 4) -> tuple:
    """Render text lines (A-Z + space) into a binary PGM page with the
    5x7 font on a fixed 6x8 cell grid. Returns ``(pgm_bytes, boxes)``
    with one pixel-exact box per line — the ground-truth layout a real
    pipeline gets from its detector."""
    lines = [ln.upper() for ln in lines]
    w = pad * 2 + max((len(ln) for ln in lines), default=1) * _CELL_W
    h = pad * 2 + len(lines) * (_CELL_H + 2)
    img = np.zeros((h, w), dtype=np.uint8)
    boxes = []
    for li, ln in enumerate(lines):
        y = pad + li * (_CELL_H + 2)
        for ci, ch in enumerate(ln):
            g = _glyph_array(ch if ch in _FONT_5X7 else " ")
            x = pad + ci * _CELL_W
            img[y: y + 7, x: x + 5][g] = 255
        boxes.append(
            {"x": pad, "y": y, "w": len(ln) * _CELL_W, "h": _CELL_H}
        )
    payload = b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()
    return payload, boxes


_FAKE_VOCAB = (
    "signal sample region layer phase spectrum matrix vector charge beam "
    "probe sensor metric bound error noise control batch trial dose rate"
).split()


def synth_ocr_table(doc_ids, refs, boxes_per_page=3, seed: int = 17) -> pa.Table:
    """Deterministic fake page images + layout boxes for tests/bench."""
    payloads, box_lists = [], []
    for r in refs:
        rng = np.random.default_rng(
            np.random.SeedSequence(
                [seed, int.from_bytes(hashlib.md5(r.encode()).digest()[:4], "big")]
            )
        )
        payloads.append(
            rng.integers(0, 256, size=int(rng.integers(512, 4096)), dtype=np.uint8).tobytes()
        )
        boxes = []
        for _ in range(boxes_per_page):
            x, y = int(rng.integers(0, 2000)), int(rng.integers(0, 3000))
            boxes.append(
                {"x": x, "y": y, "w": int(rng.integers(50, 600)), "h": int(rng.integers(20, 100))}
            )
        box_lists.append(boxes)
    return pa.Table.from_arrays(
        [
            pa.array(list(doc_ids), pa.string()),
            pa.array(list(refs), pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(box_lists, pa.list_(_BOX_STRUCT)),
        ],
        schema=OCR_INPUT_SCHEMA,
    )


def synth_glyph_ocr_table(doc_ids, refs, lines_per_page: int = 3, seed: int = 23):
    """Deterministic 5x7-font pages: returns ``(ocr_jobs table, expected)``
    where ``expected[(doc_id, box_index)]`` is the ground-truth line text
    (uppercase) — the glyph backend must recover it EXACTLY."""
    payloads, box_lists = [], []
    expected = {}
    for did, r in zip(doc_ids, refs):
        rng = np.random.default_rng(
            np.random.SeedSequence(
                [seed, int.from_bytes(hashlib.md5(r.encode()).digest()[:4], "big")]
            )
        )
        lines = [
            " ".join(
                _FAKE_VOCAB[i]
                for i in rng.integers(0, len(_FAKE_VOCAB), int(rng.integers(2, 5)))
            ).upper()
            for _ in range(lines_per_page)
        ]
        payload, boxes = render_glyph_page(lines)
        payloads.append(payload)
        box_lists.append(boxes)
        for i, ln in enumerate(lines):
            expected[(did, i)] = ln
    t = pa.Table.from_arrays(
        [
            pa.array(list(doc_ids), pa.string()),
            pa.array(list(refs), pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(box_lists, pa.list_(_BOX_STRUCT)),
        ],
        schema=OCR_INPUT_SCHEMA,
    )
    return t, expected


class OcrRegions:
    """Per-ROI OCR actor: engine + preprocessing loaded once per actor.

    ``ds.map_batches(OcrRegions, fn_constructor_kwargs={"fake": True},
    batch_format="pyarrow", batch_size=16, concurrency=(1, N))`` — small
    batch_size, payload rows are megabytes at real scale (the same
    batch-bytes rule as stages.media.DecodeMedia).
    """

    def __init__(self, fake: bool = False, lang: str = "eng", backend: str = None):
        self.fake = fake
        self.lang = lang
        self.backend = backend or ("fake" if fake else "tesseract")
        if self.backend not in ("fake", "glyph", "tesseract"):
            # fail at construction, never mid-batch — same contract as
            # the missing-engine gate below
            raise ValueError(
                f"unknown OCR backend {self.backend!r}: expected 'fake', "
                "'glyph' or 'tesseract'"
            )
        if self.backend == "glyph":
            # per-actor warm engine: the compiled pattern->char table
            # (real recognition for pages in the repo's 5x7 font)
            self._templates = {
                _glyph_array(ch).tobytes(): ch for ch in _FONT_5X7
            }
        elif self.backend == "tesseract":
            try:  # per-actor warm engine — the A2/A3 fix for v10A.R:20-31
                import cv2  # noqa: F401
                import pytesseract
            except ImportError as e:  # fail at construction, never mid-batch
                raise NotImplementedError(
                    "tesseract OCR requires pytesseract+cv2, absent in this "
                    "environment; use backend='glyph' for real recognition "
                    "of 5x7-font pages, or fake=True for the plumbing path"
                ) from e
            self._engine = pytesseract

    def _ocr_real(self, payload: bytes, box: dict) -> str:
        # v10A.R:139-160's ROI loop: decode page image, crop the box,
        # grayscale, one tesseract call per ROI (untestable in this
        # container — no codecs — but the construction gate guarantees
        # the libs exist whenever this runs)
        import cv2

        img = cv2.imdecode(np.frombuffer(payload, dtype=np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            return ""
        x, y = max(0, int(box["x"])), max(0, int(box["y"]))
        roi = img[y : y + int(box["h"]), x : x + int(box["w"])]
        if roi.size == 0:
            return ""
        gray = cv2.cvtColor(roi, cv2.COLOR_BGR2GRAY)
        return self._engine.image_to_string(gray, lang=self.lang).strip()

    def _ocr_glyph(self, payload: bytes, box: dict) -> str:
        """REAL recognition for 5x7-font PGM pages: crop the ROI, walk the
        6x8 cell grid, exact-match each 5x7 pattern against the font
        table ('?' for unknown ink)."""
        from .media import decode_pnm_gray

        gray = decode_pnm_gray(payload)
        x, y = int(box["x"]), int(box["y"])
        roi = gray[y: y + int(box["h"]), x: x + int(box["w"])]
        chars = []
        for c in range(int(box["w"]) // _CELL_W):
            cell = roi[0:7, c * _CELL_W: c * _CELL_W + 5] > 127
            if cell.shape != (7, 5):
                break
            chars.append(self._templates.get(cell.tobytes(), "?"))
        return "".join(chars).strip()

    def _ocr_fake(self, payload: bytes, box: dict) -> str:
        h = hashlib.blake2b(
            payload + bytes(str(sorted(box.items())), "utf-8"), digest_size=8
        ).digest()
        rng = np.random.default_rng(np.frombuffer(h, dtype=np.uint32))
        n = int(rng.integers(3, 9))
        return " ".join(_FAKE_VOCAB[i] for i in rng.integers(0, len(_FAKE_VOCAB), n))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ocr = {
            "fake": self._ocr_fake,
            "glyph": self._ocr_glyph,
            "tesseract": self._ocr_real,
        }[self.backend]
        out = {k: [] for k in ("doc_id", "media_ref", "box_index", "x", "y", "w", "h", "text")}
        boxes_col = batch.column("boxes").to_pylist()
        for did, ref, payload, boxes in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("media_ref").to_pylist(),
            batch.column("payload").to_pylist(),
            boxes_col,
        ):
            for i, box in enumerate(boxes or []):
                out["doc_id"].append(did)
                out["media_ref"].append(ref)
                out["box_index"].append(i)
                out["x"].append(box["x"])
                out["y"].append(box["y"])
                out["w"].append(box["w"])
                out["h"].append(box["h"])
                out["text"].append(ocr(payload, box))
        return pa.Table.from_pydict(out, schema=OCR_OUTPUT_SCHEMA)


def backfill_ocr_text(
    spans: "object", ocr: "object", num_buckets: int = 64
) -> "object":
    """Join OCR transcriptions back into the extracted span stream — the
    reference feeds its per-box OCR text into the document record
    (v10A.R:139-160); here it is ONE bucketed co-partitioning merge keyed
    on (doc_id, media_ref). The OCR side concatenates its per-box texts
    in box_index order; spans whose key has no OCR rows (all plain text
    spans — media_ref '') pass through with ``ocr_text=''``. No hot key:
    the bucket hash includes doc_id, so ref-less spans spread by
    document."""
    import pandas as pd

    from ..relational import bucketed_group_merge

    def tag_spans(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(str),
                "media_ref": df["media_ref"].astype(str),
                "span_order": df["span_order"].astype("int64"),
                "kind": df["kind"].astype(str),
                "text": df["text"].astype(str),
                "box_index": pd.Series([-1] * len(df), dtype="int64"),
                "side": "s",
            }
        )

    def tag_ocr(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(str),
                "media_ref": df["media_ref"].astype(str),
                "span_order": pd.Series([-1] * len(df), dtype="int64"),
                "kind": "",
                "text": df["text"].astype(str),
                "box_index": df["box_index"].astype("int64"),
                "side": "o",
            }
        )

    import ray.data  # noqa: F401

    both = spans.map_batches(tag_spans, batch_format="pandas").union(
        ocr.map_batches(tag_ocr, batch_format="pandas")
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, sub in g.groupby(["doc_id", "media_ref"], sort=False):
            o = sub[sub["side"] == "o"].sort_values("box_index")
            otext = " ".join(o["text"].tolist())
            s = sub[sub["side"] == "s"]
            if len(s):
                out.append(
                    pd.DataFrame(
                        {
                            "doc_id": s["doc_id"],
                            "span_order": s["span_order"],
                            "kind": s["kind"],
                            "media_ref": s["media_ref"],
                            "text": s["text"],
                            "ocr_text": otext,
                        }
                    )
                )
        if not out:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=str),
                    "span_order": pd.Series([], dtype="int64"),
                    "kind": pd.Series([], dtype=str),
                    "media_ref": pd.Series([], dtype=str),
                    "text": pd.Series([], dtype=str),
                    "ocr_text": pd.Series([], dtype=str),
                }
            )
        return pd.concat(out, ignore_index=True)

    return bucketed_group_merge(
        both, ["doc_id", "media_ref"], merge, num_buckets=num_buckets
    )


def ocr_pipeline(
    jobs_ds, fake: bool = True, concurrency=(1, 4), batch_size: int = 16,
    backend: str = None,
):
    """ocr_jobs table -> one text row per (page, box)."""
    return jobs_ds.map_batches(
        OcrRegions,
        fn_constructor_kwargs={"fake": fake, "backend": backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
