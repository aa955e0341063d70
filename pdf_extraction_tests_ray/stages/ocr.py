"""A2/A3 — OCR + image-preprocessing ACTOR stage (v10A.R:31, 139-160).

The reference OCRs one grayscale ROI per detected layout box
(``pytesseract::image_to_string`` per box, cv2 crop+grayscale before it)
and, like the layout model, re-creates the engine per document
(v10A.R:20-31). Ray-native shape: :class:`OcrRegions` is a callable class
for ``map_batches(..., concurrency=N)`` — the OCR engine handle and the
image-preprocessing module are per-actor state loaded ONCE in
``__init__``; ``__call__`` runs the per-ROI loop over a batch of
(payload, boxes) rows.

Neither tesseract nor cv2 exists in this container, so the engine import
is gated: ``OcrRegions(fake=False)`` raises a clear error at construction
(never mid-batch), and ``fake=True`` substitutes a deterministic
payload+box-hash transcription — the plumbing (Arrow box-list decode,
per-ROI loop, output layout, batch sizing for fat binary rows) is real and
tested, and a real engine drops into ``_ocr_real``.

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


class OcrRegions:
    """Per-ROI OCR actor: engine + preprocessing loaded once per actor.

    ``ds.map_batches(OcrRegions, fn_constructor_kwargs={"fake": True},
    batch_format="pyarrow", batch_size=16, concurrency=(1, N))`` — small
    batch_size, payload rows are megabytes at real scale (the same
    batch-bytes rule as stages.media.DecodeMedia).
    """

    def __init__(self, fake: bool = False, lang: str = "eng"):
        self.fake = fake
        self.lang = lang
        if not fake:
            try:  # per-actor warm engine — the A2/A3 fix for v10A.R:20-31
                import cv2  # noqa: F401
                import pytesseract
            except ImportError as e:  # fail at construction, never mid-batch
                raise NotImplementedError(
                    "real OCR requires pytesseract+cv2, absent in this "
                    "environment; construct OcrRegions(fake=True) for the "
                    "plumbing path"
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

    def _ocr_fake(self, payload: bytes, box: dict) -> str:
        h = hashlib.blake2b(
            payload + bytes(str(sorted(box.items())), "utf-8"), digest_size=8
        ).digest()
        rng = np.random.default_rng(np.frombuffer(h, dtype=np.uint32))
        n = int(rng.integers(3, 9))
        return " ".join(_FAKE_VOCAB[i] for i in rng.integers(0, len(_FAKE_VOCAB), n))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ocr = self._ocr_fake if self.fake else self._ocr_real
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


def ocr_pipeline(jobs_ds, fake: bool = True, concurrency=(1, 4), batch_size: int = 16):
    """ocr_jobs table -> one text row per (page, box)."""
    return jobs_ds.map_batches(
        OcrRegions,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
