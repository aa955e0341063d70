"""S6 — Claude-ready text render (prepare_for_claude, v10A.R:3599-3675) as
a per-row map_batches step over the extraction OUTPUT table, plus the G3
content-category breakdown (get_content_analysis, v10A.R:3694-3712).

The reference's metadata footer includes ``Sys.Date()`` — excluded here
(non-deterministic; SURVEY.md §2.9 notes it is outside the golden scope).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..doclogic.cleaners import split_authors


def render_claude_text(
    title: str,
    authors: str,
    abstract: str,
    main_text: str,
    total_pages: int,
    document_format: str,
    cleaning_method: str = "hybrid",
    body_only: bool = False,
    include_metadata: bool = True,
) -> str:
    authors_join = "; ".join(split_authors(authors))
    content_label = (
        "MAIN CONTENT (Body Only - No Front Matter)" if body_only else "MAIN CONTENT (Cleaned)"
    )
    meta = ""
    if include_metadata:
        meta = (
            "\n---\nDocument Statistics:\n"
            f"- Total Pages: {total_pages}\n"
            f"- Main Text Length: {len(main_text)} characters\n"
            "- Text Processing: ✓ Cleaned\n"
            f"- Cleaning Method: {cleaning_method}\n"
            f"- Document Format: {document_format}\n"
            "- Column-Aware Processing: ✓ Enabled"
        )
    return (
        "ACADEMIC PAPER ANALYSIS\n\n"
        f"TITLE: {title}\n\n"
        f"AUTHORS: {authors_join}\n\n"
        f"ABSTRACT:\n{abstract}\n\n"
        f"{content_label}:\n{main_text}{meta}\n"
    )


def add_claude_text(batch: pa.Table, cleaning_method: str = "hybrid") -> pa.Table:
    """map_batches step: extraction output -> + claude_text column."""
    texts = [
        render_claude_text(
            t or "", a or "", ab or "", m or "", int(p or 0), f or "", cleaning_method
        )
        for t, a, ab, m, p, f in zip(
            batch.column("title").to_pylist(),
            batch.column("authors").to_pylist(),
            batch.column("abstract").to_pylist(),
            batch.column("main_text").to_pylist(),
            batch.column("total_pages").to_pylist(),
            batch.column("document_format").to_pylist(),
        )
    ]
    return batch.append_column("claude_text", pa.array(texts, pa.string()))


def content_category_counts(ordered_spans_df: pd.DataFrame) -> pd.DataFrame:
    """G3 — count(content_category, sort=TRUE) over classified spans."""
    from ..doclogic.classify import classify_content_for_extraction

    cats = [
        classify_content_for_extraction(t, int(p), float(y), len(t))
        for t, p, y in zip(
            ordered_spans_df["text"], ordered_spans_df["page"], ordered_spans_df["y"]
        )
    ]
    out = pd.Series(cats).value_counts().rename_axis("content_category").reset_index(name="n")
    return out


# ---------------------------------------------------------------------------
# S5 — debug annotated-overlay sink (v10A.R:83-90 writes a YOLO-overlay JPEG
# per page; not in the correctness path). We render each page's span boxes
# onto a downscaled grayscale raster and emit binary PGM (P5) — pure numpy,
# no image libraries — one file per (doc_id, page).

_PAGE_W_PX = 2550.0  # reference 300-DPI page (SURVEY.md §1.1.2)
_PAGE_H_PX = 3300.0
_KIND_SHADE = {"title": 255, "abandon": 90, "figure": 150, "table": 170}
_DEFAULT_SHADE = 220  # plain text


def _overlay_pages(doc_id: str, spans: list[dict], scale: int = 8):
    """Yield ``(page, pgm_bytes)`` per page of one document."""
    import numpy as np

    from ..schema import decode_geometry

    if not spans:
        return
    kinds = [s["kind"] for s in spans]
    texts = [s["text"] for s in spans]
    offsets = [s["offset"] for s in spans]
    g = decode_geometry(kinds, texts, offsets)
    W, H = int(_PAGE_W_PX) // scale, int(_PAGE_H_PX) // scale
    for page in np.unique(g["page"]):
        img = np.zeros((H, W), dtype=np.uint8)
        for i in np.nonzero(g["page"] == page)[0]:
            x0 = int(max(g["x"][i], 0)) // scale
            y0 = int(max(g["y"][i], 0)) // scale
            x1 = min(int((g["x"][i] + g["w"][i])) // scale, W - 1)
            y1 = min(int((g["y"][i] + g["h"][i])) // scale, H - 1)
            if x1 <= x0 or y1 <= y0:
                continue
            shade = _KIND_SHADE.get(kinds[i], _DEFAULT_SHADE)
            # 1-px box outline (the reference draws rectangles, not fills)
            img[y0, x0:x1] = shade
            img[y1, x0:x1] = shade
            img[y0:y1, x0] = shade
            img[y0:y1, x1] = shade
        yield int(page), b"P5\n%d %d\n255\n" % (W, H) + img.tobytes()


def write_layout_overlays(batch: pa.Table, out_dir: str, scale: int = 8) -> pa.Table:
    """map_batches debug sink: write per-page overlay PGMs, return an index
    table (doc_id, page, path). Use on a SAMPLE (doc_hash_sample) — at
    corpus scale this is a QA spot-check, never a full-table pass."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    doc_ids, pages, paths = [], [], []
    for doc_id, spans in zip(
        batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
    ):
        for page, pgm in _overlay_pages(doc_id, spans, scale):
            path = os.path.join(out_dir, f"{doc_id}_p{page:03d}.pgm")
            with open(path, "wb") as f:
                f.write(pgm)
            doc_ids.append(doc_id)
            pages.append(page)
            paths.append(path)
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "page": pa.array(pages, pa.int32()),
            "path": pa.array(paths, pa.string()),
        }
    )
