"""The full per-document ladder: spans in -> ordered spans + scalars out.

This is the deterministic equivalent of
``processor$process_document(pdf, model, cleaning_method)``
(v10A.R:686-751) with the two optional LLM calls replaced by their own
deterministic fallback branches (the reference runs fully without them —
``process_document_simple``, v10A.R:753-819, proves the shape). It is used
both as the single-doc ORACLE for golden tests and as the body of the Ray
``map_batches`` extraction stage — one implementation, two harnesses.

Output per document:
  spans     — reading-ordered (kind, text, media_ref, order) tuples — the
              north-rule invariant (BASELINE.json input_hint)
  title / authors / abstract / main_text — CLEANED scalars (the consolidator
              preference, get_clean_results v10A.R:3535-3560)
  document_format, boundary_start/end (1-based row ids over the main-text
              frame, cf. golden transcript {start:15,end:88} v10A.R:3765),
  total_pages, total_text_regions (v10A.R:739-740)
"""

from __future__ import annotations

import numpy as np

from ..schema import decode_geometry
from .cleaners import apply_cleaning_method
from .extract import (
    extract_abstract_from_regions,
    extract_abstract_universal,
    extract_authors,
    extract_content_simple_universal,
    extract_main_text_smart,
    extract_title_universal,
)
from .formats import detect_document_format
from .reading_order import order_document


def _build_rdf(kinds, texts, media_refs, geometry, idx):
    return {
        "kinds": [kinds[i] for i in idx],
        "texts": [texts[i] for i in idx],
        "media_refs": [media_refs[i] for i in idx],
        "page": geometry["page"][idx],
        "y": geometry["y"][idx],
        "x": geometry["x"][idx],
        "w": geometry["w"][idx],
        "h": geometry["h"][idx],
        "x_center": geometry["x_center"][idx],
        "area": geometry["area"][idx],
        "_n": len(idx),
    }


def order_spans(kinds, texts, media_refs, offsets):
    """Reading-order a span list; returns ordered parallel lists.

    Used both whole-doc and per page-range FRAGMENT of a heavy document:
    ordering is strictly per-page (v10A.R:40-199 page loop), so ordering
    page-aligned fragments independently and concatenating them in page
    order is identical to whole-doc ordering (SURVEY.md §4.2 skew row).
    """
    idx, _ = order_document(kinds, texts, media_refs, offsets)
    return (
        [kinds[i] for i in idx],
        [texts[i] for i in idx],
        [media_refs[i] for i in idx],
        [int(offsets[i]) for i in idx],
    )


def build_rdf_from_ordered(kinds, texts, media_refs, offsets):
    """Rebuild the rdf frame from ALREADY-ORDERED spans (fragment reassembly)."""
    geometry = decode_geometry(kinds, texts, offsets)
    idx = np.arange(len(kinds))
    return _build_rdf(kinds, texts, media_refs, geometry, idx)


def finalize_document(rdf, cleaning_method="hybrid", structure=None, format_detector=None):
    """Doc-level extraction over an ordered rdf -> output dict (no spans).

    ``structure`` is the optional A4 LLM region analysis (M26-parsed dict,
    v10A.R:914-1040): when present the abstract is sliced by its labeled
    regions (E6, ``extract_abstract_from_regions`` — the reference's
    LLM-first path, v10A.R:1267-1346); when None the deterministic E4
    universal extractor runs, exactly as before.

    ``format_detector`` is the A1 layout-model hook (same signature as
    :func:`doclogic.formats.detect_document_format`): the learned layout
    backend (stages/extract_stage.fit_layout_format_model) injects its
    fitted scorer here; None keeps the deterministic rule scorer."""
    if rdf["_n"] == 0:
        return {
            "title": "Title not found",
            "authors": "Authors not found",
            "abstract": "Abstract not found",
            "main_text": "",
            "document_format": "generic_academic",
            "boundary_start": 0,
            "boundary_end": 0,
            "total_pages": 0,
            "total_text_regions": 0,
        }
    detector = format_detector if format_detector is not None else detect_document_format
    doc_format = detector(rdf["kinds"], rdf["texts"], rdf["page"], rdf["y"])
    title = extract_title_universal(rdf)
    authors = extract_authors(rdf)
    if structure is not None:
        abstract = extract_abstract_from_regions(rdf, structure)
    else:
        abstract = extract_abstract_universal(rdf)
    main = extract_main_text_smart(rdf, doc_format)
    if cleaning_method != "none":
        title = apply_cleaning_method(title, cleaning_method)
        abstract = apply_cleaning_method(abstract, cleaning_method)
        main_text = apply_cleaning_method(main["main"], cleaning_method)
    else:
        main_text = main["main"]
    return {
        "title": title,
        "authors": authors,
        "abstract": abstract,
        "main_text": main_text,
        "document_format": doc_format,
        "boundary_start": int(main["start"]),
        "boundary_end": int(main["end"]),
        "total_pages": int(np.max(rdf["page"])),
        "total_text_regions": int(rdf["_n"]),
    }


def process_document(
    kinds,
    texts,
    media_refs,
    offsets,
    cleaning_method="hybrid",
    structure_provider=None,
    format_detector=None,
):
    """Flagship deterministic pipeline for one document.

    Args are parallel sequences (kind/text/media_ref: str, offset: int).
    Returns a plain dict matching schema.OUTPUT_SCHEMA minus doc_id.

    ``structure_provider`` is the A4 hook (``rdf -> structure dict|None``):
    the LLM actor stage (stages/llm_stage.py) injects a client-backed
    provider here; None keeps the fully deterministic path.
    ``format_detector`` is the A1 layout-model hook (see
    :func:`finalize_document`).
    """
    idx, geometry = order_document(kinds, texts, media_refs, offsets)
    rdf = _build_rdf(kinds, texts, media_refs, geometry, idx)

    out_spans = {
        "kind": rdf["kinds"],
        "text": rdf["texts"],
        "media_ref": rdf["media_refs"],
        "order": np.arange(len(idx), dtype=np.int32),
    }

    structure = structure_provider(rdf) if structure_provider is not None else None
    out = finalize_document(
        rdf, cleaning_method, structure=structure, format_detector=format_detector
    )
    out["spans"] = out_spans
    return out


def process_document_simple(kinds, texts, media_refs, offsets, cleaning_method="hybrid"):
    """The E11-based path (``process_document_simple``, v10A.R:753-819)."""
    idx, geometry = order_document(kinds, texts, media_refs, offsets)
    rdf = _build_rdf(kinds, texts, media_refs, geometry, idx)
    if rdf["_n"] == 0:
        return {"title": "Title not found", "authors": "Authors not found",
                "abstract": "Abstract not found", "main_text": "",
                "total_pages": 0, "total_text_regions": 0}
    res = extract_content_simple_universal(rdf)

    import re

    title_clean = re.sub(r"lonic-?\s*", "Ionic ", res["title"])
    title_clean = re.sub(r"\s+", " ", title_clean).strip()
    authors_clean = re.sub(r"[°*†‡§¶#¹²³⁴⁵⁶⁷⁸⁹⁰'\"?,]", "", res["authors"])
    authors_clean = re.sub(r"\s+", " ", authors_clean).strip()
    abstract_clean = re.sub(r"\s+", " ", res["abstract"]).strip()
    main_clean = res["main_content"]
    if cleaning_method != "none":
        title_clean = apply_cleaning_method(title_clean, cleaning_method)
        authors_clean = apply_cleaning_method(authors_clean, cleaning_method)
        abstract_clean = apply_cleaning_method(abstract_clean, cleaning_method)
        main_clean = apply_cleaning_method(main_clean, cleaning_method)
    return {
        "title": title_clean,
        "authors": authors_clean,
        "abstract": abstract_clean,
        "main_text": main_clean,
        "total_pages": int(np.max(rdf["page"])),
        "total_text_regions": int(rdf["_n"]),
    }
