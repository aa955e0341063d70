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
