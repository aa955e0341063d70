"""Per-document reading-order reconstruction.

Replicates the region flow of ``simple_process_document``
(v10A.R:16-222) on decoded spans:

1. drop spans whose trimmed text is empty (v10A.R:181,186-187) — EXCEPT
   media spans (``media_ref != ''``), which the reference's layout table
   keeps implicitly (v10A.R:100-113) and our interleaved model must keep in
   reading-order position (SURVEY.md §7.3.7);
2. drop ``abandon`` spans on pages > 1 (v10A.R:183);
3. stable pre-sort by ``(page, y, x)`` (v10A.R:184);
4. per page: page 1 gets format-banded segmentation
   (``sort_by_reading_order_universal_stdaln``, v10A.R:239-483), pages 2+
   get column detection + ``(column, y, x)`` / ``(y, x)`` sort
   (v10A.R:484-508).

Band application is union-all in band order (D3): a region matching no band
is dropped; one matching several is duplicated — exactly the reference's
``filter`` + ``bind_rows`` behavior.

All sorts are stable (numpy ``lexsort`` ~ dplyr ``arrange``).
"""

from __future__ import annotations

import numpy as np

from ..schema import KIND_ABANDON, decode_geometry
from .columns import detect_page_layout
from .formats import FORMAT_REGISTRY, banding_format


def keep_mask(kinds, texts, media_refs, page):
    """Steps 1–2: empty-text filter + abandon-on-pages>1 filter."""
    n = len(kinds)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        if media_refs[i] == "" and texts[i].strip() == "":
            keep[i] = False
        elif kinds[i] == KIND_ABANDON and page[i] > 1:
            keep[i] = False
    return keep


def order_document(kinds, texts, media_refs, offsets):
    """Return ``(ordered_indices, geometry)`` for one document.

    ``ordered_indices`` indexes into the ORIGINAL span arrays, in final
    reading order (possibly with drops/duplicates from banding).
    ``geometry`` is the full decoded geometry dict for all original spans.
    """
    g = decode_geometry(kinds, texts, offsets)
    page, y, x = g["page"], g["y"], g["x"]

    keep = keep_mask(kinds, texts, media_refs, page)
    base = np.nonzero(keep)[0]
    if base.size == 0:
        return base.astype(np.int64), g

    # arrange(page, y, x) — stable (v10A.R:184)
    base = base[np.lexsort((x[base], y[base], page[base]))]

    out_parts = []
    for p in np.unique(page[base]):
        pidx = base[page[base] == p]
        if p == 1:
            out_parts.append(_order_page1(pidx, kinds, texts, g))
        else:
            out_parts.append(_order_regular(pidx, texts, g))
    return np.concatenate(out_parts), g


def _order_regular(pidx, texts, g):
    """Pages 2+: column detection + sort (v10A.R:484-508)."""
    y, x, w, h, xc = g["y"], g["x"], g["w"], g["h"], g["x_center"]
    ptexts = [texts[i] for i in pidx]
    ncols, boundary = detect_page_layout(ptexts, x[pidx], w[pidx], h[pidx], xc[pidx])
    if ncols == 2:
        col = np.where(xc[pidx] < boundary, 1, 2)
        order = np.lexsort((x[pidx], y[pidx], col))
        return pidx[order]
    order = np.lexsort((x[pidx], y[pidx]))
    return pidx[order]


def _order_page1(pidx, kinds, texts, g):
    """Page 1: format-banded segmentation (v10A.R:239-483)."""
    y, x, w, h, xc = g["y"], g["x"], g["w"], g["h"], g["x_center"]
    ptexts = [texts[i] for i in pidx]
    pg = {
        "y": y[pidx],
        "x": x[pidx],
        "w": w[pidx],
        "h": h[pidx],
        "x_center": xc[pidx],
        "area": g["area"][pidx],
    }
    fmt = banding_format(ptexts)
    rules = FORMAT_REGISTRY[fmt]

    parts = []
    for band in rules.bands:
        mask = np.asarray(band.mask(ptexts, pg), dtype=bool)
        bidx = np.nonzero(mask)[0]
        if bidx.size == 0:
            continue
        if band.use_columns:
            btexts = [ptexts[i] for i in bidx]
            ncols, boundary = detect_page_layout(
                btexts, pg["x"][bidx], pg["w"][bidx], pg["h"][bidx], pg["x_center"][bidx]
            )
            if ncols == 2:
                col = np.where(pg["x_center"][bidx] < boundary, 1, 2)
                order = np.lexsort((pg["x"][bidx], pg["y"][bidx], col))
            else:
                order = np.lexsort((pg["x"][bidx], pg["y"][bidx]))
        else:
            order = np.lexsort((pg["x"][bidx], pg["y"][bidx]))
        parts.append(pidx[bidx[order]])
    if not parts:
        return pidx[:0]
    return np.concatenate(parts)
