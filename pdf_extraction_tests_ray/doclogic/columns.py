"""Deterministic page-column detection.

Reimplements ``detect_page_layout_universal_stdaln`` (v10A.R:513-595):

1. filter to "substantial" regions — trimmed text length > 20, area > 1000,
   not starting ``(page|doi|figure|table)\\s`` case-insensitively
   (v10A.R:543-548); fewer than 3 such regions -> single column;
2. k-means method: 2-means on the substantial x-centers; accept two columns
   when ``gap > 0.12 * page_width`` AND ``betweenss/totss > 0.3`` AND both
   sides non-empty (v10A.R:566-589);
3. gap method: round x-centers to 10 px, a max gap ``> 0.15 * page_width``
   between consecutive distinct positions splits columns (v10A.R:576-590 in
   the stdaln variant, "Method 2").

The reference uses R ``kmeans(centers=2, nstart=20)`` — RNG-seeded. For 1-D
k=2 the optimum is an exact sorted split; we compute it exactly (sort x, try
every split, minimize within-cluster SS), which is reproducible and
seed-free (SURVEY.md §7.3.1). The acceptance thresholds are applied to the
exact optimum.
"""

from __future__ import annotations

import re

import numpy as np

_EXCLUDE_RE = re.compile(r"^(page|doi|figure|table)\s")

MIN_SUBSTANTIAL = 3
MIN_KMEANS_POINTS = 4  # v10A.R:564 `length(substantial_x) >= 4`
KMEANS_GAP_FRAC = 0.12  # v10A.R:571
KMEANS_SEPARATION = 0.3  # v10A.R:571 betweenss/totss
GAP_FRAC = 0.15  # v10A.R:582
GAP_ROUND = 10.0  # v10A.R:578 round(x/10)*10


def _substantial_mask(texts, areas):
    mask = np.zeros(len(texts), dtype=bool)
    for i, t in enumerate(texts):
        if len(t.strip()) > 20 and areas[i] > 1000 and not _EXCLUDE_RE.search(t.lower()):
            mask[i] = True
    return mask


def exact_two_means(x):
    """Exact optimal 1-D 2-means: returns (centers_sorted, within_ss, total_ss).

    Deterministic stand-in for R ``kmeans(x, 2, nstart=20)`` (v10A.R:566);
    returns None when x has < 2 distinct values (R kmeans raises there and
    the reference's tryCatch falls through to the gap method).
    """
    xs = np.sort(np.asarray(x, dtype=np.float64))
    n = xs.size
    if np.unique(xs).size < 2:
        return None
    csum = np.cumsum(xs)
    csq = np.cumsum(xs * xs)
    total = csum[-1]
    totalsq = csq[-1]
    ks = np.arange(1, n)  # left part = xs[:k]
    left_ss = csq[ks - 1] - (csum[ks - 1] ** 2) / ks
    rs = n - ks
    rsum = total - csum[ks - 1]
    right_ss = (totalsq - csq[ks - 1]) - (rsum**2) / rs
    wss = left_ss + right_ss
    k = int(ks[int(np.argmin(wss))])
    c1 = csum[k - 1] / k
    c2 = (total - csum[k - 1]) / (n - k)
    mean = total / n
    tot_ss = totalsq - n * mean * mean
    return np.array(sorted((c1, c2))), float(wss[k - 1]), float(tot_ss)


def detect_page_layout(texts, x, w, h, x_center):
    """Return ``(columns, boundary)`` — boundary is None for single column.

    Arguments are per-region numpy arrays / sequences for ONE page,
    geometry in reference pixels (schema.decode_geometry).
    """
    n = len(texts)
    if n < MIN_SUBSTANTIAL:
        return 1, None
    x = np.asarray(x, dtype=np.float64)
    w = np.asarray(w, dtype=np.float64)
    h = np.asarray(h, dtype=np.float64)
    x_center = np.asarray(x_center, dtype=np.float64)
    page_width = float(np.max(x + w))

    sub = _substantial_mask(texts, w * h)
    if int(sub.sum()) < MIN_SUBSTANTIAL:
        return 1, None
    sx = x_center[sub]

    # Method 1: exact 2-means (v10A.R:564-589)
    if sx.size >= MIN_KMEANS_POINTS:
        km = exact_two_means(sx)
        if km is not None:
            centers, wss, tot_ss = km
            gap = centers[1] - centers[0]
            between = tot_ss - wss
            if (
                gap > page_width * KMEANS_GAP_FRAC
                and tot_ss > 0
                and between / tot_ss > KMEANS_SEPARATION
            ):
                boundary = float(np.mean(centers))
                left = int(np.sum(sx < boundary))
                right = int(np.sum(sx >= boundary))
                if left >= 1 and right >= 1:
                    return 2, boundary

    # Method 2: gap analysis on 10px-rounded positions (v10A.R:576-590).
    # np.round matches R round() (banker's rounding at .5 ties).
    x_sorted = np.unique(np.round(sx / GAP_ROUND) * GAP_ROUND)
    if x_sorted.size >= 2:
        gaps = np.diff(x_sorted)
        gi = int(np.argmax(gaps))
        if gaps[gi] > page_width * GAP_FRAC:
            boundary = float((x_sorted[gi] + x_sorted[gi + 1]) / 2.0)
            return 2, boundary

    return 1, None


def detect_page_layout_method(x_center, w):
    """The R6 class method ``detect_page_layout_universal`` (v10A.R:3202-3242).

    A simpler detector used by the main-text re-sort (E7, v10A.R:1625-1654)
    and the Elsevier extractor (E9, v10A.R:2362-2414): no substantial-text
    filter, ``page_width = max(x_center + w/2)``, 2-means accepted when
    ``gap > 0.15 * page_width`` and BOTH sides have >= 2 regions; no
    betweenss check and no gap-method fallback.
    """
    xc = np.asarray(x_center, dtype=np.float64)
    w = np.asarray(w, dtype=np.float64)
    if xc.size < 2:
        return 1, None
    page_width = float(np.max(xc + w / 2.0))
    if xc.size >= 4:
        km = exact_two_means(xc)
        if km is not None:
            centers, _, _ = km
            gap = centers[1] - centers[0]
            if gap > page_width * 0.15:
                boundary = float(np.mean(centers))
                if int(np.sum(xc < boundary)) >= 2 and int(np.sum(xc >= boundary)) >= 2:
                    return 2, boundary
    return 1, None
