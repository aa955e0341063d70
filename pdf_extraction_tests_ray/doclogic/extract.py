"""Per-document composite extractors (E1–E11, SURVEY.md §2.3).

All functions operate on an ``rdf`` ("region data frame"): a dict of
parallel arrays for ONE document, rows already in reading order (the output
of reading_order.order_document applied to the span arrays)::

    kinds: list[str], texts: list[str], media_refs: list[str],
    page/y/x/w/h/x_center/area: np.ndarray

Row indices mirror the reference's 1-based ``row_id`` where noted.
Every decision ladder is a faithful port of the cited R logic, including
fallback magic constants (SURVEY.md §7.3.5) and R ``a:b`` descending-range
semantics where the reference's loop bounds can invert (``r_seq``).
"""

from __future__ import annotations

import re

import numpy as np

from ..schema import KIND_TEXT, KIND_TITLE
from .cleaners import dedup_sentences, normalize_ws, scrub_authors, scrub_citations
from .columns import detect_page_layout, detect_page_layout_method
from .formats import detect_document_format

_TEXTUAL = (KIND_TEXT, KIND_TITLE)  # R: element_type %in% c("plain text","title")


def r_seq(a: int, b: int) -> range:
    """R ``a:b``: ascending when a<=b, DESCENDING when a>b."""
    return range(a, b + 1) if a <= b else range(a, b - 1, -1)


def r_round(v: float) -> int:
    """R round(): banker's rounding (same as Python round)."""
    return int(round(v))


def _sub(rdf, mask):
    idx = np.nonzero(mask)[0]
    return _take(rdf, idx)


def _take(rdf, idx):
    out = {
        k: (v[idx] if isinstance(v, np.ndarray) else [v[i] for i in idx])
        for k, v in rdf.items()
        if not k.startswith("_")
    }
    out["_n"] = len(idx)
    return out


def _lens(texts):
    return np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))


def _any_match(pattern, texts, lower=False):
    rx = re.compile(pattern)
    return any(rx.search(t.lower() if lower else t) for t in texts)


def _match_mask(pattern, texts, lower=False):
    rx = re.compile(pattern)
    return np.fromiter(
        ((rx.search(t.lower() if lower else t) is not None) for t in texts),
        dtype=bool,
        count=len(texts),
    )


def _sort_yx_frame(rdf):
    order = np.lexsort((rdf["x"], rdf["y"]))
    return _take(rdf, order)


# ==========================================================================
# E1 — extract_title_universal (v10A.R:1920-1965)

_TITLE_EXCL_LABEL = re.compile(r"^(nature|communications|journal|doi|article|open|paper)\s*$")
_TITLE_EXCL_URL = re.compile(r"^(DOI:|www\.|http)")
_TITLE_CASE_RE = re.compile(r"[A-Z].*[a-z]")
_TITLE_PEN1 = re.compile(r"journal|doi|volume|issue|page|copyright")
_TITLE_PEN2 = re.compile(r"\d{4}|@|\.edu|\.com")


def extract_title_universal(rdf) -> str:
    kinds = rdf["kinds"]
    texts = rdf["texts"]
    page = rdf["page"]
    y = rdf["y"]
    cands = []
    for i in range(len(texts)):
        if page[i] != 1 or kinds[i] not in _TEXTUAL:
            continue
        t = texts[i]
        if _TITLE_EXCL_LABEL.search(t.lower()) or _TITLE_EXCL_URL.search(t):
            continue
        n = len(t)
        if kinds[i] == KIND_TITLE and n > 30:
            score = 10
        elif y[i] < 400 and 40 < n < 300:
            score = 8
        elif y[i] < 600 and n > 30 and _TITLE_CASE_RE.search(t):
            score = 6
        else:
            score = 0
        if _TITLE_PEN1.search(t.lower()):
            score -= 5
        elif _TITLE_PEN2.search(t):
            score -= 3
        elif n < 20:
            score -= 2
        if score > 3:
            cands.append((-score, y[i], i))
    if not cands:
        return "Title not found"
    cands.sort(key=lambda c: (c[0], c[1]))
    return normalize_ws(texts[cands[0][2]])


# ==========================================================================
# E3 — authors extractor, deterministic path (v10A.R:1046-1265 minus the
# optional LLM cleanup, replaced by its own error-branch regex scrub).

_NAME_PAIR_RE = re.compile(r"[A-Z][a-z]+\s+[A-Z][a-z]+")
_NAME_PAIR_B_RE = re.compile(r"\b[A-Z][a-z]+\s+[A-Z][a-z]+\b")
_SUPERSCRIPT_RE = re.compile(r"[°*†‡§¶#¹²³⁴⁵⁶⁷⁸⁹⁰]")


def extract_authors(rdf) -> str:
    page = rdf["page"]
    p1 = _sub(rdf, page == 1)
    texts = p1["texts"]
    if p1["_n"] == 0:
        return "Authors not found"

    lower_any = lambda pat: _any_match(pat, texts, lower=True)
    is_jsm = lower_any(r"jsm nanotechnology")
    is_nature = lower_any(r"nature")
    is_elsevier = lower_any(r"elsevier|sciencedirect")

    # reading order over page 1 via the STANDALONE detector (v10A.R:1064-1075)
    ncols, boundary = detect_page_layout(texts, p1["x"], p1["w"], p1["h"], p1["x_center"])
    if ncols == 2:
        col = np.where(p1["x_center"] < boundary, 1, 2)
        order = np.lexsort((p1["x"], p1["y"], col))
    else:
        order = np.lexsort((p1["x"], p1["y"]))
    p1 = _take(p1, order)
    texts = p1["texts"]
    y = p1["y"]

    authors_text = "Authors not found"
    if is_elsevier:
        # v10A.R:1078-1133
        best = None
        for i, t in enumerate(texts):
            if not (700 <= y[i] < 1000):
                continue
            if not _NAME_PAIR_RE.search(t):
                continue
            if re.search(r"^\*?\s*(Department|Faculty|Institute|Laboratory|School|College|Hospital)", t):
                continue
            if not (30 < len(t) < 500):
                continue
            score = (
                len(_NAME_PAIR_B_RE.findall(t)) * 5
                + (3 if re.search(r",|;", t) else 0)
                + (2 if re.search(r"[a-z°*†‡§¶#¹²³⁴⁵⁶⁷⁸⁹⁰]", t) else 0)
                + (2 if re.search(r"^[A-Z][a-z]+", t) else 0)
                - (10 if re.search(r"Department|University|Hospital|Institute|Laboratory|^\*", t) else 0)
            )
            if score > 5 and (best is None or (-score, y[i]) < best[0]):
                best = ((-score, y[i]), t)
        if best is not None:
            authors_text = best[1]
    elif is_jsm:
        # v10A.R:1136-1158: all candidates joined in y order
        picks = []
        for i, t in enumerate(texts):
            if not (600 <= y[i] < 1200):
                continue
            if (
                re.search(r"Mehrdad.*Tajkarimi|Kristen.*Rhinehardt", t)
                or len(_NAME_PAIR_RE.findall(t)) >= 3
                or (re.search(r"\d+,\d+", t) and len(t) > 50)
            ):
                picks.append((y[i], i))
        if picks:
            picks.sort()
            authors_text = " ".join(texts[i] for _, i in picks)
    elif is_nature:
        # v10A.R:1162-1175
        picks = [
            (y[i], i)
            for i, t in enumerate(texts)
            if 400 <= y[i] < 600 and re.search(r"([A-Z][a-z]+.*){2,}", t) and re.search(r"\d+", t)
        ]
        if picks:
            picks.sort()
            authors_text = " ".join(texts[i] for _, i in picks)
    else:
        # generic scoring (v10A.R:1179-1203)
        best = None
        for i, t in enumerate(texts):
            if re.search(r"^Editor:|^Edited by:|^Handling Editor:", t):
                continue
            name_count = len(_NAME_PAIR_RE.findall(t))
            score = (
                (4 if name_count >= 2 else 0)
                + (3 if _SUPERSCRIPT_RE.search(t) else 0)
                + (2 if t.count(",") >= 1 else 0)
                + (1 if 30 < len(t) < 1000 else 0)
            )
            if score >= 5 and (best is None or (-score, y[i]) < best[0]):
                best = ((-score, y[i]), t)
        if best is not None:
            authors_text = best[1]

    # deterministic cleanup = the reference's non-LLM branch (v10A.R:1253-1259)
    if "Authors not found" not in authors_text and len(authors_text) > 10:
        return scrub_authors(authors_text)
    return "Authors not found"


# ==========================================================================
# E4/E5 — abstract extractors (v10A.R:1348-1539, 2237-2304)

_NATURE_ABS_PROBE_RE = re.compile(
    r"Silver nanoparticles have already been successfully applied|antimicrobial technologies|biomedical.*products"
)
_JSM_ABS_PROBE_RE = re.compile(
    r"Escherichia coli can rapidly evolve resistance.*AgNP|experimental evolution.*demonstrate.*selection"
)


def extract_abstract_universal(rdf) -> str:
    page = rdf["page"]
    p1 = _sub(rdf, page == 1)
    texts_clean = [normalize_ws(t) for t in p1["texts"]]
    keep = [i for i, t in enumerate(texts_clean) if len(t) > 0]
    p1 = _take(p1, np.array(keep, dtype=np.int64))
    tc = [texts_clean[i] for i in keep]
    if p1["_n"] == 0:
        return "Abstract not found"
    y, area = p1["y"], p1["area"]

    joined_lower = " ".join(tc).lower()
    is_nature = re.search(r"nature.*nanotechnology|nature.*communications", joined_lower)
    is_jac = re.search(r"journal.*antimicrobial.*chemotherapy", joined_lower)
    is_jsm = re.search(r"jsm nanotechnology|scimed.*central", joined_lower)
    is_elsevier = re.search(r"elsevier|sciencedirect|computational.*structural.*biotechnology", joined_lower)

    if is_nature:
        # boxed abstract (v10A.R:1382-1402)
        cands = [
            (y[i], i)
            for i, t in enumerate(tc)
            if 300 <= y[i] < 900 and len(t) > 200 and area[i] > 30000 and _NATURE_ABS_PROBE_RE.search(t)
        ]
        if cands:
            cands.sort()
            return tc[cands[0][1]]

    if is_jsm:
        # v10A.R:1409-1443
        cands = [
            (y[i], i)
            for i, t in enumerate(tc)
            if _JSM_ABS_PROBE_RE.search(t)
            or (
                1000 <= y[i] < 1700
                and len(t) > 200
                and not re.search(r"Brentwood.*Biomedical|Department.*Nano|University.*USA", t)
            )
        ]
        if cands:
            cands.sort()
            probe = [i for _, i in cands if re.search(r"Escherichia coli can rapidly evolve", tc[i])]
            if probe:
                return tc[probe[0]]
            rest = [
                i for _, i in cands if not re.search(r"Department|University|Institute", tc[i])
            ]
            if rest:
                best = max(rest, key=lambda i: len(tc[i]))
                if len(tc[best]) > 0:
                    return tc[best]

    if is_jac:
        # structured abstract assembly (v10A.R:1447-1483)
        order = np.lexsort((p1["x"], y))
        comp = [
            i
            for i in order
            if re.search(r"^objectives?:|^methods?:|^results?:|^conclusions?:", tc[i].lower())
        ]
        if comp:
            return " ".join(tc[i] for i in comp)

    if is_elsevier:
        return extract_abstract_elsevier(rdf)

    # generic (v10A.R:1491-1538)
    order = np.lexsort((p1["x"], y))
    explicit = [i for i in order if re.search(r"^abstract\s*:?|^summary\s*:?", tc[i].lower())]
    if explicit:
        # arrange(y) then first
        first = min(explicit, key=lambda i: y[i])
        return re.sub(r"^(Abstract|ABSTRACT|Summary|SUMMARY)\s*:?\s*", "", tc[first])

    kinds = p1["kinds"]
    gen = [
        i
        for i in order
        if kinds[i] == KIND_TEXT
        and len(tc[i]) > 150
        and tc[i].count(".") >= 2
        and not re.search(r"^(highlights?|keywords?|introduction|university|department)", tc[i].lower())
    ]
    if gen:
        gen.sort(key=lambda i: -len(tc[i]))
        return tc[gen[0]]
    return "Abstract not found"


def extract_abstract_elsevier(rdf) -> str:
    """E5 (v10A.R:2237-2304)."""
    page = rdf["page"]
    p1 = _sub(rdf, page == 1)
    order = np.lexsort((p1["x"], p1["y"]))
    p1 = _take(p1, order)
    tc = [normalize_ws(t) for t in p1["texts"]]
    y, x = p1["y"], p1["x"]

    header = [
        i
        for i in range(len(tc))
        if re.search(r"^ABSTRACT\s*$|^A\s*B\s*S\s*T\s*R\s*A\s*C\s*T", tc[i].upper())
    ]
    if header:
        hi = min(header, key=lambda i: y[i])
        y0, x0 = y[hi], x[hi]
        cands = [
            i
            for i in range(len(tc))
            if y[i] > y0
            and y[i] < y0 + 800
            and abs(x[i] - x0) < 200
            and len(tc[i]) > 50
            and not re.search(r"keywords?:|article info", tc[i].lower())
        ]
        if cands:
            cands.sort(key=lambda i: y[i])
            return " ".join(tc[i] for i in cands)

    right = [
        i
        for i in range(len(tc))
        if x[i] > 1000
        and 600 < y[i] < 1400
        and len(tc[i]) > 100
        and not re.search(r"keywords?:|article info|doi:", tc[i].lower())
    ]
    if right:
        right.sort(key=lambda i: y[i])
        return " ".join(tc[i] for i in right[:2])
    return "Abstract not found"


# ==========================================================================
# E7 — extract_main_text_smart (v10A.R:1598-1842). The MDPI front-matter
# strip and clinical-trial end-search inside the generic path are DEAD CODE
# in the reference (the is_mdpi early-return at v10A.R:1612-1615 fires on
# exactly the same condition), so they are intentionally not ported.

_INTRO_GENERAL_RE = re.compile(r"introduction|^1\.\s+introduction")
_INTRO_NUMBERED_RE = re.compile(r"^1\.\s+[A-Z]")
_PROPER_START_RE = re.compile(r"^[A-Z][a-z]")


def extract_main_text_smart(rdf, doc_format: str):
    all_lower_has = lambda pat: _any_match(pat, rdf["texts"], lower=True)
    is_mdpi = doc_format == "mdpi" or all_lower_has(r"mdpi")
    is_elsevier = doc_format == "elsevier" or all_lower_has(r"elsevier|sciencedirect")
    if is_mdpi:
        return extract_main_text_mdpi(rdf)
    if is_elsevier:
        return extract_main_text_elsevier(rdf)

    # textual spans only, per-page re-sort via the CLASS-METHOD detector
    # (v10A.R:1625-1654)
    kinds = rdf["kinds"]
    texts = rdf["texts"]
    mask = np.fromiter(
        ((kinds[i] in _TEXTUAL) and texts[i].strip() != "" for i in range(len(texts))),
        dtype=bool,
        count=len(texts),
    )
    f = _sub(rdf, mask)

    parts = []
    for p in np.unique(f["page"]):
        pidx = np.nonzero(f["page"] == p)[0]
        sub = _take(f, pidx)
        ncols, boundary = detect_page_layout_method(sub["x_center"], sub["w"])
        if ncols == 2:
            col = np.where(sub["x_center"] < boundary, 1, 2)
            order = np.lexsort((sub["x"], sub["y"], col))
        else:
            order = np.lexsort((sub["x"], sub["y"]))
        parts.append(pidx[order])
    idx = np.concatenate(parts) if parts else np.array([], dtype=np.int64)
    f = _take(f, idx)

    tclean = [normalize_ws(t) for t in f["texts"]]
    keep = [i for i, t in enumerate(tclean) if t]
    f = _take(f, np.array(keep, dtype=np.int64))
    tclean = [tclean[i] for i in keep]
    tlower = [t.lower() for t in tclean]
    n = len(tclean)
    if n == 0:
        return {"main": "", "original": "", "start": 0, "end": 0}

    # intro scoring (v10A.R:1699-1728); row_id is 1-based
    best = None
    for i in range(n):
        score = (
            (5 if _INTRO_GENERAL_RE.search(tlower[i]) else 0)
            + (3 if _INTRO_NUMBERED_RE.search(tclean[i]) else 0)
            + (1 if len(tclean[i]) > 100 else 0)
            + (1 if _PROPER_START_RE.search(tclean[i]) else 0)
        )
        if score >= 3 and (best is None or (-score, i) < best):
            best = (-score, i)
    start_idx = best[1] + 1 if best is not None else min(15, n)
    end_idx = n

    start_idx = max(1, start_idx)
    if start_idx > end_idx:
        start_idx, end_idx = 1, n

    main = " ".join(tclean[start_idx - 1 : end_idx])
    main = dedup_sentences(main)
    original = " ".join(tclean)
    return {"main": main, "original": original, "start": start_idx, "end": end_idx}


# ==========================================================================
# E8 — extract_main_text_mdpi_simplified (v10A.R:2077-2235)

def extract_main_text_mdpi(rdf):
    kinds = rdf["kinds"]
    texts = rdf["texts"]
    mask = np.fromiter(
        ((kinds[i] in _TEXTUAL) and texts[i].strip() != "" for i in range(len(texts))),
        dtype=bool,
        count=len(texts),
    )
    f = _sub(rdf, mask)
    order = np.lexsort((f["x"], f["y"], f["page"]))  # arrange(page, y, x)
    f = _take(f, order)
    tclean = [normalize_ws(t) for t in f["texts"]]
    keep = [i for i, t in enumerate(tclean) if t]
    f = _take(f, np.array(keep, dtype=np.int64))
    tclean = [tclean[i] for i in keep]
    tlower = [t.lower() for t in tclean]
    n0 = len(tclean)
    if n0 == 0:
        return {"main": "", "original": "", "start": 0, "end": 0}

    # main-content X zone from page-1 'abstract' block (v10A.R:2100-2113)
    p1 = [i for i in range(n0) if f["page"][i] == 1]
    zone = [i for i in p1 if "abstract" in tlower[i] and len(tclean[i]) > 100]
    if zone:
        x_min = float(np.min(f["x"][zone]))
    else:
        x_min = 300.0

    zidx = [i for i in range(n0) if f["x"][i] >= x_min - 50]
    z = _take(f, np.array(zidx, dtype=np.int64))
    ztc = [tclean[i] for i in zidx]
    ztl = [tlower[i] for i in zidx]
    n = len(ztc)
    if n == 0:
        return {"main": "", "original": " ".join(tclean), "start": 0, "end": 0}

    # start: "^Abstract:" within the first 20 (v10A.R:2124-2156)
    start_idx = None
    for i in range(min(20, n)):
        if re.search(r"^abstract:?\s", ztl[i]) or re.search(r"^Abstract:", ztc[i]):
            start_idx = i + 1
            break
    if start_idx is None:
        for i in range(min(20, n)):
            if len(ztc[i]) > 100 and re.search(
                r"Methicillin-resistant|MRSA|silver nanoparticles", ztc[i]
            ):
                start_idx = i + 1
                break
    if start_idx is None:
        start_idx = 3

    # end: References shifted back left, or explicit end sections
    # (v10A.R:2158-2184); R `a:b` may DESCEND when the start bound exceeds n.
    end_idx = n
    lo = max(start_idx + 20, r_round(n * 0.7))
    for i in r_seq(lo, n):
        if i < 1 or i > n:
            continue
        tl, t_x = ztl[i - 1], z["x"][i - 1]
        if re.search(r"^references?\s*$", tl) and t_x < (x_min + 50):
            end_idx = i - 1
            break
        if re.search(
            r"^supplementary materials?:|^author contributions?:|^funding:|^institutional review", tl
        ):
            end_idx = i - 1
            break

    start_idx = max(1, start_idx)
    end_idx = min(end_idx, n)
    if start_idx > end_idx:
        start_idx, end_idx = 1, r_round(n * 0.8)

    main = " ".join(ztc[start_idx - 1 : end_idx])
    main = scrub_citations(main)
    main = dedup_sentences(main)
    original = " ".join(tclean)
    return {"main": main, "original": original, "start": start_idx, "end": end_idx}


# ==========================================================================
# E9 — extract_main_text_elsevier (v10A.R:2350-2489)

_ELS_INFO_RE = re.compile(r"article info|keywords")
_ELS_INTRO_RE = re.compile(r"^1\.\s+Introduction|^Introduction$|^1\. Introduction")
_ELS_END_RE = re.compile(
    r"^References\s*$|^Acknowledgments?|^Author\s+statement|^CRediT\s+authorship|^Declaration\s+of\s+Competing|^Compliance\s+with\s+ethics"
)


def extract_main_text_elsevier(rdf):
    kinds = rdf["kinds"]
    texts = rdf["texts"]
    mask = np.fromiter(
        ((kinds[i] in _TEXTUAL) and texts[i].strip() != "" for i in range(len(texts))),
        dtype=bool,
        count=len(texts),
    )
    f = _sub(rdf, mask)

    parts = []
    for p in np.unique(f["page"]):
        pidx = np.nonzero(f["page"] == p)[0]
        sub = _take(f, pidx)
        if p == 1:
            # split article-info vs main (v10A.R:2362-2393)
            tcl = [normalize_ws(t).lower() for t in sub["texts"]]
            info = np.fromiter((_ELS_INFO_RE.search(t) is not None for t in tcl), dtype=bool, count=len(tcl))
            info_idx = np.nonzero(info)[0]
            info_order = np.lexsort((sub["x"][info_idx], sub["y"][info_idx]))
            main_idx = np.nonzero(~info)[0]
            if main_idx.size:
                ncols, boundary = detect_page_layout_method(
                    sub["x_center"][main_idx], sub["w"][main_idx]
                )
                if ncols == 2:
                    col = np.where(sub["x_center"][main_idx] < boundary, 1, 2)
                    morder = np.lexsort((sub["x"][main_idx], sub["y"][main_idx], col))
                else:
                    morder = np.lexsort((sub["x"][main_idx], sub["y"][main_idx]))
                parts.append(pidx[np.concatenate([info_idx[info_order], main_idx[morder]])])
            else:
                parts.append(pidx[info_idx[info_order]])
        else:
            ncols, boundary = detect_page_layout_method(sub["x_center"], sub["w"])
            if ncols == 2:
                col = np.where(sub["x_center"] < boundary, 1, 2)
                order = np.lexsort((sub["x"], sub["y"], col))
            else:
                order = np.lexsort((sub["x"], sub["y"]))
            parts.append(pidx[order])
    idx = np.concatenate(parts) if parts else np.array([], dtype=np.int64)
    f = _take(f, idx)
    tclean = [normalize_ws(t) for t in f["texts"]]
    tlower = [t.lower() for t in tclean]
    n = len(tclean)
    if n == 0:
        return {"main": "", "original": "", "start": 0, "end": 0}

    intro_start = None
    for i in range(n):
        if not _ELS_INFO_RE.search(tlower[i]) and _ELS_INTRO_RE.search(tclean[i]):
            intro_start = i + 1
            break
    if intro_start is None:
        # fallback: 3rd substantial page-1 row outside the info box
        # (v10A.R:2429-2440); fewer than 3 -> none (R slice(3) empty)
        fb = [
            i + 1
            for i in range(n)
            if not re.search(r"article info|keywords|received.*revised.*accepted", tlower[i])
            and len(tclean[i]) > 100
            and f["page"][i] == 1
        ]
        if len(fb) >= 3:
            intro_start = fb[2]

    ends = [i + 1 for i in range(n) if _ELS_END_RE.search(tclean[i])]
    end_idx = ends[0] - 1 if ends else n

    if intro_start is not None:
        rows = [i for i in r_seq(intro_start, end_idx) if 1 <= i <= n]
        rows = [
            i for i in rows if not re.search(r"^keywords:|^article info|^abbreviations", tlower[i - 1])
        ]
        main = " ".join(tclean[i - 1] for i in rows)
        start_out = intro_start
    else:
        rows = [i for i in r_seq(10, end_idx) if 1 <= i <= n]
        main = " ".join(tclean[i - 1] for i in rows)
        start_out = 10

    main = re.sub(r"\[\d+\]", "", main)
    main = normalize_ws(main)
    original = " ".join(tclean)
    return {"main": main, "original": original, "start": start_out, "end": end_idx}


# ==========================================================================
# E2 — extract_title_elsevier (v10A.R:2306-2348): y-banded multi-line merge.


def extract_title_elsevier(rdf) -> str:
    page = rdf["page"]
    p1 = _sub(rdf, page == 1)
    order = np.lexsort((p1["x"], p1["y"]))
    p1 = _take(p1, order)
    tc = [normalize_ws(t) for t in p1["texts"]]
    y = p1["y"]
    cands = [
        i
        for i in range(len(tc))
        if 400 < y[i] < 800
        and 30 < len(tc[i]) < 400
        and not re.search(
            r"journal|elsevier|doi:|review article|research article|sciencedirect", tc[i].lower()
        )
        and not re.search(r"^(article|paper|correspondence)\s*$", tc[i].lower())
        and re.search(r"^[A-Z].*[a-z]", tc[i])
        and tc[i].count(" ") > 3
    ]
    if not cands:
        return "Title not found"
    cands.sort(key=lambda i: y[i])
    y0 = y[cands[0]]
    merged = [tc[i] for i in cands if y[i] < y0 + 200]
    return normalize_ws(" ".join(merged))


# ==========================================================================
# E6 — extract_abstract_with_llm (v10A.R:1267-1346): LLM-region slice else
# aggressive scoring. The deterministic path passes structure=None.


def extract_abstract_from_regions(rdf, structure=None) -> str:
    page = rdf["page"]
    p1 = _sub(rdf, page == 1)
    order = np.lexsort((p1["x"], p1["y"]))
    p1 = _take(p1, order)
    texts = p1["texts"]
    n = len(texts)
    abstract_text = None
    regions = (structure or {}).get("abstract_regions")
    if regions:
        rows = [r for r in regions if 1 <= r <= n]
        if rows:
            abstract_text = " ".join(texts[r - 1] for r in rows)
    if abstract_text is None:
        scored = []
        for i, t in enumerate(texts):
            if re.search(r"^abstract|^summary", t.lower()):
                s = 10
            elif len(t) > 200 and re.search(r"nanomaterials|nanocrystals|antibacterial", t):
                s = 8
            elif len(t) > 150 and t.count(".") >= 2:
                s = 6
            elif len(t) > 100 and t.count(".") >= 1:
                s = 4
            else:
                s = 0
            if s >= 4:
                scored.append((-s, -len(t), i))
        if scored:
            scored.sort()
            abstract_text = texts[scored[0][2]]
        else:
            large = [i for i in range(n) if len(texts[i]) > 50]
            if large:
                abstract_text = texts[max(large, key=lambda i: len(texts[i]))]
            else:
                return "Abstract not found"
    if not abstract_text:
        return "Abstract not found"
    out = re.sub(r"^(Abstract|ABSTRACT|Summary|SUMMARY):?\s*", "", abstract_text)
    return normalize_ws(out)


# ==========================================================================
# E10 — extract_body_text_only (v10A.R:1844-1918): conservative boundaries
# + running-header filter; <1000-char fallback to E7.


def extract_body_text_only(rdf, doc_format: str) -> str:
    texts = rdf["texts"]
    mask = np.fromiter(
        (len(texts[i].strip()) > 10 for i in range(len(texts))), dtype=bool, count=len(texts)
    )
    f = _sub(rdf, mask)
    order = np.lexsort((f["x"], f["y"], f["page"]))
    f = _take(f, order)
    tclean = [re.sub(r"\s+", " ", t) for t in f["texts"]]
    page = f["page"]
    n = len(tclean)
    if n == 0:
        return ""

    best = None
    for i in range(n):
        score = (
            (2 if re.search(r"introduction|background|infectious diseases|noble metal", tclean[i].lower()) else 0)
            + (1 if re.search(r"^\d+\.?\s", tclean[i]) else 0)
            + (1 if len(tclean[i]) > 100 else 0)
            + (1 if page[i] <= 2 else 0)
        )
        if score >= 2 and (best is None or (-score, page[i], i) < best):
            best = (-score, page[i], i)
    start_row = best[2] + 1 if best is not None else 10

    end_row = None
    for i in range(n):
        t = tclean[i].strip()
        is_ref = bool(re.search(r"^\s*References\s*$|^\s*REFERENCES\s*$", t))
        is_ack = bool(re.search(r"^\s*Acknowledgments?\s*$", t))
        if (
            (is_ref or is_ack)
            and len(t) < 50
            and page[i] >= 6
            and not re.search(r"doi|www\.|http", tclean[i].lower())
        ):
            end_row = i + 1
            break

    if end_row is not None:
        rows = [i for i in r_seq(start_row, end_row - 1) if 1 <= i <= n]
        body = " ".join(tclean[i - 1] for i in rows).strip()
    else:
        rows = [i for i in r_seq(start_row, n) if 1 <= i <= n]
        body = " ".join(
            tclean[i - 1]
            for i in rows
            if not re.search(r"^\s*NATURE COMMUNICATIONS.*\|.*DOI", tclean[i - 1])
            and not re.search(r"^\s*URE COMMUNICATIONS.*\|.*DOI", tclean[i - 1])
            and len(tclean[i - 1]) > 20
        ).strip()

    if len(body) < 1000:
        return extract_main_text_smart(rdf, doc_format)["main"]
    return body


# ==========================================================================
# E11 — extract_content_simple_universal (v10A.R:1967-2075): the
# process_document_simple path.

_E11_INTRO_PATTERNS = [
    r"Silver, either in ionic form.*Ag.*nanoparticles",
    r"^Introduction\s*$",
    r"^Silver.*ionic.*form.*AgNPs.*toxic.*bacteria",
]


def extract_content_simple_universal(rdf):
    texts = rdf["texts"]
    mask = np.fromiter(
        (texts[i] is not None and len(texts[i].strip()) > 5 for i in range(len(texts))),
        dtype=bool,
        count=len(texts),
    )
    f = _sub(rdf, mask)
    order = np.lexsort((f["x"], f["y"], f["page"]))  # arrange(page, y, x)
    f = _take(f, order)
    tclean = [normalize_ws(t) for t in f["texts"]]
    n = len(tclean)
    if n == 0:
        return {"title": "Title not found", "authors": "Authors not found",
                "abstract": "Abstract not found", "main_content": ""}
    page, y = f["page"], f["y"]

    title = "Title not found"
    tcands = [
        (y[i], i)
        for i in range(n)
        if page[i] == 1
        and 20 < len(tclean[i]) < 300
        and re.search(
            r"Selection.*Silver|Bacterial.*resistance.*silver|Silver.*Nanoparticle.*Resistance",
            tclean[i],
        )
        and not re.search(r"journal|doi|university|department", tclean[i].lower())
    ]
    if tcands:
        tcands.sort()
        title = tclean[tcands[0][1]]

    authors = "Authors not found"
    acands = [
        (y[i], i)
        for i in range(n)
        if page[i] == 1
        and len(_NAME_PAIR_RE.findall(tclean[i])) >= 3
        and len(tclean[i]) > 50
        and not re.search(r"Department|University|Abstract|Escherichia|resistance", tclean[i])
    ]
    if acands:
        acands.sort()
        authors = tclean[acands[0][1]]

    abstract = "Abstract not found"
    abcands = [
        i
        for i in range(n)
        if page[i] == 1
        and len(tclean[i]) > 150
        and re.search(
            r"Escherichia coli.*resistance|experimental evolution.*demonstrate|AgNP.*selection",
            tclean[i],
        )
        and not re.search(r"Department|University|Institute|^Silver,", tclean[i])
    ]
    if abcands:
        abstract = max(abcands, key=lambda i: len(tclean[i]))
        abstract = tclean[abstract]

    intro_idx = None
    for i in range(n):
        for pat in _E11_INTRO_PATTERNS:
            if re.search(pat, tclean[i]):
                intro_idx = i + 1
                break
        if intro_idx is not None:
            break
    if intro_idx is None:
        fb = [
            i + 1
            for i in range(n)
            if len(tclean[i]) > 100
            and re.search(r"^Silver.*toxic.*bacteria|Silver.*nanoparticles.*bacteria", tclean[i])
            and not re.search(r"Department|University", tclean[i])
        ]
        intro_idx = fb[0] if fb else 25

    rows = [i for i in r_seq(intro_idx, n) if 1 <= i <= n]
    main = " ".join(tclean[i - 1] for i in rows)
    main = re.sub(r"(\. [^.]{50,}?)\1+", r"\1", main)
    main = re.sub(r"ABBREVIATIONS.*?(?=(Introduction|Silver|[A-Z][a-z]+\s+[a-z]+))", "", main)
    main = normalize_ws(main)
    return {"title": title, "authors": authors, "abstract": abstract, "main_content": main}
