"""Region classifiers, predicates, hint annotation, boundary finders, and
the LLM-response parser (SURVEY.md §2.2 M9–M17, M26; §2.3 E12/E13; §2.5 J2).

Everything is vectorized over the rdf arrays (numpy.select-style ladders);
all are pure functions usable inside ``map_batches``. The LLM parser M26
exists because the OPTIONAL LLM analysis stage (A4) must parse model
output; the deterministic default path never calls a model — the
``default_structure()`` fallback (v10A.R:1030-1035) is what the flagship
pipeline uses.
"""

from __future__ import annotations

import json
import re

import numpy as np

# ==========================================================================
# M13/M14/M15 — header / body-start / body-end predicates (v10A.R:2492-2525)

_SECTION_HEADER_PATTERNS = [
    r"^\d+\. [A-Z]",
    r"^\d+ [A-Z]",
    r"^[A-Z]{2,}$",
    r"^[A-Z][a-z]+ [A-Z][a-z]+",
    r"^(Introduction|Methods|Results|Discussion|Conclusion)$",
    r"^(Materials and Methods|Results and Discussion)$",
]
_BODY_START_PATTERNS = [
    r"^(INTRODUCTION|Introduction)$",
    r"^1\. ",
    r"^1 ",
    r"^(Background|Objectives?|Aims?)$",
    r"^(Materials and Methods|Methods)$",
]
_BODY_END_PATTERNS = [
    r"^(References|REFERENCES|Bibliography|BIBLIOGRAPHY)$",
    r"^(Acknowledgments?|ACKNOWLEDGMENTS?)$",
    r"^(Conflicts? of Interest|CONFLICTS? OF INTEREST)$",
    r"^(Competing Interests|COMPETING INTERESTS)$",
    r"^(Appendix|APPENDIX|Supplementary|SUPPLEMENTARY)$",
    r"^(Supporting Information|SUPPORTING INFORMATION)$",
]

_SECTION_RES = [re.compile(p) for p in _SECTION_HEADER_PATTERNS]
_START_RES = [re.compile(p) for p in _BODY_START_PATTERNS]
_END_RES = [re.compile(p) for p in _BODY_END_PATTERNS]


def detect_section_header(text: str) -> bool:
    return any(rx.search(text) for rx in _SECTION_RES)


def detect_body_start(text: str) -> bool:
    return any(rx.search(text) for rx in _START_RES)


def detect_body_end(text: str) -> bool:
    return any(rx.search(text) for rx in _END_RES)


# ==========================================================================
# M9 — region hint annotator (prepare_regions_for_analysis, v10A.R:821-863)


def region_hints(texts, kinds, y, w, h):
    """Returns (region_id 1-based, text_preview<=400, element_hint) for
    page-1 regions already (y, x)-sorted. case_when: first match wins."""
    hints, previews = [], []
    for i, t in enumerate(texts):
        tl = t.lower()
        n = len(t)
        if re.search(r"^Editor:|^Edited by:|^Handling Editor:", t):
            h_ = "editor_info"
        elif re.search(r"[°*†‡§¶#¹²³⁴⁵⁶⁷⁸⁹⁰]", t) and len(
            re.findall(r"[A-Z][a-z]+\s+[A-Z][a-z]+", t)
        ) >= 2:
            h_ = "likely_author"
        elif y[i] < 600 and 50 < n < 300 and kinds[i] == "title":
            h_ = "likely_title"
        elif re.search(r"abstract|summary", tl) or (n > 500 and 600 < y[i] < 2000):
            h_ = "likely_abstract"
        elif re.search(r"^1\.|introduction", tl):
            h_ = "likely_introduction"
        elif re.search(r"environmental significance", tl):
            h_ = "likely_env_sig"
        elif re.search(r"doi|cite|received|accepted|rsc\.li", t):
            h_ = "likely_citation"
        elif re.search(r"university|department|institute|school", t) and not re.search(
            r"[°*†‡§¶#]", t
        ):
            h_ = "likely_affiliations"
        elif w[i] * h[i] < 10000:
            h_ = "likely_metadata"
        else:
            h_ = "unknown"
        hints.append(h_)
        clean = re.sub(r"\s+", " ", t)
        previews.append(clean if len(t) <= 400 else clean[:397] + "...")
    return list(range(1, len(texts) + 1)), previews, hints


# ==========================================================================
# M10 — classify_content_type (v10A.R:2643-2654)


def classify_content_type(text: str, text_length: int) -> str:
    if re.search(r"bioRxiv|doi:|preprint|copyright|license", text):
        return "metadata"
    if re.search(r"^(TITLE|AUTHORS?|ABSTRACT|SUMMARY)$", text):
        return "front_matter"
    if re.search(r"Department of|University of|@.*\.edu", text):
        return "affiliations"
    if detect_section_header(text):
        return "section_header"
    if detect_body_end(text):
        return "end_matter"
    if text_length > 200 and re.search(r"\. ", text):
        return "body_text"
    if re.search(r"^\d+\. ", text) and text_length < 100:
        return "reference_item"
    return "unknown"


# ==========================================================================
# M11 — classify_content_for_extraction (v10A.R:2656-2692)


def classify_content_for_extraction(text: str, page_num: int, y_pos: float, text_length: int) -> str:
    tl = text.lower()
    if page_num == 1:
        if re.search(r"DOI:|doi:|www\.|http", text):
            return "metadata"
        if y_pos < 400 and text_length < 300:
            return "title"
        if re.search(r"([A-Z][a-z]+\s+){2,}", text) and re.search(r"@|university", text):
            return "authors"
        if re.search(r"abstract|summary", tl) or (text_length > 200 and 400 < y_pos < 1000):
            return "abstract"
        if re.search(r"university|department|institute", tl) and text_length > 50:
            return "affiliations"
    if page_num >= 3:
        if re.search(r"^\d+\.\s.*et al\.|journal|proc\.|vol\.", text) and text_length < 500:
            return "reference"
        if re.search(r"^references?$|^bibliography$", tl) and text_length < 100:
            return "reference_header"
        if re.search(r"chemical reagents|preparation and characterization|statistical analysis", tl):
            return "methods_detail"
        if re.search(r"^methods$|materials and methods", tl) and text_length < 100:
            return "methods_header"
        if re.search(r"author contribution|competing interest|data availability|supplementary", tl):
            return "publication_info"
        if re.search(r"Creative Commons|license|copyright|©", text) and text_length > 100:
            return "copyright"
        if re.search(r"acknowledgment|funding|supported by|grant", tl):
            return "acknowledgments"
    if re.search(r"^introduction$|^1\.|infectious diseases|background", tl):
        return "introduction"
    if re.search(r"^results$|^discussion$|^conclusion", tl):
        return "section_header"
    if text_length > 100 and text.count(".") >= 2:
        return "body_text"
    return "unknown"


# ==========================================================================
# M12 — classify_content_universal (v10A.R:2694-2744): additive scores,
# argmax>=2 else unknown; tie -> first in list order (R which.max)

_M12_ORDER = ["title", "authors", "abstract", "section_header", "body_text", "metadata", "reference"]


def classify_content_universal(text: str, text_length: int, y_pos: float, element_type: str = "unknown") -> str:
    tl = text.lower()
    s = dict.fromkeys(_M12_ORDER, 0)
    if y_pos < 500 and 20 < text_length < 300:
        s["title"] += 2
    if re.search(r"^[A-Z].*[a-z]", text) and not re.search(r"^(journal|article|doi)", tl):
        s["title"] += 1
    if element_type == "title":
        s["title"] += 3
    if re.search(r"([A-Z][a-z]+\s+){1,}[A-Z][a-z]+", text):
        s["authors"] += 2
    if re.search(r"\d+|@|university|department", text):
        s["authors"] += 1
    if 300 < y_pos < 800 and text_length < 500:
        s["authors"] += 1
    if re.search(r"abstract|summary", tl):
        s["abstract"] += 3
    if 200 < text_length < 2000 and y_pos > 400:
        s["abstract"] += 2
    if text.count(".") >= 3 and re.search(r"\b(the|and|of|in|to)\b", text):
        s["abstract"] += 1
    if re.search(r"^\d+\.\s+[A-Z]|^[A-Z]{2,}\s*$", text):
        s["section_header"] += 3
    if re.search(r"^(introduction|methods|results|discussion|conclusion)", tl):
        s["section_header"] += 2
    if text_length > 100 and text.count(".") >= 1:
        s["body_text"] += 1
    if y_pos > 600:
        s["body_text"] += 1
    if re.search(r"doi|copyright|received|accepted|published", tl):
        s["metadata"] += 3
    if re.search(r"©|journal|volume|issue|page", tl):
        s["metadata"] += 2
    if re.search(r"^\d+\.\s", text) and text_length < 200:
        s["reference"] += 2
    if re.search(r"et al\.|journal|vol\.|pp\.", tl):
        s["reference"] += 1
    best = max(_M12_ORDER, key=lambda k: (s[k], -_M12_ORDER.index(k)))
    return best if s[best] >= 2 else "unknown"


# ==========================================================================
# M16/M17 — vectorized front/end-matter detectors (v10A.R:2527-2595)


def detect_front_matter(texts, y_pos, page_num) -> np.ndarray:
    n = len(texts)
    out = np.zeros(n, dtype=bool)
    for i in range(n):
        if page_num[i] != 1:
            continue
        t, tl, y = texts[i], texts[i].lower(), y_pos[i]
        ln = len(t)
        is_title = y < 600 and 20 < ln < 300 and not re.search(r"^(introduction|methods|results)", tl)
        is_authors = bool(
            re.search(r"([A-Z][a-z]+\s+){1,}[A-Z][a-z]+", t)
            and (re.search(r"\d+|@|university|department", t) or y < 800)
        )
        is_abstract = bool(
            re.search(r"abstract|summary", tl) or (ln > 200 and 400 < y < 1200 and t.count(".") >= 3)
        )
        is_affil = bool(re.search(r"university|department|institute|school", tl) and ln > 50)
        out[i] = is_title or is_authors or is_abstract or is_affil
    return out


def detect_end_matter(texts, page_num, text_lengths) -> np.ndarray:
    n = len(texts)
    out = np.zeros(n, dtype=bool)
    for i in range(n):
        if page_num[i] < 3:
            continue
        t = texts[i]
        tl = t.strip().lower()
        ln = text_lengths[i]
        is_ref = bool(re.search(r"^references?$|^bibliography$", tl) and ln < 50)
        is_ack = bool(re.search(r"^acknowledgments?$|^acknowledgements?$", tl) and ln < 50)
        is_item = bool(
            re.search(r"^\d+\.\s", t) and ln < 300 and re.search(r"et al\.|journal|proc\.|vol\.", t)
        )
        is_auth = bool(
            re.search(r"author contribution|competing interest|data availability", tl) and ln < 200
        )
        out[i] = is_ref or is_ack or is_item or is_auth
    return out


# ==========================================================================
# E12 — find_content_boundaries (v10A.R:2746-2802)


def find_content_boundaries(texts, page_num, y_pos):
    """Returns (start_row, end_row) 1-based or None — classifier-driven."""
    n = len(texts)
    lens = [len(t) for t in texts]
    ctypes = [classify_content_type(texts[i], lens[i]) for i in range(n)]
    starts = [i + 1 for i in range(n) if detect_body_start(texts[i])]
    ends = [i + 1 for i in range(n) if detect_body_end(texts[i])]

    if not starts:
        fm = [i + 1 for i in range(n) if ctypes[i] in ("front_matter", "affiliations", "metadata")]
        if fm:
            fm_end = max(fm)
            starts = [
                i + 1
                for i in range(n)
                if i + 1 > fm_end and ctypes[i] in ("section_header", "body_text")
            ][:1]
    if not ends:
        refs = [i + 1 for i in range(n) if ctypes[i] == "reference_item"]
        if refs:
            ends = [refs[0]]

    start = starts[0] if starts else None
    end = ends[0] if ends else None
    if start is not None and end is not None and start >= end:
        start = None
    return start, end


# ==========================================================================
# E13 — find_main_content_boundaries (v10A.R:2804-2839)


def find_main_content_boundaries(texts, page_num, y_pos):
    n = len(texts)
    lens = [len(t) for t in texts]
    cats = [
        classify_content_for_extraction(texts[i], int(page_num[i]), float(y_pos[i]), lens[i])
        for i in range(n)
    ]
    intro = [i + 1 for i in range(n) if cats[i] == "introduction"]
    if not intro:
        intro = [
            i + 1
            for i in range(n)
            if (page_num[i] > 1 or (page_num[i] == 1 and y_pos[i] > 1000)) and cats[i] == "body_text"
        ][:1]
    start = intro[0] if intro else max(1, round(n * 0.1))

    end_cats = ("reference", "reference_header", "methods_detail", "publication_info", "copyright", "acknowledgments")
    ends = [i + 1 for i in range(n) if cats[i] in end_cats]
    end = (ends[0] - 1) if ends else round(n * 0.9)
    return start, min(end, n)


# ==========================================================================
# J2 — abstract-tail boundary lookup (v7.R:731-761; debug v10A.R:3386-3412)


def find_abstract_tail_in_body(abstract: str, body_texts, tail_words: int = 6):
    """Locate the row whose text contains the last N words of the abstract;
    returns a 1-based row id or None."""
    if not abstract:
        return None
    words = abstract.strip().split()
    if not words:
        return None
    tail = " ".join(words[-tail_words:])
    for i, t in enumerate(body_texts):
        if tail in t:
            return i + 1
    return None


# ==========================================================================
# M26 — LLM-response JSON parser (v10A.R:914-1040)

_REGION_KEYS = ("title_regions", "author_regions", "abstract_regions", "introduction_regions")


def default_structure():
    """The deterministic fallback the flagship path uses (v10A.R:1030-1035)."""
    return {
        "title_regions": [1],
        "author_regions": [2],
        "abstract_regions": [3, 4, 5],
        "introduction_regions": None,
        "other_regions": {},
    }


def parse_llm_response(response: str):
    """Brace-balance JSON extraction, json parse, regex fallback, then the
    defaults — the full M26 ladder."""
    s = response.strip()
    start = s.find("{")
    if start != -1:
        part = s[start:]
        depth = 0
        end = None
        for i, ch in enumerate(part):
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        if end is not None:
            try:
                info = json.loads(part[: end + 1])
                out = default_structure()
                out.update({k: v for k, v in info.items() if v is not None})
                for k in _REGION_KEYS:
                    if out.get(k) is not None and not isinstance(out[k], list):
                        out[k] = [out[k]]
                return out
            except (json.JSONDecodeError, TypeError):
                pass
    # enhanced fallback (v10A.R:984-1040)
    out = {k: None for k in _REGION_KEYS}
    out["other_regions"] = {}
    found_any = False
    for key in ("title_regions", "author_regions", "abstract_regions"):
        m = re.search(key + r"[^\[]*\[([0-9,\s]+)\]", response)
        if m:
            nums = [int(x) for x in re.findall(r"\d+", m.group(1))]
            if nums:
                out[key] = nums
                found_any = True
    if not found_any:
        out["title_regions"] = [1]
        out["author_regions"] = [2]
        out["abstract_regions"] = [3, 4, 5]
    return out


# ==========================================================================
# v7-era layout detectors (SURVEY.md §2.10): kept for coverage parity

def detect_page_layout_simple(x_center, page_width) -> tuple[int, float | None]:
    """v7.R:2199-2223: sorted x-centers; any gap > 0.2*page_width splits."""
    xs = np.sort(np.asarray(x_center, dtype=np.float64))
    if xs.size < 3:
        return 1, None
    gaps = np.diff(xs)
    gi = int(np.argmax(gaps))
    if gaps[gi] > 0.2 * page_width:
        return 2, float((xs[gi] + xs[gi + 1]) / 2)
    return 1, None


def detect_page_layout_quantile(x_center, areas, page_width) -> tuple[int, float | None]:
    """v7.R:2225-2279: drop regions below the 0.3 area quantile, then exact
    2-means with a 0.15*page_width gap acceptance."""
    from .columns import exact_two_means

    x = np.asarray(x_center, dtype=np.float64)
    a = np.asarray(areas, dtype=np.float64)
    if x.size < 3:
        return 1, None
    thr = np.quantile(a, 0.3)
    keep = x[a >= thr]
    if keep.size < 4:
        return 1, None
    km = exact_two_means(keep)
    if km is None:
        return 1, None
    centers, _, _ = km
    if centers[1] - centers[0] > 0.15 * page_width:
        return 2, float(np.mean(centers))
    return 1, None
