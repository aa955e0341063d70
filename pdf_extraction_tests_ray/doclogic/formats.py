"""Publisher-format detection and the format-plugin registry.

Two distinct detections exist in the reference and both are kept:

1. **Banding flags** (``sort_by_reading_order_universal_stdaln``,
   v10A.R:243-247): four per-page boolean flags computed from page-1 text,
   checked in the order elsevier -> nature -> jac -> jsm -> generic. These
   drive the page-1 band segmentation (reading_order.py).
2. **Scored document format** (``detect_document_format``,
   v10A.R:607-683): weighted regex scoring over page-1 text producing one of
   ``mdpi | nature_communications | rsc | elsevier | generic_academic``;
   ties resolve to the FIRST maximal entry in the reference's list order
   (R ``which.max`` semantics).

The registry at the bottom is the engine's user-extension surface
(SURVEY.md §2.10): a publisher is added by registering a
:class:`FormatRules` with band definitions — no pipeline change.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from ..schema import KIND_ABANDON, KIND_TEXT

# --------------------------------------------------------------------------
# banding flags (v10A.R:243-247); patterns applied to tolower(text) per span

_NATURE_RE = re.compile(r"nature.*nanotechnology|nature.*communications")
_JAC_RE = re.compile(r"journal.*antimicrobial.*chemotherapy")
_JSM_RE = re.compile(r"jsm nanotechnology|scimed.*central")
_ELSEVIER_RE = re.compile(r"elsevier|sciencedirect|computational.*structural.*biotechnology")


def banding_probe_pattern() -> str:
    """The combined publisher-probe regex (RE2-compatible — plain
    alternations, no lookaround), built from the SAME compiled patterns
    :func:`banding_format` branches on. Single source of truth for the
    SQL extraction oracles and their Ray-side doc filters: a probe added
    here propagates to both sides of the CORRECTNESS check."""
    return "|".join(p.pattern for p in (_NATURE_RE, _JAC_RE, _JSM_RE, _ELSEVIER_RE))


def banding_probe_patterns() -> list:
    """Per-format probe patterns IN DISPATCH ORDER (the :func:`banding_format`
    branch order, v10A.R:250/298/348/396 — elsevier wins a multi-probe tie).
    Single source of truth for the SQL publisher-order oracle's format CASE:
    the SQL must test the same patterns in the same order, so it is built
    from this list, never hand-copied."""
    return [
        ("elsevier", _ELSEVIER_RE.pattern),
        ("nature", _NATURE_RE.pattern),
        ("jac", _JAC_RE.pattern),
        ("jsm", _JSM_RE.pattern),
    ]


def banding_format(texts) -> str:
    """Which page-1 banding applies; checked in reference branch order
    (elsevier first — v10A.R:250, then nature 298, jac 348, jsm 396,
    else generic 446)."""
    lower = [t.lower() for t in texts]
    if any(_ELSEVIER_RE.search(t) for t in lower):
        return "elsevier"
    if any(_NATURE_RE.search(t) for t in lower):
        return "nature"
    if any(_JAC_RE.search(t) for t in lower):
        return "jac"
    if any(_JSM_RE.search(t) for t in lower):
        return "jsm"
    return "generic"


# --------------------------------------------------------------------------
# scored document-format detector (v10A.R:607-683)

# List order matters: R which.max returns the first maximum (v10A.R:680).
_FORMAT_ORDER = ["nature_communications", "rsc", "elsevier", "mdpi", "generic_academic"]


def detect_document_format(kinds, texts, page, y) -> str:
    """Port of ``detect_document_format`` (v10A.R:607-683).

    ``kinds`` use our span vocabulary ('text' == reference "plain text").
    Scores: mdpi +5/+3/+2, nature +3, rsc +3, elsevier +5/+3/+2/+2, layout
    hints +1; generic_academic starts at 1.
    """
    page = np.asarray(page)
    first = page == 1
    texts_1 = [texts[i] for i in np.nonzero(first)[0]]
    kinds_1 = [kinds[i] for i in np.nonzero(first)[0]]
    y_1 = np.asarray(y, dtype=np.float64)[first]

    all_text = " ".join(t.lower() for t in texts_1)
    publisher_text = " ".join(
        t.lower()
        for t, k in zip(texts_1, kinds_1)
        if k in (KIND_ABANDON, KIND_TEXT)
    )

    s = {"nature_communications": 0, "rsc": 0, "elsevier": 0, "mdpi": 0, "generic_academic": 1}

    if re.search(r"mdpi|biomolecules|nanomaterials|materials|sustainability|applied sciences", publisher_text):
        s["mdpi"] += 5
    if re.search(r"licensee mdpi|basel, switzerland", publisher_text):
        s["mdpi"] += 3
    if re.search(r"academic editor:|received:.*revised:.*accepted:.*published:", publisher_text):
        s["mdpi"] += 2

    if re.search(r"nature.*communications|doi.*nature|nature\.com", publisher_text):
        s["nature_communications"] += 3

    if re.search(r"royal society|environmental science|rsc\.li|rsc publishing", publisher_text):
        s["rsc"] += 3

    if re.search(r"elsevier|sciencedirect|computational.*structural.*biotechnology", publisher_text):
        s["elsevier"] += 5
    if re.search(r"journal homepage.*www\.elsevier\.com", publisher_text):
        s["elsevier"] += 3
    if re.search(r"review article|research article|article info", publisher_text):
        s["elsevier"] += 2
    if re.search(r"article\s+info|abstract.*keywords", all_text):
        s["elsevier"] += 2

    # Layout hints (v10A.R:667-677): first region with y<600 and >30 chars.
    hint_idx = [i for i, t in enumerate(texts_1) if y_1[i] < 600 and len(t) > 30]
    if hint_idx:
        title_y = min(y_1[i] for i in hint_idx)  # arrange(y) then [1]
        if title_y < 300:
            s["nature_communications"] += 1
        if 200 < title_y < 400:
            s["rsc"] += 1

    best = max(_FORMAT_ORDER, key=lambda k: (s[k], -_FORMAT_ORDER.index(k)))
    return best


LAYOUT_FEATURE_DIM = 12


def layout_format_features(kinds, texts, page, y) -> list:
    """Integer page-1 layout features underlying
    :func:`detect_document_format`'s scorer — the distillation surface
    for the learned A1 layout backend (round-5 VERDICT #8): bias + the
    ten publisher-cue regex indicators + the two title-y layout hints,
    computed from EXACTLY the prep the rule scorer uses (v10A.R:607-683).
    The rule itself is a fixed-weight argmax over these features, so a
    self-distilled linear model can recover it exactly; features are
    pure 0/1 ints, keeping the ridge moments exact."""
    page = np.asarray(page)
    first = page == 1
    texts_1 = [texts[i] for i in np.nonzero(first)[0]]
    kinds_1 = [kinds[i] for i in np.nonzero(first)[0]]
    y_1 = np.asarray(y, dtype=np.float64)[first]

    all_text = " ".join(t.lower() for t in texts_1)
    publisher_text = " ".join(
        t.lower()
        for t, k in zip(texts_1, kinds_1)
        if k in (KIND_ABANDON, KIND_TEXT)
    )

    f = [1]
    for pat, hay in (
        (r"mdpi|biomolecules|nanomaterials|materials|sustainability|applied sciences", publisher_text),
        (r"licensee mdpi|basel, switzerland", publisher_text),
        (r"academic editor:|received:.*revised:.*accepted:.*published:", publisher_text),
        (r"nature.*communications|doi.*nature|nature\.com", publisher_text),
        (r"royal society|environmental science|rsc\.li|rsc publishing", publisher_text),
        (r"elsevier|sciencedirect|computational.*structural.*biotechnology", publisher_text),
        (r"journal homepage.*www\.elsevier\.com", publisher_text),
        (r"review article|research article|article info", publisher_text),
        (r"article\s+info|abstract.*keywords", all_text),
    ):
        f.append(1 if re.search(pat, hay) else 0)
    hint_idx = [i for i, t in enumerate(texts_1) if y_1[i] < 600 and len(t) > 30]
    hint_nat = hint_rsc = 0
    if hint_idx:
        title_y = min(y_1[i] for i in hint_idx)
        hint_nat = 1 if title_y < 300 else 0
        hint_rsc = 1 if 200 < title_y < 400 else 0
    f.extend([hint_nat, hint_rsc])
    return f


# --------------------------------------------------------------------------
# format-plugin registry (engine extension surface, SURVEY.md §2.10)


@dataclass
class Band:
    """One page-1 band: a mask function over the page's region arrays.

    ``mask(texts, g)`` receives the page's raw texts plus the geometry dict
    (page/x/y/w/h/x_center/area) and returns a boolean ndarray. Bands are
    applied IN ORDER and concatenated — faithfully union-all (D3,
    v10A.R:288): a region matching no band is dropped, one matching two
    bands is duplicated, exactly as the reference's chain of ``filter`` +
    ``bind_rows`` behaves.
    """

    name: str
    mask: Callable[[list, dict], np.ndarray]
    use_columns: bool = False  # apply column detection + (col, y, x) sort


@dataclass
class FormatRules:
    name: str
    bands: list = field(default_factory=list)


def _b(name, fn, use_columns=False):
    return Band(name=name, mask=fn, use_columns=use_columns)


def _re_any(pattern, texts, lower=False):
    rx = re.compile(pattern)
    return np.fromiter(
        ((rx.search(t.lower() if lower else t) is not None) for t in texts),
        dtype=bool,
        count=len(texts),
    )


def _text_lens(texts):
    return np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))


# ---- Elsevier page-1 bands (v10A.R:250-296) ------------------------------

def _els_header(t, g):
    return g["y"] < 300


def _els_article_type(t, g):
    return (g["y"] >= 300) & (g["y"] < 400)


def _els_title(t, g):
    return (g["y"] >= 400) & (g["y"] < 700) & ~_re_any(r"journal|elsevier", t, lower=True)


def _els_authors(t, g):
    return (g["y"] >= 700) & (g["y"] < 1000) & _re_any(r"[A-Z][a-z]+", t)


def _els_article_info(t, g):
    return (g["x"] < 800) & (g["y"] >= 1000) & (g["y"] < 1600)


def _els_abstract(t, g):
    return (g["x"] >= 800) & (g["y"] >= 1000) & (g["y"] < 1600)


def _els_main(t, g):
    return g["y"] >= 1600


# ---- Nature page-1 bands (v10A.R:298-346) --------------------------------

_NATURE_ABS_PROBE = r"Silver nanoparticles have already been successfully applied"


def _nat_abstract_box(t, g):
    # v10A.R:312-314: content probe OR (nchar>400 & 500<y<800)
    return _re_any(_NATURE_ABS_PROBE, t) | (
        (_text_lens(t) > 400) & (g["y"] > 500) & (g["y"] < 800)
    )


def _nat_header(t, g):
    return g["y"] < 200


def _nat_title(t, g):
    return (g["y"] >= 200) & (g["y"] < 450)


def _nat_authors(t, g):
    return (g["y"] >= 450) & (g["y"] < 550)


def _nat_boxed_abstract(t, g):
    boxed = (g["y"] >= 550) & (g["y"] < 850) & (g["area"] > 30000)
    return boxed | _nat_abstract_box(t, g)


def _nat_main(t, g):
    return (g["y"] >= 850) & ~_nat_abstract_box(t, g)


# ---- JAC page-1 bands (v10A.R:348-394) -----------------------------------

def _jac_header(t, g):
    return g["y"] < 500


def _jac_title(t, g):
    return (g["y"] >= 500) & (g["y"] < 900)


def _jac_abstract(t, g):
    return (g["y"] >= 900) & (g["y"] < 1800)


def _jac_main(t, g):
    return g["y"] >= 1800


# ---- JSM page-1 bands (v10A.R:396-444) -----------------------------------

_JSM_ABS_PROBE = r"Escherichia coli can rapidly evolve resistance"


def _jsm_header(t, g):
    return g["y"] < 300


def _jsm_title(t, g):
    return (g["y"] >= 300) & (g["y"] < 700)


def _jsm_authors(t, g):
    return (g["y"] >= 700) & (g["y"] < 1100)


def _jsm_abstract(t, g):
    box = (g["y"] >= 1100) & (g["y"] < 1600) & (g["area"] > 20000)
    return box | _re_any(_JSM_ABS_PROBE, t)


def _jsm_keywords(t, g):
    return (g["y"] >= 1600) & (g["y"] < 1800)


def _jsm_main(t, g):
    return g["y"] >= 1800


# ---- generic page-1 bands (v10A.R:446-482) -------------------------------

def _gen_header(t, g):
    return g["y"] < 400


def _gen_title(t, g):
    return (g["y"] >= 400) & (g["y"] < 800)


def _gen_abstract(t, g):
    return (g["y"] >= 800) & (g["y"] < 1500)


def _gen_main(t, g):
    return g["y"] >= 1500


FORMAT_REGISTRY: dict[str, FormatRules] = {
    "elsevier": FormatRules(
        "elsevier",
        [
            _b("header", _els_header),
            _b("article_type", _els_article_type),
            _b("title", _els_title),
            _b("authors", _els_authors),
            _b("article_info", _els_article_info),
            _b("abstract", _els_abstract),
            _b("main", _els_main, use_columns=True),
        ],
    ),
    "nature": FormatRules(
        "nature",
        [
            _b("header", _nat_header),
            _b("title", _nat_title),
            _b("authors", _nat_authors),
            _b("abstract", _nat_boxed_abstract),
            _b("main", _nat_main, use_columns=True),
        ],
    ),
    "jac": FormatRules(
        "jac",
        [
            _b("header", _jac_header),
            _b("title", _jac_title),
            _b("abstract", _jac_abstract),
            _b("main", _jac_main, use_columns=True),
        ],
    ),
    "jsm": FormatRules(
        "jsm",
        [
            _b("header", _jsm_header),
            _b("title", _jsm_title),
            _b("authors", _jsm_authors),
            _b("abstract", _jsm_abstract),
            _b("keywords", _jsm_keywords),
            _b("main", _jsm_main, use_columns=True),
        ],
    ),
    "generic": FormatRules(
        "generic",
        [
            _b("header", _gen_header),
            _b("title", _gen_title),
            _b("abstract", _gen_abstract),
            _b("main", _gen_main, use_columns=True),
        ],
    ),
}


def register_format(rules: FormatRules) -> None:
    """Extension point: add a publisher's banding rules."""
    FORMAT_REGISTRY[rules.name] = rules
