"""Text-cleaning chains (M19–M25).

Each chain is an ORDERED list of compiled-regex substitutions — the
reference's effects are order-sensitive (SURVEY.md §7.3.2), so each step is
ported individually and applied in sequence. R stringr/ICU regex is close
enough to Python ``re`` for these patterns (the lookaheads at
v10A.R:3441-3443 need ``re``, not pyarrow.compute).

The ``textclean_*`` steps (v10A.R:3463-3467) call the R ``textclean``
package; we port a DOCUMENTED SUBSET (contraction lexicon, whitespace
collapse, non-ASCII strip, symbol removal, strip) — the subset is the
engine's semantics; it is exercised by unit tests and shared by the oracle.
"""

from __future__ import annotations

import re

# --------------------------------------------------------------------------
# textclean subset

_CONTRACTIONS = [
    ("can't", "cannot"),
    ("won't", "will not"),
    ("shan't", "shall not"),
    ("n't", " not"),
    ("'re", " are"),
    ("'ll", " will"),
    ("'ve", " have"),
    ("'d", " would"),
    ("let's", "let us"),
    ("it's", "it is"),
    ("that's", "that is"),
    ("there's", "there is"),
    ("what's", "what is"),
    ("i'm", "i am"),
]
# One alternation pass instead of 14 sequential passes over the full main
# text: leftmost-match semantics reproduce the sequential order for this
# lexicon (no replacement creates a new contraction).
_CONTRACTION_MAP = {a.lower(): b for a, b in _CONTRACTIONS}
_CONTRACTION_ONE_RE = re.compile(
    "|".join(re.escape(a) for a, _ in _CONTRACTIONS), re.IGNORECASE
)


def replace_contraction(text: str) -> str:
    """Subset of textclean::replace_contraction (v10A.R:3463)."""
    return _CONTRACTION_ONE_RE.sub(lambda m: _CONTRACTION_MAP[m.group(0).lower()], text)


_WHITE_RE = re.compile(r"\s+")


def replace_white(text: str) -> str:
    """textclean::replace_white (v10A.R:3465): collapse whitespace runs."""
    return _WHITE_RE.sub(" ", text).strip()


def replace_non_ascii(text: str) -> str:
    """textclean::replace_non_ascii(remove=TRUE) (v10A.R:3467)."""
    return text.encode("ascii", "ignore").decode("ascii")


_SYMBOL_RE = re.compile(r"[%@$#&+=]")


def replace_symbol(text: str) -> str:
    """textclean::replace_symbol(remove=TRUE) (v10A.R:3464), subset."""
    return _SYMBOL_RE.sub("", text)


_STRIP_KEEP_RE = re.compile(r"[^a-z' ]+")


def strip_textclean(text: str) -> str:
    """textclean::strip (v10A.R:3466): lowercase, keep letters/apostrophes."""
    return _WHITE_RE.sub(" ", _STRIP_KEEP_RE.sub(" ", text.lower())).strip()


# --------------------------------------------------------------------------
# ordered chains


def _chain(steps):
    return [(re.compile(p), r) for p, r in steps]


# M20 — clean_text_for_llm_aggressive (v10A.R:3439-3450), exact order.
_AGGRESSIVE = _chain(
    [
        (r"[\"'°*,\d\s.\-]{3,}(?=\s|$)", " "),
        (r"\.[\"'°*,\d\s\-]+(?=\s+[A-Z])", "."),
        (r"\s+[\"'°*,\d\s\-]+\s+", " "),
        (r"([a-z])([A-Z])", r"\1 \2"),
        (r"\s+", " "),
        (r"\(Fig\.[^)]*\)|\(Table[^)]*\)", ""),
        (r"([a-z])-\s+([a-z])", r"\1\2"),
        (r"\.\s*\.", "."),
    ]
)


def clean_aggressive(text: str) -> str:
    for rx, rep in _AGGRESSIVE:
        text = rx.sub(rep, text)
    return text.strip()


# M21 — clean_text_with_textclean_academic (v10A.R:3452-3480).
_ACADEMIC_POST = _chain(
    [
        (r"\.[\"'°*,\d\s\-]+(?=\s+[A-Z])", "."),
        (r"\s+[\"'°*,\d\s\-]{2,}\s+(?=[a-zA-Z])", " "),
        (r"\s+[\"'°*,\d\s\-]{3,}\s+", " "),
        (r"\([Ff]ig\.?\s*\d+[^)]*\)", ""),
        (r"\([Tt]able\s*\d+[^)]*\)", ""),
        (r"([a-z])-\s+([a-z])", r"\1\2"),
        (r"\s+", " "),
        (r"(\d+)\s*×\s*10\s*([−\-]?\d+)", r"\1×10^\2"),
        (r"(\d+)\s*nm", r"\1 nm"),
        (r"(\d+)\s*mg", r"\1 mg"),
        (r"p\s*H", "pH"),
        (r"\s+", " "),
    ]
)


def clean_textclean_academic(text: str) -> str:
    text = replace_contraction(text)
    text = replace_symbol(text)
    text = replace_white(text)
    text = strip_textclean(text)
    text = replace_non_ascii(text)
    for rx, rep in _ACADEMIC_POST:
        text = rx.sub(rep, text)
    return text.strip()


# M22 — clean_text_hybrid (v10A.R:3482-3506); the driver default
# (cleaning_method="hybrid", v10A.R:3730-3731).
_HYBRID_PRE = _chain(
    [
        (r"\.[\"'°*,\d\s\-]+(?=\s+[A-Z])", "."),
        (r"\s+[\"'°*,\d\s\-]{2,}\s+(?=[a-zA-Z])", " "),
        (r"\s+[\"'°*,\d\s\-]{3,}\s+", " "),
        (r"\([Ff]ig\.?\s*\d+[^)]*\)", ""),
        (r"\([Tt]able\s*\d+[^)]*\)", ""),
        (r"([a-z])-\s+([a-z])", r"\1\2"),
    ]
)
_HYBRID_POST = _chain(
    [
        (r"\s+", " "),
        (r"p\s*H", "pH"),
        (r"Ag\s*NPs", "AgNPs"),
        (r"Ag\s*NP", "AgNP"),
    ]
)


def clean_hybrid(text: str) -> str:
    for rx, rep in _HYBRID_PRE:
        text = rx.sub(rep, text)
    text = replace_contraction(text)
    text = replace_white(text)
    text = replace_non_ascii(text)
    for rx, rep in _HYBRID_POST:
        text = rx.sub(rep, text)
    return text.strip()


# M24 — apply_cleaning_method dispatcher (v10A.R:3526-3533).
CLEANING_METHODS = {
    "custom_aggressive": clean_aggressive,
    "textclean_academic": clean_textclean_academic,
    "hybrid": clean_hybrid,
    "none": lambda t: t,
}


def apply_cleaning_method(text: str, method: str) -> str:
    return CLEANING_METHODS.get(method, CLEANING_METHODS["none"])(text)


# M23 — clean_title_fallback (v10A.R:3508-3523): per-format title prefixes.
_TITLE_FMT_RES = {
    "nature": (re.compile(r"^(ARTICLE|Article|DOI.*|OPEN)\s*"), ""),
    "elsevier": (re.compile(r"^(Available online|Journal homepage).*"), ""),
    "mdpi": (re.compile(r"^(materials|nanomaterials|sustainability|Article)\s*"), ""),
    "rsc": (re.compile(r"^(Green Chemistry|Chemical Science|Nanoscale)\s*"), ""),
}
_TITLE_DEFAULT_RE = (re.compile(r"^(ARTICLE|Article|DOI.*|OPEN)\s*"), "")


def clean_title_fallback(text: str, doc_format: str = "generic") -> str:
    text = _WHITE_RE.sub(" ", text).strip()
    rx, rep = _TITLE_FMT_RES.get(doc_format, _TITLE_DEFAULT_RE)
    return rx.sub(rep, text).strip()


# M25 — author-string splitter (get_clean_results, v10A.R:3560-3582).
_AUTHOR_PREFIX_RE = re.compile(r"^(Here|The|Authors)")


def split_authors(authors: str) -> list[str]:
    if not authors:
        return ["Authors not found"]
    parts = [p.strip() for p in re.split(r";|\n", authors)]
    parts = [p for p in parts if p and not _AUTHOR_PREFIX_RE.search(p)]
    if len(parts) == 1 and "," in parts[0]:
        parts = [p.strip() for p in parts[0].split(",") if p.strip()]
    if parts and any(len(p) > 3 for p in parts):
        return parts
    return ["Authors not found"]


# Per-doc scrub used by the deterministic authors path (v10A.R:1255-1259)
_AUTHOR_SCRUB_RE = re.compile(r"[°*†‡§¶#¹²³⁴⁵⁶⁷⁸⁹⁰\"»]")


def scrub_authors(text: str) -> str:
    return _WHITE_RE.sub(" ", _AUTHOR_SCRUB_RE.sub("", text)).strip()


# M19 — citation / figure-reference scrubber (v10A.R:2202-2209, 1802-1814).
_CITATION_SCRUB = _chain(
    [
        (r"\(Figure \d+[a-z]?\)", ""),
        (r"\(Table \d+\)", ""),
        (r"\[\d+–\d+\]", ""),
        (r"\[\d+,\s*\d+\]", ""),
        (r"\[\d+\]", ""),
        (r"\s+", " "),
    ]
)


def scrub_citations(text: str) -> str:
    for rx, rep in _CITATION_SCRUB:
        text = rx.sub(rep, text)
    return text.strip()


# D1 — order-preserving sentence dedup (v10A.R:1817-1822, 2212-2217):
# split on ". ", R unique() (first-seen), rejoin, collapse whitespace.
def dedup_sentences(text: str) -> str:
    parts = re.split(r"\. ", text)
    seen: dict[str, None] = {}
    for p in parts:
        if p not in seen:
            seen[p] = None
    out = ". ".join(seen.keys())
    return _WHITE_RE.sub(" ", out).strip()


_NORM_WS_RE = re.compile(r"\s+")


def normalize_ws(text: str) -> str:
    """M6 — ``str_replace_all(text, "\\s+", " ") %>% str_trim`` (v10A.R:1656)."""
    return _NORM_WS_RE.sub(" ", text).strip()
