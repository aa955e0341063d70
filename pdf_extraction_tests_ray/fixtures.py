"""Deterministic synthetic corpus generator (FIXTURES.md).

Produces the ``documents_spans`` input table: one row per document with an
interleaved text+media ``spans`` list. Everything derives from ``seed`` and
the per-document index — per-doc RNG streams are independent of generation
order, so any subset of the corpus is reproducible.

Families exercise specific reference branches (FIXTURES.md §3); the marker
strings (e.g. the Nature boxed-abstract probe, JSM's E. coli probe, JAC's
Objectives:/Methods:/... components) are the literal content probes in the
reference's decision ladders (v10A.R:312, 1386, 1413, 1447-1483, ...).

Geometry is placed in scaled units and packed into ``offset``; width/height
come from schema.derive_extent — the SAME formula doclogic uses, so
generator and oracle see identical geometry.

``spans_from_flat_text`` adapts the driver's flat ``documents`` testdata
table (TESTDATA.md) into span documents deterministically — used by
``__ray_entry__.entry()`` and bench.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .schema import (
    INPUT_SCHEMA,
    KIND_ABANDON,
    KIND_CAPTION,
    KIND_FIGURE,
    KIND_TABLE,
    KIND_TEXT,
    KIND_TITLE,
    SCALE,
    pack_offset,
)

# Vocabulary chosen to avoid every publisher-detection regex in
# doclogic.formats (no 'nature', 'journal', 'article', 'elsevier', 'mdpi',
# 'materials', 'review', 'keywords', 'science', ...).
_VOCAB = (
    "silver gradient cluster sample method growth cell protein reaction "
    "measure value signal model result analysis data image structure system "
    "effect process region layer phase state function factor change surface "
    "compound particle membrane tissue culture assay buffer solution "
    "temperature pressure density volume spectrum band peak curve slope "
    "matrix vector field charge current light beam probe sensor device "
    "pattern feature metric score range limit bound error noise drift "
    "control group batch trial dose response rate flux yield gain loss"
).split()

_DEF_FAMILIES = [
    ("generic1", 30),
    ("generic2", 30),
    ("nature", 20),
    ("jac", 15),
    ("jsm", 15),
    ("elsevier", 20),
    ("mdpi", 20),
    ("media", 20),
    ("pathological", 30),
]

# Column x-centers in scaled units (x_center_px = xb * SCALE).
_XB_1COL = 364  # ~1200 px
_XB_COL1 = 194  # ~640 px
_XB_COL2 = 579  # ~1911 px


def _words(rng, n):
    return " ".join(_VOCAB[i] for i in rng.integers(0, len(_VOCAB), size=n))


def _sentence(rng, lo=6, hi=14):
    w = _words(rng, int(rng.integers(lo, hi)))
    return w[:1].upper() + w[1:] + "."


def _para(rng, n_sent=(3, 7)):
    return " ".join(_sentence(rng) for _ in range(int(rng.integers(*n_sent))))


def _span(kind, text, page, y_s, xb, media_ref=""):
    return {
        "kind": kind,
        "text": text,
        "media_ref": media_ref,
        "offset": int(pack_offset(page, int(y_s), int(xb))),
    }


def _col_xb(rng, two_col, col=None):
    if not two_col:
        return _XB_1COL + int(rng.integers(-8, 9))
    c = col if col is not None else int(rng.integers(0, 2))
    base = _XB_COL1 if c == 0 else _XB_COL2
    return base + int(rng.integers(-6, 7))


def _body_pages(rng, first_page, n_pages, two_col, intro=True, refs=False, dup_sentences=False):
    """Body spans for pages first_page..n_pages."""
    spans = []
    for p in range(first_page, n_pages + 1):
        n_spans = int(rng.integers(6, 12))
        ys = np.sort(rng.choice(np.arange(40, 990, 12), size=n_spans, replace=False))
        for j, y in enumerate(ys):
            if p == first_page and j == 0 and intro:
                spans.append(_span(KIND_TITLE, "1. Introduction", p, y, _col_xb(rng, two_col, 0)))
                continue
            txt = _para(rng)
            if dup_sentences and rng.random() < 0.3:
                s = _sentence(rng)
                txt = s + " " + s + " " + txt
            spans.append(_span(KIND_TEXT, txt, p, y, _col_xb(rng, two_col)))
    if refs:
        spans.append(_span(KIND_TITLE, "References", n_pages, 992, _col_xb(rng, two_col, 0)))
    return spans


def _generic_doc(rng, two_col):
    n_pages = int(rng.integers(2, 7))
    spans = []
    # page 1, generic bands (v10A.R:446-482): header<400px(y_s<121),
    # title 400-800(121-242), abstract 800-1500(242-454), main >=1500(455+)
    spans.append(_span(KIND_ABANDON, "Quarterly Bulletin of Applied Measurement", 1, 30, _XB_1COL))
    title_words = _words(rng, 10)
    spans.append(_span(KIND_TITLE, ("Resolving " + title_words)[:120], 1, 150, _XB_1COL))
    authors = "Maria Vasquez 1 , Chen Wei 2 , Anders Holm 3"
    spans.append(_span(KIND_TEXT, authors, 1, 185, _XB_1COL))
    abstract = "Abstract: " + _para(rng, (4, 7))
    spans.append(_span(KIND_TEXT, abstract, 1, 300, _XB_1COL))
    spans.append(_span(KIND_TEXT, _para(rng), 1, 380, _XB_1COL))
    for y in (470, 560, 700, 850):
        spans.append(_span(KIND_TEXT, _para(rng), 1, y + int(rng.integers(0, 30)), _col_xb(rng, two_col)))
    spans += _body_pages(rng, 2, n_pages, two_col, intro=True, dup_sentences=rng.random() < 0.2)
    return spans


def _nature_doc(rng):
    n_pages = int(rng.integers(3, 7))
    spans = []
    # bands (v10A.R:298-346): header<200(y_s<60), title 200-450(61-136),
    # authors 450-550(137-166), boxed abstract 550-850(167-257), main>=850
    spans.append(_span(KIND_ABANDON, "nature communications volume 12", 1, 25, _XB_1COL))
    spans.append(_span(KIND_TITLE, ("Coupled response of " + _words(rng, 8))[:110], 1, 80, _XB_1COL))
    spans.append(_span(KIND_TEXT, "Elena Marchetti 1,2 , Tomas Lind 2 , Priya Raman 3", 1, 145, _XB_1COL))
    probe = (
        "Silver nanoparticles have already been successfully applied in several "
        "antimicrobial technologies and biomedical products. "
    )
    abstract = probe + _para(rng, (6, 9))
    spans.append(_span(KIND_TEXT, abstract, 1, 200, _XB_1COL))
    for y in (270, 300):
        spans.append(_span(KIND_TEXT, _para(rng), 1, y, _col_xb(rng, True)))
    spans += _body_pages(rng, 2, n_pages, True, intro=True)
    return spans


def _jac_doc(rng):
    n_pages = int(rng.integers(2, 5))
    spans = []
    # bands (v10A.R:348-394): header<500(y_s<151), title 500-900(152-272),
    # abstract 900-1800(273-545), main>=1800(546+)
    spans.append(_span(KIND_ABANDON, "Journal of Antimicrobial Chemotherapy", 1, 40, _XB_1COL))
    spans.append(_span(KIND_TITLE, ("Silver resistance in gram negative " + _words(rng, 6))[:110], 1, 170, _XB_1COL))
    spans.append(_span(KIND_TEXT, "Craig Randall 1 , Anita Gupta 2 , Owen Jackson 2", 1, 230, _XB_1COL))
    spans.append(_span(KIND_TEXT, "Objectives: " + _para(rng, (2, 4)), 1, 300, _XB_1COL))
    spans.append(_span(KIND_TEXT, "Methods: " + _para(rng, (2, 4)), 1, 350, _XB_1COL))
    spans.append(_span(KIND_TEXT, "Results: " + _para(rng, (2, 4)), 1, 400, _XB_1COL))
    spans.append(_span(KIND_TEXT, "Conclusions: " + _para(rng, (2, 4)), 1, 450, _XB_1COL))
    spans.append(_span(KIND_TITLE, "Introduction", 1, 560, _XB_COL1))
    spans.append(_span(KIND_TEXT, _para(rng), 1, 600, _col_xb(rng, True)))
    spans += _body_pages(rng, 2, n_pages, True, intro=False)
    return spans


def _jsm_doc(rng):
    n_pages = int(rng.integers(2, 5))
    spans = []
    # bands (v10A.R:396-444): header<300(y_s<91), title 300-700(92-211),
    # authors 700-1100(212-333), abstract 1100-1600(334-484),
    # keywords 1600-1800(485-545), main>=1800(546+)
    spans.append(_span(KIND_ABANDON, "JSM Nanotechnology and Nanomedicine", 1, 30, _XB_1COL))
    spans.append(_span(KIND_TITLE, "Selection of Silver Nanoparticle Resistance Traits", 1, 120, _XB_1COL))
    spans.append(_span(KIND_TEXT, "Mehrdad Tajkarimi 1 , Kristen Rhinehardt 2 , Liam Ortega 2", 1, 240, _XB_1COL))
    probe = "Escherichia coli can rapidly evolve resistance under repeated AgNP exposure. "
    spans.append(_span(KIND_TEXT, probe + _para(rng, (5, 8)), 1, 360, _XB_1COL))
    spans.append(_span(KIND_TEXT, "Index terms: silver; resistance; selection", 1, 500, _XB_1COL))
    spans.append(_span(KIND_TITLE, "Introduction", 1, 560, _XB_COL1))
    spans.append(_span(KIND_TEXT, _para(rng), 1, 600, _col_xb(rng, True)))
    spans += _body_pages(rng, 2, n_pages, True, intro=False)
    return spans


def _elsevier_doc(rng):
    n_pages = int(rng.integers(3, 7))
    spans = []
    # bands (v10A.R:250-296): header<300(y_s<91), type 300-400(92-121),
    # title 400-700(122-211), authors 700-1000(212-302),
    # info x<800 / abstract x>=800 at 1000-1600(303-484), main>=1600(485+)
    spans.append(_span(KIND_ABANDON, "Computational and Structural Biotechnology Reports", 1, 30, _XB_1COL))
    spans.append(_span(KIND_ABANDON, "journal homepage www.elsevier.com locator csbr", 1, 55, _XB_1COL))
    spans.append(_span(KIND_TEXT, "Full Length Study", 1, 100, _XB_1COL))
    spans.append(_span(KIND_TITLE, ("Engineering the " + _words(rng, 9))[:110], 1, 150, _XB_1COL))
    spans.append(_span(KIND_TEXT, "Sofia Lindgren a , Marco Benedetti b , Hana Sato a", 1, 240, _XB_1COL))
    # ARTICLE INFO box, left (x<800): x_center low
    spans.append(_span(KIND_TEXT, "Article info received 3 accepted 9 available online", 1, 330, 150))
    spans.append(_span(KIND_TEXT, "Keywords: silver; membrane; flux", 1, 370, 150))
    # ABSTRACT header + body, right column (x left >= 800)
    spans.append(_span(KIND_TITLE, "ABSTRACT", 1, 320, 409))
    spans.append(_span(KIND_TEXT, _para(rng, (4, 6)), 1, 350, 539))
    spans.append(_span(KIND_TEXT, _para(rng, (3, 5)), 1, 400, 539))
    # main on page 1
    spans.append(_span(KIND_TITLE, "1. Introduction", 1, 520, _XB_COL1))
    spans.append(_span(KIND_TEXT, _para(rng), 1, 560, _col_xb(rng, True)))
    spans += _body_pages(rng, 2, n_pages, True, intro=False)
    spans.append(_span(KIND_TITLE, "References", n_pages, 995, _XB_COL1))
    return spans


def _mdpi_doc(rng):
    n_pages = int(rng.integers(3, 6))
    spans = []
    # MDPI layout: left minicolumn (x small) with metadata, main zone right.
    # X-zone logic: v10A.R:2100-2156. Main-zone x_center 880px -> xb 267;
    # a >100-char span gets w=960 so x=400. Minicolumn xb 91 -> x<0..350.
    main_xb = 267
    spans.append(_span(KIND_ABANDON, "licensee mdpi basel, switzerland", 1, 30, _XB_1COL))
    spans.append(_span(KIND_TITLE, ("Silver based coating for " + _words(rng, 8))[:110], 1, 90, _XB_1COL))
    spans.append(_span(KIND_TEXT, "Lucia Ferrante 1 , Piotr Nowak 2 , Emre Demir 2", 1, 130, _XB_1COL))
    spans.append(_span(KIND_TEXT, "Academic Editor: R Keller", 1, 200, 91))
    spans.append(_span(KIND_TEXT, "Received: 3 May Revised: 9 May Accepted: 1 June Published: 8 June", 1, 230, 91))
    spans.append(_span(KIND_TEXT, "Citation: Ferrante L et al", 1, 260, 91))
    abstract = "Abstract: " + _para(rng, (5, 8)) + " Methicillin-resistant strains respond to silver nanoparticles."
    spans.append(_span(KIND_TEXT, abstract, 1, 300, main_xb + 20))
    spans.append(_span(KIND_TEXT, _para(rng), 1, 420, main_xb + 25))
    spans.append(_span(KIND_TITLE, "1. Introduction", 1, 520, main_xb))
    spans.append(_span(KIND_TEXT, _para(rng), 1, 560, main_xb + 30))
    for p in range(2, n_pages + 1):
        n_spans = int(rng.integers(6, 10))
        ys = np.sort(rng.choice(np.arange(40, 960, 14), size=n_spans, replace=False))
        for y in ys:
            spans.append(_span(KIND_TEXT, _para(rng) + " (Figure 2) [3] [4–6]", p, y, main_xb + 20 + int(rng.integers(0, 21))))
    spans.append(_span(KIND_TEXT, "The approach warrants a clinical trial.", n_pages, 970, main_xb + 25))
    # "References" shifts back toward the left zone boundary: x inside
    # [x_min-50, x_min+50) so the X-shift end rule fires (v10A.R:2168-2173)
    spans.append(_span(KIND_TITLE, "References", n_pages, 985, 155))
    return spans


def _media_doc(rng, doc_id):
    spans = _generic_doc(rng, two_col=bool(rng.integers(0, 2)))
    n_pages = max(s["offset"] // 1_000_000 for s in spans)
    k = 0
    for p in range(1, n_pages + 1):
        for _ in range(int(rng.integers(1, 4))):
            y = int(rng.integers(480, 950))
            ref = f"media://{doc_id}/{k}"
            kind = KIND_FIGURE if rng.random() < 0.7 else KIND_TABLE
            spans.append(_span(kind, "", p, y, _col_xb(rng, False), media_ref=ref))
            spans.append(
                _span(KIND_CAPTION, f"Figure {k}: " + _sentence(rng), p, min(y + 20, 999), _col_xb(rng, False))
            )
            k += 1
    return spans


def _pathological_doc(rng, variant, doc_id):
    if variant == 0:  # empty doc
        return []
    if variant == 1:  # all-empty texts (everything filtered)
        return [_span(KIND_TEXT, "   ", 1, 100, _XB_1COL), _span(KIND_TEXT, "", 1, 300, _XB_1COL)]
    if variant == 2:  # <3 spans per page: no column detection (v10A.R:522)
        return [
            _span(KIND_TITLE, "Sparse but sufficiently long heading line", 1, 150, _XB_1COL),
            _span(KIND_TEXT, _para(rng), 1, 500, _XB_1COL),
            _span(KIND_TEXT, _para(rng), 2, 300, _XB_1COL),
        ]
    if variant == 3:  # abandon-only page 1
        spans = [_span(KIND_ABANDON, "Running header only page", 1, 40, _XB_1COL)]
        spans += _body_pages(rng, 2, 3, False, intro=True)
        return spans
    if variant == 4:  # duplicated sentences (D1/D2)
        spans = _generic_doc(rng, two_col=False)
        s = _sentence(rng)
        spans.append(_span(KIND_TEXT, s + " " + s + " " + s, 2, 995, _XB_1COL))
        return spans
    if variant == 5:  # unicode superscripts in authors (v10A.R:777)
        spans = _generic_doc(rng, two_col=False)
        spans.append(_span(KIND_TEXT, "Nadia Petrov¹², Igor Sokolov³*†", 1, 190, _XB_1COL))
        return spans
    if variant == 6:  # no intro / no references fallbacks (v10A.R:1726)
        spans = [
            _span(KIND_ABANDON, "Plain bulletin head", 1, 30, _XB_1COL),
            _span(KIND_TITLE, "Observations without standard sectioning present", 1, 150, _XB_1COL),
        ]
        for p in (1, 2):
            for y in range(300, 960, 110):
                spans.append(_span(KIND_TEXT, " ".join(_words(rng, 4) for _ in range(2)), p, y, _XB_1COL))
        return spans
    if variant == 7:  # media-only document
        return [
            _span(KIND_FIGURE, "", 1, 200, _XB_1COL, media_ref=f"media://{doc_id}/0"),
            _span(KIND_FIGURE, "", 1, 600, _XB_1COL, media_ref=f"media://{doc_id}/1"),
            _span(KIND_TABLE, "", 2, 400, _XB_1COL, media_ref=f"media://{doc_id}/2"),
        ]
    if variant == 8:  # huge doc (heavy-row split path)
        spans = [
            _span(KIND_ABANDON, "Extended compendium head", 1, 30, _XB_1COL),
            _span(KIND_TITLE, "A very long compendium of repeated measurements", 1, 150, _XB_1COL),
        ]
        for p in range(1, 201):
            for y in range(120, 960, 40):
                spans.append(_span(KIND_TEXT, _sentence(rng, 8, 20), p, y, _col_xb(rng, p % 2 == 0)))
        return spans
    # default: boundary-exact y values
    spans = _generic_doc(rng, two_col=False)
    for y_s in (121, 122, 242, 243, 454, 455):
        spans.append(_span(KIND_TEXT, _para(rng, (2, 4)), 1, y_s, _XB_1COL))
    return spans


def generate_doc(family: str, doc_index: int, seed: int = 42):
    """One document's span list; independent RNG stream per (seed, index)."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, doc_index]))
    doc_id = f"doc-{doc_index:06d}"
    if family == "generic1":
        spans = _generic_doc(rng, two_col=False)
    elif family == "generic2":
        spans = _generic_doc(rng, two_col=True)
    elif family == "nature":
        spans = _nature_doc(rng)
    elif family == "jac":
        spans = _jac_doc(rng)
    elif family == "jsm":
        spans = _jsm_doc(rng)
    elif family == "elsevier":
        spans = _elsevier_doc(rng)
    elif family == "mdpi":
        spans = _mdpi_doc(rng)
    elif family == "media":
        spans = _media_doc(rng, doc_id)
    elif family == "pathological":
        spans = _pathological_doc(rng, doc_index % 10, doc_id)
    else:
        raise ValueError(f"unknown family {family}")
    # input span order is shuffled: output order must be recomputed from
    # geometry (permutation-invariance property, SURVEY.md §5.2)
    if spans:
        perm = rng.permutation(len(spans))
        spans = [spans[i] for i in perm]
    return doc_id, spans


def corpus_table(families=None, seed: int = 42, scale: int = 1) -> pa.Table:
    """The golden corpus as one Arrow table (~200 docs at scale=1)."""
    families = families or _DEF_FAMILIES
    doc_ids, span_lists = [], []
    idx = 0
    for fam, count in families:
        for _ in range(count * scale):
            doc_id, spans = generate_doc(fam, idx, seed)
            doc_ids.append(doc_id)
            span_lists.append(spans)
            idx += 1
    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": span_lists}, schema=INPUT_SCHEMA
    )


def write_corpus(path: str, families=None, seed: int = 42, scale: int = 1, num_files: int = 8):
    """Write the corpus as a directory of parquet files (Ray-readable)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    t = corpus_table(families, seed, scale)
    n = t.num_rows
    per = max(1, (n + num_files - 1) // num_files)
    for i in range(0, n, per):
        pq.write_table(t.slice(i, per), os.path.join(path, f"part-{i // per:05d}.parquet"))
    return path


# --------------------------------------------------------------------------
# flat-text adapter for the driver testdata `documents` table


# Version salt for oracle_io's dump-freshness sidecar: bump whenever
# spans_from_flat_text's OUTPUT changes for any doc_id, so a stale on-disk
# dump (written by older code) is never compared against fresh Ray-side
# synthesis. v3: doc_id GOLDEN_TRANSCRIPT_DOC_ID routes to the pinned
# golden-transcript document.
FLAT_SPANS_VERSION = 3

# The reference's end-of-script demo transcript (v10A_ALTAIR.R:3740-3796)
# prints the full extraction result for one Biochemistry article: title,
# authors line, boundaries {start:15, end:88}, total_pages 9,
# total_text_regions 99, document_format generic_academic. This doc_id in
# the driver corpus is routed to a synthetic document engineered to hit
# exactly those pins through the REAL pipeline, giving the flagship's
# extraction semantics a driver-checked SQL-equality row
# (queries.extract_golden_transcript).
GOLDEN_TRANSCRIPT_DOC_ID = 73

# Page-1 spans straight from the transcript's raw tibble (x, y, w, h, text,
# kind in reference pixels; v10A_ALTAIR.R:3782-3796). The w/h here position
# x_center only — extents are re-derived from text by the offset codec.
_GOLDEN_P1 = [
    (252, 157, 675, 128, "Bichemistry", KIND_ABANDON),
    (2199, 379, 153, 51, "| Article", KIND_ABANDON),
    (246, 389, 375, 36, "pubs.acs.org/biochemistry", KIND_ABANDON),
    (248, 490, 2067, 152,
     "Altering the Neisseria gonorrhoeae pilE Guanine Quadruplex Loop Bases "
     "Affects Pilin Antigenic Variation", KIND_TITLE),
    (247, 663, 1459, 62,
     "Lauren L. Prister, Shaohui Yin, Laty A. Cahoon, and H Steven Seifert”",
     KIND_TEXT),
    (344, 778, 639, 43, "Cite This: Biochemistry 2020, 59, 1104-1112", KIND_TEXT),
    (1436, 778, 209, 42, "Read Online", KIND_TEXT),
    (343, 779, 640, 43, "Cite This: Biochemistry 2020, 59, 1104-1112", KIND_TEXT),
    (622, 920, 314, 52, "lil Metrics & More", KIND_TITLE),
    (1169, 920, 473, 50, "Article Recommendations", KIND_TITLE),
    (248, 1050, 2000, 800,
     "ABSTRACT: Neisseria gonorrhoeae possesses a programmed recombination "
     "system that allows the bacteria to alter the major subunit of the type "
     "IV pilus, pilin or PilE. An alternate DNA structure known as a guanine "
     "quadruplex is required for pilin antigenic variation.", KIND_TEXT),
]

_GOLDEN_FILLERS = [
    "The assay series remained stable under repeated calibration and the variance stayed within the expected envelope across replicates.",
    "Measurements of the folded structure were consistent between preparations and showed no drift over the sampling window.",
    "Binding affinity estimates were obtained from triplicate titrations and agreed with the values reported for the parental sequence.",
    "The recombination frequency was quantified by a colony immunoblot protocol and normalized against the parental strain.",
    "Thermal melting profiles were recorded at a fixed ramp rate and the transition midpoints were reproducible between runs.",
    "Strand exchange activity was monitored in a gel based assay and quantified by densitometry of the product band.",
    "Sequence contexts flanking the motif were held constant so that any change in the phenotype could be attributed to the loop bases.",
    "Oligonucleotide substrates were annealed in a potassium buffer and verified by native gel electrophoresis before use.",
    "The circular dichroism spectra displayed the signature expected for a parallel topology in all loop variants tested.",
    "Growth curves of the mutant strains matched the parental strain showing that the loop substitutions did not impair fitness.",
]


def golden_transcript_spans() -> list[dict]:
    """The pinned golden-transcript document (no RNG; fixed permutation).

    Census: page 1 carries the 11 transcript-derived spans (3 abandon kept
    on page 1, 3 title, 5 text incl. the duplicated Cite-This row); pages
    2-9 carry 10 body texts + 1 figure each. Kept spans = 11 + 88 = 99
    (total_text_regions); textual frame (text+title, non-empty) = 8 + 80 =
    88 (boundary_end); no span scores >=3 on the intro ladder so
    boundary_start falls back to min(15, n) = 15 — exactly the reference
    transcript's {start:15, end:88} (v10A_ALTAIR.R:3765-3769)."""
    spans = []
    for x, y, w, h, text, kind in _GOLDEN_P1:
        spans.append(
            _span(kind, text, 1, round(y / SCALE), round((x + w / 2) / SCALE))
        )
    for p in range(2, 10):
        for j in range(10):
            spans.append(
                _span(
                    KIND_TEXT,
                    _GOLDEN_FILLERS[j]
                    + f" This observation held for panel {chr(65 + p)} of the series.",
                    p,
                    60 + 90 * j,
                    160,
                )
            )
        spans.append(_span(KIND_FIGURE, "", p, 970, 160, media_ref=f"media://golden/{p}"))
    # fixed deterministic shuffle (order must be recomputed from geometry)
    rng = np.random.default_rng(np.random.SeedSequence([7, 9090]))
    perm = rng.permutation(len(spans))
    return [spans[i] for i in perm]


def spans_from_flat_text(doc_id: int, text: str) -> list[dict]:
    """Deterministically expand one flat testdata document into spans.

    Seeded by ``doc_id`` only — stable across runs/processes. Most docs get
    a generic-family layout (title + author + abstract + body paragraphs
    over 1-3 pages, occasionally 2-column or with a media span); a fixed
    ``doc_id % 16`` residue routes to the publisher golden families
    (elsevier / nature / jac / jsm page-1 band sets, v10A.R:250-444, plus
    the generically-banded mdpi layout) so the DRIVER corpus exercises
    every banding branch, not just the generic one. Publisher docs get
    deterministic band-quirk riders: a no-band span (dropped, D3) and
    content-probe spans matching two bands (duplicated).
    """
    if int(doc_id) == GOLDEN_TRANSCRIPT_DOC_ID:
        return golden_transcript_spans()
    rng = np.random.default_rng(np.random.SeedSequence([7, int(doc_id)]))
    words = text.split()
    if not words:
        return []
    fam = int(doc_id) % 16
    if fam in (11, 12, 13, 14, 15):
        if fam == 11:
            spans = _elsevier_doc(rng)
            if rng.random() < 0.5:
                # authors band [700,1000) requires [A-Z][a-z]+ and no other
                # elsevier band covers that y range -> union-all DROP quirk
                spans.append(_span(KIND_TEXT, "2024 10 1016 0 1234567", 1, 250, _XB_1COL))
        elif fam == 12:
            spans = _nature_doc(rng)
            if rng.random() < 0.5:
                # >400 chars at y~511: authors band AND the nchar>400 &
                # 500<y<800 abstract-box rule -> union-all DUPLICATE quirk
                # (90 words: even all-4-char-word draws exceed 400 chars)
                spans.append(_span(KIND_TEXT, _words(rng, 90), 1, 155, _XB_1COL))
        elif fam == 13:
            spans = _jac_doc(rng)
        elif fam == 14:
            spans = _jsm_doc(rng)
            if rng.random() < 0.5:
                # JSM abstract content probe in the header band -> DUPLICATE
                spans.append(
                    _span(
                        KIND_TEXT,
                        "Escherichia coli can rapidly evolve resistance under exposure.",
                        1,
                        50,
                        _XB_1COL,
                    )
                )
        else:
            spans = _mdpi_doc(rng)
        perm = rng.permutation(len(spans))
        return [spans[i] for i in perm]
    spans = []
    spans.append(_span(KIND_ABANDON, "Synthetic Bulletin of Stream Processing", 1, 30, _XB_1COL))
    title = " ".join(words[: min(12, len(words))])
    title = (title[:1].upper() + title[1:] + " study")[:120]
    spans.append(_span(KIND_TITLE, title.ljust(35, "x"), 1, 150, _XB_1COL))
    spans.append(_span(KIND_TEXT, "Alex Moreno 1 , Dana Kim 2 , Ravi Patel 3", 1, 185, _XB_1COL))
    abstract = "Abstract: " + " ".join(words[: min(60, len(words))]) + "."
    spans.append(_span(KIND_TEXT, abstract, 1, 300, _XB_1COL))
    spans.append(_span(KIND_TITLE, "1. Introduction", 1, 470, _XB_1COL))
    two_col = bool(rng.integers(0, 2))
    # body: chunks of ~18 words as paragraphs over pages
    chunk = 18
    pieces = [" ".join(words[i : i + chunk]) + "." for i in range(0, len(words), chunk)]
    page, y = 1, 520
    for k, piece in enumerate(pieces):
        spans.append(_span(KIND_TEXT, piece[:1].upper() + piece[1:], page, y, _col_xb(rng, two_col)))
        y += int(rng.integers(40, 90))
        if y > 980:
            page, y = page + 1, 60
    if rng.random() < 0.3:
        spans.append(
            _span(KIND_FIGURE, "", page, min(y, 999), _XB_1COL, media_ref=f"media://{doc_id}/0")
        )
    perm = rng.permutation(len(spans))
    return [spans[i] for i in perm]
