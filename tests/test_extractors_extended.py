"""Unit tests for the secondary extractors (E2/E6/E10), the scored format
detector branches, the simple path (E11), and MDPI/Elsevier boundary
behavior on family fixtures."""

import numpy as np
import pytest

from pdf_extraction_tests_ray.doclogic import extract as E
from pdf_extraction_tests_ray.doclogic.document import (
    _build_rdf,
    process_document,
    process_document_simple,
)
from pdf_extraction_tests_ray.doclogic.reading_order import order_document
from pdf_extraction_tests_ray.fixtures import generate_doc


def _rdf_for(fam, idx):
    _, spans = generate_doc(fam, idx)
    k = [s["kind"] for s in spans]
    t = [s["text"] for s in spans]
    r = [s["media_ref"] for s in spans]
    o = [s["offset"] for s in spans]
    oi, g = order_document(k, t, r, o)
    return _build_rdf(k, t, r, g, oi), (k, t, r, o)


def test_title_elsevier_merges_lines():
    rdf, _ = _rdf_for("elsevier", 115)
    title = E.extract_title_elsevier(rdf)
    assert title.startswith("Engineering the")


def test_abstract_from_regions_with_structure():
    rdf, _ = _rdf_for("generic1", 3)
    out = E.extract_abstract_from_regions(rdf, {"abstract_regions": [1, 2]})
    assert out  # slices the first two page-1 rows


def test_abstract_from_regions_default_ladder():
    rdf, _ = _rdf_for("generic1", 3)
    out = E.extract_abstract_from_regions(rdf, None)
    assert len(out) > 50


def test_body_text_only_fallback_to_smart():
    # small doc: conservative path yields <1000 chars for sparse fixtures ->
    # falls back to E7 output (v10A.R:1908-1911)
    rdf, _ = _rdf_for("pathological", 172)  # <3 spans variant
    out = E.extract_body_text_only(rdf, "generic_academic")
    smart = E.extract_main_text_smart(rdf, "generic_academic")["main"]
    assert out == smart or len(out) >= 1000


def test_mdpi_end_boundary_excludes_references():
    _, (k, t, r, o) = _rdf_for("mdpi", 135)
    res = process_document(k, t, r, o, cleaning_method="none")
    assert res["document_format"] == "mdpi"
    assert "References" not in res["main_text"]
    # citation scrub applied (v10A.R:2202-2209)
    assert "[3]" not in res["main_text"]
    assert "(Figure 2)" not in res["main_text"]
    assert "clinical trial" in res["main_text"]


def test_elsevier_main_skips_info_box():
    _, (k, t, r, o) = _rdf_for("elsevier", 116)
    res = process_document(k, t, r, o, cleaning_method="none")
    assert res["document_format"] == "elsevier"
    assert "1. Introduction" in res["main_text"]
    assert "Keywords:" not in res["main_text"]


def test_jac_structured_abstract():
    _, (k, t, r, o) = _rdf_for("jac", 82)
    res = process_document(k, t, r, o, cleaning_method="none")
    assert res["abstract"].startswith("Objectives:")
    assert "Conclusions:" in res["abstract"]


def test_jsm_abstract_probe():
    _, (k, t, r, o) = _rdf_for("jsm", 97)
    res = process_document(k, t, r, o, cleaning_method="none")
    assert res["abstract"].startswith("Escherichia coli can rapidly evolve resistance")
    assert "Tajkarimi" in res["authors"]


def test_nature_boxed_abstract_and_authors():
    _, (k, t, r, o) = _rdf_for("nature", 66)
    res = process_document(k, t, r, o, cleaning_method="none")
    assert res["abstract"].startswith("Silver nanoparticles have already been")
    assert res["document_format"] == "nature_communications"


def test_process_document_simple_runs():
    _, (k, t, r, o) = _rdf_for("jsm", 98)
    res = process_document_simple(k, t, r, o)
    assert res["title"].startswith("Selection of Silver Nanoparticle")
    assert res["total_text_regions"] > 0


def test_sentence_dedup_in_main():
    # pathological variant 4 plants a triple-repeated sentence
    _, (k, t, r, o) = _rdf_for("pathological", 174)
    res = process_document(k, t, r, o, cleaning_method="none")
    main = res["main_text"]
    # first-seen dedup: any sentence appears at most once
    parts = main.split(". ")
    assert len(parts) == len(set(parts))


def test_empty_and_media_only_docs():
    _, (k, t, r, o) = _rdf_for("pathological", 170)  # empty
    res = process_document(k, t, r, o)
    assert res["total_text_regions"] == 0 and res["main_text"] == ""
    _, (k, t, r, o) = _rdf_for("pathological", 177)  # media-only
    res = process_document(k, t, r, o)
    assert res["total_text_regions"] == 3
    assert all(ref.startswith("media://") for ref in res["spans"]["media_ref"])
    assert res["title"] == "Title not found"


def test_abandon_only_page1_title_not_found():
    _, (k, t, r, o) = _rdf_for("pathological", 173)
    res = process_document(k, t, r, o, cleaning_method="none")
    assert res["title"] == "Title not found"
