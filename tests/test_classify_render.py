"""Tests for classifiers (M9-M17), boundary finders (E12/E13), the LLM
response parser (M26), and the Claude-text render (S6)."""

import numpy as np

from pdf_extraction_tests_ray.doclogic import classify as C
from pdf_extraction_tests_ray.stages.render import render_claude_text


def test_predicates():
    assert C.detect_section_header("1. Results")
    assert C.detect_section_header("INTRODUCTION")
    assert C.detect_body_start("Introduction")
    assert C.detect_body_start("1. Overview")
    assert C.detect_body_end("References")
    assert C.detect_body_end("ACKNOWLEDGMENTS")
    assert not C.detect_body_end("The references show")


def test_classify_content_type():
    assert C.classify_content_type("doi: 10.1000/x preprint", 22) == "metadata"
    assert C.classify_content_type("Department of Chemistry", 23) == "affiliations"
    assert C.classify_content_type("1. Methods", 10) == "section_header"
    body = "x" * 150 + ". " + "y" * 60
    assert C.classify_content_type(body, len(body)) == "body_text"


def test_classify_for_extraction_pages():
    assert C.classify_content_for_extraction("Short heading", 1, 200, 13) == "title"
    assert (
        C.classify_content_for_extraction("12. Smith et al. journal vol. 3", 4, 500, 31)
        == "reference"
    )
    assert C.classify_content_for_extraction("Introduction", 2, 100, 12) == "introduction"


def test_classify_universal_tie_and_threshold():
    assert C.classify_content_universal("zz", 2, 2500) == "unknown"
    assert C.classify_content_universal("1. Results and Discussion", 25, 2500) == "section_header"


def test_find_main_content_boundaries_fallbacks():
    texts = ["filler text here"] * 10
    start, end = C.find_main_content_boundaries(texts, np.ones(10), np.full(10, 50.0))
    assert start == 1  # round(10*0.1)
    assert end == 9  # round(10*0.9)


def test_abstract_tail_lookup():
    abstract = "We study silver response under stress conditions"
    body = ["intro text", "more study silver response under stress conditions follow", "rest"]
    assert C.find_abstract_tail_in_body(abstract, body) == 2
    assert C.find_abstract_tail_in_body("absent tail words entirely", body) is None


def test_parse_llm_response_json_path():
    resp = 'Sure! {"title_regions": [2], "author_regions": [3], "abstract_regions": [4, 5]} done'
    out = C.parse_llm_response(resp)
    assert out["title_regions"] == [2]
    assert out["abstract_regions"] == [4, 5]


def test_parse_llm_response_brace_balance():
    resp = 'prefix {"title_regions": [1], "other_regions": {"3": "citation"}} trailing } garbage'
    out = C.parse_llm_response(resp)
    assert out["other_regions"] == {"3": "citation"}


def test_parse_llm_response_regex_fallback():
    resp = "the title_regions are [7] and abstract_regions: [8, 9] roughly"
    out = C.parse_llm_response(resp)
    assert out["title_regions"] == [7]
    assert out["abstract_regions"] == [8, 9]


def test_parse_llm_response_defaults():
    out = C.parse_llm_response("no structure at all")
    assert out["title_regions"] == [1]
    assert out["author_regions"] == [2]
    assert out["abstract_regions"] == [3, 4, 5]


def test_region_hints():
    texts = ["Editor: John", "Nadia Petrov¹ Igor Sokolov²", "x" * 600]
    ids, previews, hints = C.region_hints(
        texts, ["text", "text", "text"], np.array([100.0, 300.0, 800.0]),
        np.array([500.0, 500.0, 900.0]), np.array([60.0, 60.0, 300.0]),
    )
    assert ids == [1, 2, 3]
    assert hints[0] == "editor_info"
    assert hints[1] == "likely_author"
    assert hints[2] == "likely_abstract"
    assert len(previews[2]) <= 400


def test_v7_layout_detectors():
    xs = [600, 620, 640, 1900, 1920, 1940]
    ncols, b = C.detect_page_layout_simple(xs, 2400)
    assert ncols == 2 and 640 < b < 1900
    ncols, b = C.detect_page_layout_quantile(xs, [5000] * 6, 2400)
    assert ncols == 2


def test_render_claude_text():
    txt = render_claude_text(
        "A Title", "A. Smith; B. Jones", "The abstract.", "Body text.", 9, "mdpi"
    )
    assert "TITLE: A Title" in txt
    assert "AUTHORS: A. Smith; B. Jones" in txt
    assert "MAIN CONTENT (Cleaned):" in txt
    assert "Total Pages: 9" in txt
    assert "Document Format: mdpi" in txt


def test_layout_overlay_sink(tmp_path, golden_corpus):
    """S5 debug sink: per-(doc,page) PGM overlays + index table; deterministic."""
    from pdf_extraction_tests_ray.stages.render import write_layout_overlays

    sample = golden_corpus.slice(0, 4)
    out = write_layout_overlays(sample, str(tmp_path / "a"))
    assert set(out.column_names) == {"doc_id", "page", "path"}
    assert out.num_rows > 0
    paths = out.column("path").to_pylist()
    head = open(paths[0], "rb").read(15)
    assert head.startswith(b"P5\n")
    # deterministic: a second render produces byte-identical images
    out2 = write_layout_overlays(sample, str(tmp_path / "b"))
    for p1, p2 in zip(paths, out2.column("path").to_pylist()):
        assert open(p1, "rb").read() == open(p2, "rb").read()
    # every span page of the first doc is covered
    spans0 = sample.column("spans").to_pylist()[0]
    pages0 = {s["offset"] // 1_000_000 for s in spans0}
    got0 = {
        p
        for d, p in zip(out.column("doc_id").to_pylist(), out.column("page").to_pylist())
        if d == sample.column("doc_id").to_pylist()[0]
    }
    assert got0 == pages0
