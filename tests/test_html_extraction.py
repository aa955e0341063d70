"""HTML DOM text-density extraction (doclogic/htmlx + stages/html_stage).

Unit tests pin the densitometric rules on hand-built pages; the pipeline
test runs the Ray stage; the driver oracle (extract_html_main) covers
whole-corpus equality against SQL in test_queries_conformance.py.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extraction_tests_ray.doclogic.htmlx import (
    classify_blocks,
    extract_main_html,
    parse_blocks,
)

LONG = " ".join(f"w{i}" for i in range(30))  # 30 words: clearly content


def test_skip_subtrees_never_emit():
    html = (
        "<body><script>var a=1;</script><style>p{}</style>"
        "<nav><a href='/'>home</a> <a href='/x'>x</a></nav>"
        f"<header>banner</header><footer>legal</footer><p>{LONG}</p></body>"
    )
    blocks = parse_blocks(html)
    assert [b.text for b in blocks] == [LONG]


def test_link_density_drops_navigation():
    html = (
        f"<body><div><a href='/1'>one link</a> <a href='/2'>two link</a></div>"
        f"<p>{LONG}</p></body>"
    )
    blocks = parse_blocks(html)
    keep = classify_blocks(blocks)
    assert keep == [False, True]
    assert blocks[0].link_density > 0.9


def test_neighbor_rule_keeps_heading_next_to_content():
    html = f"<body><h2>Short Heading</h2><p>{LONG}</p></body>"
    spans = extract_main_html(html)
    assert [s["kind"] for s in spans] == ["heading", "text"]
    assert spans[0]["order"] == 0 and spans[1]["order"] == 1

    # same heading with NO content neighbor -> dropped
    lonely = "<body><h2>Short Heading</h2><div><a href='/'>only links</a></div></body>"
    assert extract_main_html(lonely) == []


def test_short_document_gate():
    few = "only five words right here"
    assert extract_main_html(f"<body><p>{few}</p></body>") == []
    twelve = " ".join(f"t{i}" for i in range(12))
    spans = extract_main_html(f"<body><p>{twelve}</p></body>")
    assert [s["text"] for s in spans] == [twelve]


def test_trailing_fragment_kept_after_content():
    frag = "short tail words"
    spans = extract_main_html(f"<body><p>{LONG}</p><p>{frag}</p></body>")
    assert [s["text"] for s in spans] == [LONG, frag]


def test_entity_unescape_round_trip():
    spans = extract_main_html(
        "<body><p>" + " ".join(f"w{i}" for i in range(11)) + " a &amp; b</p></body>"
    )
    assert spans and spans[0]["text"].endswith("a & b")


def test_interleaved_media_spans():
    """A content-adjacent <img> becomes a figure span at its DOM order; a
    chrome image (no content neighbors) is dropped; text context skips
    over media blocks."""
    html = (
        f"<body><img src='img://chrome/banner'>"
        f"<div><a href='/'>nav nav</a></div>"
        f"<p>{LONG}</p><img src='img://doc/1'><p>short tail</p></body>"
    )
    spans = extract_main_html(html)
    assert [s["kind"] for s in spans] == ["text", "figure", "text"]
    assert spans[1]["media_ref"] == "img://doc/1"
    assert spans[1]["order"] == 1
    assert spans[2]["text"] == "short tail"  # context skips the figure

    # image with no content anywhere -> nothing survives
    assert extract_main_html("<body><img src='img://x/1'></body>") == []


@pytest.mark.usefixtures("ray_session")
def test_html_partitioned_job_with_quarantine(tmp_path):
    """The HTML leg runs through the same partitioned job machinery as
    spans: grouped commits + manifests + resume, and a poisoned document
    lands in quarantine instead of killing its partition."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extraction_tests_ray.stages.html_stage import synth_html_doc
    from pdf_extraction_tests_ray.state.checkpoint import run_partitioned

    ids = [f"page-{i:03d}" for i in range(12)]
    rows = []
    for i, did in enumerate(ids):
        text = " ".join(f"d{i}w{j}" for j in range(30))
        rows.append({"doc_id": did, "html": synth_html_doc(did, text)})
    rows.append({"doc_id": "page-bad", "html": None})  # poisoned: parser raises
    src = str(tmp_path / "pages")
    os.makedirs(src)
    pq.write_table(pa.Table.from_pylist(rows), f"{src}/part0.parquet")

    out = str(tmp_path / "out")
    summary = run_partitioned(src, out, num_groups=2, pipeline="html")
    assert len(summary["ran"]) == 2

    import ray

    import glob

    part_files = sorted(
        glob.glob(f"{out}/part=0/*.parquet") + glob.glob(f"{out}/part=1/*.parquet")
    )
    got = ray.data.read_parquet(part_files).to_pandas()
    assert sorted(got["doc_id"]) == ids  # the poisoned page is quarantined
    assert (got["n_spans"] > 0).all() and "error" not in got.columns
    q = ray.data.read_parquet(f"{out}/quarantine").to_pandas()
    assert list(q["doc_id"]) == ["page-bad"] and "Traceback" in q["error"].iloc[0]

    # resume skips everything
    again = run_partitioned(src, out, num_groups=2, pipeline="html")
    assert again["ran"] == [] and sorted(again["skipped"]) == [0, 1]

    # knob misuse fails loudly
    with pytest.raises(ValueError):
        run_partitioned(src, out, num_groups=2, pipeline="html", fragmented=True)

    m = json.load(open(f"{out}/manifest/part-0.json"))
    assert m["rows_written"] > 0 and m["engine_version"]


@pytest.mark.usefixtures("ray_session")
def test_html_stage_layout_invariant():
    """The Ray stage output is identical across block layouts and matches
    the per-doc pure function."""
    import ray

    from pdf_extraction_tests_ray.stages.html_stage import (
        add_html,
        extract_html_batch,
        synth_html_doc,
    )

    rows = [
        {"doc_id": i, "text": " ".join(f"d{i}w{j}" for j in range(5 + 7 * i))}
        for i in range(8)
    ]
    outs = []
    for parts in (1, 4):
        ds = ray.data.from_items(rows).repartition(parts)
        out = (
            ds.map_batches(add_html, batch_format="pandas")
            .map_batches(extract_html_batch, batch_format="pandas")
            .to_pandas()
            .sort_values(["doc_id", "order"])
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # doc 0 has 5 words (< 12): no spans; doc 1 has 12: heading + 1 para
    assert 0 not in set(outs[0]["doc_id"])
    d1 = outs[0][outs[0]["doc_id"] == 1]
    assert list(d1["kind"]) == ["heading", "text"]

    one = extract_main_html(synth_html_doc(7, rows[7]["text"]))
    d7 = outs[0][outs[0]["doc_id"] == 7]
    assert list(d7["text"]) == [s["text"] for s in one]


# ---------------------------------------------------------------------------
# atomic <table> extraction


CONTENT = "<p>" + " ".join(f"w{i}" for i in range(20)) + "</p>"


def test_table_is_one_atomic_span():
    from pdf_extraction_tests_ray.doclogic.htmlx import extract_main_html

    html = (
        "<body>" + CONTENT
        + "<table><tr><td>a1</td><td>a2</td></tr>"
        + "<tr><td>b1</td><td>b2</td></tr></table>"
        + CONTENT + "</body>"
    )
    spans = extract_main_html(html)
    tables = [s for s in spans if s["kind"] == "table"]
    assert len(tables) == 1
    assert tables[0]["text"] == "a1 | a2 || b1 | b2"
    # DOM order preserved: text, table, text
    assert [s["kind"] for s in spans] == ["text", "table", "text"]


def test_link_farm_table_is_dropped():
    """A layout table of navigation links fails the link-density gate."""
    from pdf_extraction_tests_ray.doclogic.htmlx import extract_main_html

    nav = (
        "<table><tr>"
        + "".join(f'<td><a href="/{i}">link {i}</a></td>' for i in range(4))
        + "</tr></table>"
    )
    spans = extract_main_html("<body>" + CONTENT + nav + CONTENT + "</body>")
    assert [s["kind"] for s in spans] == ["text", "text"]


def test_nested_table_flattens_into_outer():
    from pdf_extraction_tests_ray.doclogic.htmlx import extract_main_html

    html = (
        "<body>" + CONTENT
        + "<table><tr><td>o1</td></tr>"
        + "<table><tr><td>i1</td><td>i2</td></tr></table>"
        + "<tr><td>o2</td></tr></table>"
        + CONTENT + "</body>"
    )
    tables = [s for s in extract_main_html(html) if s["kind"] == "table"]
    assert len(tables) == 1
    assert tables[0]["text"] == "o1 || i1 | i2 || o2"


def test_short_text_after_table_keeps_content_context():
    """A caption-sized paragraph right after an in-article table must not
    lose its content neighborhood to the (density-neutral) table."""
    from pdf_extraction_tests_ray.doclogic.htmlx import extract_main_html

    html = (
        "<body>" + CONTENT
        + "<table><tr><td>x</td><td>y</td></tr></table>"
        + "<p>short trailing caption</p></body>"
    )
    kinds_texts = [(s["kind"], s["text"]) for s in extract_main_html(html)]
    assert ("text", "short trailing caption") in kinds_texts
    assert ("table", "x | y") in kinds_texts


def test_big_table_is_content_on_its_own_mass():
    """A data table with >= 12 cell words is content even with no text
    neighbors."""
    from pdf_extraction_tests_ray.doclogic.htmlx import extract_main_html

    cells = "".join(f"<td>cell word {i}</td>" for i in range(5))
    html = f"<body><nav><a href='/'>only nav</a></nav><table><tr>{cells}</tr></table></body>"
    spans = extract_main_html(html)
    assert [s["kind"] for s in spans] == ["table"]


# ---------------------------------------------------------------------------
# atomic <ul>/<ol> extraction


def test_list_is_one_atomic_span():
    from pdf_extraction_tests_ray.doclogic.htmlx import extract_main_html

    html = (
        "<body>" + CONTENT
        + "<ul><li>first item</li><li>second item</li></ul>"
        + CONTENT + "</body>"
    )
    spans = extract_main_html(html)
    assert [s["kind"] for s in spans] == ["text", "list", "text"]
    assert spans[1]["text"] == "first item; second item"


def test_nav_menu_list_is_dropped():
    """A <ul> of links (nav menu outside <nav>) fails link density."""
    from pdf_extraction_tests_ray.doclogic.htmlx import extract_main_html

    menu = (
        "<ul>"
        + "".join(f'<li><a href="/{i}">menu {i}</a></li>' for i in range(4))
        + "</ul>"
    )
    spans = extract_main_html("<body>" + CONTENT + menu + CONTENT + "</body>")
    assert [s["kind"] for s in spans] == ["text", "text"]


def test_nested_list_flattens():
    from pdf_extraction_tests_ray.doclogic.htmlx import extract_main_html

    html = (
        "<body>" + CONTENT
        + "<ul><li>outer one</li><ul><li>inner a</li></ul><li>outer two</li></ul>"
        + "</body>"
    )
    lists = [s for s in extract_main_html(html) if s["kind"] == "list"]
    assert len(lists) == 1
    assert lists[0]["text"] == "outer one; inner a; outer two"


def test_big_list_is_content_on_its_own_mass():
    from pdf_extraction_tests_ray.doclogic.htmlx import extract_main_html

    items = "".join(f"<li>item number {i} words</li>" for i in range(4))
    html = f"<body><ul>{items}</ul></body>"
    assert [s["kind"] for s in extract_main_html(html)] == ["list"]


def test_img_inside_table_hoists_as_figure():
    """Media inside an atomic table/list must not vanish — the figure is
    hoisted just after the containing block."""
    from pdf_extraction_tests_ray.doclogic.htmlx import extract_main_html

    html = (
        "<body>" + CONTENT
        + '<table><tr><td>a picture</td><td><img src="img://x/1"></td></tr></table>'
        + CONTENT + "</body>"
    )
    spans = extract_main_html(html)
    assert [s["kind"] for s in spans] == ["text", "table", "figure", "text"]
    assert spans[2]["media_ref"] == "img://x/1"
    html2 = (
        "<body>" + CONTENT
        + '<ul><li>one item</li><li><img src="img://x/2"></li></ul>'
        + CONTENT + "</body>"
    )
    spans2 = extract_main_html(html2)
    assert ("figure", "img://x/2") in [
        (s["kind"], s["media_ref"]) for s in spans2
    ]


def test_table_with_implied_row_and_caption():
    """<td> without <tr> (browsers imply the row) and <caption> text must
    not drop the table."""
    from pdf_extraction_tests_ray.doclogic.htmlx import extract_main_html

    html = (
        "<body>" + CONTENT
        + "<table><td>cellA</td><td>cellB</td></table>"
        + "<table><caption>the caption</caption><tr><td>x1</td></tr></table>"
        + CONTENT + "</body>"
    )
    tables = [s["text"] for s in extract_main_html(html) if s["kind"] == "table"]
    assert "cellA | cellB" in tables
    assert "the caption || x1" in tables  # caption = its own implied row


# ---------------------------------------------------------------------------
# hand-built realistic pages (static fixtures, tests/html_fixture_pages.py)


def test_news_article_page_classification():
    """Full pinned classification of a realistic news page: headline kept
    through the byline via the heading forward rule; nav/breadcrumbs/
    sidebar/footer dropped structurally or by link density; the inline
    figure and its caption ride the content context; the comments section
    (short fragments AND its heading) is dropped."""
    from html_fixture_pages import NEWS_ARTICLE

    spans = extract_main_html(NEWS_ARTICLE)
    assert [s["kind"] for s in spans] == [
        "heading", "text", "text", "figure", "text", "text", "heading", "text",
    ]
    assert [s["order"] for s in spans] == list(range(8))
    assert spans[0]["text"] == "Storm Delays Harvest Across the Valley"
    assert spans[1]["text"] == "By Ana Petrova, Agriculture Correspondent"
    assert spans[2]["text"].startswith("Heavy rain over the weekend")
    assert spans[3]["media_ref"] == "/img/2024/harvest-combines.jpg"
    assert spans[4]["text"] == "Combines stood idle near Eastbrook on Sunday as fields drained."
    assert spans[6]["text"] == "Prices firm on the delay"
    joined = " ".join(s["text"] for s in spans)
    for boiler in [
        "The Daily Ledger",       # logo/header
        "Subscribe",              # nav
        "Home",                   # breadcrumbs
        "Comments",               # heading of a dropped section
        "Same story every year",  # short comment fragments
        "Rail strike",            # sidebar related-links
        "Privacy",                # footer
    ]:
        assert boiler not in joined, boiler


def test_product_page_link_farm_vs_specs_table():
    """The link-farm directory table (pure anchors) is dropped by link
    density while the in-content specs table survives atomically; the
    whats-in-the-box list is kept; nav/footer links dropped."""
    from html_fixture_pages import PRODUCT_PAGE

    spans = extract_main_html(PRODUCT_PAGE)
    assert [s["kind"] for s in spans] == [
        "heading", "text", "heading", "table", "text", "heading", "list",
    ]
    assert spans[0]["text"] == "VX-220 Bench Power Supply"
    assert spans[3]["text"] == (
        "Output voltage | 0 to 30 V || Output current | 0 to 5 A || "
        "Ripple | < 1 mV rms || Line regulation | 0.01 % + 2 mV"
    )
    assert spans[6]["text"] == (
        "VX-220 unit with detachable IEC mains lead; "
        "Pair of shrouded banana test leads, one metre; "
        "Calibration certificate and printed quick-start guide"
    )
    joined = " ".join(s["text"] for s in spans)
    for boiler in ["Multimeters", "Oscilloscopes", "Cart", "Returns"]:
        assert boiler not in joined, boiler


def test_docs_page_toc_and_pager_dropped():
    """The nested table-of-contents link list and the prev/next pager are
    dropped; the pre code block and in-article bullet list are kept in
    DOM order between their surrounding paragraphs."""
    from html_fixture_pages import DOCS_PAGE

    spans = extract_main_html(DOCS_PAGE)
    assert [s["kind"] for s in spans] == [
        "heading", "text", "heading", "text", "text", "text", "heading", "text", "list",
    ]
    assert spans[0]["text"] == "Configuring retry policies"
    assert "strategy: exponential" in spans[4]["text"]  # the <pre> block
    assert spans[8]["text"].startswith("Per-attempt timeout")
    joined = " ".join(s["text"] for s in spans)
    for boiler in ["Overview", "Previous: Timeouts", "Next: Hedging", "Edit this page"]:
        assert boiler not in joined, boiler


def test_cjk_mass_gate_language_aware():
    """A CJK article paragraph tokenizes to ~1 'word', so the word gate
    alone would leave it undecided (and drop it when isolated); the
    CJK-character mass gate keeps it. Short CJK fragments still resolve
    by context, and CJK-heavy nav is still killed by link density."""
    para = "這是一段足夠長的中文正文內容" * 3  # 42 CJK chars, no spaces
    short = "短句"  # 2 chars: under the gate
    # isolated long CJK paragraph: kept by the char-mass gate
    out = extract_main_html(f"<body><p>{para}</p></body>")
    assert [s["text"] for s in out] == [para]
    # sanity: the word gate really cannot see it (one whitespace token)
    blocks = parse_blocks(f"<body><p>{para}</p></body>")
    assert blocks[0].n_words == 1 and blocks[0].n_cjk_chars == len(para)
    # short CJK fragment between content stays; isolated it goes
    kept = extract_main_html(
        f"<body><p>{para}</p><p>{short}</p><p>{para}</p></body>"
    )
    assert [s["text"] for s in kept] == [para, short, para]
    assert extract_main_html(f"<body><p>{short}</p></body>") == []
    # CJK link farm: link density gate unchanged
    nav = "".join(f"<a href='/{i}'>連結文字連結</a>" for i in range(8))
    out = extract_main_html(f"<body><div>{nav}</div><p>{para}</p></body>")
    assert [s["text"] for s in out] == [para]
    # hiragana and hangul count toward the same mass signal
    ja = "これはじゅうぶんにながいにほんごのほんぶんです" * 2
    ko = "이것은충분히긴한국어본문단락입니다" * 2
    for t in (ja, ko):
        assert [s["text"] for s in extract_main_html(f"<body><p>{t}</p></body>")] == [t]


@pytest.mark.usefixtures("ray_session")
def test_learned_boilerplate_distills_the_rules():
    """fit_boilerplate_model self-distills classify_blocks into a linear
    block model; on the synthesizer corpus the learned extraction agrees
    with the rule-based extraction on >= 95% of spans, the fit is
    bitwise layout-invariant (exact-integer moments), and the apply
    stage runs as an actor pool with broadcast weights."""
    import ray

    from pdf_extraction_tests_ray.stages.html_stage import (
        LearnedBoilerplate,
        add_html,
        extract_html_batch,
        fit_boilerplate_model,
    )

    docs = pd.DataFrame(
        {
            "doc_id": list(range(40)),
            "text": [
                " ".join(f"w{d}x{i}" for i in range(70 + (d % 5) * 13))
                for d in range(40)
            ],
        }
    )
    pages = ray.data.from_pandas(docs).map_batches(add_html, batch_format="pandas")
    w = fit_boilerplate_model(pages)
    w_other_layout = fit_boilerplate_model(
        ray.data.from_pandas(docs).repartition(7).map_batches(add_html, batch_format="pandas")
    )
    assert w.tolist() == w_other_layout.tolist()  # bitwise invariant

    learned = (
        pages.map_batches(
            LearnedBoilerplate,
            fn_constructor_kwargs={"weights_ref": ray.put([float(x) for x in w])},
            concurrency=2,
            batch_format="pandas",
        )
        .to_pandas()
        .sort_values(["doc_id", "order"])
        .reset_index(drop=True)
    )
    ruled = (
        pages.map_batches(extract_html_batch, batch_format="pandas")
        .to_pandas()
        .sort_values(["doc_id", "order"])
        .reset_index(drop=True)
    )
    rule_keys = set(map(tuple, ruled[["doc_id", "kind", "text"]].itertuples(index=False)))
    learn_keys = set(map(tuple, learned[["doc_id", "kind", "text"]].itertuples(index=False)))
    inter = len(rule_keys & learn_keys)
    union = len(rule_keys | learn_keys)
    assert inter / union >= 0.95, (inter, union, len(rule_keys), len(learn_keys))
