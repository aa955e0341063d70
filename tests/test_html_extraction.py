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
