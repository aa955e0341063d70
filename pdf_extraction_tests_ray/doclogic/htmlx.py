"""HTML DOM text-density main-content extraction (boilerplate strip).

The north-star pipeline covers interleaved web documents, where the text
side arrives as HTML rather than PDF layout spans; this module is the
DOM-heuristics leg: parse the DOM into block-level text runs, score each
block densitometrically, and keep the content blocks. Pure Python
(stdlib ``html.parser`` — no lxml/bs4 in this environment), no Ray: like
the rest of ``doclogic`` it doubles as the single-document oracle for
the Ray stage that wraps it.

Heuristics follow the public densitometric-classification literature
(Kohlschuetter, Fankhauser, Nejdl, "Boilerplate Detection using Shallow
Text Features", WSDM 2010 — the boilerpipe rules):
- LINK DENSITY: a block whose characters are mostly anchor text is
  navigation, not content.
- TEXT MASS: boilerplate blocks are short and fragmented, content runs
  long — implemented as a word-count gate (the word count IS the
  densitometric signal at a fixed wrap measure: boilerpipe's chars-per-
  wrapped-line and a word threshold rank blocks near-identically, and
  the word form keeps the SQL oracle exact).
- CONTEXT: a short block *between* content blocks (a heading inside the
  article) is kept; the same block between boilerplate is dropped.
  Implemented as the standard one-pass neighbor rule; media blocks are
  transparent to it.
- STRUCTURE: <script>/<style>/<nav>/<header>/<footer>/<aside> subtrees
  are boilerplate by construction and never produce blocks.

Deterministic: pure function of the HTML string; no RNG, no state.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

# block-level elements that FLUSH the current text run
_BLOCK_TAGS = {
    "p", "div", "section", "article", "li", "ul", "ol", "table", "tr",
    "td", "th", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre",
    "br", "main", "body", "figure", "figcaption",
}
# subtrees that are boilerplate by construction (never emit blocks)
_SKIP_TAGS = {"script", "style", "nav", "header", "footer", "aside", "noscript"}
# heading tags (kept as headings when between content)
_HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}

_MAX_LINK_DENSITY = 0.33  # boilerpipe's link-density gate
_MIN_DENSITY_WORDS = 12  # text-mass gate (words) for isolated blocks

# Language-aware mass gate: the word gate assumes space-delimited text —
# a CJK article paragraph tokenizes to ~1 "word" and would always fall
# through to the context rule (and an ISOLATED one would be dropped as
# boilerplate). CJK scripts carry roughly one morpheme per codepoint, so
# character mass is the densitometric signal there: 24 CJK chars ≈ the
# content mass of the 12-word Latin gate at boilerpipe's wrap measure.
_MIN_DENSITY_CJK_CHARS = 24
_CJK_RANGES = (
    ("ぁ", "ヿ"),  # hiragana (U+3041, first assigned) + katakana
    ("一", "鿿"),  # CJK unified ideographs (same range lang-id uses)
    ("가", "힣"),  # hangul syllables (ends U+D7A3 per spec)
)


@dataclass
class Block:
    text: str = ""
    n_chars: int = 0
    n_link_chars: int = 0
    is_heading: bool = False
    n_words: int = field(default=0)
    media_ref: str = ""  # <img src>: an interleaved media span
    is_table: bool = False  # atomic <table> (cells ' | ', rows ' || ')
    is_list: bool = False  # atomic <ul>/<ol> (items joined '; ')

    @property
    def link_density(self) -> float:
        return self.n_link_chars / self.n_chars if self.n_chars else 0.0

    @property
    def n_cjk_chars(self) -> int:
        return sum(
            1 for c in self.text if any(lo <= c <= hi for lo, hi in _CJK_RANGES)
        )


class _BlockParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._buf: list[str] = []
        self._link_chars = 0
        self._in_anchor = 0
        self._skip_depth = 0
        self._heading_depth = 0
        # <table> capture: one ATOMIC block per top-level table (cells
        # ' | ', rows ' || ') — per-cell fragments would be short-block
        # boilerplate to the densitometric gates, losing every data
        # table; nested tables flatten into the outer one's row list
        self._table_depth = 0
        self._rows: list[list[str]] = []
        self._cell: list[str] | None = None
        self._tbl_link_chars = 0
        # <ul>/<ol> capture: one ATOMIC block per top-level list (items
        # joined '; ') — per-<li> fragments would be short-block
        # boilerplate, shattering in-article bullet lists; nested lists
        # flatten into the outer item sequence. A <table> inside a list
        # item still captures as its own table block (table wins).
        self._list_depth = 0
        self._items: list[str] = []
        self._item: list[str] | None = None
        self._lst_link_chars = 0
        # <img> inside a table/list: the figure is HOISTED to just after
        # the containing atomic block (media must not vanish — gallery
        # tables are common crawl markup; the neighbor rule then treats
        # it like any other figure)
        self._pending_media: list[str] = []

    def _close_item(self):
        if self._item is not None:
            text = " ".join("".join(self._item).split())
            if text:
                self._items.append(text)
            self._item = None

    def _flush_list(self):
        self._close_item()
        text = "; ".join(self._items)
        if text:
            b = Block(
                text=text,
                n_chars=len(text),
                n_link_chars=min(self._lst_link_chars, len(text)),
                is_list=True,
            )
            b.n_words = sum(len(i.split()) for i in self._items)
            self.blocks.append(b)
        self._items = []
        self._lst_link_chars = 0
        self._emit_pending_media()

    def _close_cell(self):
        if self._cell is not None:
            text = " ".join("".join(self._cell).split())
            if text and self._rows:
                self._rows[-1].append(text)
            self._cell = None

    def _flush_table(self):
        self._close_cell()
        rows = [" | ".join(r) for r in self._rows if r]
        text = " || ".join(rows)
        if text:
            b = Block(
                text=text,
                n_chars=len(text),
                n_link_chars=min(self._tbl_link_chars, len(text)),
                is_table=True,
            )
            # density signal = cell words only (not the separator glyphs)
            b.n_words = sum(len(c.split()) for r in self._rows for c in r)
            self.blocks.append(b)
        self._rows = []
        self._tbl_link_chars = 0
        self._emit_pending_media()

    def _emit_pending_media(self):
        for src in self._pending_media:
            self.blocks.append(Block(media_ref=src))
        self._pending_media = []

    def _flush(self):
        text = " ".join("".join(self._buf).split())
        if text:
            b = Block(
                text=text,
                n_chars=len(text),
                n_link_chars=min(self._link_chars, len(text)),
                is_heading=self._heading_depth > 0,
            )
            b.n_words = len(text.split())
            self.blocks.append(b)
        self._buf = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "table":
            if self._table_depth == 0:
                self._flush()
            self._table_depth += 1
            return
        if self._table_depth:
            if tag == "tr":
                self._close_cell()
                self._rows.append([])
            elif tag in ("td", "th", "caption"):
                self._close_cell()
                if not self._rows:  # implied row: <td> with no <tr> seen
                    self._rows.append([])
                self._cell = []
            elif tag == "a":
                self._in_anchor += 1
            elif tag == "img":
                src = dict(attrs).get("src") or ""
                if src:
                    self._pending_media.append(src)
            return
        if tag in ("ul", "ol"):
            if self._list_depth == 0:
                self._flush()
            self._list_depth += 1
            return
        if self._list_depth:
            if tag == "li":
                self._close_item()
                self._item = []
            elif tag == "a":
                self._in_anchor += 1
            elif tag == "img":
                src = dict(attrs).get("src") or ""
                if src:
                    self._pending_media.append(src)
            return
        if tag == "img":
            # media span at its DOM position: flush the text run, emit a
            # zero-text block carrying the ref (kept/dropped by the same
            # neighbor rule as other short blocks — a content-adjacent
            # figure survives, chrome imagery does not)
            self._flush()
            src = dict(attrs).get("src") or ""
            if src:
                self.blocks.append(Block(media_ref=src))
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _HEADING_TAGS:
            self._heading_depth += 1
        if tag == "a":
            self._in_anchor += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if self._table_depth:
            if tag == "table":
                self._table_depth -= 1
                if self._table_depth == 0:
                    self._flush_table()
            elif tag in ("td", "th"):
                self._close_cell()
            elif tag == "a":
                self._in_anchor = max(0, self._in_anchor - 1)
            return
        if self._list_depth:
            if tag in ("ul", "ol"):
                self._list_depth -= 1
                if self._list_depth == 0:
                    self._flush_list()
            elif tag == "li":
                self._close_item()
            elif tag == "a":
                self._in_anchor = max(0, self._in_anchor - 1)
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _HEADING_TAGS:
            self._heading_depth = max(0, self._heading_depth - 1)
        if tag == "a":
            self._in_anchor = max(0, self._in_anchor - 1)

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._table_depth:
            if self._cell is not None:
                self._cell.append(data)
                if self._in_anchor:
                    self._tbl_link_chars += len(data.strip())
            return
        if self._list_depth:
            if self._item is not None:
                self._item.append(data)
                if self._in_anchor:
                    self._lst_link_chars += len(data.strip())
            return
        self._buf.append(data)
        if self._in_anchor:
            self._link_chars += len(data.strip())

    def close(self):
        super().close()
        if self._table_depth:  # unclosed <table> at EOF
            self._table_depth = 0
            self._flush_table()
        if self._list_depth:  # unclosed <ul>/<ol> at EOF
            self._list_depth = 0
            self._flush_list()
        self._flush()


def parse_blocks(html: str) -> list[Block]:
    """DOM -> block-level text runs with link/heading annotations.
    <script>/<style>/<nav>/<header>/<footer>/<aside> subtrees never emit."""
    p = _BlockParser()
    p.feed(html)
    p.close()
    return p.blocks


def classify_blocks(blocks: list[Block]) -> list[bool]:
    """Per-block content/boilerplate decision (True = content).

    Pass 1 — local densitometric gates: link density above
    ``_MAX_LINK_DENSITY`` is boilerplate; long blocks (>=
    ``_MIN_DENSITY_WORDS`` words, or >= ``_MIN_DENSITY_CJK_CHARS`` CJK
    codepoints — the language-aware form of the same mass signal for
    scripts that don't space-delimit) below the gate are content.
    Pass 2 — neighbor rule: a short text fragment is kept only when
    adjacent to a content block on either side; a short HEADING instead
    looks FORWARD to the next locally-decided block (headings introduce
    the content BELOW them — boilerpipe's heading handling): an article
    headline separated from its first paragraph by a short byline stays,
    while a section heading whose section was dropped (a comments header
    over short comments, a sidebar title) goes with it. Real-page
    fixtures in tests/test_html_extraction.py pin both directions."""
    local = []
    for b in blocks:
        if b.link_density > _MAX_LINK_DENSITY:
            local.append(False)
        elif b.n_words >= _MIN_DENSITY_WORDS or b.n_cjk_chars >= _MIN_DENSITY_CJK_CHARS:
            local.append(True)
        else:
            local.append(None)  # undecided: resolve by context
    out = []
    n = len(blocks)
    for i, dec in enumerate(local):
        if dec is not None:
            out.append(dec)
            continue
        if blocks[i].is_heading and not blocks[i].media_ref:
            j = i + 1
            while j < n and local[j] is None:
                j += 1
            out.append(j < n and local[j] is True)
            continue
        if blocks[i].media_ref:
            # a figure keeps its immediate context: kept inside content
            prev_c = i > 0 and local[i - 1] is True
            next_c = i + 1 < n and local[i + 1] is True
        else:
            # text context skips over media AND short table/list blocks
            # (a figure carries no density signal, and a small data table
            # or bullet list is likewise neutral — a caption-sized
            # paragraph right after one must not lose its content
            # neighborhood to it; the nearest TEXT neighbors decide)
            def _transparent(k: int) -> bool:
                return bool(blocks[k].media_ref) or (
                    (blocks[k].is_table or blocks[k].is_list)
                    and local[k] is None
                )

            j = i - 1
            while j >= 0 and _transparent(j):
                j -= 1
            prev_c = j >= 0 and local[j] is True
            j = i + 1
            while j < n and _transparent(j):
                j += 1
            next_c = j < n and local[j] is True
        out.append(prev_c or next_c)
    return out


def block_features(blocks: list[Block]) -> list[list[int]]:
    """Integer densitometric feature vector per block, for the LEARNED
    boilerplate classifier: ``[bias, n_words, n_chars, n_link_chars,
    is_heading, n_cjk_chars, prev_n_words, next_n_words]``. The last two
    expose the context signal the rule classifier reads from neighbors;
    the link-density rule is linear in (n_link_chars, n_chars) so the
    whole rule family sits near a linear boundary in this space. Pure
    ints — exact-integer moment training is bitwise layout-invariant."""
    feats = []
    n = len(blocks)
    for i, b in enumerate(blocks):
        feats.append(
            [
                1,
                b.n_words,
                b.n_chars,
                b.n_link_chars,
                int(b.is_heading),
                b.n_cjk_chars,
                blocks[i - 1].n_words if i > 0 else 0,
                blocks[i + 1].n_words if i + 1 < n else 0,
            ]
        )
    return feats


def spans_from_blocks(blocks: list[Block], keep: list[bool]) -> list[dict]:
    """Kept blocks -> ordered span dicts (shared by the rule-based and
    learned classifiers so the two variants differ ONLY in ``keep``)."""
    out = []
    order = 0
    for b, k in zip(blocks, keep):
        if not k:
            continue
        if b.media_ref:
            kind = "figure"
        elif b.is_table:
            kind = "table"
        elif b.is_list:
            kind = "list"
        else:
            kind = "heading" if b.is_heading else "text"
        out.append(
            {
                "kind": kind,
                "text": b.text,
                "media_ref": b.media_ref,
                "order": order,
            }
        )
        order += 1
    return out


def extract_main_html(html: str) -> list[dict]:
    """Main-content spans of one HTML document, in DOM order:
    ``[{kind, text, media_ref, order}]`` — kind ``heading``/``text`` for
    text runs, ``figure`` for kept interleaved ``<img>`` spans, ``table``
    for atomic table blocks (cells ' | ', rows ' || ') and ``list`` for
    atomic ``<ul>``/``<ol>`` blocks (items '; '). The same densitometric
    gates apply to both, so link-farm layout tables and nav-menu lists
    are dropped while data tables / in-article bullet lists survive on
    word mass or content context."""
    blocks = parse_blocks(html)
    return spans_from_blocks(blocks, classify_blocks(blocks))
