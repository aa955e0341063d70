"""Ray stage for HTML DOM main-content extraction (boilerplate strip).

Wraps ``doclogic.htmlx`` (the pure-Python densitometric classifier) as a
stateless ``map_batches`` transform — per-document independence, no
shuffle, same shape as the PDF-span extraction stage. Includes the
deterministic HTML synthesizer used by tests/bench/driver: it wraps each
``documents.text`` row in a realistic page skeleton (nav/header/footer/
aside/related-links boilerplate around an <article> of 20-word
paragraphs under an "Overview <doc_id>" heading, with an interleaved
<img> between every 3rd and 4th paragraph), chosen so the EXPECTED
extraction — text AND figure spans — is a pure function of the word
list, which is what lets the driver check the whole DOM path against a
plain SQL oracle.
"""

from __future__ import annotations

import html as _html

import numpy as np
import pandas as pd

from ..doclogic.htmlx import (
    block_features,
    classify_blocks,
    extract_main_html,
    parse_blocks,
    spans_from_blocks,
)

PARA_WORDS = 20  # words per synthesized content paragraph
IMG_EVERY = 3  # an interleaved <img> after every 3rd paragraph


def synth_html_doc(doc_id, text: str) -> str:
    """Deterministic page: boilerplate chrome + an article whose content
    paragraphs are consecutive 20-word chunks of ``text`` (whitespace
    split), under the heading ``Overview <doc_id>``."""
    words = text.split()
    paras = [
        " ".join(words[i : i + PARA_WORDS]) for i in range(0, len(words), PARA_WORDS)
    ]
    nav = "".join(f'<a href="/s/{i}">site link {i}</a> ' for i in range(5))
    related = "".join(f'<a href="/r/{i}">related story {i} here</a> ' for i in range(4))
    body = ""
    for j, p in enumerate(paras, start=1):
        body += f"<p>{_html.escape(p)}</p>"
        if j == 2 and j < len(paras):
            # deterministic 2x3 data table after the 2nd paragraph: its
            # cells are the doc's first six words, so the expected atomic
            # 'table' span stays a pure function of the word list
            cells = [_html.escape(w) for w in words[:6]]
            body += (
                "<table><tr><td>" + "</td><td>".join(cells[:3])
                + "</td></tr><tr><td>" + "</td><td>".join(cells[3:6])
                + "</td></tr></table>"
            )
        if j == 4 and j < len(paras):
            # deterministic 3-item bullet list after the 4th paragraph:
            # items are word pairs 7-8 / 9-10 / 11-12 of the doc
            items = [
                _html.escape(" ".join(words[k : k + 2])) for k in (6, 8, 10)
            ]
            body += "<ul>" + "".join(f"<li>{i}</li>" for i in items) + "</ul>"
        if j % IMG_EVERY == 0 and j < len(paras):
            # interleaved media span between paragraphs (never after the
            # last: a figure with only boilerplate after a short trailing
            # paragraph would be context-dropped, which the SQL oracle
            # would have to special-case)
            body += f'<img src="img://{doc_id}/{j // IMG_EVERY}">'
    return (
        "<html><head><title>x</title><script>var x=1;</script>"
        "<style>p{margin:0}</style></head><body>"
        f"<header>Site Chrome Banner</header><nav>{nav}</nav>"
        '<aside>promoted teaser text over here</aside>'
        f"<article><h2>Overview {doc_id}</h2>{body}"
        f'<div class="related">{related}</div></article>'
        "<footer>copyright legal words</footer></body></html>"
    )


def add_html(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["html"] = [
        synth_html_doc(d, t) for d, t in zip(df["doc_id"].tolist(), df["text"].tolist())
    ]
    return df


def extract_html_docs(df: pd.DataFrame) -> pd.DataFrame:
    """Doc-level variant for the partitioned job (state/checkpoint):
    one row per document with NESTED spans and the engine's quarantine
    contract — ``error`` column, empty string = ok; a failing document
    carries its traceback instead of killing the partition."""
    import traceback

    rows = []
    for d, h in zip(df["doc_id"].tolist(), df["html"].tolist()):
        try:
            spans = extract_main_html(h)
            rows.append(
                {"doc_id": d, "spans": spans, "n_spans": len(spans), "error": ""}
            )
        except Exception:
            rows.append(
                {
                    "doc_id": d,
                    "spans": [],
                    "n_spans": 0,
                    "error": traceback.format_exc()[-2000:],
                }
            )
    return pd.DataFrame(rows)


def extract_html_batch(df: pd.DataFrame) -> pd.DataFrame:
    """One row per kept span: (doc_id, order, kind, text, media_ref) —
    text/heading runs interleaved with figure spans in DOM order."""
    ids, orders, kinds, texts, refs = [], [], [], [], []
    for d, h in zip(df["doc_id"].tolist(), df["html"].tolist()):
        for span in extract_main_html(h):
            ids.append(d)
            orders.append(span["order"])
            kinds.append(span["kind"])
            texts.append(span["text"])
            refs.append(span["media_ref"])
    return pd.DataFrame(
        {"doc_id": ids, "order": orders, "kind": kinds, "text": texts, "media_ref": refs}
    )


# ---------------------------------------------------------------------------
# Learned-boilerplate variant: distill the densitometric rules into a
# linear block classifier, then extract with the model instead of the
# rules. The trainer is the repo's exact-integer-moments ridge pattern
# (stages/curation.fit_ridge_scorer): one combiner pass over pages, 8x8
# python-int partials, one driver solve — bitwise layout-invariant. The
# apply stage is an ACTOR POOL (A-series architecture: weights broadcast
# once via ray.put, materialized per actor in __init__, never per batch)
# — at 8 floats the state is trivial, but the stage is the documented
# drop-in point for a REAL learned boilerplate model (e.g. a token-level
# transformer), where warm per-actor state is the part that matters.

_BOILER_DIM = 8  # bias, n_words, n_chars, n_link_chars, is_heading, n_cjk, prev_w, next_w


def fit_boilerplate_model(pages, lam: float = 1.0, html_col: str = "html"):
    """Distill ``classify_blocks`` into ridge weights over
    ``doclogic.htmlx.block_features``: labels are the rule classifier's
    own decisions (self-distillation — no hand labels exist at corpus
    scale), features are pure ints, so X'X / X'y partials are exact and
    the fit is a pure function of the block multiset."""
    import ray  # noqa: F401  (pages is a ray.data.Dataset)

    d = _BOILER_DIM

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        xtx = [[0] * d for _ in range(d)]
        xty = [0] * d
        for h in df[html_col].tolist():
            blocks = parse_blocks(h)
            keep = classify_blocks(blocks)
            for x, y in zip(block_features(blocks), keep):
                yi = int(y)
                for i in range(d):
                    xi = x[i]
                    if not xi:
                        continue
                    row = xtx[i]
                    for j in range(i, d):
                        row[j] += xi * x[j]
                    xty[i] += xi * yi
        flat = {f"m{i}_{j}": [xtx[i][j]] for i in range(d) for j in range(i, d)}
        flat.update({f"v{i}": [xty[i]] for i in range(d)})
        return pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in flat.items()})

    p = pages.map_batches(partial, batch_format="pandas").to_pandas()
    xtx = np.zeros((d, d))
    xty = np.zeros(d)
    for i in range(d):
        for j in range(i, d):
            s = sum(int(x) for x in p[f"m{i}_{j}"].tolist())  # exact python ints
            xtx[i][j] = xtx[j][i] = float(s)
        xty[i] = float(sum(int(x) for x in p[f"v{i}"].tolist()))
    reg = lam * np.eye(d)
    reg[0, 0] = 0.0  # never shrink the bias
    return np.linalg.solve(xtx + reg, xty)


class LearnedBoilerplate:
    """Actor-pool span extraction with the LEARNED block classifier:
    keep a block when ``w . x >= 0.5`` (ridge on 0/1 labels). Pass to
    ``pages.map_batches(LearnedBoilerplate, fn_constructor_kwargs=
    {"weights_ref": ray.put(list(w))}, concurrency=N)``. Output schema
    matches ``extract_html_batch`` exactly."""

    def __init__(self, weights_ref):
        import ray

        self._w = np.asarray(ray.get(weights_ref), dtype=np.float64)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, orders, kinds, texts, refs = [], [], [], [], []
        for doc, h in zip(df["doc_id"].tolist(), df["html"].tolist()):
            blocks = parse_blocks(h)
            x = np.asarray(block_features(blocks), dtype=np.float64)
            keep = (x @ self._w >= 0.5).tolist() if len(blocks) else []
            for span in spans_from_blocks(blocks, keep):
                ids.append(doc)
                orders.append(span["order"])
                kinds.append(span["kind"])
                texts.append(span["text"])
                refs.append(span["media_ref"])
        return pd.DataFrame(
            {"doc_id": ids, "order": orders, "kind": kinds, "text": texts, "media_ref": refs}
        )
