"""Ray stage for HTML DOM main-content extraction (boilerplate strip).

Wraps ``doclogic.htmlx`` (the pure-Python densitometric classifier) as a
stateless ``map_batches`` transform — per-document independence, no
shuffle, same shape as the PDF-span extraction stage. Includes the
deterministic HTML synthesizer used by tests/bench/driver: it wraps each
``documents.text`` row in a realistic page skeleton (nav/header/footer/
aside/related-links boilerplate around an <article> of 20-word
paragraphs under an "Overview <doc_id>" heading), chosen so the EXPECTED
extraction is a pure function of the word list — which is what lets the
driver check the whole DOM path against a plain SQL oracle.
"""

from __future__ import annotations

import html as _html

import pandas as pd

from ..doclogic.htmlx import extract_main_html

PARA_WORDS = 20  # words per synthesized content paragraph


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
    body = "".join(f"<p>{_html.escape(p)}</p>" for p in paras)
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


def extract_html_batch(df: pd.DataFrame) -> pd.DataFrame:
    """One row per kept content span: (doc_id, order, kind, text)."""
    ids, orders, kinds, texts = [], [], [], []
    for d, h in zip(df["doc_id"].tolist(), df["html"].tolist()):
        for span in extract_main_html(h):
            ids.append(d)
            orders.append(span["order"])
            kinds.append(span["kind"])
            texts.append(span["text"])
    return pd.DataFrame(
        {"doc_id": ids, "order": orders, "kind": kinds, "text": texts}
    )
