"""Text-analysis stages over a flat ``documents`` table
(doc_id:int64, text, lang, source, n_chars — TESTDATA.md).

All stages are ``map_batches`` with pandas bodies (string-heavy kernels);
the per-batch work is vectorized via list comprehensions over Python
strings, which for these metrics beats round-tripping through Arrow string
kernels that don't exist (regex token counts, lexicon hits).
"""

from __future__ import annotations

import pandas as pd

from ..functions import text as T


def token_count_batch(df: pd.DataFrame) -> pd.DataFrame:
    texts = df["text"].tolist()
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].values,
            "lang": df["lang"].values,
            "n_tokens_ws": [T.whitespace_token_count(t) for t in texts],
            "n_tokens_bpe": [T.bpe_ish_token_count(t) for t in texts],
        }
    )


def quality_batch(df: pd.DataFrame) -> pd.DataFrame:
    texts = df["text"].tolist()
    feats = [T.quality_features(t) for t in texts]
    out = pd.DataFrame(
        {
            "doc_id": df["doc_id"].values,
            "source": df["source"].values,
            "n_words": [f[0] for f in feats],
            "punct_ratio": [round(f[1], 6) for f in feats],
            "avg_word_len": [round(f[2], 6) for f in feats],
            "stopword_ratio": [round(f[3], 6) for f in feats],
        }
    )
    out["is_quality"] = [
        T.is_quality(f[0], f[1], f[2]) for f in feats
    ]
    return out


class LangId:
    """Actor-pool stage: lexicons live in actor state (warm once).

    Note on the synthetic testdata: the documents table's ``lang`` column
    is a synthetic partition dimension — its TEXT is language-less
    technical tokens for every label (verified by inspection), so
    ``predicted_lang`` correctly lands on 'en' regardless of ``lang``.
    The heuristic itself is exercised on real multilingual strings in
    tests/test_stages.py::test_langid."""

    def __init__(self):
        self.detect = T.detect_language

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].tolist()
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].values,
                "lang": df["lang"].values,
                "predicted_lang": [self.detect(t) for t in texts],
            }
        )


def fingerprint_batch(df: pd.DataFrame) -> pd.DataFrame:
    texts = df["text"].tolist()
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].values,
            "text_md5": [T.md5_fingerprint(t) for t in texts],
            "rolling_fp": [T.rolling_fingerprint(t) for t in texts],
        }
    )
