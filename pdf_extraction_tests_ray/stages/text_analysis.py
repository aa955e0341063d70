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


def repetition_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Per-doc repetition signals (Gopher-style); stateless map_batches —
    pure per-row compute, no shuffle, streams at any scale."""
    feats = [T.repetition_features(t) for t in df["text"].tolist()]
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].values,
            "n_words": [f[0] for f in feats],
            "dup_word_frac": [round(f[1], 6) for f in feats],
            "top_bigram_frac": [round(f[2], 6) for f in feats],
            "dup_sent_frac": [round(f[3], 6) for f in feats],
            "is_repetitive": [T.is_repetitive(f[2], f[3]) for f in feats],
        }
    )


def chunk_batch(df: pd.DataFrame, chunk_size: int, stride: int) -> pd.DataFrame:
    """Explode docs into stride-windowed word chunks (stateless
    map_batches — pure per-row compute, streams at any scale; output rows
    ~ n_words/stride per doc)."""
    ids, idxs, toks, txts = [], [], [], []
    for d, t in zip(df["doc_id"].tolist(), df["text"].tolist()):
        for ci, n, chunk in T.chunk_text(t, chunk_size, stride):
            ids.append(d)
            idxs.append(ci)
            toks.append(n)
            txts.append(chunk)
    return pd.DataFrame(
        {
            "doc_id": pd.Series(ids, dtype="int64"),
            "chunk_idx": pd.Series(idxs, dtype="int64"),
            "n_tokens": pd.Series(toks, dtype="int64"),
            "chunk_text": pd.Series(txts, dtype=object),
        }
    )


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


def corpus_stats(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Single-pass corpus profile (the Dolma-style 'analyze' job): ONE
    streaming execution reduces the corpus to per-batch partial moments —
    doc/token counts, char sums and sum-of-squares (exact Python ints, no
    overflow), min/max, and the distinct lang/source label sets (bounded:
    ISO codes / source registries are O(100) at any corpus scale). The
    O(#batches) tiny partial rows merge driver-side; the float columns
    (avg/std of chars) are derived from the INTEGER sums with the exact
    left-to-right double expression the SQL oracle uses, so the round-6
    value hash agrees."""
    import ray.data

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].tolist()
        chars = [int(c) for c in df["n_chars"].tolist()]
        return pd.DataFrame(
            {
                "n_docs": pd.Series([len(df)], dtype="int64"),
                "n_tokens": pd.Series(
                    [sum(T.whitespace_token_count(t) for t in texts)], dtype="int64"
                ),
                "sum_chars": pd.Series([sum(chars)], dtype="int64"),
                # python-int squares: exact at any magnitude
                "sumsq_chars": pd.Series([sum(c * c for c in chars)], dtype="int64"),
                "min_chars": pd.Series([min(chars)], dtype="int64"),
                "max_chars": pd.Series([max(chars)], dtype="int64"),
                # \x1f (unit separator) cannot appear in a label the way
                # a comma can ('web,news' must stay one source)
                "langs": ["\x1f".join(sorted(set(df["lang"].tolist())))],
                "sources": ["\x1f".join(sorted(set(df["source"].tolist())))],
            }
        )

    p = docs.map_batches(partial, batch_format="pandas").to_pandas()
    n = int(p["n_docs"].sum())
    sc = int(p["sum_chars"].sum())
    # python-int accumulation: the corpus-wide sum of squares can exceed
    # int64 even when every per-batch partial fits
    ssq = sum(int(x) for x in p["sumsq_chars"].tolist())
    langs: set = set()
    sources: set = set()
    for ls in p["langs"].tolist():
        langs.update(x for x in ls.split("\x1f") if x)
    for ss in p["sources"].tolist():
        sources.update(x for x in ss.split("\x1f") if x)
    import numpy as np

    avg_chars = round(float(sc) / n, 6)
    std_chars = round(float(np.sqrt((float(ssq) - float(sc) * sc / n) / n)), 6)
    out = pd.DataFrame(
        {
            "n_docs": pd.Series([n], dtype="int64"),
            "n_tokens": pd.Series([int(p["n_tokens"].sum())], dtype="int64"),
            "n_langs": pd.Series([len(langs)], dtype="int64"),
            "n_sources": pd.Series([len(sources)], dtype="int64"),
            "min_chars": pd.Series([int(p["min_chars"].min())], dtype="int64"),
            "max_chars": pd.Series([int(p["max_chars"].max())], dtype="int64"),
            "avg_chars": pd.Series([avg_chars], dtype="float64"),
            "std_chars": pd.Series([std_chars], dtype="float64"),
        }
    )
    return ray.data.from_pandas(out)


def pack_sequences(
    docs: "ray.data.Dataset",
    max_tokens: int = 2048,
    group_size: int = 256,
    num_buckets: int = 64,
):
    """Greedy sequence packing for LLM training batches: pack documents
    into sequences of at most ``max_tokens`` whitespace tokens.

    Packing is LOCAL by construction — docs are grouped by a fixed
    ``doc_id // group_size`` range key, each group packed in doc_id order —
    so the result is deterministic across block layouts and cluster sizes,
    unlike per-block packing. A doc longer than ``max_tokens`` gets its own
    (oversized) pack rather than being dropped or split — truncation policy
    belongs to the tokenizer stage.

    The shuffle is keyed on a COARSE ``pack_group % num_buckets`` bucket
    (one ``map_groups`` call per bucket, each packing its pack_groups with
    a local pandas groupby) — grouping on pack_group directly would pay
    Ray's per-distinct-key grouped-aggregate overhead at n_docs/group_size
    cardinality (CLAUDE.md performance note).

    Output: (pack_id, n_docs, total_tokens, doc_ids) one row per pack.
    """
    import ray.data  # noqa: F401  (type only)

    def key_and_count(df: pd.DataFrame) -> pd.DataFrame:
        group = df["doc_id"].astype("int64") // group_size
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": [T.whitespace_token_count(t) for t in df["text"].tolist()],
                "pack_group": group,
                "_bucket": group % num_buckets,
            }
        )

    def pack_one(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable")
        group = int(g["pack_group"].iloc[0])
        packs, cur_ids, cur_tok = [], [], 0
        for did, nt in zip(g["doc_id"].tolist(), g["n_tokens"].tolist()):
            if cur_ids and cur_tok + nt > max_tokens:
                packs.append((cur_ids, cur_tok))
                cur_ids, cur_tok = [], 0
            cur_ids.append(did)
            cur_tok += nt
        if cur_ids:
            packs.append((cur_ids, cur_tok))
        return pd.DataFrame(
            {
                "pack_id": [f"{group}-{i}" for i in range(len(packs))],
                "n_docs": [len(ids) for ids, _ in packs],
                "total_tokens": [tok for _, tok in packs],
                "doc_ids": [",".join(str(d) for d in ids) for ids, _ in packs],
            }
        )

    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [pack_one(sub) for _, sub in g.groupby("pack_group", sort=True)],
            ignore_index=True,
        )

    return (
        docs.map_batches(key_and_count, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(pack_bucket, batch_format="pandas")
    )
