"""Corpus keyword search: tf-idf-style scoring over the documents table.

Training-data tooling: "find the docs about X" over a billion-doc corpus
without an external search engine. Two cheap passes:

1. document frequency of the QUERY terms only (the term list is tiny and
   broadcast; each batch emits at most |terms| partial rows — never a
   full-vocabulary shuffle like top_terms);
2. score = sum over query terms of tf x weight(df), each batch keeping
   its local top-k, followed by a k-row final reduce (the
   knn_bruteforce shuffle shape: k rows per batch, never the corpus).

Weights are INTEGER idf surrogates, ``weight = N // (df + 1) + 1`` — the
repo's float-parity convention (see CLAUDE.md): rank order tracks
log-idf closely while keeping every score an exact BIGINT, so the SQL
oracle hash-matches regardless of summation order (a float ln() would
differ across libm implementations at the last ulp).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from ..functions import text as T
from ..relational import pool_max


def term_doc_frequency(docs: "ray.data.Dataset", terms: list) -> dict:
    """df per query term: per-batch partial counts (<= |terms| rows per
    batch) merged driver-side — the collected frame is |terms| rows."""
    tset = sorted(set(terms))
    ref = ray.put(tset)

    class Partial:
        def __init__(self, ref):
            self.terms = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            counts = dict.fromkeys(self.terms, 0)
            for t in df["text"].tolist():
                ws = set(T.normalize_text(t).split(" "))
                for q in self.terms:
                    if q in ws:
                        counts[q] += 1
            return pd.DataFrame({"term": list(counts), "df": list(counts.values())})

    parts = docs.map_batches(
        Partial,
        fn_constructor_kwargs={"ref": ref},
        batch_format="pandas",
        concurrency=(1, pool_max()),
    ).to_pandas()  # |terms| x n_batches rows — tiny by construction
    return parts.groupby("term")["df"].sum().to_dict()


def keyword_search(
    docs: "ray.data.Dataset", terms: list, k: int = 10
) -> "ray.data.Dataset":
    """Top-k docs by integer tf-idf score (ties broken by doc_id asc).
    Output: (doc_id, score: int64)."""
    n_total = docs.count()  # parquet metadata
    df_map = term_doc_frequency(docs, terms)
    weights = {t: n_total // (df_map.get(t, 0) + 1) + 1 for t in set(terms)}
    ref = ray.put(weights)

    class Score:
        def __init__(self, ref, k):
            self.w = ray.get(ref)
            self.k = k

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ids, scores = [], []
            for d, t in zip(df["doc_id"].tolist(), df["text"].tolist()):
                s = 0
                ws = T.normalize_text(t).split(" ")
                for q, w in self.w.items():
                    tf = ws.count(q)
                    if tf:
                        s += tf * w
                if s:
                    ids.append(d)
                    scores.append(s)
            out = pd.DataFrame({"doc_id": ids, "score": np.array(scores, dtype=np.int64)})
            return out.sort_values(
                ["score", "doc_id"], ascending=[False, True], kind="stable"
            ).head(self.k)

    local = docs.map_batches(
        Score,
        fn_constructor_kwargs={"ref": ref, "k": k},
        batch_format="pandas",
        concurrency=(1, pool_max()),
    )
    return local.sort(["score", "doc_id"], descending=[True, False]).limit(k)
