"""Corpus keyword search: tf-idf-style scoring over the documents table.

Training-data tooling: "find the docs about X" over a billion-doc corpus
without an external search engine. ONE tokenization pass over the corpus
(stateless tasks — the query-term list is tiny and closed over) emits the
distributed (doc_id, term, tf) hit table, which is materialized once and
feeds both downstream consumers: the per-term document-frequency stats
(<= |terms| partial rows per block -> tiny driver frame) and the scoring
pass (per-block totals + local top-k, then a k-rows-per-block final
reduce — the knn_bruteforce shuffle shape; the corpus never moves).

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



def _term_frequencies(df: pd.DataFrame, terms: list) -> pd.DataFrame:
    """Vectorized (doc_id, term, tf) for the query terms only: one
    normalize+split per doc, pandas explode + isin — no Python loop over
    rows in the hot path."""
    ws = df["text"].map(T.normalize_text).str.split(" ")
    ex = pd.DataFrame({"doc_id": df["doc_id"], "term": ws}).explode("term")
    ex = ex[ex["term"].isin(set(terms))]
    if ex.empty:
        return pd.DataFrame({"doc_id": [], "term": [], "tf": []})
    return (
        ex.groupby(["doc_id", "term"], sort=False).size().rename("tf").reset_index()
    )


def keyword_search(
    docs: "ray.data.Dataset", terms: list, k: int = 10
) -> "ray.data.Dataset":
    """Top-k docs by integer tf-idf score (ties broken by doc_id asc).
    Output: (doc_id, score: int64).

    ONE corpus pass: each batch emits its (doc_id, term, tf) HIT rows
    (bounded by query-term hits, a sliver of the corpus), which are
    materialized once and reused for both the df statistics (pandas over
    the tiny hit table) and the scoring — a second full-text pass would
    double the job for no reason, since everything after tokenization
    only needs the hits."""
    tset = sorted(set(terms))
    n_total = docs.count()  # parquet metadata

    def hits_fn(df: pd.DataFrame) -> pd.DataFrame:
        return _term_frequencies(df, tset)

    # the hit table STAYS DISTRIBUTED (common query terms make it
    # O(corpus rows) — never collect it); tokenization runs once and the
    # materialized hits feed both consumers below. A doc's hit rows all
    # live in one block (one row per (doc, term) per input batch), so
    # per-block scoring sees complete documents.
    hits = docs.map_batches(hits_fn, batch_format="pandas").materialize()

    # df per term: <= |terms| partial rows per block -> tiny driver frame
    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("term", sort=False)["doc_id"].nunique().rename("df")
        return g.reset_index()

    parts = hits.map_batches(df_partial, batch_format="pandas").to_pandas()
    df_map = (
        parts.groupby("term")["df"].sum().to_dict() if len(parts) else {}
    )
    weights = {t: n_total // (int(df_map.get(t, 0)) + 1) + 1 for t in tset}

    def score_fn(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": [], "score": np.array([], dtype=np.int64)})
        df = df.assign(score=df["tf"].to_numpy() * df["term"].map(weights).to_numpy())
        out = (
            df.groupby("doc_id", sort=False)["score"].sum().astype("int64").reset_index()
        )
        return out.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="stable"
        ).head(k)

    local = hits.map_batches(score_fn, batch_format="pandas")
    return local.sort(["score", "doc_id"], descending=[True, False]).limit(k)
