"""Training-corpus curation operators: benchmark decontamination,
stratified sampling, per-group top terms.

These complement the dedup/quality family (stages/dedup.py,
functions/text.py) with the remaining standard steps of an LLM
training-data pipeline. Scale notes per operator:

- decontamination: the BENCHMARK side is small by definition (eval sets
  are thousands of documents, the train corpus is billions) -> its
  distinct n-grams are collected once and broadcast via ``ray.put``; the
  train side streams through a vectorized membership filter, no shuffle.
  At a benchmark too large to broadcast, reuse the bucketed hash-join
  shape of ``dedup._verify_pairs_join`` keyed on n-gram hash.
- stratified sample: deterministic k-per-stratum by md5(doc_id) rank —
  reproducible across engines, block layouts and cluster sizes (the same
  argument as ``queries.doc_hash_sample``); one grouped top-k whose
  shuffle moves at most k rows per (stratum, block).
- top terms: per-batch partial (group, word) counts -> bucketed merge
  (word keys are high-cardinality; see relational.bucketed_group_merge)
  -> grouped top-k.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray
import ray.data

from ..functions import text as T
from ..relational import bucketed_group_merge, grouped_topk, pool_max


def collect_benchmark_ngrams(bench: "ray.data.Dataset", n: int = 13) -> frozenset:
    """Distinct word-n-grams of the benchmark corpus (normalized text).

    Driver-side collect is CORRECT here: the benchmark is the small side
    by construction. Grams are kept as strings (exact membership — no
    hash-collision caveat); at extreme benchmark sizes switch to u64
    hashes + the bucketed-join path instead.
    """

    def grams(df: pd.DataFrame) -> pd.DataFrame:
        out = set()
        for t in df["text"].tolist():
            out |= T.word_ngrams(t, n)
        return pd.DataFrame({"ng": sorted(out)})

    acc: set = set()
    for b in bench.map_batches(grams, batch_format="pandas").iter_batches(
        batch_size=8192, batch_format="pandas"
    ):
        acc.update(b["ng"].tolist())
    return frozenset(acc)


def decontaminate(
    train: "ray.data.Dataset", bench_ngrams: frozenset, n: int = 13
) -> "ray.data.Dataset":
    """Drop every train document sharing at least one word-n-gram with the
    benchmark (the GPT-3-style 13-gram overlap rule). Streaming filter
    against the broadcast gram set — no shuffle, no driver pass over the
    train side."""
    ref = ray.put(bench_ngrams)

    class Filter:
        def __init__(self, ref, n):
            self.grams = ray.get(ref)
            self.n = n

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if not self.grams:
                return df
            keep = [
                T.word_ngrams(t, self.n).isdisjoint(self.grams)
                for t in df["text"].tolist()
            ]
            return df[np.asarray(keep, dtype=bool)]

    return train.map_batches(
        Filter,
        fn_constructor_kwargs={"ref": ref, "n": n},
        batch_format="pandas",
        concurrency=(1, pool_max()),
    )


def stratified_sample(
    docs: "ray.data.Dataset", stratum: str, k: int
) -> "ray.data.Dataset":
    """Deterministic k-per-stratum sample: within each stratum keep the k
    docs with the smallest md5(doc_id) hex digest (a uniform, seed-free,
    engine-portable rank — DuckDB's md5() computes the identical key)."""

    def add_rank_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_h"] = [
            hashlib.md5(str(d).encode("utf-8")).hexdigest() for d in df["doc_id"].tolist()
        ]
        return df

    out = grouped_topk(
        docs.map_batches(add_rank_key, batch_format="pandas"),
        group_keys=[stratum],
        sort_cols=["_h"],
        ascending=[True],
        k=k,
    )
    return out.drop_columns(["_h"])


def top_terms(
    docs: "ray.data.Dataset", group: str = "source", k: int = 5
) -> "ray.data.Dataset":
    """Top-k most frequent words per group (count desc, word asc ties).

    Partial counts per batch -> bucketed merge on the high-cardinality
    (group, word) key -> grouped top-k (k rows per (group, block))."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        groups, words = [], []
        for g, t in zip(df[group].tolist(), df["text"].tolist()):
            for w in T.normalize_text(t).split(" "):
                if w:
                    groups.append(g)
                    words.append(w)
        out = pd.DataFrame({group: groups, "word": words})
        agg = out.groupby([group, "word"], sort=False).size().rename("n").reset_index()
        return agg

    counts = bucketed_group_merge(
        docs.map_batches(partial, batch_format="pandas"),
        [group, "word"],
        lambda df: df.groupby([group, "word"], sort=False)
        .agg(n=("n", "sum"))
        .reset_index(),
    )
    return grouped_topk(
        counts,
        group_keys=[group],
        sort_cols=["n", "word"],
        ascending=[False, True],
        k=k,
    )
