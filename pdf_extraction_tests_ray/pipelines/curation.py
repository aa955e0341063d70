"""The end-to-end training-corpus curation pipeline: the composite a
100-TB data job actually runs, chaining the engine's curation operators
in the canonical order.

    hold out benchmark -> quality filter -> exact dedup (keep min doc_id)
      -> benchmark decontamination [-> sequence packing]

Every stage is a streaming ``map_batches`` filter over the corpus — the
only shuffle in the whole chain is exact_dedup's pre-aggregated hash
groupby (the keep decision), and the only driver state is the two small
broadcasts (duplicated-text map, benchmark gram set). Order matters and
is part of the contract: dedup keeps the min doc_id among QUALITY
survivors (a filtered-out doc can't be a keeper), and decontamination
runs last so a contaminated keeper doesn't resurrect its duplicates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ..functions import text as T
from ..stages import curation as C
from ..stages import dedup as D


def quality_filter(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Keep docs passing the C4-style trainability gate
    (functions.text.is_quality: enough words, sane punctuation density,
    plausible word lengths)."""

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        mask = [
            T.is_quality(*T.quality_features(t)[:3]) for t in df["text"].tolist()
        ]
        return df[np.asarray(mask, dtype=bool)]

    return docs.map_batches(keep, batch_format="pandas")


def curate_corpus(
    train: "ray.data.Dataset",
    bench: "ray.data.Dataset",
    ngram_n: int = 13,
) -> "ray.data.Dataset":
    """quality -> exact-dedup apply -> decontaminate, streaming."""
    q = quality_filter(train)
    dq = D.apply_exact_dedup(q)
    grams = C.collect_benchmark_ngrams(bench, n=ngram_n)
    return C.decontaminate(dq, grams, n=ngram_n)
