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


def contamination_score(
    train: "ray.data.Dataset", bench_ngrams: frozenset, n: int = 13
) -> "ray.data.Dataset":
    """Graded contamination REPORT: for every train document, how many of
    its distinct word-n-grams hit the benchmark set — the audit form of
    :func:`decontaminate` (which drops on >=1 hit). Output (doc_id,
    n_grams, n_hits), pure integers so the SQL oracle is hash-exact.
    Same streaming shape: grams broadcast once, no shuffle."""
    ref = ray.put(bench_ngrams)

    class Score:
        def __init__(self, ref, n):
            self.grams = ray.get(ref)
            self.n = n

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ids, totals, hits = [], [], []
            for d, t in zip(df["doc_id"].tolist(), df["text"].tolist()):
                g = T.word_ngrams(t, self.n)
                ids.append(d)
                totals.append(len(g))
                hits.append(len(g & self.grams))
            return pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "n_grams": np.asarray(totals, dtype=np.int64),
                    "n_hits": np.asarray(hits, dtype=np.int64),
                }
            )

    return train.map_batches(
        Score,
        fn_constructor_kwargs={"ref": ref, "n": n},
        batch_format="pandas",
        concurrency=(1, pool_max()),
    )


def benchmark_ngram_bloom(bench: "ray.data.Dataset", n: int = 13, bits_per_item: int = 64):
    """Bloom filter of the benchmark's distinct word-n-grams — the scale
    path of :func:`collect_benchmark_ngrams`: the broadcast side shrinks
    from a frozenset of ~100-byte gram strings to 8 bytes/gram of bits
    (~12x), and train-side membership becomes vectorized integer probes
    instead of Python set lookups. One-sided error: a benchmark gram is
    NEVER missed (no contamination can leak); a false positive (~1e-13 at
    64 bits/item) can only over-drop a clean train doc.

    Returns (bits, m, k) for :func:`decontaminate_bloom`."""
    from ..functions import sketches as SK

    grams = collect_benchmark_ngrams(bench, n)
    return SK.bloom_build(sorted(grams), bits_per_item)


def decontaminate_bloom(
    train: "ray.data.Dataset", bloom, n: int = 13
) -> "ray.data.Dataset":
    """GPT-3-style 13-gram decontamination against a broadcast Bloom
    filter (see :func:`benchmark_ngram_bloom`). Same streaming no-shuffle
    shape as :func:`decontaminate`; drops a superset (in the fp sense) of
    the exact filter's drops."""
    from ..functions import sketches as SK

    bits, m, k = bloom
    ref = ray.put(bits)

    class Filter:
        def __init__(self, ref, m, k, n):
            self.bits = ray.get(ref)
            self.m, self.k, self.n = m, k, n

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            keep = np.ones(len(df), dtype=bool)
            for i, t in enumerate(df["text"].tolist()):
                grams = sorted(T.word_ngrams(t, self.n))
                if grams and SK.bloom_contains(self.bits, self.m, self.k, grams).any():
                    keep[i] = False
            return df[keep]

    return train.map_batches(
        Filter,
        fn_constructor_kwargs={"ref": ref, "m": m, "k": k, "n": n},
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


def top_terms_approx(
    docs: "ray.data.Dataset",
    group: str = "source",
    k: int = 5,
    capacity: int = 1024,
) -> "ray.data.Dataset":
    """Top-k terms per group via MERGEABLE Misra-Gries summaries
    (functions.sketches.mg_add/mg_trim) — the heavy-hitters scale path
    when even the (group, word) distinct-count shuffle of
    :func:`top_terms` is too large: each batch ships at most ``capacity``
    counter rows per group (vocabulary size never leaves the task), and
    the merge is a LOW-cardinality ``groupby(group)`` over bounded rows
    (<= capacity x blocks per group).

    Guarantee: per-key undercount <= n_group/(capacity+1) over any merge
    tree; with capacity >= the group's distinct-word count no trim ever
    fires and the output is EXACTLY :func:`top_terms` — which is how the
    driver oracle checks this path (same SQL as the exact operator at the
    default capacity). Ties: count desc, word asc, like the exact twin.
    """
    from ..functions import sketches as SK

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out_g, out_w, out_n = [], [], []
        for g, sub in df.groupby(group, sort=False):
            counts: dict = {}
            for t in sub["text"].tolist():
                for w in T.normalize_text(t).split(" "):
                    if w:
                        counts[w] = counts.get(w, 0) + 1
            counts = SK.mg_trim(counts, capacity)
            out_g.extend([g] * len(counts))
            out_w.extend(counts.keys())
            out_n.extend(counts.values())
        return pd.DataFrame({group: out_g, "word": out_w, "n": out_n})

    def merge(gdf: pd.DataFrame) -> pd.DataFrame:
        summary: dict = {}
        for w, c in zip(gdf["word"].tolist(), gdf["n"].tolist()):
            summary[w] = summary.get(w, 0) + int(c)
        summary = SK.mg_trim(summary, capacity)
        top = sorted(summary.items(), key=lambda wc: (-wc[1], wc[0]))[:k]
        g = gdf[group].iloc[0]
        return pd.DataFrame(
            {group: [g] * len(top), "word": [w for w, _ in top], "n": [c for _, c in top]}
        )

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby(group)
        .map_groups(merge, batch_format="pandas")
    )


def apportion_quotas(weights: dict, total: int) -> dict:
    """Largest-remainder apportionment of ``total`` slots over ``weights``
    — deterministic (remainder ties broken by key), sums exactly to
    ``total``. Shared by the Ray operator and the SQL oracle so quota
    math can never diverge between them."""
    import math

    wsum = float(sum(weights.values()))
    raw = {s: total * w / wsum for s, w in weights.items()}
    base = {s: int(math.floor(r)) for s, r in raw.items()}
    rem = total - sum(base.values())
    order = sorted(weights, key=lambda s: (-(raw[s] - base[s]), s))
    for s in order[:rem]:
        base[s] += 1
    return base


def weighted_mix(
    docs: "ray.data.Dataset", weights: dict, total: int, source_col: str = "source"
) -> "ray.data.Dataset":
    """Deterministic source-weighted subsample — the data-MIXING step of a
    training pipeline: hit a target domain distribution (``weights``) at a
    target budget (``total`` docs) by taking each source's quota of docs
    with the smallest md5(doc_id) rank (the same engine-portable rank as
    :func:`stratified_sample`; DuckDB computes the identical key).

    Scale shape: quotas are computed driver-side from the weights alone
    (no data pass) and closed over as a tiny dict; each batch keeps at
    most quota rows per source (combiner), and the final per-source trim
    is a low-cardinality ``groupby(source)`` — the shuffle moves at most
    quota rows per (source, block). Sources absent from ``weights`` get
    quota 0 and are dropped at the batch filter, before any shuffle."""
    quotas = apportion_quotas(weights, total)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[source_col].isin(quotas)].copy()
        if df.empty:
            return df.assign(_h=pd.Series(dtype=str))
        df["_h"] = [
            hashlib.md5(str(d).encode("utf-8")).hexdigest() for d in df["doc_id"].tolist()
        ]
        df = df.sort_values("_h", kind="stable")
        keep = df.groupby(source_col, sort=False).cumcount() < df[source_col].map(quotas)
        return df[keep.to_numpy()]

    def trim(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("_h", kind="stable")
        q = quotas[g[source_col].iloc[0]]
        return g.head(q).drop(columns=["_h"])

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby(source_col)
        .map_groups(trim, batch_format="pandas")
    )


def weighted_mix_tokens(
    docs: "ray.data.Dataset",
    weights: dict,
    total_tokens: int,
    source_col: str = "source",
) -> "ray.data.Dataset":
    """Token-budget data mixing — the realistic form of
    :func:`weighted_mix`: training recipes allocate TOKENS per domain,
    not document counts. Each source gets a token quota
    (largest-remainder over ``weights``); within a source, docs are
    taken in md5(doc_id) rank order while the RUNNING token total stays
    below the quota (the first doc crossing the line is excluded — the
    half-open prefix rule, exactly SQL's ``SUM() OVER (...) <= quota``
    on the PRECEDING cumulative sum).

    Scale shape: tokens are counted per batch (vectorized whitespace
    count), each batch keeps only rows that could possibly make the cut
    — impossible to prune without the global rank, so the combiner keeps
    everything and the per-source trim happens in the low-cardinality
    ``groupby(source)`` (same partitioning assumption as weighted_mix:
    one source's candidate rows fit in a group; at extreme scale
    pre-filter by an md5-rank band first)."""
    quotas = apportion_quotas(weights, total_tokens)

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[source_col].isin(quotas)].copy()
        if df.empty:
            return df.assign(_h=pd.Series(dtype=str), n_tokens=pd.Series(dtype="int64"))
        df["_h"] = [
            hashlib.md5(str(d).encode("utf-8")).hexdigest() for d in df["doc_id"].tolist()
        ]
        # T.whitespace_token_count matches the DuckDB regexp_split_to_array
        # length exactly (empty-text edge included)
        df["n_tokens"] = [T.whitespace_token_count(t) for t in df["text"].tolist()]
        return df

    def trim(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("_h", kind="stable")
        q = quotas[g[source_col].iloc[0]]
        prior = g["n_tokens"].cumsum() - g["n_tokens"]  # tokens BEFORE each doc
        keep = (prior + g["n_tokens"]) <= q
        return g[keep.to_numpy()].drop(columns=["_h", "text"])

    return (
        docs.map_batches(prep, batch_format="pandas")
        .groupby(source_col)
        .map_groups(trim, batch_format="pandas")
    )


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


def bigram_pmi(
    docs: "ray.data.Dataset", min_count: int = 5, k: int = 20
) -> "ray.data.Dataset":
    """Corpus-level collocation mining: top-``k`` adjacent-word bigrams by
    pointwise mutual information (the phrase-detection primitive of
    tokenizer/vocabulary construction, Mikolov et al. 2013's phrase-score
    shape) with ``PMI = ln((c_ab/B) / ((c_a/U) * (c_b/U)))``.

    Shuffle shape: ONE map_batches pass emits tagged partial-count rows
    (kind 'u' unigram / 'b' bigram / 'tu','tb' per-batch totals — repeated
    terms never leave the task) -> ONE bucketed merge on the
    high-cardinality (kind, term) key, which also applies the
    ``min_count`` floor to bigrams (each term's global count lives in one
    bucket, so the floor is exact). The merged survivors are
    vocabulary-bounded — the same small-side contract as
    :func:`build_vocab` — so totals, the PMI arithmetic and the final
    top-k finish driver-side on O(vocab) rows.

    Float parity: PMI is computed as ``ln((n_ab * U * U) / (B * n_a *
    n_b))`` with the numerator/denominator each accumulated
    left-to-right in double — the identical IEEE expression the SQL
    oracle uses — then rounded to 6 places, which is also the
    (pmi desc, bigram) tie-break key."""
    from collections import Counter

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        uc: Counter = Counter()
        bc: Counter = Counter()
        total_u = 0
        total_b = 0
        for t in df["text"].tolist():
            ws = [w for w in T.normalize_text(t).split(" ") if w]
            total_u += len(ws)
            uc.update(ws)
            if len(ws) >= 2:
                total_b += len(ws) - 1
                bc.update(f"{a} {b}" for a, b in zip(ws, ws[1:]))
        kinds = ["u"] * len(uc) + ["b"] * len(bc) + ["tu", "tb"]
        terms = list(uc) + list(bc) + ["", ""]
        ns = list(uc.values()) + list(bc.values()) + [total_u, total_b]
        return pd.DataFrame(
            {"kind": kinds, "term": terms, "n": pd.Series(ns, dtype="int64")}
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        agg = (
            df.groupby(["kind", "term"], sort=False)
            .agg(n=("n", "sum"))
            .reset_index()
        )
        return agg[(agg["kind"] != "b") | (agg["n"] >= min_count)]

    pdf = bucketed_group_merge(
        docs.map_batches(partial, batch_format="pandas"), ["kind", "term"], merge
    ).to_pandas()

    big_u = float(int(pdf.loc[pdf["kind"] == "tu", "n"].sum()))
    big_b = float(int(pdf.loc[pdf["kind"] == "tb", "n"].sum()))
    u = dict(
        zip(pdf.loc[pdf["kind"] == "u", "term"], pdf.loc[pdf["kind"] == "u", "n"])
    )
    b = pdf.loc[pdf["kind"] == "b", ["term", "n"]]
    if b.empty or big_b == 0:
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "bigram": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype="int64"),
                    "pmi": pd.Series([], dtype="float64"),
                }
            )
        )
    pmis = []
    for term, n_ab in zip(b["term"].tolist(), b["n"].tolist()):
        wa, wb = term.split(" ")
        pmis.append(
            round(
                float(
                    np.log(
                        (float(n_ab) * big_u * big_u)
                        / (big_b * int(u[wa]) * int(u[wb]))
                    )
                ),
                6,
            )
        )
    out = pd.DataFrame(
        {"bigram": b["term"].to_numpy(), "n": b["n"].astype("int64").to_numpy(), "pmi": pmis}
    )
    out = (
        out.sort_values(["pmi", "bigram"], ascending=[False, True], kind="stable")
        .head(k)
        .reset_index(drop=True)
    )
    return ray.data.from_pandas(out)


def build_vocab(docs: "ray.data.Dataset", size: int = 1000) -> pd.DataFrame:
    """Corpus-wide top-``size`` vocabulary with STABLE integer ids —
    the tokenizer-building primitive. Rank by (count desc, word asc),
    ids 1..size; 0 is reserved for OOV/UNK.

    Shuffle shape: per-batch partial word counts (combiner — repeated
    words never leave the task) -> bucketed merge on the high-cardinality
    word key -> constant-group top-k (``size`` rows per block cross the
    final shuffle). The returned frame is ``size`` rows — small by
    definition (a vocabulary is O(100k) at any corpus scale), so it is a
    legitimate driver-side artifact / broadcast side."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        words: list = []
        for t in df["text"].tolist():
            words.extend(w for w in T.normalize_text(t).split(" ") if w)
        if not words:
            return pd.DataFrame(
                {"word": pd.Series([], dtype=object), "n": pd.Series([], dtype="int64")}
            )
        s = pd.Series(words).value_counts()
        return pd.DataFrame({"word": s.index.to_numpy(), "n": s.to_numpy()})

    counts = bucketed_group_merge(
        docs.map_batches(partial, batch_format="pandas"),
        ["word"],
        lambda df: df.groupby("word", sort=False).agg(n=("n", "sum")).reset_index(),
    )
    topk = grouped_topk(
        counts.map_batches(
            lambda df: df.assign(_g=np.int8(0)), batch_format="pandas"
        ),
        group_keys=["_g"],
        sort_cols=["n", "word"],
        ascending=[False, True],
        k=size,
    )
    vdf = (
        topk.to_pandas()
        .sort_values(["n", "word"], ascending=[False, True], kind="stable")
        .reset_index(drop=True)
    )
    vdf["token_id"] = np.arange(1, len(vdf) + 1, dtype="int64")
    return vdf[["word", "n", "token_id"]]


_SCORER_DIM = 6


def _scorer_features(text: str) -> list:
    """Integer feature vector [bias, n_tokens, n_punct, n_nonspace,
    n_stopwords, n_chars] — all exact counts, so moment sums are
    order-independent python ints and training is EXACTLY invariant to
    block layout / cluster size (the same determinism argument as the
    repo's other integer-moment operators)."""
    t = text.strip()
    return [
        1,
        T.whitespace_token_count(text),
        T.punct_char_count(t),
        T.nonspace_char_count(t),
        T.stopword_count(text),
        len(t),
    ]


def fit_ridge_scorer(
    docs: "ray.data.Dataset", label_col: str = "label", lam: float = 1.0
) -> "np.ndarray":
    """Train a linear quality scorer (the CCNet/FineWeb-Edu curation
    primitive: a cheap learned model ranking documents for filtering)
    as closed-form ridge regression over INTEGER feature moments.

    The corpus pass is one map_batches combiner emitting each batch's
    exact-integer X^T X (d*d) and X^T y (d) partials; the driver sums
    the python-int partials (no float order-dependence, no overflow) and
    solves the d*d system once. d = {bias, token/punct/nonspace/stopword/
    char counts} = 6 — driver state is 36 ints regardless of corpus
    size."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        xtx = [[0] * _SCORER_DIM for _ in range(_SCORER_DIM)]
        xty = [0] * _SCORER_DIM
        for t, y in zip(df["text"].tolist(), df[label_col].tolist()):
            x = _scorer_features(t)
            yi = int(y)
            for i in range(_SCORER_DIM):
                xi = x[i]
                row = xtx[i]
                for j in range(i, _SCORER_DIM):
                    row[j] += xi * x[j]
                xty[i] += xi * yi
        flat = {f"m{i}_{j}": [xtx[i][j]] for i in range(_SCORER_DIM) for j in range(i, _SCORER_DIM)}
        flat.update({f"v{i}": [xty[i]] for i in range(_SCORER_DIM)})
        return pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in flat.items()})

    p = docs.map_batches(partial, batch_format="pandas").to_pandas()
    xtx = np.zeros((_SCORER_DIM, _SCORER_DIM))
    xty = np.zeros(_SCORER_DIM)
    for i in range(_SCORER_DIM):
        for j in range(i, _SCORER_DIM):
            s = sum(int(x) for x in p[f"m{i}_{j}"].tolist())  # exact
            xtx[i][j] = xtx[j][i] = float(s)
        xty[i] = float(sum(int(x) for x in p[f"v{i}"].tolist()))
    reg = lam * np.eye(_SCORER_DIM)
    reg[0, 0] = 0.0  # never shrink the bias
    return np.linalg.solve(xtx + reg, xty)


def score_docs(docs: "ray.data.Dataset", weights: "np.ndarray") -> "ray.data.Dataset":
    """Apply a fitted linear scorer, streaming: weights broadcast once;
    output (doc_id, score) with score = w . x rounded to 6 places
    (deterministic: exact integer features, fixed-order dot)."""
    ref = ray.put([float(w) for w in weights])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(ref)
        scores = []
        for t in df["text"].tolist():
            x = _scorer_features(t)
            acc = 0.0
            for wi, xi in zip(w, x):
                acc += wi * xi
            scores.append(round(acc, 6))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "score": pd.Series(scores, dtype="float64"),
            }
        )

    return docs.map_batches(score, batch_format="pandas")


def dsir_importance(
    docs: "ray.data.Dataset",
    target_lang: str = "en",
    n_buckets: int = 1024,
    add_k: float = 0.5,
) -> "ray.data.Dataset":
    """DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169):
    score every raw document by how much more likely its hashed-unigram
    features are under the TARGET distribution (here: ``lang ==
    target_lang`` docs, the in-domain proxy) than under the RAW corpus
    distribution — the data-selection signal for LM pretraining mixes.

    Scale shape: pass 1 reduces each batch to <= ``n_buckets`` hashed
    feature-count rows per side (the bucket dictionary is O(n_buckets)
    at any corpus size — the DSIR trick that makes the densities
    broadcastable where a vocabulary is not), merged by one bounded
    bucket shuffle and collected driver-side; pass 2 streams the corpus
    once, summing per-token add-k log-likelihood ratios from the
    broadcast tables in document order. Features hash with md5
    (``hash_u64_md5 % n_buckets``) so a SQL oracle rebuilds the same
    buckets; log terms hit the same libm on both engines (margins pinned
    in tests). Output: (doc_id, n_tokens, log_importance round 6)."""
    import math

    from ..functions.text import hash_u64_md5

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows: dict = {}
        wb: dict = {}  # word -> bucket memo (md5 once per distinct word)
        for lang, t in zip(df["lang"].tolist(), df["text"].tolist()):
            is_t = lang == target_lang
            for w in T.normalize_text(t).split(" "):
                if not w:
                    continue
                b = wb.get(w)
                if b is None:
                    b = wb[w] = hash_u64_md5(w) % n_buckets
                tn, rn = rows.get(b, (0, 0))
                rows[b] = (tn + (1 if is_t else 0), rn + 1)
        return pd.DataFrame(
            {
                "bucket": pd.Series(list(rows), dtype="int64"),
                "tgt_n": pd.Series([v[0] for v in rows.values()], dtype="int64"),
                "raw_n": pd.Series([v[1] for v in rows.values()], dtype="int64"),
            }
        )

    counts = bucketed_group_merge(
        docs.map_batches(partial, batch_format="pandas"),
        ["bucket"],
        lambda df: df.groupby("bucket", sort=False)
        .agg(tgt_n=("tgt_n", "sum"), raw_n=("raw_n", "sum"))
        .reset_index(),
    ).to_pandas()
    tgt = dict(zip(counts["bucket"].tolist(), (int(x) for x in counts["tgt_n"])))
    raw = dict(zip(counts["bucket"].tolist(), (int(x) for x in counts["raw_n"])))
    t_total, r_total = sum(tgt.values()), sum(raw.values())
    t_denom = float(t_total) + add_k * n_buckets
    r_denom = float(r_total) + add_k * n_buckets
    ref = ray.put((tgt, raw))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        tgt_c, raw_c = ray.get(ref)
        wb: dict = {}
        ids, ns, lws = [], [], []
        for did, t in zip(df["doc_id"].tolist(), df["text"].tolist()):
            ws = [w for w in T.normalize_text(t).split(" ") if w]
            lw = 0.0
            for w in ws:
                b = wb.get(w)
                if b is None:
                    b = wb[w] = hash_u64_md5(w) % n_buckets
                lw += math.log((tgt_c.get(b, 0) + add_k) / t_denom)
                lw -= math.log((raw_c.get(b, 0) + add_k) / r_denom)
            ids.append(did)
            ns.append(len(ws))
            lws.append(round(lw, 6))
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_tokens": pd.Series(ns, dtype="int64"),
                "log_importance": pd.Series(lws, dtype="float64"),
            }
        )

    return docs.map_batches(score, batch_format="pandas")


def word_count_dict(docs: "ray.data.Dataset") -> pd.DataFrame:
    """Corpus-wide ``(word, n)`` count dictionary via per-batch combiner
    counts + one bucketed merge — the vocabulary-bounded reduction that
    BPE training (and any tokenizer learner) runs on. Same small-side
    contract as :func:`build_vocab`: a word dictionary is O(vocab) at any
    corpus scale, so collecting it driver-side is legitimate."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for t in df["text"].tolist():
            c.update(w for w in T.normalize_text(t).split(" ") if w)
        return pd.DataFrame(
            {"word": list(c), "n": pd.Series(list(c.values()), dtype="int64")}
        )

    return (
        bucketed_group_merge(
            docs.map_batches(partial, batch_format="pandas"),
            ["word"],
            lambda df: df.groupby("word", sort=False).agg(n=("n", "sum")).reset_index(),
        )
        .to_pandas()
        .sort_values("word", kind="stable")
        .reset_index(drop=True)
    )


def lm_perplexity(docs: "ray.data.Dataset", add_k: float = 0.5) -> "ray.data.Dataset":
    """CCNet-style language-model quality signal: per-document perplexity
    under an add-k-smoothed unigram LM trained on the corpus itself
    (Wenzek et al. 2020 rank web text by LM perplexity; the unigram LM is
    the engine-shaped stand-in for KenLM).

    Two passes, both bounded: pass 1 is the distributed word-count
    reduction (:func:`word_count_dict`, vocabulary-bounded driver
    artifact, broadcast once); pass 2 streams the corpus computing each
    doc's cross-entropy H = -(1/n) * sum log2((c_w + k) / (U + k(V+1)))
    with unseen words at c_w = 0, ppl = 2^H. Deterministic and
    layout-invariant: the per-doc loop always runs in document word
    order over the same broadcast integer counts."""
    import math

    wc = word_count_dict(docs)
    total = int(wc["n"].sum())
    vocab_n = len(wc)
    ref = ray.put(dict(zip(wc["word"].tolist(), (int(x) for x in wc["n"].tolist()))))

    denom = float(total) + add_k * (vocab_n + 1)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        counts = ray.get(ref)
        ids, ns, ppls = [], [], []
        for did, t in zip(df["doc_id"].tolist(), df["text"].tolist()):
            ws = [w for w in T.normalize_text(t).split(" ") if w]
            if not ws:
                ids.append(did)
                ns.append(0)
                ppls.append(float("nan"))
                continue
            h = 0.0
            for w in ws:
                h -= math.log2((counts.get(w, 0) + add_k) / denom)
            ids.append(did)
            ns.append(len(ws))
            ppls.append(round(2.0 ** (h / len(ws)), 6))
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_tokens": pd.Series(ns, dtype="int64"),
                "ppl": pd.Series(ppls, dtype="float64"),
            }
        )

    return docs.map_batches(score, batch_format="pandas")


_EOW = "</w>"  # Sennrich et al. 2016 end-of-word marker


def train_bpe(docs: "ray.data.Dataset", num_merges: int = 100) -> list:
    """Learn a BPE merge table (Sennrich et al. 2016) the way production
    tokenizer trainers do at corpus scale: the CORPUS pass is the
    distributed word-count dictionary (:func:`word_count_dict` — one
    combiner pass + one bucketed merge); the merge-learning loop then
    runs driver-side over that O(vocab) dictionary, never touching the
    corpus again. Deterministic: pair selection ties break (count desc,
    pair lexicographic asc).

    Returns the ordered merge list ``[(left, right), ...]``. Words are
    char sequences with a trailing ``</w>`` symbol."""
    from collections import Counter, defaultdict

    wc = word_count_dict(docs)
    # word table by id; incremental pair counts + pair -> word-id index so
    # each merge touches only the words that CONTAIN the merged pair
    # (full recounts would cost O(num_merges * vocab * word_len))
    syms = [tuple(list(w) + [_EOW]) for w in wc["word"].tolist()]
    cnts = [int(n) for n in wc["n"].tolist()]
    pair_counts: Counter = Counter()
    pair_words: dict = defaultdict(set)
    for i, (sym, n) in enumerate(zip(syms, cnts)):
        for p in zip(sym, sym[1:]):
            pair_counts[p] += n
            pair_words[p].add(i)

    def merge_word(sym: tuple, a: str, b: str, merged: str) -> tuple:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(merged)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        return tuple(out)

    merges: list = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        for i in list(pair_words[best]):
            old, n = syms[i], cnts[i]
            new = merge_word(old, best[0], best[1], merged)
            for p in zip(old, old[1:]):
                pair_counts[p] -= n
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                    pair_words.pop(p, None)
                else:
                    pw = pair_words.get(p)
                    if pw is not None:
                        pw.discard(i)
            for p in zip(new, new[1:]):
                pair_counts[p] += n
                pair_words[p].add(i)
            syms[i] = new
    return merges


def _bpe_word(word: str, ranks: dict, memo: dict) -> list:
    """Encode one word with the learned merge ranks (lowest rank first),
    memoized per worker — the warm state that justifies the actor pool."""
    got = memo.get(word)
    if got is not None:
        return got
    sym = list(word) + [_EOW]
    while len(sym) >= 2:
        ranked = [(ranks[p], p) for p in zip(sym, sym[1:]) if p in ranks]
        if not ranked:
            break
        _, (a, b) = min(ranked)
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    memo[word] = sym
    return sym


def bpe_encode(
    docs: "ray.data.Dataset", merges: list, max_tokens_out: int = 30
) -> "ray.data.Dataset":
    """Apply a learned BPE merge table, streaming: the merge table is
    broadcast once via ``ray.put``; each actor holds a word->tokens memo
    (genuinely warm state — web text is Zipfian, so the memo hit rate
    approaches 1). Output per doc: (doc_id, n_bpe, toks_str) with
    toks_str the ' '-joined token sequence truncated to
    ``max_tokens_out`` (bounded output column; full sequences belong in
    a sink, not a result table)."""
    ref = ray.put({tuple(m): i for i, m in enumerate(merges)})

    class BpeEncode:
        def __init__(self, r):
            self.ranks = ray.get(r)
            self.memo: dict = {}

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            n_bpe, toks_strs = [], []
            for t in df["text"].tolist():
                toks: list = []
                for w in T.normalize_text(t).split(" "):
                    if w:
                        toks.extend(_bpe_word(w, self.ranks, self.memo))
                n_bpe.append(len(toks))
                toks_strs.append(" ".join(toks[:max_tokens_out]))
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"].to_numpy(),
                    "n_bpe": pd.Series(n_bpe, dtype="int64"),
                    "toks_str": pd.Series(toks_strs, dtype=object),
                }
            )

    return docs.map_batches(
        BpeEncode,
        fn_constructor_kwargs={"r": ref},
        batch_format="pandas",
        concurrency=(1, pool_max()),
    )


_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Gopher-style document quality rules (Rae et al. 2021, Table A1 —
    the filter family FineWeb/RefinedWeb/MassiveText all derive from),
    one streaming pass, no shuffle. Per doc:

    - ok_word_count:    50 <= n_words <= 100000
    - ok_mean_word_len: mean word length in [3, 10] — compared in INTEGER
      arithmetic (3*n <= total_chars <= 10*n) so the SQL oracle
      hash-matches with no float division on either side
    - ok_hash_ratio:    words containing '#' <= 10% (10*n_hash <= n)
    - ok_ellipsis:      lines ending in '...'/'…' <= 30% (10*e <= 3*L)
    - ok_bullet:        lines starting with a bullet <= 90% (10*b <= 9*L)
    - ok_alpha:         >= 80% of words contain a letter (5*a >= 4*n)
    - ok_stopwords:     >= 2 of the 8 Gopher stop words appear as words
    - keep:             AND of all

    Words = split of trimmed text on whitespace runs (empty text counts 1
    empty word — the DuckDB regexp_split_to_array convention the repo's
    token counts already share); lines = split on newline."""
    import re

    ws_re = re.compile(r"\s+")
    alpha_re = re.compile(r"[a-zA-Z]")
    # line-rule regexes shared semantically with the SQL oracle (DuckDB
    # ltrim/rtrim strip spaces only, Python str.strip strips all
    # whitespace — regex on both sides removes the mismatch)
    ell_re = re.compile(r"(\.\.\.|…)\s*$")
    bul_re = re.compile(r"^\s*[-*•] ")

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        out = {
            "doc_id": df["doc_id"].to_numpy(),
            "n_words": [], "ok_word_count": [], "ok_mean_word_len": [],
            "ok_hash_ratio": [], "ok_ellipsis": [], "ok_bullet": [],
            "ok_alpha": [], "ok_stopwords": [], "keep": [],
        }
        for t in df["text"].tolist():
            words = ws_re.split(t.strip())
            n = len(words)
            total_chars = sum(len(w) for w in words)
            n_hash = sum(1 for w in words if "#" in w)
            n_alpha = sum(1 for w in words if alpha_re.search(w))
            wl = set(w.lower() for w in words)
            n_stops = sum(1 for s in _GOPHER_STOPS if s in wl)
            lines = t.split("\n")
            nl = len(lines)
            n_ell = sum(1 for l in lines if ell_re.search(l))
            n_bul = sum(1 for l in lines if bul_re.match(l))
            f_wc = 50 <= n <= 100000
            f_mwl = 3 * n <= total_chars <= 10 * n
            f_hash = 10 * n_hash <= n
            f_ell = 10 * n_ell <= 3 * nl
            f_bul = 10 * n_bul <= 9 * nl
            f_alpha = 5 * n_alpha >= 4 * n
            f_stop = n_stops >= 2
            out["n_words"].append(n)
            out["ok_word_count"].append(f_wc)
            out["ok_mean_word_len"].append(f_mwl)
            out["ok_hash_ratio"].append(f_hash)
            out["ok_ellipsis"].append(f_ell)
            out["ok_bullet"].append(f_bul)
            out["ok_alpha"].append(f_alpha)
            out["ok_stopwords"].append(f_stop)
            out["keep"].append(
                f_wc and f_mwl and f_hash and f_ell and f_bul and f_alpha and f_stop
            )
        res = pd.DataFrame(out)
        res["n_words"] = res["n_words"].astype("int64")
        return res

    return docs.map_batches(flags, batch_format="pandas")


def bpe_roundtrip(docs: "ray.data.Dataset", merges: list) -> "ray.data.Dataset":
    """BPE conservation check, streaming: encode every document with the
    learned merge table, DECODE the full token sequence back (concat
    tokens, map the end-of-word marker to a space), and emit
    (doc_id, decoded_md5). BPE is lossless by construction — token
    boundaries partition the normalized text — so the md5 must equal
    ``md5(normalized text)``, which IS SQL-expressible: this gives the
    iterative merge machinery (train + encode + memo) a driver value-hash
    oracle without dumping token tables. Full sequences never leave the
    task (only the 32-char digest does)."""
    import hashlib

    ref = ray.put({tuple(m): i for i, m in enumerate(merges)})

    class RoundTrip:
        def __init__(self, r):
            self.ranks = ray.get(r)
            self.memo: dict = {}

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            digests = []
            for t in df["text"].tolist():
                words_back = []
                for w in T.normalize_text(t).split(" "):
                    if not w:
                        continue
                    back = "".join(_bpe_word(w, self.ranks, self.memo))
                    # strip exactly the ONE end-of-word marker the encoder
                    # appended — a literal '</w>' inside the word survives,
                    # so decode is exact even on adversarial text
                    if back.endswith(_EOW):
                        back = back[: -len(_EOW)]
                    words_back.append(back)
                decoded = " ".join(words_back)
                digests.append(hashlib.md5(decoded.encode("utf-8")).hexdigest())
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"].to_numpy(),
                    "decoded_md5": pd.Series(digests, dtype=object),
                }
            )

    return docs.map_batches(
        RoundTrip,
        fn_constructor_kwargs={"r": ref},
        batch_format="pandas",
        concurrency=(1, pool_max()),
    )


def encode_docs(
    docs: "ray.data.Dataset", vocab: pd.DataFrame
) -> "ray.data.Dataset":
    """Tokenizer ENCODE: map every normalized word to its vocabulary id
    (0 = OOV), streaming — the vocab dict is broadcast once via
    ``ray.put``. Output per doc: (doc_id, n_tokens, n_oov, ids_str) with
    ids_str the ' '-joined id sequence (string-typed so the driver's
    value-hash comparison is exact)."""
    ref = ray.put(dict(zip(vocab["word"].tolist(), vocab["token_id"].tolist())))

    def enc(df: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(ref)
        ids_strs, noov, ntok = [], [], []
        for t in df["text"].tolist():
            ids = [v.get(w, 0) for w in T.normalize_text(t).split(" ") if w]
            ids_strs.append(" ".join(map(str, ids)))
            noov.append(sum(1 for i in ids if i == 0))
            ntok.append(len(ids))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_tokens": pd.Series(ntok, dtype="int64"),
                "n_oov": pd.Series(noov, dtype="int64"),
                "ids_str": pd.Series(ids_strs, dtype=object),
            }
        )

    return docs.map_batches(enc, batch_format="pandas")
