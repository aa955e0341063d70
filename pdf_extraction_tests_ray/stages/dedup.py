"""Corpus deduplication operators (exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine) as Ray Data pipelines.

Scale notes (every operator documents its shuffle):
- exact: vectorized hash per batch + PER-BATCH PRE-AGGREGATION, then one
  small ``groupby(hash)`` over partials — the canonical pre-aggregate
  pattern (the shuffle moves one row per distinct hash per batch, not one
  per document).
- minhash-lsh: signature per batch -> explode to (band_key, doc_id) rows ->
  ``groupby(band_key)`` -> within-bucket candidate pairs -> pair-level dedup
  -> verify exact Jaccard via a BUCKETED HASH JOIN of the candidate pairs
  against the docs table (``_verify_pairs_join``: one bounded bucket
  shuffle of the corpus text, shingling only pair-referenced docs —
  no driver-side or broadcast text materialization at any scale).
- simhash: 64-bit signature -> 4x16-bit chunk blocking (pigeonhole: any
  pair within hamming<=3 shares a chunk) -> verify hamming.
- ngram-jaccard: block by ``source`` (bounded blocks) -> all-pairs within
  block via ``map_groups``.
- embedding: block by ``label`` -> within-block cosine via numpy matmul.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions import text as T
from ..relational import pool_max


# --------------------------------------------------------------------------
# exact dedup


def exact_dedup(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """One row per distinct normalized text: (text_md5, keep_doc_id,
    dup_count). keep = min doc_id (deterministic representative)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = [T.md5_fingerprint(t) for t in df["text"].tolist()]
        g = pd.DataFrame({"text_md5": h, "doc_id": df["doc_id"].values})
        agg = g.groupby("text_md5", sort=False).agg(
            keep_doc_id=("doc_id", "min"), dup_count=("doc_id", "size")
        )
        return agg.reset_index()

    from ..relational import bucketed_group_merge

    partials = docs.map_batches(partial, batch_format="pandas")
    return bucketed_group_merge(
        partials,
        ["text_md5"],
        lambda df: df.groupby("text_md5", sort=False)
        .agg(keep_doc_id=("keep_doc_id", "min"), dup_count=("dup_count", "sum"))
        .reset_index(),
    )


def shared_ngram_pairs(
    docs: "ray.data.Dataset",
    n: int = 13,
    num_buckets: int = 64,
    max_docs_per_gram: int = 64,
) -> "ray.data.Dataset":
    """EXACT substring-overlap detection (the exact-substring measure of
    "Deduplicating Training Data Makes Language Models Better", Lee et
    al. 2022, at word-window granularity): for every document pair
    sharing at least one word-``n``-gram, count the DISTINCT shared
    grams. Output: (doc_a, doc_b, n_shared), doc_a < doc_b.

    Scale shape: per batch, each doc emits one row per DISTINCT gram
    keyed by the gram's md5 (fixed 32-byte key, never the text); ONE
    bucket shuffle on the gram key co-locates a gram's docs; within a
    gram the doc list becomes sorted pairs — capped at
    ``max_docs_per_gram`` docs per gram (a boilerplate gram shared by k
    docs would emit C(k,2) pairs; the cap bounds the blow-up and is the
    standard move — log and drop ultra-common grams, they are
    boilerplate, not duplication). Pair counts then merge in a second
    bucketed shuffle keyed on the pair.
    """

    def gram_rows(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        ids, hs = [], []
        for d, t in zip(df["doc_id"].tolist(), df["text"].tolist()):
            for g in T.word_ngrams(t, n):
                ids.append(d)
                hs.append(hashlib.md5(g.encode("utf-8")).hexdigest())
        return pd.DataFrame({"doc_id": ids, "h": hs}).drop_duplicates()

    from ..relational import bucketed_group_merge

    def pairs_of_gram(df: pd.DataFrame) -> pd.DataFrame:
        # df holds (doc_id, h) rows for ONE bucket (many grams): per gram,
        # sorted distinct docs -> pairs
        out_a, out_b = [], []
        capped = 0
        for _, sub in df.groupby("h", sort=False):
            all_docs = sorted(set(sub["doc_id"].tolist()))
            if len(all_docs) > max_docs_per_gram:
                capped += 1
            ds_ = all_docs[:max_docs_per_gram]
            for i in range(len(ds_)):
                for j in range(i + 1, len(ds_)):
                    out_a.append(ds_[i])
                    out_b.append(ds_[j])
        if capped:
            # no silent truncation: the docstring's cap is a scale guard,
            # and a hit means pair counts UNDERCOUNT for those grams (the
            # uncapped SQL oracle will disagree at such corpora)
            print(
                f"shared_ngram_pairs: capped {capped} gram(s) at "
                f"{max_docs_per_gram} docs — boilerplate grams truncated"
            )
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    # shuffle 1: gram key -> per-gram pairs (one row per (gram, pair))
    per_gram = bucketed_group_merge(
        docs.map_batches(gram_rows, batch_format="pandas"),
        ["h"],
        pairs_of_gram,
        num_buckets=num_buckets,
    )

    # shuffle 2: sum pair contributions (each (gram, pair) row counts 1
    # distinct shared gram by construction)
    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["doc_a", "doc_b"], sort=False)
            .size()
            .rename("n_shared")
            .reset_index()
        )

    return bucketed_group_merge(
        per_gram.map_batches(count_partial, batch_format="pandas"),
        ["doc_a", "doc_b"],
        lambda df: df.groupby(["doc_a", "doc_b"], sort=False)
        .agg(n_shared=("n_shared", "sum"))
        .reset_index(),
        num_buckets=num_buckets,
    )


_ROLL_P = np.uint64(1099511628211)  # FNV-1a prime (odd -> full-period mod 2^64)


def _doc_gram_rolls(texts, n: int) -> tuple:
    """Per doc: (normalized token list, uint64 rolling hash per gram
    position), computed BATCH-wise: every doc's tokens concatenate into
    one array hashed by a single pandas C-rate siphash call (fixed key,
    never the salted builtin), the window combine is Horner over n
    shifted vectorized multiplies with wraparound uint64 arithmetic, and
    each doc takes its own first len-n+1 positions (windows crossing doc
    boundaries are simply never selected). Per-DOC granularity measured
    0.9s vs 0.6s full-md5 at sf0.1 — tiny-array numpy overhead ate the
    win; batch granularity is the vectorization that actually pays.
    The hash of a position depends only on its doc's tokens, so the
    result is layout-invariant."""
    toks_all = [T.normalize_text(t).split(" ") for t in texts]
    lens = np.fromiter((len(t) for t in toks_all), dtype=np.int64, count=len(toks_all))
    empty = np.empty(0, dtype=np.uint64)
    flat_n = int(lens.sum())
    if flat_n == 0 or flat_n - n + 1 <= 0:
        return toks_all, [empty] * len(toks_all)
    flat = np.empty(flat_n, dtype=object)
    pos = 0
    for t in toks_all:
        flat[pos : pos + len(t)] = t
        pos += len(t)
    th = pd.util.hash_array(flat)
    npos = flat_n - n + 1
    with np.errstate(over="ignore"):
        acc = th[:npos].copy()
        for j in range(1, n):
            acc = acc * _ROLL_P + th[j : j + npos]
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    rolls_all = []
    for s, l in zip(starts.tolist(), lens.tolist()):
        k = l - n + 1
        rolls_all.append(acc[s : s + k] if k > 0 and s + k <= npos else (acc[s:npos] if k > 0 else empty))
    return toks_all, rolls_all


def exact_substring_cut(
    docs: "ray.data.Dataset",
    n: int = 12,
    min_count: int = 2,
    num_buckets: int = 64,
    prefilter: bool = True,
    prefilter_collect_budget_docs: int = 200_000,
    repeat_broadcast_budget: int = 20_000_000,
) -> "ray.data.Dataset":
    """Exact-substring dedup with SPAN REMOVAL (the cut half of Lee et
    al. 2022's ExactSubstr, at word-window granularity): every word
    ``n``-gram occurring >= ``min_count`` times in the corpus keeps its
    globally-first occurrence (min (doc_id, pos)) and every OTHER
    occurrence's n-token span is cut from its document. A long repeated
    region is a run of overlapping duplicated grams, so the first
    document keeps it intact and later copies lose the whole region
    (their cut intervals merge). Output: (doc_id, kept_text, n_kept) for
    EVERY input document — kept_text re-joins the surviving normalized
    tokens, n_kept counts them.

    Scale shape: TWO all-to-alls plus (``prefilter=True``, round-5
    VERDICT #4) one LIGHT no-shuffle pre-pass. The pre-pass computes a
    vectorized uint64 polynomial rolling hash per gram position
    (:func:`_doc_gram_rolls`), reduces each batch to its distinct
    (roll, count) partials, merges them driver-side, and broadcasts the
    hashes seen >= ``min_count`` times corpus-wide. The gram pass then
    md5-hashes ONLY positions whose rolling hash repeats (every true
    md5-duplicate is also a roll-duplicate, so recall is exact; a false
    roll collision just md5s a few extra grams, and the md5 KEY still
    decides the cut — the oracle contract is untouched). This cuts the
    Python-rate md5 work AND the gram shuffle volume from O(all grams)
    to O(repeated grams) — at web dup rates the difference between
    shuffling the corpus and shuffling the duplicated sliver. Then:
    (1) surviving gram rows (md5 key, doc_id, pos) bucket-shuffle on the
    gram hash; each gram group orders by (doc_id, pos) and emits
    all-but-first as cut marks. (2) the cut marks ride a tagged union
    WITH the doc rows through one doc_id bucket shuffle (the
    fold-adjacent-shuffles move — no separate join pass), where each doc
    rebuilds its kept token mask vectorized.

    Size switches (the DROP_BROADCAST_BUDGET pattern): past
    ``prefilter_collect_budget_docs`` (metadata count) the per-batch
    distinct partials would outgrow the driver, so the repeat set is
    computed by a bucketed roll-hash count shuffle instead (one extra
    all-to-all, collects ONLY the repeats — small by construction); if
    the repeat set itself exceeds ``repeat_broadcast_budget`` entries the
    prefilter is skipped entirely (full-md5 path, identical output).
    Fully SQL-oracled (``dedup_substring_cut``): the decided keys are
    md5/int/string ops, no floats; prefilter on/off equality and layout
    invariance are pinned in tests."""
    import hashlib

    from ..relational import bucketed_group_merge

    repeats_ref = None
    if prefilter:

        def roll_partial(df: pd.DataFrame) -> pd.DataFrame:
            _, rolls = _doc_gram_rolls(df["text"].tolist(), n)
            if rolls:
                allr = np.concatenate(rolls)
            else:
                allr = np.empty(0, dtype=np.uint64)
            u, c = np.unique(allr, return_counts=True)
            return pd.DataFrame({"r": u, "c": c.astype("int64")})

        partials = docs.map_batches(roll_partial, batch_format="pandas")
        n_docs = docs.count()  # parquet metadata / cached count
        if n_docs <= prefilter_collect_budget_docs:
            # light pre-pass: NO shuffle, driver-side vectorized merge
            pf = partials.to_pandas()
            agg = pf.groupby("r")["c"].sum() if len(pf) else pd.Series(dtype="int64")
            repeats = np.sort(agg.index[agg >= min_count].to_numpy().astype(np.uint64))
        else:
            # corpus too big for a driver merge of per-batch distincts:
            # one bucketed count shuffle, collecting ONLY the repeats
            rep_ds = bucketed_group_merge(
                partials,
                ["r"],
                lambda g: g.groupby("r", sort=False)["c"]
                .sum()
                .reset_index()
                .query(f"c >= {int(min_count)}")[["r"]],
                num_buckets=num_buckets,
            )
            rp = rep_ds.to_pandas()
            repeats = (
                np.sort(rp["r"].to_numpy().astype(np.uint64))
                if len(rp) and "r" in rp.columns
                else np.empty(0, dtype=np.uint64)
            )
        if len(repeats) > repeat_broadcast_budget:
            print(
                f"exact_substring_cut: repeat set {len(repeats)} exceeds the "
                f"broadcast budget — prefilter skipped (full-md5 path)"
            )
        else:
            repeats_ref = ray.put(repeats)

    def gram_rows(df: pd.DataFrame) -> pd.DataFrame:
        rep = ray.get(repeats_ref) if repeats_ref is not None else None
        hs, ids, ps = [], [], []
        toks_all, rolls_all = _doc_gram_rolls(df["text"].tolist(), n)
        for d, toks, rolls in zip(df["doc_id"].tolist(), toks_all, rolls_all):
            if rep is not None:
                if len(rep) and len(rolls):
                    idx = np.clip(np.searchsorted(rep, rolls), 0, len(rep) - 1)
                    cand = np.flatnonzero(rep[idx] == rolls)
                else:
                    cand = np.empty(0, dtype=np.int64)
            else:
                cand = np.arange(len(rolls))
            for i in cand.tolist():
                hs.append(hashlib.md5(" ".join(toks[i : i + n]).encode("utf-8")).hexdigest())
                ids.append(d)
                ps.append(i)
        return pd.DataFrame(
            {"h": hs, "doc_id": np.asarray(ids, dtype=np.int64), "pos": np.asarray(ps, dtype=np.int64)}
        )

    def cuts_of_gram(df: pd.DataFrame) -> pd.DataFrame:
        # one lexsort over the bucket, then pure boolean masks — the
        # per-distinct-gram pandas groupby loop measured ~Python-rate at
        # ~25k groups/bucket (CLAUDE.md high-cardinality lesson)
        sub = df.sort_values(["h", "doc_id", "pos"], kind="stable")
        h = sub["h"].to_numpy()
        first = np.empty(len(sub), dtype=bool)
        first[:1] = True
        first[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, len(sub)))
        keep = (~first) & (np.repeat(sizes, sizes) >= min_count)
        out = sub.loc[keep, ["doc_id", "pos"]].reset_index(drop=True)
        if out.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"), "pos": pd.Series([], dtype="int64")}
            )
        return out

    from ..relational import bucketed_group_merge

    marks = bucketed_group_merge(
        docs.map_batches(gram_rows, batch_format="pandas"),
        ["h"],
        cuts_of_gram,
        num_buckets=num_buckets,
    )

    # tagged union: doc rows carry text (pos = -1), mark rows carry pos
    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "text": df["text"],
                "pos": np.full(len(df), -1, dtype=np.int64),
            }
        )

    def tag_marks(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "text": pd.Series([""] * len(df), dtype="object"),
                "pos": df["pos"].astype("int64"),
            }
        )

    cols = ["doc_id", "text", "pos"]
    tagged = (
        docs.map_batches(tag_docs, batch_format="pandas")
        .select_columns(cols)
        .union(marks.map_batches(tag_marks, batch_format="pandas").select_columns(cols))
    )

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        out_id, out_text, out_n = [], [], []
        for d, sub in df.groupby("doc_id", sort=False):
            texts = sub.loc[sub["pos"] < 0, "text"]
            if texts.empty:
                continue  # marks whose doc landed in another bucket: impossible (same key)
            toks = np.asarray(T.normalize_text(texts.iloc[0]).split(" "), dtype=object)
            pos = sub.loc[sub["pos"] >= 0, "pos"].to_numpy()
            if len(pos):
                # difference array: O(marks + tokens), not O(marks * n)
                diff = np.zeros(len(toks) + 1, dtype=np.int64)
                np.add.at(diff, pos, 1)
                np.add.at(diff, np.minimum(pos + n, len(toks)), -1)
                mask = np.cumsum(diff[:-1]) == 0
            else:
                mask = np.ones(len(toks), dtype=bool)
            out_id.append(d)
            out_text.append(" ".join(toks[mask]))
            out_n.append(int(mask.sum()))
        return pd.DataFrame(
            {
                "doc_id": np.asarray(out_id, dtype=np.int64),
                "kept_text": out_text,
                "n_kept": np.asarray(out_n, dtype=np.int64),
            }
        )

    return bucketed_group_merge(tagged, ["doc_id"], rebuild, num_buckets=num_buckets)


def _undirected_edges(
    df: pd.DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> pd.DataFrame:
    """Expand a (doc_a, doc_b) pair batch into both edge directions —
    shared by the distributed components and PageRank passes."""
    return pd.DataFrame(
        {
            src_col: pd.concat([df["doc_a"], df["doc_b"]], ignore_index=True),
            dst_col: pd.concat([df["doc_b"], df["doc_a"]], ignore_index=True),
        }
    )


def duplicate_clusters(pairs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Connected components over a near-duplicate PAIR list:
    (doc_id, cluster_id) with cluster_id = min doc_id in the component —
    the step that turns pairwise dedup output into per-document cluster
    assignments (keep one representative per cluster, attribute the rest).

    The pair list is the SMALL side by construction — it is the output
    of a verified dedup pass, orders of magnitude below the corpus — so
    union-find runs driver-side over it (same small-side contract as the
    knn query vectors). If pairs ever outgrow one machine, switch to
    iterated min-label-propagation joins; the output contract stays.
    Deterministic: min-id labels, sorted output."""
    return ray.data.from_pandas(_clusters_frame(pairs))


def _clusters_frame(pairs: "ray.data.Dataset") -> pd.DataFrame:
    """Driver-side union-find core of :func:`duplicate_clusters`; returns
    the (doc_id, cluster_id) pandas frame directly so callers that stay
    driver-side (apply_neardup_dedup's broadcast path) skip the
    from_pandas -> Ray execution round-trip."""
    pdf = pairs.to_pandas()
    # Ray drops the schema of zero-row blocks: an empty pair list arrives
    # as a column-less frame — the dup-free-corpus case, not an error
    if pdf.empty or "doc_a" not in pdf.columns:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "cluster_id": pd.Series([], dtype="int64")}
        )
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in zip(pdf["doc_a"].tolist(), pdf["doc_b"].tolist()):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id so the root is the deterministic label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return pd.DataFrame(
        sorted((v, find(v)) for v in parent), columns=["doc_id", "cluster_id"]
    )


def duplicate_clusters_distributed(
    pairs: "ray.data.Dataset", max_iters: int = 50, num_buckets: int = 64
) -> "ray.data.Dataset":
    """Connected components at PAIR-LIST-DOESN'T-FIT-ONE-MACHINE scale:
    iterative min-label propagation, the distributed alternative to
    :func:`duplicate_clusters` (identical output contract — (doc_id,
    cluster_id=min id in component)).

    Each iteration: join every node's current label to its neighbors
    through the edge list (one bucketed merge keyed on the node), take
    the min of own and neighbor labels, and stop when an iteration
    changes nothing (checked with a metadata-cheap count of changed
    rows). Iterations needed = graph diameter — near-duplicate clusters
    are shallow (dup groups, not social graphs), so this converges in a
    handful of rounds; ``max_iters`` guards pathological chains.
    """
    import functools

    from ..relational import bucketed_group_merge

    edges = pairs.map_batches(
        functools.partial(_undirected_edges, src_col="v", dst_col="u"),
        batch_format="pandas",
    ).materialize()
    if edges.count() == 0:  # dup-free corpus: no components to label
        return ray.data.from_pandas(
            pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "cluster_id": pd.Series([], dtype="int64")}
            )
        )

    # labels: every node starts as its own label
    labels = bucketed_group_merge(
        edges.map_batches(
            lambda df: df[["v"]].drop_duplicates().assign(label=lambda x: x["v"]),
            batch_format="pandas",
        ),
        ["v"],
        lambda df: df.drop_duplicates("v"),
        num_buckets=num_buckets,
    ).materialize()

    for _ in range(max_iters):
        # ship each node's label to its neighbors: tag label rows and
        # edge rows, co-locate by node, emit (u, candidate_label)
        lab = labels.map_batches(
            lambda df: pd.DataFrame({"node": df["v"], "u": df["v"], "label": df["label"]}),
            batch_format="pandas",
        )
        edg = edges.map_batches(
            lambda df: pd.DataFrame({"node": df["v"], "u": df["u"], "label": -1}),
            batch_format="pandas",
        )

        def propagate(g: pd.DataFrame) -> pd.DataFrame:
            # g holds one bucket of nodes: label rows (label>=0) and edge
            # rows (label==-1). For each node, send its label to every
            # neighbor AND to itself.
            out = []
            for _, sub in g.groupby("node", sort=False):
                lbl = sub.loc[sub["label"] >= 0, "label"]
                if lbl.empty:
                    continue
                lv = int(lbl.min())
                targets = sub["u"].unique()
                out.append(pd.DataFrame({"v": targets, "cand": lv}))
            if not out:
                return pd.DataFrame({"v": [], "cand": []})
            return pd.concat(out, ignore_index=True)

        cands = bucketed_group_merge(
            lab.union(edg), ["node"], propagate, num_buckets=num_buckets
        )
        new_labels = bucketed_group_merge(
            cands.map_batches(
                lambda df: df.groupby("v", sort=False)["cand"].min().rename("label").reset_index(),
                batch_format="pandas",
            ),
            ["v"],
            lambda df: df.groupby("v", sort=False)["label"].min().reset_index(),
            num_buckets=num_buckets,
        ).materialize()

        # converged? labels only ever DECREASE (min of a set containing
        # the old label), so an unchanged label SUM means a fixpoint —
        # one cheap aggregation instead of a compare join per iteration
        new_sum = new_labels.sum("label")
        old_sum = labels.sum("label")
        labels = new_labels
        if new_sum == old_sum:
            break
    else:
        # exhausted without a fixpoint: labels are WRONG (a component
        # wider than max_iters still carries multiple labels) — never
        # return them silently
        raise RuntimeError(
            f"label propagation did not converge within max_iters="
            f"{max_iters}; the pair graph has a component of diameter "
            f"> {max_iters} — raise max_iters (iterations are cheap "
            f"relative to silently-wrong clusters)"
        )

    return labels.map_batches(
        lambda df: df.rename(columns={"v": "doc_id", "label": "cluster_id"}).sort_values(
            "doc_id"
        ),
        batch_format="pandas",
    )


def pagerank_local(
    pairs: "ray.data.Dataset", damping: float = 0.85, iters: int = 10
) -> "ray.data.Dataset":
    """PageRank over an undirected pair list, iterated DRIVER-SIDE: the
    pair list is the verified-dedup output — small by the same contract
    as :func:`duplicate_clusters` — so the power iteration runs on a
    driver adjacency structure (sparse accumulate per iteration). When
    the pair list outgrows one machine, :func:`pagerank` is the
    distributed twin with the identical output contract (agreement
    within float-summation tolerance — the two paths accumulate in
    different orders — is pinned in tests). Output: (doc_id, rank round
    6), sorted."""
    pdf = pairs.to_pandas()
    # zero-row blocks lose their schema: an empty pair list arrives
    # column-less, so guard before touching doc_a/doc_b
    nodes = (
        []
        if pdf.empty or "doc_a" not in pdf.columns
        else sorted(set(pdf["doc_a"]).union(pdf["doc_b"]))
    )
    if not nodes:
        return ray.data.from_pandas(
            pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "rank": pd.Series([], dtype="float64")})
        )
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    src = np.array(
        [idx[a] for a in pdf["doc_a"]] + [idx[b] for b in pdf["doc_b"]], dtype=np.int64
    )
    dst = np.array(
        [idx[b] for b in pdf["doc_b"]] + [idx[a] for a in pdf["doc_a"]], dtype=np.int64
    )
    # canonical edge order: deterministic float accumulation
    order = np.lexsort((src, dst))
    src, dst = src[order], dst[order]
    deg = np.bincount(src, minlength=n).astype(np.float64)
    r = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = r[src] / deg[src]
        r = base + damping * np.bincount(dst, weights=contrib, minlength=n)
    return ray.data.from_pandas(
        pd.DataFrame({"doc_id": nodes, "rank": np.round(r, 6)})
    )


def pagerank(
    pairs: "ray.data.Dataset",
    damping: float = 0.85,
    iters: int = 10,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Distributed PageRank over an undirected pair list (e.g. the
    shared-ngram overlap graph): document centrality in the duplication/
    overlap graph — the harmonic-centrality-style quality prior web
    curation pipelines use. Fixed ``iters`` power iterations; each one is
    ONE bucketed merge shipping rank/degree contributions along edges
    (the same shuffle shape as :func:`duplicate_clusters_distributed`).
    This is the PAIR-LIST-DOESN'T-FIT-ONE-MACHINE path; fixed per-shuffle
    costs make :func:`pagerank_local` the right call at query scale
    (same output, pinned equal in tests).

    Deterministic across block layouts: every contribution sum runs over
    rows canonically sorted by source node before the groupby (float
    addition is order-dependent; the stable sort pins the order), so
    results are bitwise reproducible. Nodes outside the pair list have
    rank (1-d)/N trivially and are excluded by construction."""
    from ..relational import bucketed_group_merge

    edges = pairs.map_batches(_undirected_edges, batch_format="pandas").materialize()

    # out-degrees (and the node set) — one bucketed count merge
    deg = bucketed_group_merge(
        edges.map_batches(
            lambda df: df.groupby("src", sort=False).size().rename("deg").reset_index(),
            batch_format="pandas",
        ),
        ["src"],
        lambda df: df.groupby("src", sort=False).agg(deg=("deg", "sum")).reset_index(),
        num_buckets=num_buckets,
    ).materialize()
    n_nodes = deg.count()
    if n_nodes == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "rank": pd.Series([], dtype="float64")})
        )
    base = (1.0 - damping) / n_nodes

    # ranks start uniform; carry deg alongside to avoid a per-iter join
    ranks = deg.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["src"], "rank": 1.0 / n_nodes, "deg": df["deg"]}
        ),
        batch_format="pandas",
    ).materialize()

    for _ in range(iters):
        # tag rank rows and edge rows, co-locate by source node, emit
        # (dst, contribution); then sum contributions per dst — both
        # merges sort canonically before summing (bitwise determinism)
        lab = ranks.map_batches(
            lambda df: pd.DataFrame(
                {"key": df["node"], "dst": df["node"], "val": df["rank"] / df["deg"],
                 "is_edge": np.int8(0)}
            ),
            batch_format="pandas",
        )
        edg = edges.map_batches(
            lambda df: pd.DataFrame(
                {"key": df["src"], "dst": df["dst"], "val": -1.0,
                 "is_edge": np.int8(1)}
            ),
            batch_format="pandas",
        )

        def scatter(g: pd.DataFrame) -> pd.DataFrame:
            out = []
            for key, sub in g.sort_values(["key", "dst"], kind="stable").groupby(
                "key", sort=True
            ):
                contrib = sub.loc[sub["is_edge"] == 0, "val"]
                if contrib.empty:
                    continue
                c = float(contrib.iloc[0])
                targets = sub.loc[sub["is_edge"] == 1, "dst"]
                out.append(
                    pd.DataFrame({"dst": targets, "c": c, "src": key, "deg": -1})
                )
            if not out:
                return pd.DataFrame({"dst": [], "c": [], "src": [], "deg": []})
            return pd.concat(out, ignore_index=True)

        contribs = bucketed_group_merge(
            lab.union(edg), ["key"], scatter, num_buckets=num_buckets
        )
        # fold the deg/rank rebuild into the gather merge: deg rows ride
        # the same shuffle (2 all-to-alls per iteration, not 3)
        deg_rows = deg.map_batches(
            lambda df: pd.DataFrame(
                {"dst": df["src"], "c": 0.0, "src": -1, "deg": df["deg"]}
            ),
            batch_format="pandas",
        )

        def gather(g: pd.DataFrame) -> pd.DataFrame:
            out = {"node": [], "rank": [], "deg": []}
            for node, sub in g.sort_values(["dst", "src"], kind="stable").groupby(
                "dst", sort=True
            ):
                d = sub.loc[sub["deg"] >= 0, "deg"]
                if d.empty:
                    continue
                in_sum = float(sub.loc[sub["deg"] < 0, "c"].sum())  # canonical order
                out["node"].append(node)
                out["rank"].append(base + damping * in_sum)
                out["deg"].append(int(d.iloc[0]))
            return pd.DataFrame(out)

        ranks = bucketed_group_merge(
            contribs.union(deg_rows), ["dst"], gather, num_buckets=num_buckets
        ).materialize()

    return ranks.map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["node"], "rank": np.round(df["rank"], 6)}
        ).sort_values("doc_id"),
        batch_format="pandas",
    )


# Max drop-side rows the apply stages will ship as one ray.put broadcast.
# Below it, a broadcast lookup beats a shuffle (one object-store read per
# task, zero data movement of the corpus). Above it — the web-scale regime
# where 30-50% of a crawl is duplicated and the drop side is O(corpus) —
# the apply switches to a bucketed hash join so NEITHER side is ever
# driver- or worker-resident in full. 1M int64/md5 entries ≈ 60-120 MB as
# a Python set/dict: comfortably beneath a worker heap, well past anything
# a small-dup-rate corpus produces.
DROP_BROADCAST_BUDGET = 1_000_000


def duplicate_keep_map(docs: "ray.data.Dataset") -> dict:
    """``text_md5 -> keep_doc_id`` for texts with ``dup_count > 1`` ONLY.

    This is the broadcast side of :func:`apply_exact_dedup`. Its size is
    O(#duplicated texts), NOT O(#distinct texts): empty for a
    duplicate-free corpus and small whenever the duplicate rate is low
    (the common web-corpus case — broadcasting the *keep* list instead
    would be O(corpus) for mostly-unique data)."""
    dup_df = _duplicate_groups(docs).to_pandas()
    if dup_df.empty or "text_md5" not in dup_df.columns:  # duplicate-free corpus
        return {}
    return dict(zip(dup_df["text_md5"].tolist(), dup_df["keep_doc_id"].tolist()))


def _duplicate_groups(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(text_md5, keep_doc_id) for duplicated texts only, MATERIALIZED so
    the follow-up count() is served from block metadata (no re-execution)
    — the same metadata-count pattern as similarity.train_ivf_centroids."""
    return (
        exact_dedup(docs)
        .map_batches(
            lambda df: df.loc[df["dup_count"] > 1, ["text_md5", "keep_doc_id"]],
            batch_format="pandas",
        )
        .materialize()
    )


def apply_exact_dedup(
    docs: "ray.data.Dataset", broadcast_budget: int | None = None
) -> "ray.data.Dataset":
    """Corpus hygiene end-to-end: keep exactly one document (min doc_id)
    per distinct normalized text.

    Two regimes, switched on the measured (metadata-count) size of the
    duplicated-groups table — never on a guess:

    - ``<= broadcast_budget`` (default :data:`DROP_BROADCAST_BUDGET`):
      broadcast the ``text_md5 -> keep_doc_id`` map; each batch re-hashes
      its own texts (cheap md5 — no second shuffle over the corpus) and
      drops rows whose hash is claimed by a different keeper.
    - ``> broadcast_budget`` — web-scale dup rates where the drop side is
      itself O(corpus): a bucketed hash join (semi_join shape,
      relational.py) co-locates each text hash's doc rows with its single
      keeper row; one bounded bucket shuffle, no driver materialization,
      no broadcast. Output is IDENTICAL (pinned in
      tests/test_llm_and_scale_paths.py::test_apply_exact_dedup_antijoin_path).
    """
    budget = DROP_BROADCAST_BUDGET if broadcast_budget is None else broadcast_budget
    dup_ds = _duplicate_groups(docs)
    if dup_ds.count() <= budget:
        dup_df = dup_ds.to_pandas()
        dup_map = (
            {}
            if dup_df.empty or "text_md5" not in dup_df.columns
            else dict(zip(dup_df["text_md5"].tolist(), dup_df["keep_doc_id"].tolist()))
        )
        dup_ref = ray.put(dup_map)

        class DropDuplicates:
            def __init__(self, ref):
                self.dup = ray.get(ref)

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                if not self.dup:
                    return df
                keep = [
                    (k := self.dup.get(T.md5_fingerprint(t))) is None or k == d
                    for t, d in zip(df["text"].tolist(), df["doc_id"].tolist())
                ]
                return df[np.asarray(keep, dtype=bool)]

        return docs.map_batches(
            DropDuplicates,
            fn_constructor_kwargs={"ref": dup_ref},
            batch_format="pandas",
            concurrency=(1, pool_max()),
        )
    return _keeper_filter_join(docs, dup_ds)


def _keeper_filter_join(
    docs: "ray.data.Dataset", dup_ds: "ray.data.Dataset", num_buckets: int = 64
) -> "ray.data.Dataset":
    """Scale path of :func:`apply_exact_dedup`: tagged-union bucketed hash
    join on ``text_md5`` (the semi_join shape from relational.py, with a
    keeper COMPARISON instead of pure membership). Doc rows ride the
    bucket shuffle once; per bucket, a vectorized map lookup drops rows
    whose hash names a different keeper."""
    from ..relational import _bucket_of, _sentinel_for

    dschema = docs.schema()
    doc_cols = list(dschema.names)
    fills = {c: _sentinel_for(t) for c, t in zip(dschema.names, dschema.types)}

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        out = df[doc_cols].copy()
        out["_md5"] = [T.md5_fingerprint(t) for t in df["text"].tolist()]
        out["_keep"] = out["doc_id"]  # dtype-preserving filler (right side wins)
        out["_side"] = np.int8(1)
        return out

    def tag_dups(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"_md5": df["text_md5"], "_keep": df["keep_doc_id"]})
        for c in doc_cols:
            # dtype-preserving sentinel of the doc column's own type — these
            # filler rows are dropped by the filter, value irrelevant
            out[c] = pd.Series([fills[c]] * len(out), index=out.index)
        out["_side"] = np.int8(0)
        return out[doc_cols + ["_md5", "_keep", "_side"]]

    cols = doc_cols + ["_md5", "_keep", "_side"]
    tagged = (
        docs.map_batches(tag_docs, batch_format="pandas")
        .select_columns(cols)
        .union(dup_ds.map_batches(tag_dups, batch_format="pandas").select_columns(cols))
    )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = _bucket_of(df, ["_md5"], num_buckets)
        return df

    def filt(g: pd.DataFrame) -> pd.DataFrame:
        side = g["_side"].to_numpy()
        keeper = dict(
            zip(g.loc[side == 0, "_md5"].tolist(), g.loc[side == 0, "_keep"].tolist())
        )
        l = g[side == 1]
        if not keeper:
            return l.drop(columns=["_md5", "_keep", "_side", "_bucket"])
        keep = [
            (k := keeper.get(h)) is None or k == d
            for h, d in zip(l["_md5"].tolist(), l["doc_id"].tolist())
        ]
        return l[np.asarray(keep, dtype=bool)].drop(
            columns=["_md5", "_keep", "_side", "_bucket"]
        )

    return (
        tagged.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(filt, batch_format="pandas")
    )


def apply_neardup_dedup(
    docs: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    id_col: str = "doc_id",
    distributed_clusters: bool = False,
    broadcast_budget: int | None = None,
) -> "ray.data.Dataset":
    """NEAR-duplicate corpus hygiene end-to-end (the FineWeb/RefinedWeb
    shape): given a verified near-duplicate PAIR list (from
    :func:`minhash_lsh_pairs`, :func:`ngram_jaccard_pairs`,
    :func:`simhash_pairs`, ...), keep exactly one document — the min
    ``id_col`` of each connected component — and every unpaired document.

    Scale contract mirrors :func:`apply_exact_dedup`, switched on the
    MEASURED drop-set size (metadata count of the materialized drop rows):
    within ``broadcast_budget`` (default :data:`DROP_BROADCAST_BUDGET`)
    the drop ids ship as one ``ray.put`` frozenset — O(#near-dup docs),
    empty for a dup-free corpus; past it (web-scale crawls run 30-50%
    near-duplicate, making the drop set O(corpus) exactly when dedup
    matters most) the filter routes through ``relational.anti_join`` — a
    bucketed hash shuffle where neither side is ever driver- or
    worker-resident in full. Components come from driver union-find over
    the (small, verified) pair list by default; pass
    ``distributed_clusters=True`` to route through
    :func:`duplicate_clusters_distributed` (iterated min-label
    propagation, same output contract) when the pair list itself
    outgrows one machine."""
    budget = DROP_BROADCAST_BUDGET if broadcast_budget is None else broadcast_budget
    if distributed_clusters:
        # drop rows stay a Dataset: materialize once, count from metadata
        drops = duplicate_clusters_distributed(pairs).map_batches(
            lambda df: df.loc[df["doc_id"] != df["cluster_id"], ["doc_id"]],
            batch_format="pandas",
        ).materialize()
        if drops.count() > budget:
            from ..relational import anti_join

            return anti_join(docs, drops, on=id_col, right_on="doc_id")
        drop_df = drops.to_pandas()
    else:
        # union-find already ran driver-side over the (small-by-contract)
        # pair list, so the drop frame is ALREADY driver-resident — no
        # Dataset round-trip, no extra Ray executions
        cf = _clusters_frame(pairs)
        drop_df = cf.loc[cf["doc_id"] != cf["cluster_id"], ["doc_id"]]
        if len(drop_df) > budget:
            from ..relational import anti_join

            return anti_join(
                docs, ray.data.from_pandas(drop_df), on=id_col, right_on="doc_id"
            )
    # empty drop set -> column-less frame (zero-row blocks lose schema)
    drop = (
        frozenset()
        if drop_df.empty or "doc_id" not in drop_df.columns
        else frozenset(drop_df["doc_id"].tolist())
    )
    drop_ref = ray.put(drop)

    class DropNearDuplicates:
        def __init__(self, ref):
            self.drop = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if not self.drop:
                return df
            return df[~df[id_col].isin(self.drop)]

    return docs.map_batches(
        DropNearDuplicates,
        fn_constructor_kwargs={"ref": drop_ref},
        batch_format="pandas",
        concurrency=(1, pool_max()),
    )


# --------------------------------------------------------------------------
# line-level (sub-document) dedup — C4-style


def line_dedup_drops(
    docs: "ray.data.Dataset", num_buckets: int = 256
) -> "ray.data.Dataset":
    """Corpus-wide duplicate LINE occurrences: (doc_id, line_idx) rows for
    every line occurrence that is NOT the corpus-wide first.

    C4 deduplicates at sub-document granularity (Raffel et al. 2020
    §2.2 keeps one of any repeated three-sentence span; Lee et al. 2022
    measure the same effect with exact substrings). Unit here is
    :func:`functions.text.split_lines`'s '.'-sentence (this corpus has no
    newlines); the keeper of a line is its minimum (doc_id, line_idx)
    occurrence — deterministic across block layouts and cluster sizes.

    Scale shape: each batch explodes to narrow (line_hash, doc_id,
    line_idx) rows — md5 key, never the line text, so the shuffle moves
    ~48 bytes per line occurrence regardless of line length. ONE bounded
    bucket shuffle on line_hash co-locates a line's occurrences; the
    per-bucket kernel is a vectorized sort + duplicated() mask emitting
    only the drop rows (O(duplicate occurrences) output — empty for a
    dedup-clean corpus)."""
    import hashlib

    # Arrow tables with EXPLICIT schemas throughout (the _verify_pairs_join
    # convention): mostly-empty drop outputs must keep their dtypes, or the
    # downstream union's pandas concat NaN-promotes doc_id to float64 and
    # the reassembly bucket hash diverges from the doc side's.
    def explode(df: pd.DataFrame) -> pa.Table:
        pos, idxs, hs = [], [], []
        for p, t in enumerate(df["text"].tolist()):
            for i, ln in enumerate(T.split_lines(t), 1):
                pos.append(p)
                idxs.append(i)
                hs.append(hashlib.md5(ln.encode("utf-8")).hexdigest())
        ids = df["doc_id"].iloc[pos] if pos else df["doc_id"].iloc[:0]
        return pa.Table.from_pydict(
            {
                "line_hash": pa.array(hs, type=pa.string()),
                "doc_id": pa.Array.from_pandas(ids),
                "line_idx": pa.array(idxs, type=pa.int64()),
            }
        )

    from ..relational import bucketed_group_merge

    def drops_of_bucket(g: pd.DataFrame) -> pa.Table:
        id_type = pa.array(g["doc_id"].head(1)).type  # groups are never empty
        g = g.sort_values(["line_hash", "doc_id", "line_idx"], kind="mergesort")
        dup = g.duplicated(subset="line_hash", keep="first")
        sub = g.loc[dup]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(sub["doc_id"].tolist(), type=id_type),
                "line_idx": pa.array(sub["line_idx"].tolist(), type=pa.int64()),
            }
        )

    return bucketed_group_merge(
        docs.map_batches(explode, batch_format="pandas"),
        ["line_hash"],
        drops_of_bucket,
        num_buckets=num_buckets,
    )


def apply_line_dedup(
    docs: "ray.data.Dataset", num_buckets: int = 64
) -> "ray.data.Dataset":
    """Rewrite each document with its corpus-wide duplicate lines removed
    (first occurrence kept): (doc_id, text_dedup, n_kept, n_dropped).

    Reassembly is a bucketed hash join on doc_id (semi_join's tag/union
    shape — no broadcast on either side): the doc side moves each doc
    once, the drop side moves O(duplicate occurrences). Within a bucket
    each doc re-splits its own text (cheaper than shipping line text
    through the line_hash shuffle) and rejoins the kept lines with '. '
    — the same separator class the split consumed, so output is a pure
    deterministic function of the input text reproduced verbatim by the
    SQL oracle's string_agg. Docs with no non-empty line (or, degenerate,
    all lines dropped) disappear, matching SQL GROUP BY semantics."""
    drops = line_dedup_drops(docs, num_buckets=max(num_buckets, 256))

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].values,  # native dtype, never cast
                "text": df["text"].astype(object),
                "line_idx": np.full(len(df), -1, dtype="int64"),
            }
        )

    def tag_drops(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].values,
                "text": np.full(len(df), "", dtype=object),
                "line_idx": df["line_idx"].astype("int64"),
            }
        )

    cols = ["doc_id", "text", "line_idx"]
    tagged = (
        docs.map_batches(tag_docs, batch_format="pandas")
        .select_columns(cols)
        .union(drops.map_batches(tag_drops, batch_format="pandas").select_columns(cols))
    )

    from ..relational import _bucket_of

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = _bucket_of(df, ["doc_id"], num_buckets)
        return df

    def rebuild(g: pd.DataFrame) -> pa.Table:
        id_type = pa.array(g["doc_id"].head(1)).type  # groups are never empty
        out_id, out_tx, out_k, out_d = [], [], [], []
        for d, sub in g.groupby("doc_id", sort=False):
            is_doc = sub["line_idx"].to_numpy() < 0
            if not is_doc.any():
                continue  # impossible: drops derive from the same docs
            lines = T.split_lines(sub.loc[is_doc, "text"].iloc[0])
            if not lines:
                continue
            dropset = set(sub.loc[~is_doc, "line_idx"].tolist())
            kept = [ln for i, ln in enumerate(lines, 1) if i not in dropset]
            if not kept:
                continue
            out_id.append(d)
            out_tx.append(". ".join(kept))
            out_k.append(len(kept))
            out_d.append(len(lines) - len(kept))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out_id, type=id_type),
                "text_dedup": pa.array(out_tx, type=pa.string()),
                "n_kept": pa.array(out_k, type=pa.int64()),
                "n_dropped": pa.array(out_d, type=pa.int64()),
            }
        )

    return (
        tagged.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(rebuild, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# MinHash + LSH near-dup


def minhash_band_rows(
    df: pd.DataFrame, k: int = 5, n_perm: int = 128, n_bands: int = 21
) -> pd.DataFrame:
    """Emit (band_key, doc_id) rows per document. Stateless task fn — the
    permutation constants are module-level (per-worker import-cached), so
    an actor pool would only cap elasticity (CLAUDE.md actor-pool note).

    Default banding 21 bands x 6 rows (of 128 perms): the LSH S-curve
    midpoint (1/b)^(1/r) = (1/21)^(1/6) ~= 0.60 matches the default verify
    threshold. The previous 32x4 banding put the midpoint at 0.42, which
    on a corpus with ~0.17 background similarity (shared vocabulary)
    admitted ~3% of ALL pairs as candidates — 397k candidate pairs at
    sf0.1 vs ~1k with 21x6, at measured recall 1.0 both ways (true
    near-dups in the corpus sit at jaccard >= 0.93)."""
    doc_ids, band_keys = [], []
    for did, txt in zip(df["doc_id"].tolist(), df["text"].tolist()):
        sh = T.char_shingles_u64(txt, k)
        sig = T.minhash_signature(sh, n_perm)
        for key in T.lsh_bands(sig, n_bands):
            doc_ids.append(did)
            band_keys.append(np.int64(np.uint64(key).astype(np.int64)))
    out = pd.DataFrame({"band_key": band_keys, "doc_id": doc_ids})
    # coarse shuffle bucket: groupby on the full band_key would spawn
    # one map_groups call per (mostly singleton) bucket; grouping on a
    # 256-way coarsening moves the same rows but amortizes group calls
    out["bucket"] = out["band_key"] % 256
    return out


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    a, b = [], []
    for _, sub in g.groupby("band_key", sort=False):
        ids = sorted(set(sub["doc_id"].tolist()))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
    return pd.DataFrame({"doc_a": a, "doc_b": b})


def minhash_lsh_pairs(
    docs: "ray.data.Dataset",
    threshold: float = 0.6,
    k: int = 5,
    n_perm: int = 128,
    n_bands: int = 21,
) -> "ray.data.Dataset":
    """Verified near-duplicate pairs (doc_a, doc_b, jaccard>=threshold).

    Keep the banding S-curve midpoint ``(1/n_bands) ** (n_bands/n_perm)``
    near ``threshold`` when overriding: too-shallow bands (32x4,
    midpoint 0.42) admit the background-similarity floor as candidates
    and the exact-verify stage pays for every one of them."""
    import functools

    bands = docs.map_batches(
        functools.partial(minhash_band_rows, k=k, n_perm=n_perm, n_bands=n_bands),
        batch_format="pandas",
    )
    cand = bands.groupby("bucket").map_groups(_bucket_pairs, batch_format="pandas")
    # a pair surfacing from several bands yields duplicate candidate rows;
    # the verify join dedupes them for free (stage 1 drops duplicate
    # (pair, slot) rows per bucket; stage 2 groups by pair) — a separate
    # pair-dedup shuffle here measured +0.7s fixed cost for no byte savings
    return _verify_pairs_join(docs, cand, k=k, threshold=threshold)


def _side_schema(id_type: pa.DataType) -> pa.Schema:
    return pa.schema(
        [("doc_a", id_type), ("doc_b", id_type), ("slot", pa.int8()), ("sh", pa.binary())]
    )


def _pair_schema(id_type: pa.DataType) -> pa.Schema:
    return pa.schema([("doc_a", id_type), ("doc_b", id_type), ("jaccard", pa.float64())])


def _verify_pairs_join(
    docs: "ray.data.Dataset",
    cand: "ray.data.Dataset",
    k: int,
    threshold: float,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Exact-Jaccard verification of candidate pairs as a BUCKETED HASH
    JOIN — no driver-side text materialization at any corpus size.

    Stage 1 co-partitions the docs table with the pair-sides (two tagged
    rows per candidate pair) by ``hash(doc_id) % num_buckets``; each bucket
    group shingles ONLY the docs a pair references (lazy memo — one
    shingling per referenced doc per bucket) and emits
    ``(doc_a, doc_b, slot, shingles-as-bytes)``. Stage 2 co-partitions by
    pair key and computes the exact Jaccard from the two shingle arrays.

    Shuffle cost: the corpus text moves through ONE bounded bucket shuffle
    (the standard hash-join price — unavoidable without a broadcast);
    everything after stage 1 is O(candidate pairs). Unreferenced docs are
    never shingled. The banding/bucketing upstream is unchanged.
    """
    from ..relational import _bucket_of

    # doc ids keep their NATIVE dtype end-to-end (int64 testdata, string
    # extraction output): the bucket hash, union schema and output schemas
    # are all derived from it, never cast. Docs rows are marked by
    # slot == -1 (doc_a/doc_b carry the row's own id as a typed filler).
    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        return pd.DataFrame(
            {
                "key": df["doc_id"].values,
                "text": df["text"].astype(object),
                "doc_a": df["doc_id"].values,
                "doc_b": df["doc_id"].values,
                "slot": np.full(n, -1, dtype=np.int8),
            }
        )

    def tag_sides(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        a = pd.DataFrame(
            {
                "key": df["doc_a"].values,
                "text": np.full(n, "", dtype=object),
                "doc_a": df["doc_a"].values,
                "doc_b": df["doc_b"].values,
                "slot": np.zeros(n, dtype=np.int8),
            }
        )
        b = a.copy()
        b["key"] = df["doc_b"].values
        b["slot"] = np.ones(n, dtype=np.int8)
        return pd.concat([a, b], ignore_index=True)

    cols = ["key", "text", "doc_a", "doc_b", "slot"]
    tagged = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(tag_docs, batch_format="pandas")
        .select_columns(cols)
        .union(
            cand.select_columns(["doc_a", "doc_b"])
            .map_batches(tag_sides, batch_format="pandas")
            .select_columns(cols)
        )
    )

    def add_doc_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = _bucket_of(df, ["key"], num_buckets)
        return df

    def attach_shingles(g: pd.DataFrame) -> pa.Table:
        id_type = pa.array(g["key"].head(1)).type  # groups are never empty
        # candidate pairs may arrive multiply (one row per LSH band hit) —
        # shingle and ship each (pair, slot) once
        side = g[g["slot"] >= 0].drop_duplicates(["doc_a", "doc_b", "slot"])
        if side.empty:
            return _side_schema(id_type).empty_table()
        texts = dict(
            zip(g.loc[g["slot"] < 0, "key"].tolist(), g.loc[g["slot"] < 0, "text"].tolist())
        )
        memo: dict = {}

        def sh(d):
            b = memo.get(d)
            if b is None:
                t = texts.get(d)
                if t is None:
                    return None  # pair references a doc absent from docs
                b = T.char_shingles_u64(t, k).tobytes()
                memo[d] = b
            return b

        shs = [sh(d) for d in side["key"].tolist()]
        present = np.array([s is not None for s in shs], dtype=bool)
        side = side[present]  # stage 2's len(sub)<2 guard drops the pair
        return pa.Table.from_pydict(
            {
                "doc_a": side["doc_a"].tolist(),
                "doc_b": side["doc_b"].tolist(),
                "slot": side["slot"].to_numpy(),
                "sh": [s for s in shs if s is not None],
            },
            schema=_side_schema(id_type),
        )

    sides = (
        tagged.map_batches(add_doc_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(attach_shingles, batch_format="pandas")
    )

    def add_pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = _bucket_of(df, ["doc_a", "doc_b"], num_buckets)
        return df

    def verify(g: pd.DataFrame) -> pa.Table:
        id_type = pa.array(g["doc_a"].head(1)).type
        out_a, out_b, out_j = [], [], []
        for (a, b), sub in g.groupby(["doc_a", "doc_b"], sort=False):
            if len(sub) < 2:
                continue  # a referenced doc is absent from the corpus
            by_slot = dict(zip(sub["slot"].tolist(), sub["sh"].tolist()))
            j = T.jaccard_u64(
                np.frombuffer(by_slot[0], dtype=np.uint64),
                np.frombuffer(by_slot[1], dtype=np.uint64),
            )
            if j >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(round(j, 6))
        return pa.Table.from_pydict(
            {"doc_a": out_a, "doc_b": out_b, "jaccard": out_j},
            schema=_pair_schema(id_type),
        )

    return (
        sides.map_batches(add_pair_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(verify, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# SimHash near-dup


def build_minhash_index(
    docs: "ray.data.Dataset",
    index_dir: str,
    k: int = 5,
    n_perm: int = 128,
    n_bands: int = 21,
) -> dict:
    """PERSIST the text-MinHash band index for CROSS-JOB near-dup dedup
    (the FineWeb cross-dump pattern: each new crawl dedupes against all
    previously indexed crawls without re-reading their text). One row per
    (band_key, doc_id), partitioned by ``bucket = band_key % 256`` (one
    directory per bucket — probes read only the buckets they hash into).
    The sidecar is three ints (k, n_perm, n_bands): signatures are
    seed-derived, so any reader reproduces the exact banding.

    Band rows are CO-LOCATED by bucket before the partitioned write (one
    groupby all-to-all, paid once at build): a plain partitioned write
    emits one file per (input block x bucket) — measured 15,716 files at
    sf0.1 (256 buckets x ~61 blocks), and the probe's read_parquet paid
    ~17s of metadata resolution alone. Co-location collapses that to one
    file per bucket; probes open exactly the files they prune to."""
    import functools
    import os

    import pyarrow.parquet as pq

    docs.map_batches(
        functools.partial(minhash_band_rows, k=k, n_perm=n_perm, n_bands=n_bands),
        batch_format="pandas",
    ).groupby("bucket").map_groups(lambda df: df, batch_format="pandas").write_parquet(
        index_dir, partition_cols=["bucket"]
    )
    pq.write_table(
        pa.table({"k": [k], "n_perm": [n_perm], "n_bands": [n_bands]}),
        os.path.join(index_dir, "_meta.parquet"),
    )
    return {"k": k, "n_perm": n_perm, "n_bands": n_bands}


def append_minhash_index(docs: "ray.data.Dataset", index_dir: str) -> None:
    """Fold another shard's band rows into an existing index (new parquet
    files land inside the same bucket directories; nothing is rewritten).
    Banding knobs come from the sidecar so every shard hashes
    identically."""
    import functools
    import os

    import pyarrow.parquet as pq

    meta = pq.read_table(os.path.join(index_dir, "_meta.parquet")).to_pydict()
    docs.map_batches(
        functools.partial(
            minhash_band_rows,
            k=int(meta["k"][0]),
            n_perm=int(meta["n_perm"][0]),
            n_bands=int(meta["n_bands"][0]),
        ),
        batch_format="pandas",
    ).groupby("bucket").map_groups(lambda df: df, batch_format="pandas").write_parquet(
        index_dir, partition_cols=["bucket"]
    )


def dedup_minhash_incremental(
    new_docs: "ray.data.Dataset",
    index_dir: str,
    threshold: float = 0.6,
) -> "ray.data.Dataset":
    """Incremental near-dup dedup of a NEW shard against a persisted band
    index plus itself: survivors are new docs that (1) are the min-doc_id
    keeper of their within-shard verified near-dup cluster and (2) share
    NO band with any indexed document.

    Within-shard drops are exact-Jaccard VERIFIED (texts are at hand);
    cross-job drops are banding-only — the index stores band keys, not
    text, so a collision stands in for 'near-dup at the index threshold'
    (the 21x6 default puts the S-curve midpoint at 0.6; the false-match
    rate is the documented price of not persisting corpus text). The
    probe is one bucketed co-location of new band rows with ONLY the
    bucket directories the new shard hashes into (file-pruned read); the
    cross-drop set is O(#matching docs), broadcast like every drop set."""
    import functools
    import glob
    import os

    import pyarrow.parquet as pq

    from ..relational import bucketed_group_merge

    meta = pq.read_table(os.path.join(index_dir, "_meta.parquet")).to_pydict()
    kk, n_perm, n_bands = (
        int(meta["k"][0]),
        int(meta["n_perm"][0]),
        int(meta["n_bands"][0]),
    )

    new_bands = new_docs.map_batches(
        functools.partial(minhash_band_rows, k=kk, n_perm=n_perm, n_bands=n_bands),
        batch_format="pandas",
    ).materialize()

    # file-pruned probe: only bucket dirs the new shard hashes into
    present = sorted(
        set(
            new_bands.map_batches(
                lambda df: df[["bucket"]].drop_duplicates(), batch_format="pandas"
            ).to_pandas()["bucket"]
        )
    )
    files = [
        f
        for b in present
        for f in glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet"))
    ]
    if files:
        idx = ray.data.read_parquet(files, columns=["band_key", "doc_id"])
        tagged_idx = idx.map_batches(
            lambda df: pd.DataFrame(
                {"band_key": df["band_key"], "doc_id": df["doc_id"], "side": np.int8(0)}
            ),
            batch_format="pandas",
        )
        tagged_new = new_bands.map_batches(
            lambda df: pd.DataFrame(
                {"band_key": df["band_key"], "doc_id": df["doc_id"], "side": np.int8(1)}
            ),
            batch_format="pandas",
        )

        def hits(g: pd.DataFrame) -> pd.DataFrame:
            indexed = set(g.loc[g["side"] == 0, "band_key"].tolist())
            if not indexed:
                return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
            m = g.loc[
                (g["side"] == 1) & g["band_key"].isin(indexed), ["doc_id"]
            ].drop_duplicates()
            return m

        hit_df = bucketed_group_merge(
            tagged_idx.union(tagged_new), ["band_key"], hits, num_buckets=64
        ).to_pandas()
        cross_drop = (
            frozenset()
            if hit_df.empty or "doc_id" not in hit_df.columns
            else frozenset(hit_df["doc_id"].tolist())
        )
    else:  # nothing indexed in these buckets
        cross_drop = frozenset()

    # within-shard verified dedup (texts available), then the cross drop
    pairs = minhash_lsh_pairs(
        new_docs, threshold=threshold, k=kk, n_perm=n_perm, n_bands=n_bands
    ).select_columns(["doc_a", "doc_b"])
    kept = apply_neardup_dedup(new_docs, pairs)
    ref = ray.put(cross_drop)

    class DropIndexed:
        def __init__(self, r):
            self.drop = ray.get(r)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if not self.drop:
                return df
            return df[~df["doc_id"].isin(self.drop)]

    return kept.map_batches(
        DropIndexed,
        fn_constructor_kwargs={"r": ref},
        batch_format="pandas",
        concurrency=(1, pool_max()),
    )


def simhash_pairs(
    docs: "ray.data.Dataset", max_hamming: int = 3, hash_name: str = "blake2b"
) -> "ray.data.Dataset":
    """Pairs with SimHash hamming distance <= max_hamming (64-bit, word
    2-grams), blocked by 16-bit chunks (pigeonhole-complete for <=3).
    hash_name="md5" makes the fingerprints (hence the pair list)
    SQL-replayable — the oracle needs no blocking at test scale since
    the chunk blocking is candidate-complete for <=3."""

    def sigs(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"chunk_id": [], "chunk_val": [], "doc_id": [], "simhash": [], "bucket": []}
        for did, txt in zip(df["doc_id"].tolist(), df["text"].tolist()):
            h = T.simhash64(txt, hash_name=hash_name)
            for ci, cv in enumerate(T.simhash_chunks(h)):
                rows["chunk_id"].append(ci)
                rows["chunk_val"].append(cv)
                rows["doc_id"].append(did)
                rows["simhash"].append(h)
                rows["bucket"].append((ci * 65536 + cv) % 256)  # coarse shuffle key
        return pd.DataFrame(rows)

    blocked = docs.map_batches(sigs, batch_format="pandas")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_a": [], "doc_b": [], "hamming": []}
        for _, sub in g.groupby(["chunk_id", "chunk_val"], sort=False):
            recs = sorted(set(zip(sub["doc_id"].tolist(), sub["simhash"].tolist())))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    d = T.hamming64(recs[i][1], recs[j][1])
                    if d <= max_hamming:
                        out["doc_a"].append(recs[i][0])
                        out["doc_b"].append(recs[j][0])
                        out["hamming"].append(d)
        return pd.DataFrame(out)

    from ..relational import bucketed_group_merge

    cand = blocked.groupby("bucket").map_groups(pairs, batch_format="pandas")
    return bucketed_group_merge(
        cand,
        ["doc_a", "doc_b"],
        lambda df: df.groupby(["doc_a", "doc_b"], sort=False)
        .agg(hamming=("hamming", "min"))
        .reset_index(),
    )


# --------------------------------------------------------------------------
# n-gram Jaccard within source blocks


def ngram_jaccard_pairs(
    docs: "ray.data.Dataset", n: int = 1, threshold: float = 0.5
) -> "ray.data.Dataset":
    """All-pairs word-n-gram Jaccard within each ``source`` block.

    Blocking bounds the quadratic term to the block size; at corpus scale
    the block key would be (source, length-bucket) with hot blocks salted.
    """

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        recs = sorted(zip(g["doc_id"].tolist(), g["text"].tolist()))
        sets = [T.word_ngrams(t, n) for _, t in recs]
        src = g["source"].iloc[0]
        out = {"source": [], "doc_a": [], "doc_b": [], "jaccard": []}
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                jac = T.jaccard(sets[i], sets[j])
                if jac >= threshold:
                    out["source"].append(src)
                    out["doc_a"].append(recs[i][0])
                    out["doc_b"].append(recs[j][0])
                    out["jaccard"].append(round(jac, 6))
        return pd.DataFrame(out)

    return docs.groupby("source").map_groups(pairs, batch_format="pandas")


def containment_pairs(
    docs: "ray.data.Dataset", n: int = 1, threshold: float = 0.9
) -> "ray.data.Dataset":
    """ASYMMETRIC near-dup detection: Broder containment
    ``|Sa ∩ Sb| / |Sa|`` over word-n-gram sets within each ``source``
    block — the metric that catches a document CONTAINED in a larger one
    (quoted article inside a wrapper page, boilerplate-wrapped reposts),
    where Jaccard is diluted by the size ratio and never fires.

    Emits ORDERED rows (doc_a contained-in doc_b, a != b) at containment
    >= ``threshold``; a pair of mutual near-dups yields both directions.
    Empty n-gram sets are vacuously contained (containment 1.0), the
    :func:`functions.text.jaccard` convention. Same blocking contract as
    :func:`ngram_jaccard_pairs`: the block key bounds the quadratic term;
    at corpus scale block on (source, length-bucket) and salt hot blocks.
    """

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        recs = sorted(zip(g["doc_id"].tolist(), g["text"].tolist()))
        sets = [T.word_ngrams(t, n) for _, t in recs]
        src = g["source"].iloc[0]
        out = {"source": [], "doc_a": [], "doc_b": [], "containment": []}
        for i in range(len(recs)):
            for j in range(len(recs)):
                if i == j:
                    continue
                inter = len(sets[i] & sets[j])
                c = 1.0 if not sets[i] else inter / len(sets[i])
                if c >= threshold:
                    out["source"].append(src)
                    out["doc_a"].append(recs[i][0])
                    out["doc_b"].append(recs[j][0])
                    out["containment"].append(round(c, 6))
        # typed even when empty: a no-match group must not emit an
        # all-float64 frame that can fail block schema unification
        return pd.DataFrame(
            {
                "source": pd.Series(out["source"], dtype="object"),
                "doc_a": pd.Series(out["doc_a"], dtype=g["doc_id"].dtype),
                "doc_b": pd.Series(out["doc_b"], dtype=g["doc_id"].dtype),
                "containment": pd.Series(out["containment"], dtype="float64"),
            }
        )

    return docs.groupby("source").map_groups(pairs, batch_format="pandas")


# --------------------------------------------------------------------------
# embedding-cosine near-dup within label blocks


def semantic_dedup(
    emb: "ray.data.Dataset",
    n_clusters: int = 16,
    threshold: float = 0.95,
    train_sample_budget: int = 65536,
) -> "ray.data.Dataset":
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup in
    embedding space. (1) spherical k-means clusters the corpus — bounded
    driver-side training sample, broadcast centroids, streaming assign
    (reuses the IVF machinery in ``stages.similarity``); (2) WITHIN each
    cluster only, exact pairwise cosine finds near-dup groups (connected
    components at >= ``threshold``); (3) each group keeps ONE
    representative — the member LEAST similar to the cluster centroid
    (the paper's keep-low-centroid-similarity rule: prefer the atypical
    example), lowest vec_id on ties.

    Scale shape: the quadratic all-pairs cost drops from O(n^2) to
    sum_c O(|c|^2) — size ``n_clusters`` ~ corpus / target_cell_size so
    cells stay bounded (the paper runs 110k clusters on LAION); ONE
    ``groupby(cell)`` shuffle moves each vector once. Deterministic
    across block layouts and cluster sizes: centroids are trained on an
    id-canonicalized bounded sample and each cell's pass sorts by vec_id.

    Output: (vec_id, cell, keep) for every vector — keep=False marks the
    semantic duplicates to drop.
    """
    from .similarity import _as_matrix, _norm_rows, ivf_assign, train_ivf_centroids

    cents = _norm_rows(
        np.asarray(
            train_ivf_centroids(emb, n_clusters, train_sample_budget),
            dtype=np.float64,
        )
    )
    cref = ray.put(cents)
    assigned = ivf_assign(emb, cents)

    def dedup_cell(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        cell = int(g["cell"].iloc[0])
        m = _norm_rows(_as_matrix(g["embedding"]))
        sim = m @ m.T
        n = len(ids)
        parent = np.arange(n)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        iu, ju = np.where(np.triu(sim >= threshold, k=1))
        for i, j in zip(iu.tolist(), ju.tolist()):
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
        root = np.array([find(i) for i in range(n)])
        cent_sim = m @ ray.get(cref)[cell]
        keep = np.zeros(n, dtype=bool)
        for r in np.unique(root):
            members = np.where(root == r)[0]
            # ids pre-sorted -> argmin ties resolve to the lowest vec_id
            keep[members[int(np.argmin(cent_sim[members]))]] = True
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": np.full(n, cell, dtype=np.int32),
                "keep": keep,
            }
        )

    return assigned.groupby("cell").map_groups(dedup_cell, batch_format="pandas")


def embedding_neardup_pairs(
    emb: "ray.data.Dataset", threshold: float = 0.95
) -> "ray.data.Dataset":
    """Pairs with cosine similarity >= threshold within each label block
    (numpy matmul per block; float64, rounded to 6 decimals)."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        sim = mn @ mn.T
        iu = np.triu_indices(len(ids), k=1)
        mask = sim[iu] >= threshold
        return pd.DataFrame(
            {
                "vec_a": ids[iu[0][mask]],
                "vec_b": ids[iu[1][mask]],
                "cosine": np.round(sim[iu][mask], 6),
            }
        )

    return emb.groupby("label").map_groups(pairs, batch_format="pandas")


def _levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance (matches DuckDB's ``levenshtein`` exactly)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != b[j - 1])
            )
        prev = cur
    return prev[lb]


def fuzzy_pairs(
    ds: "ray.data.Dataset",
    block: str,
    name: str,
    max_dist: int = 1,
) -> "ray.data.Dataset":
    """Record-linkage fuzzy matching: pairs of DISTINCT ``name`` values
    within each ``block`` whose edit distance is <= ``max_dist``, each
    side carrying its row count.

    Scale shape (the classic blocking + dictionary design): per-batch
    (block, name, count) partials — repeated names never leave the task —
    then ONE ``groupby(block)`` shuffle; inside each block the quadratic
    DP runs over the block's DISTINCT-NAME DICTIONARY only (names repeat
    heavily in entity data: 64 distinct over 20k rows here), never over
    rows. Blocking is the caller's recall contract, as in record-linkage
    practice (cross-block near-matches are not compared).

    Output: (block, name_a, name_b, dist, n_a, n_b) with name_a < name_b.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby([block, name], sort=False)
            .size()
            .rename("_n")
            .reset_index()
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        counts = g.groupby(name, sort=False)["_n"].sum()
        names = sorted(counts.index.tolist())
        bval = g[block].iloc[0]
        rows = []
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                d = _levenshtein(names[i], names[j])
                if d <= max_dist:
                    rows.append(
                        {
                            block: bval,
                            "name_a": names[i],
                            "name_b": names[j],
                            "dist": np.int64(d),
                            "n_a": np.int64(counts[names[i]]),
                            "n_b": np.int64(counts[names[j]]),
                        }
                    )
        if not rows:
            return pd.DataFrame(
                {
                    block: pd.Series([], dtype=g[block].dtype),
                    "name_a": pd.Series([], dtype=object),
                    "name_b": pd.Series([], dtype=object),
                    "dist": pd.Series([], dtype="int64"),
                    "n_a": pd.Series([], dtype="int64"),
                    "n_b": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(rows)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(block)
        .map_groups(pairs, batch_format="pandas")
    )
