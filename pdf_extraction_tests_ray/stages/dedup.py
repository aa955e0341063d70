"""Corpus deduplication operators (exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine) as Ray Data pipelines.

Scale notes (every operator documents its shuffle):
- exact: vectorized hash per batch + PER-BATCH PRE-AGGREGATION, then one
  small ``groupby(hash)`` over partials — the canonical pre-aggregate
  pattern (the shuffle moves one row per distinct hash per batch, not one
  per document).
- minhash-lsh: signature per batch -> explode to (band_key, doc_id) rows ->
  ``groupby(band_key)`` -> within-bucket candidate pairs -> pair-level dedup
  -> verify exact Jaccard with a broadcast doc->text lookup (``ray.put``
  once; at 10^12 scale verification becomes a bucketed hash join instead —
  the blocking/banding structure is unchanged).
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


def apply_exact_dedup(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Corpus hygiene end-to-end: keep exactly one document (min doc_id)
    per distinct normalized text. The keep-list from :func:`exact_dedup`
    is a SMALL result (one row per distinct text) -> broadcast semi-join:
    ``ray.put`` the keep set once, filter every batch against it. No
    second shuffle over the corpus."""
    keep_df = exact_dedup(docs).to_pandas()  # small: distinct texts only
    keep_ref = ray.put(frozenset(keep_df["keep_doc_id"].tolist()))

    class KeepFilter:
        def __init__(self, ref):
            self.keep = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df[df["doc_id"].isin(self.keep)]

    return docs.map_batches(
        KeepFilter,
        fn_constructor_kwargs={"ref": keep_ref},
        batch_format="pandas",
        concurrency=(1, pool_max()),
    )


# --------------------------------------------------------------------------
# MinHash + LSH near-dup


def minhash_band_rows(
    df: pd.DataFrame, k: int = 5, n_perm: int = 128, n_bands: int = 32
) -> pd.DataFrame:
    """Emit (band_key, doc_id) rows per document. Stateless task fn — the
    permutation constants are module-level (per-worker import-cached), so
    an actor pool would only cap elasticity (CLAUDE.md actor-pool note)."""
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
    n_bands: int = 32,
) -> "ray.data.Dataset":
    """Verified near-duplicate pairs (doc_a, doc_b, jaccard>=threshold)."""
    import functools

    bands = docs.map_batches(
        functools.partial(minhash_band_rows, k=k, n_perm=n_perm, n_bands=n_bands),
        batch_format="pandas",
    )
    from ..relational import bucketed_group_merge

    cand = bands.groupby("bucket").map_groups(_bucket_pairs, batch_format="pandas")
    # a pair can surface from several bands -> dedup pairs (bucketed merge:
    # pair keys are high-cardinality)
    cand = bucketed_group_merge(
        cand,
        ["doc_a", "doc_b"],
        lambda df: df.groupby(["doc_a", "doc_b"], sort=False)
        .size()
        .rename("n_bands_hit")
        .reset_index(),
    )

    # broadcast the small side for verification (ray.put ONCE, read per actor)
    lookup_ref = ray.put(dict(zip(*_collect_texts(docs))))

    class Verify:
        def __init__(self, ref, k, thr):
            self.texts = ray.get(ref)
            self.k, self.thr = k, thr
            self._shingles: dict = {}  # per-actor memo: each doc shingled once

        def _sh(self, doc_id):
            s = self._shingles.get(doc_id)
            if s is None:
                s = T.char_shingles_u64(self.texts[doc_id], self.k)
                self._shingles[doc_id] = s
            return s

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            out = {"doc_a": [], "doc_b": [], "jaccard": []}
            for a, b in zip(df["doc_a"].tolist(), df["doc_b"].tolist()):
                j = T.jaccard_u64(self._sh(a), self._sh(b))
                if j >= self.thr:
                    out["doc_a"].append(a)
                    out["doc_b"].append(b)
                    out["jaccard"].append(round(j, 6))
            return pd.DataFrame(out)

    return cand.map_batches(
        Verify,
        fn_constructor_kwargs={"ref": lookup_ref, "k": k, "thr": threshold},
        batch_format="pandas",
        concurrency=(1, pool_max()),
    )


def _collect_texts(docs):
    """Driver-side collect of (doc_id, text) — valid ONLY for the broadcast
    small side; at corpus scale replace with a bucketed join."""
    ids, texts = [], []
    for b in docs.select_columns(["doc_id", "text"]).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        ids.extend(b.column("doc_id").to_pylist())
        texts.extend(b.column("text").to_pylist())
    return ids, texts


# --------------------------------------------------------------------------
# SimHash near-dup


def simhash_pairs(docs: "ray.data.Dataset", max_hamming: int = 3) -> "ray.data.Dataset":
    """Pairs with SimHash hamming distance <= max_hamming (64-bit, word
    2-grams), blocked by 16-bit chunks (pigeonhole-complete for <=3)."""

    def sigs(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"chunk_id": [], "chunk_val": [], "doc_id": [], "simhash": [], "bucket": []}
        for did, txt in zip(df["doc_id"].tolist(), df["text"].tolist()):
            h = T.simhash64(txt)
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


# --------------------------------------------------------------------------
# embedding-cosine near-dup within label blocks


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
