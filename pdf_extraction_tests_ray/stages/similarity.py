"""Similarity search over an embedding column (list<float>).

- ``knn_bruteforce``: exact top-k cosine — the query matrix is broadcast
  once via ``ray.put``; each batch does one numpy matmul and emits its
  LOCAL top-k, and a final tiny sort+limit reduces the per-batch
  candidates. The shuffle moves k rows per batch, never the corpus.
- ``knn_lsh``: multi-table sign-random-projection LSH — each vector is
  bucketed by seeded hyperplane signatures in ``n_tables`` independent
  tables; the query probes matching buckets (margin-ranked multi-probe,
  ``_probe_buckets``) and a vector is a candidate if ANY table hits.
  Approximate: the scale path. Measured recall@10 vs brute force at the
  round-4 defaults: 1.0 at 10k clustered vectors, 0.93 on the real sf0.1
  embeddings (BASELINE.md round-4 table).
- ``knn_ivf``: recall on CLUSTERED data is ~1.0 even at nprobe=2/16
  (measured, 10k x 20 clusters); on the UNSTRUCTURED synthetic testdata
  embeddings every space partitioning has a linear recall/scan tradeoff
  (neighbors aren't concentrated in any cell), so the default nprobe=10
  buys recall 0.90 at ~0.63 corpus scanned there — dual-assignment was
  measured equivalent, not better, on such data and is deliberately not
  implemented.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from ..relational import pool_max


def _as_matrix(col) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in col])


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


# per-WORKER-process object cache: ray.get of a pickled Python object
# (e.g. a shortlist id set) re-deserializes on every call, so a keep()
# closure doing ray.get per batch pays that for each batch (ADVICE r4).
# Bounded: cleared when it outgrows a handful of live broadcasts.
_OBJ_CACHE: dict = {}


def _worker_cached_get(ref):
    key = ref.hex()
    if key not in _OBJ_CACHE:
        if len(_OBJ_CACHE) > 32:
            _OBJ_CACHE.clear()
        _OBJ_CACHE[key] = ray.get(ref)
    return _OBJ_CACHE[key]


def quantize_int8(emb: "ray.data.Dataset") -> "ray.data.Dataset":
    """Symmetric int8 vector quantization (the ANN-index / embedding-store
    compression path: 4x smaller than float32, 8x than float64): per
    vector, scale = 127/max|v| and q_i = floor(v_i * scale + 0.5) —
    a pure per-row map, no shuffle, streaming at any scale.

    Output (vec_id, scale, q_str) with q_str the ' '-joined int codes
    (string-typed so the driver's value hash is exact); every float op
    (double upcast, 127/amax, floor(x*scale+0.5)) is mirrored verbatim
    by the SQL oracle."""

    def q(df: pd.DataFrame) -> pd.DataFrame:
        m = _as_matrix(df["embedding"])
        amax = np.abs(m).max(axis=1)
        scale = np.where(amax > 0, 127.0 / np.where(amax > 0, amax, 1.0), 0.0)
        codes = np.floor(m * scale[:, None] + 0.5).astype(np.int64)
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].to_numpy(),
                "scale": np.round(scale, 6),
                "q_str": [" ".join(map(str, row)) for row in codes],
            }
        )

    return emb.map_batches(q, batch_format="pandas")


def knn_bruteforce(
    emb: "ray.data.Dataset", query_vec, k: int = 10, exclude_vec_id=None
) -> "ray.data.Dataset":
    """Top-k (vec_id, cos_sim) for one query vector; deterministic ties by
    vec_id ascending. cos rounded to 6 decimals AFTER selection."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    class LocalTopK:
        def __init__(self, ref, k, exclude):
            self.q = ray.get(ref)
            self.k = k
            self.exclude = exclude

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if self.exclude is not None:
                df = df[df["vec_id"] != self.exclude]
            if df.empty:
                return pd.DataFrame({"vec_id": [], "cos_sim": []})
            m = _norm_rows(_as_matrix(df["embedding"]))
            sims = m @ self.q
            order = np.lexsort((df["vec_id"].to_numpy(), -sims))[: self.k]
            return pd.DataFrame(
                {
                    "vec_id": df["vec_id"].to_numpy()[order],
                    "cos_sim": sims[order],
                }
            )

    local = emb.map_batches(
        LocalTopK,
        fn_constructor_kwargs={"ref": q_ref, "k": k, "exclude": exclude_vec_id},
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, pool_max()),
    )
    top = local.sort(["cos_sim", "vec_id"], descending=[True, False]).limit(k)
    return top.map_batches(
        lambda df: df.assign(cos_sim=np.round(df["cos_sim"], 6)), batch_format="pandas"
    )


def knn_bruteforce_multi(
    emb: "ray.data.Dataset", query_ids, query_mat, k: int = 10
) -> "ray.data.Dataset":
    """Batched brute-force ANN: top-k per query via ONE matmul per batch
    against a broadcast (n_queries, dim) matrix (``ray.put`` once, read in
    every task — never re-shipped per batch). Self-matches (vec_id ==
    query id) are excluded. Per-batch local top-k keeps the shuffle to
    k rows per (query, batch); the final grouped top-k merges survivors."""
    qids = np.asarray(query_ids, dtype=np.int64)
    qm = _norm_rows(np.asarray(query_mat, dtype=np.float64))
    q_ref = ray.put((qids, qm))

    class LocalTopK:
        def __init__(self, ref, k):
            self.qids, self.qm = ray.get(ref)
            self.k = k

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame({"query_id": [], "vec_id": [], "cos_sim": []})
            vec_ids = df["vec_id"].to_numpy()
            m = _norm_rows(_as_matrix(df["embedding"]))
            sims = m @ self.qm.T  # (batch, n_queries)
            out_q, out_v, out_s = [], [], []
            for j, qid in enumerate(self.qids):
                s = sims[:, j]
                mask = vec_ids != qid
                vi, si = vec_ids[mask], s[mask]
                order = np.lexsort((vi, -si))[: self.k]
                out_q.append(np.full(len(order), qid, dtype=np.int64))
                out_v.append(vi[order])
                out_s.append(si[order])
            return pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "vec_id": np.concatenate(out_v),
                    "cos_sim": np.concatenate(out_s),
                }
            )

    local = emb.map_batches(
        LocalTopK,
        fn_constructor_kwargs={"ref": q_ref, "k": k},
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, pool_max()),
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos_sim", "vec_id"], ascending=[False, True], kind="stable").head(k)
        return g.assign(cos_sim=np.round(g["cos_sim"], 6))

    return local.groupby("query_id").map_groups(final, batch_format="pandas")


_N_PLANES = 12
_LSH_RNG = np.random.default_rng(np.random.SeedSequence([777]))


def _planes(dim: int, n_planes: int = _N_PLANES) -> np.ndarray:
    rng = np.random.default_rng(np.random.SeedSequence([777, dim]))
    return rng.standard_normal((n_planes, dim))


def _adaptive_n_planes(n_vectors: int, target_bucket: int = 64) -> int:
    """Size the hyperplane count so an average bucket holds ~target_bucket
    vectors: too many planes on a small corpus leaves probed buckets empty
    (recall collapses); too few on a big one degrades to brute force."""
    if n_vectors <= target_bucket:
        return 2
    return max(2, min(_N_PLANES, int(np.log2(n_vectors / target_bucket)) + 1))


def _signature(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    return (bits.astype(np.uint32) << np.arange(planes.shape[0], dtype=np.uint32)).sum(axis=1)


def _probe_buckets(qn: np.ndarray, planes: np.ndarray, probes: int) -> np.ndarray:
    """Margin-ranked MULTI-PROBE bucket set (Lv et al., VLDB 2007): rank
    perturbation sets — subsets of up to 3 flips over the 8 lowest-margin
    planes — by summed |margin| and take the ``probes`` best, home bucket
    included. Replaces the round-3 single-bit-flip probing (recall on the
    real sf0.1 embeddings: 0.72 -> 0.93 at probes=8 with ~1.6x candidate
    volume; BASELINE.md round-4 table) because the next-likeliest bucket
    after the single flips is a DOUBLE flip of two near-zero margins, not
    a single flip of a large one. Deterministic: ties in summed margin
    break on the flip tuple."""
    from itertools import combinations

    q_sig = int(_signature(qn[None, :], planes)[0])
    margins = np.abs(qn @ planes.T)
    low = np.argsort(margins)[: min(8, len(margins))].tolist()
    ranked = [(0.0, ())]
    for r in (1, 2, 3):
        for combo in combinations(low, r):
            ranked.append((float(margins[list(combo)].sum()), combo))
    ranked.sort(key=lambda x: (x[0], x[1]))
    out = set()
    for _, combo in ranked[: max(1, probes)]:
        s = q_sig
        for b in combo:
            s ^= 1 << int(b)
        out.add(s)
    return np.asarray(sorted(out), dtype=np.uint32)


def knn_lsh(
    emb: "ray.data.Dataset",
    query_vec,
    k: int = 10,
    exclude_vec_id=None,
    probes: int = 8,
    n_planes: int | None = None,
    n_tables: int = 4,
) -> "ray.data.Dataset":
    """Approximate top-k via multi-table sign-random-projection LSH.

    ``n_tables`` independent hyperplane tables; a vector is a candidate if
    ANY table maps it into the query's probed buckets — the ``probes``
    margin-ranked multi-probe perturbations per table (home bucket plus
    the likeliest flip SETS, :func:`_probe_buckets`). Recall/latency
    knobs: ``n_tables`` (recall, costs a signature matmul per table) and
    ``probes`` (recall, costs only extra candidate sims — the cheap
    lever); ``n_planes`` defaults adaptive to corpus size via one
    metadata-only ``count()`` (parquet row counts, no data scan) so an
    average bucket holds ~64 vectors at any scale. Defaults measured at
    recall@10 >= 0.9 vs knn_bruteforce (pinned in tests; BASELINE.md)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    dim = q.shape[0]
    if n_planes is None:
        n_planes = _adaptive_n_planes(emb.count())
    tables = []
    for t in range(n_tables):
        rng = np.random.default_rng(np.random.SeedSequence([777, dim, t]))
        planes = rng.standard_normal((n_planes, dim))
        tables.append((planes, _probe_buckets(qn, planes, probes)))
    probe_ref = ray.put((qn, tables))

    class ProbeTopK:
        def __init__(self, ref, k, exclude):
            self.q, self.tables = ray.get(ref)
            self.k, self.exclude = k, exclude

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if self.exclude is not None:
                df = df[df["vec_id"] != self.exclude]
            if df.empty:
                return pd.DataFrame({"vec_id": [], "cos_sim": []})
            m = _norm_rows(_as_matrix(df["embedding"]))
            mask = np.zeros(len(m), dtype=bool)
            for planes, probe_sigs in self.tables:
                mask |= np.isin(_signature(m, planes), probe_sigs)
            if not mask.any():
                return pd.DataFrame({"vec_id": [], "cos_sim": []})
            sims = m[mask] @ self.q
            ids = df["vec_id"].to_numpy()[mask]
            order = np.lexsort((ids, -sims))[: self.k]
            return pd.DataFrame({"vec_id": ids[order], "cos_sim": sims[order]})

    local = emb.map_batches(
        ProbeTopK,
        fn_constructor_kwargs={"ref": probe_ref, "k": k, "exclude": exclude_vec_id},
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, pool_max()),
    )
    top = local.sort(["cos_sim", "vec_id"], descending=[True, False]).limit(k)
    return top.map_batches(
        lambda df: df.assign(cos_sim=np.round(df["cos_sim"], 6)), batch_format="pandas"
    )


def build_lsh_index(
    emb: "ray.data.Dataset",
    index_dir: str,
    n_tables: int = 4,
    n_planes: int | None = None,
) -> dict:
    """PERSIST the multi-table LSH index: every vector is written once
    per table, partitioned by ``(table, bucket)`` — one directory per
    hash bucket, ×``n_tables`` storage (the standard LSH space/recall
    trade). The sidecar ``_meta.parquet`` is three ints (dim, n_planes,
    n_tables): plane matrices are seed-derived from (dim, table), so the
    index needs no matrix storage and any reader reconstructs the exact
    hash. Build once, serve many queries via :func:`knn_lsh_index` with
    file-level pruned reads of only the probed buckets."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if n_planes is None:
        n_planes = _adaptive_n_planes(emb.count())
    head = emb.limit(1).to_pandas()
    dim = int(len(np.asarray(head["embedding"].iloc[0])))
    planes_by_t = [_table_planes(dim, t, n_planes) for t in range(n_tables)]
    pref = ray.put(planes_by_t)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"vec_id": [], "embedding": [], "table": [], "bucket": []}
            )
        m = _norm_rows(_as_matrix(df["embedding"]))
        outs = []
        for t, planes in enumerate(ray.get(pref)):
            outs.append(
                pd.DataFrame(
                    {
                        "vec_id": df["vec_id"].to_numpy(),
                        "embedding": df["embedding"].to_numpy(),
                        "table": np.full(len(df), t, dtype=np.int16),
                        "bucket": _signature(m, planes).astype("int64"),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    emb.map_batches(explode, batch_format="pandas").write_parquet(
        index_dir, partition_cols=["table", "bucket"]
    )
    pq.write_table(
        pa.table({"dim": [dim], "n_planes": [n_planes], "n_tables": [n_tables]}),
        os.path.join(index_dir, "_meta.parquet"),
    )
    return {"dim": dim, "n_planes": n_planes, "n_tables": n_tables}


def _table_planes(dim: int, t: int, n_planes: int) -> np.ndarray:
    """The (dim, table)-seeded hyperplanes — the SAME derivation
    :func:`knn_lsh` uses, so in-memory and persisted probing hash
    identically."""
    rng = np.random.default_rng(np.random.SeedSequence([777, dim, t]))
    return rng.standard_normal((n_planes, dim))


def knn_lsh_index(
    index_dir: str,
    query_vec,
    k: int = 10,
    exclude_vec_id=None,
    probes: int = 8,
) -> "ray.data.Dataset":
    """ANN over a PERSISTED (table, bucket)-partitioned LSH index
    (:func:`build_lsh_index` output): reconstruct each table's planes
    from the 3-int sidecar, probe the query's ``probes`` margin-ranked
    multi-probe buckets per table (:func:`_probe_buckets` — the same set
    the in-memory twin scans), and read ONLY those buckets' partition
    directories — query cost scales with the probed buckets' share of
    the corpus. Candidates dedupe by vec_id (a vector probed in several
    tables must not occupy two top-k slots) before the exact-cosine final
    top-k; the result set equals :func:`knn_lsh` with the same knobs
    (pinned in tests)."""
    import glob
    import os

    import pyarrow.parquet as pq

    meta = pq.read_table(os.path.join(index_dir, "_meta.parquet")).to_pydict()
    dim, n_planes, n_tables = (
        int(meta["dim"][0]),
        int(meta["n_planes"][0]),
        int(meta["n_tables"][0]),
    )
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    paths = []
    for t in range(n_tables):
        planes = _table_planes(dim, t, n_planes)
        for s in _probe_buckets(qn, planes, probes).tolist():
            paths.extend(
                sorted(
                    glob.glob(
                        os.path.join(index_dir, f"table={t}", f"bucket={s}", "*.parquet")
                    )
                )
            )
    if not paths:  # every probed bucket empty
        return ray.data.from_pandas(
            pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                          "cos_sim": pd.Series([], dtype="float64")})
        )
    cand = ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
    ref = ray.put(qn)

    class TopK:
        def __init__(self, ref, k, exclude):
            self.q = ray.get(ref)
            self.k, self.exclude = k, exclude

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if self.exclude is not None:
                df = df[df["vec_id"] != self.exclude]
            df = df.drop_duplicates("vec_id")
            if df.empty:
                return pd.DataFrame({"vec_id": [], "cos_sim": []})
            m = _norm_rows(_as_matrix(df["embedding"]))
            sims = m @ self.q
            ids = df["vec_id"].to_numpy()
            order = np.lexsort((ids, -sims))[: self.k]
            return pd.DataFrame({"vec_id": ids[order], "cos_sim": sims[order]})

    local = cand.map_batches(
        TopK,
        fn_constructor_kwargs={"ref": ref, "k": k, "exclude": exclude_vec_id},
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, pool_max()),
    )
    # cross-table dedupe: <= k rows per batch reach this tiny shuffle
    deduped = local.groupby("vec_id").map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
    top = deduped.sort(["cos_sim", "vec_id"], descending=[True, False]).limit(k)
    return top.map_batches(
        lambda df: df.assign(cos_sim=np.round(df["cos_sim"], 6)), batch_format="pandas"
    )


def _train_centroids(sample: np.ndarray, n_centroids: int, iters: int = 10) -> np.ndarray:
    """Deterministic SPHERICAL k-means on a driver-side sample: seeded
    greedy farthest-point init, fixed iteration count, no RNG in the loop.

    Centroids are re-normalized to unit length after every mean update, so
    train-time assignment (argmin Euclidean to unit centroids over unit
    points == argmax cosine) uses the SAME rule as probe-time cosine
    assignment — a train/probe metric mismatch shifts cell membership and
    degrades recall."""
    rng = np.random.default_rng(np.random.SeedSequence([424242, sample.shape[1]]))
    cents = [sample[int(rng.integers(len(sample)))]]
    # incremental running min keeps init O(k*N*d), not O(k^2*N*d) — the
    # distance vector per centroid is computed identically, so the
    # elementwise minimum is bit-equal to the old stacked np.min (the
    # adaptive ~4*sqrt(N) cell counts made the quadratic form visible:
    # ~5s at k=283/N=5k; this form is milliseconds)
    d_min = np.sum((sample - cents[0]) ** 2, axis=1)
    for _ in range(n_centroids - 1):
        nxt = sample[int(np.argmax(d_min))]  # farthest-point: deterministic
        cents.append(nxt)
        np.minimum(d_min, np.sum((sample - nxt) ** 2, axis=1), out=d_min)
    cents = _norm_rows(np.array(cents))
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)  # cosine on unit rows
        for j in range(n_centroids):
            m = assign == j
            if m.any():
                cents[j] = sample[m].mean(axis=0)
        cents = _norm_rows(cents)  # spherical: keep centroids unit-length
    return cents


def train_ivf_centroids(
    emb: "ray.data.Dataset",
    n_centroids: int = 16,
    train_sample_budget: int = 65536,
) -> np.ndarray:
    """Fit IVF cell centroids on a BOUNDED deterministic sample.

    The sample modulus scales with the corpus: one metadata-only
    ``count()`` (parquet row counts, no data scan) sizes
    ``vec_id % mod == 0`` so at most ~``train_sample_budget`` vectors ever
    reach the driver — the sample stays the small side at 10^12 vectors,
    unlike a fixed modulus whose sample grows O(corpus)."""
    n_total = emb.count()
    if n_total == 0:
        raise ValueError("cannot train IVF centroids on an empty dataset")
    mod = max(1, -(-int(n_total) // train_sample_budget))  # ceil div
    ids, rows = [], []
    for b in emb.map_batches(
        lambda df: df[df["vec_id"] % mod == 0], batch_format="pandas"
    ).iter_batches(batch_size=4096, batch_format="pandas"):
        if len(b):
            ids.append(b["vec_id"].to_numpy())
            rows.append(_norm_rows(_as_matrix(b["embedding"])))
    if not rows:
        # non-dense / offset vec_ids can miss the modulus entirely —
        # fall back to the first `budget` rows (still bounded)
        head = emb.limit(train_sample_budget).to_pandas()
        ids = [head["vec_id"].to_numpy()]
        rows = [_norm_rows(_as_matrix(head["embedding"]))]
    sample = np.concatenate(rows)
    # batch ARRIVAL order follows task completion and varies run to run;
    # the farthest-point init is row-order sensitive -> canonicalize by id
    sample = sample[np.argsort(np.concatenate(ids), kind="stable")]
    return _train_centroids(sample, min(n_centroids, len(sample)))


def pca_fit(emb: "ray.data.Dataset", k: int) -> tuple[np.ndarray, np.ndarray]:
    """Distributed PCA via MERGEABLE COVARIANCE MOMENTS — the
    dimensionality-reduction step ahead of ANN/clustering at corpus
    scale. ONE ``map_batches`` pass reduces each batch to
    (n, Σx ∈ R^d, ΣxᵀX ∈ R^(d×d)) — O(d²) bytes per batch regardless of
    row count (the combiner shape); the driver merges partials in
    canonical min-vec_id order, forms the covariance, and runs the d×d
    eigendecomposition locally (d is small by construction — 64 here).
    Deterministic sign convention: each component's largest-|coefficient|
    entry is made positive. Returns (components (k,d) row-major,
    mean (d,)).

    Like the distributed k-means trainer, results are bit-deterministic
    for a fixed block layout and stable to float-association drift across
    layouts (tests pin projection agreement, not bit-equality)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"n": pd.Series([], dtype="int64"),
                 "sx": pd.Series([], dtype=object),
                 "sxx": pd.Series([], dtype=object),
                 "mid": pd.Series([], dtype="int64")}
            )
        m = _as_matrix(df["embedding"])
        return pd.DataFrame(
            {
                "n": [len(m)],
                "sx": [m.sum(axis=0).tobytes()],
                "sxx": [(m.T @ m).tobytes()],
                "mid": [int(df["vec_id"].min())],
            }
        )

    parts = (
        emb.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .sort_values("mid", kind="stable")
    )
    n = int(parts["n"].sum())
    d = len(np.frombuffer(parts["sx"].iloc[0], dtype=np.float64))
    sx = np.zeros(d)
    sxx = np.zeros((d, d))
    for rsx, rsxx in zip(parts["sx"].tolist(), parts["sxx"].tolist()):
        sx += np.frombuffer(rsx, dtype=np.float64)
        sxx += np.frombuffer(rsxx, dtype=np.float64).reshape(d, d)
    mean = sx / n
    cov = sxx / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    comps = v[:, ::-1][:, :k].T.copy()  # top-k, (k, d)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, mean


def pca_project(
    emb: "ray.data.Dataset", components: np.ndarray, mean: np.ndarray
) -> "ray.data.Dataset":
    """Streaming projection: broadcast (components, mean) once, emit
    (vec_id, pc1..pck) per row — a pure per-batch matmul, no shuffle."""
    ref = ray.put((np.asarray(components, np.float64), np.asarray(mean, np.float64)))
    k = int(np.asarray(components).shape[0])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        comps, mu = ray.get(ref)
        out = pd.DataFrame({"vec_id": df["vec_id"].to_numpy()})
        if len(df):
            p = (_as_matrix(df["embedding"]) - mu) @ comps.T
        else:
            p = np.zeros((0, k))
        for i in range(k):
            out[f"pc{i + 1}"] = np.round(p[:, i], 6)
        return out

    return emb.map_batches(project, batch_format="pandas")


def train_ivf_centroids_distributed(
    emb: "ray.data.Dataset",
    n_centroids: int = 16,
    iters: int = 5,
    init_sample_budget: int = 4096,
) -> np.ndarray:
    """FULL-CORPUS spherical k-means (distributed Lloyd) — the
    10^12-vector scale path where even a budget-capped driver sample
    under-represents the distribution (TODO.md's mini-batch note).

    Init = the bounded-sample trainer (:func:`train_ivf_centroids`); each
    refinement iteration is then ONE ``map_batches`` pass over the whole
    corpus emitting per-cell (count, vector-sum) partials — at most
    ``n_centroids`` rows per batch, the mergeable-sketch combiner shape —
    which the driver merges in canonical (cell, min vec_id) order, so the
    update is deterministic for a fixed block layout. Across layouts the
    centroids are stable only up to float-association drift; like the
    t-digest family, tests pin ASSIGNMENT AGREEMENT, not bit-equality.
    Empty cells keep their previous centroid; centroids re-normalize
    every update (same spherical rule as train/probe assignment)."""
    cents = train_ivf_centroids(emb, n_centroids, init_sample_budget)
    dim = cents.shape[1]
    for _ in range(iters):
        ref = ray.put(cents)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame(
                    {"cell": pd.Series([], dtype="int64"),
                     "n": pd.Series([], dtype="int64"),
                     "s": pd.Series([], dtype=object),
                     "mid": pd.Series([], dtype="int64")}
                )
            m = _norm_rows(_as_matrix(df["embedding"]))
            cell = np.argmax(m @ ray.get(ref).T, axis=1)
            ids = df["vec_id"].to_numpy()
            rows = []
            for c in np.unique(cell):
                msk = cell == c
                rows.append(
                    {
                        "cell": int(c),
                        "n": int(msk.sum()),
                        "s": m[msk].sum(axis=0).tobytes(),
                        "mid": int(ids[msk].min()),
                    }
                )
            return pd.DataFrame(rows)

        parts = (
            emb.map_batches(partial, batch_format="pandas")
            .to_pandas()  # <= n_centroids rows per batch — driver-small
            .sort_values(["cell", "mid"], kind="stable")
        )
        new = cents.copy()
        for c, sub in parts.groupby("cell", sort=True):
            s = np.zeros(dim, dtype=np.float64)
            n = 0
            for raw, cnt in zip(sub["s"].tolist(), sub["n"].tolist()):
                s += np.frombuffer(raw, dtype=np.float64)
                n += int(cnt)
            if n:
                new[int(c)] = s / n
        cents = _norm_rows(new)
    return cents


def ivf_assign(emb: "ray.data.Dataset", centroids: np.ndarray) -> "ray.data.Dataset":
    """Materialize the IVF inverted index: append each vector's ``cell``
    (argmax cosine against the broadcast centroids) as a column.

    This is the BUILD-ONCE step: persist the result (write_parquet
    partitioned by cell) and serve many queries from it via
    :func:`knn_ivf_prebuilt` — a single ad-hoc query that re-assigns the
    whole corpus (``knn_ivf``) costs ~n_centroids x the FLOPs of the
    brute-force dot product and only wins once assignments are reused."""
    cn = _norm_rows(np.asarray(centroids, dtype=np.float64))
    ref = ray.put(cn)

    class Assign:
        def __init__(self, ref):
            self.cents = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return df.assign(cell=np.array([], dtype=np.int32))
            m = _norm_rows(_as_matrix(df["embedding"]))
            return df.assign(cell=np.argmax(m @ self.cents.T, axis=1).astype(np.int32))

    return emb.map_batches(
        Assign,
        fn_constructor_kwargs={"ref": ref},
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, pool_max()),
    )


def knn_ivf_prebuilt(
    assigned: "ray.data.Dataset",
    centroids: np.ndarray,
    query_vec,
    k: int = 10,
    exclude_vec_id=None,
    nprobe: int | None = None,
) -> "ray.data.Dataset":
    """ANN over a PREBUILT inverted index (:func:`ivf_assign` output):
    filter to the ``nprobe`` cells nearest the query (default: the same
    ~0.5-scan-budget auto-probe as :func:`knn_ivf`, so the two return
    identical results on the same centroids), exact top-k inside. With
    the index persisted as cell-partitioned parquet, the cell filter
    becomes a partition-pruned read — the scan touches nprobe/n_centroids
    of the corpus and no assignment FLOPs are spent at query time."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    cn = _norm_rows(np.asarray(centroids, dtype=np.float64))
    if nprobe is None:
        nprobe = _auto_nprobe(len(cn))
    probe = np.sort(np.argsort(-(cn @ qn))[:nprobe]).astype(np.int32)
    ref = ray.put((qn, probe))

    class CellTopK:
        def __init__(self, ref, k, exclude):
            self.q, self.cells = ray.get(ref)
            self.k, self.exclude = k, exclude

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df[np.isin(df["cell"].to_numpy(), self.cells)]
            if self.exclude is not None:
                df = df[df["vec_id"] != self.exclude]
            if df.empty:
                return pd.DataFrame({"vec_id": [], "cos_sim": []})
            m = _norm_rows(_as_matrix(df["embedding"]))
            sims = m @ self.q
            ids = df["vec_id"].to_numpy()
            order = np.lexsort((ids, -sims))[: self.k]
            return pd.DataFrame({"vec_id": ids[order], "cos_sim": sims[order]})

    local = assigned.map_batches(
        CellTopK,
        fn_constructor_kwargs={"ref": ref, "k": k, "exclude": exclude_vec_id},
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, pool_max()),
    )
    top = local.sort(["cos_sim", "vec_id"], descending=[True, False]).limit(k)
    return top.map_batches(
        lambda df: df.assign(cos_sim=np.round(df["cos_sim"], 6)), batch_format="pandas"
    )


def build_ivf_index(
    emb: "ray.data.Dataset",
    index_dir: str,
    n_centroids: int | None = None,
    train_sample_budget: int = 65536,
) -> np.ndarray:
    """PERSIST the IVF index: train centroids, assign every vector, write
    the corpus CELL-PARTITIONED (``partition_cols=["cell"]`` -> one
    directory per cell) plus the centroid matrix as a small parquet at
    ``<index_dir>/_centroids.parquet``. Build once, serve many queries
    via :func:`knn_ivf_index`, whose probe READ then touches only
    nprobe/n_centroids of the files — the partition-pruned scan that
    makes IVF pay off at corpus scale (the one-shot :func:`knn_ivf`
    spends ~n_centroids x brute-force FLOPs per query instead)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if n_centroids is None:
        n_centroids = _adaptive_n_centroids(emb.count())
    cn = train_ivf_centroids(emb, n_centroids, train_sample_budget)
    ivf_assign(emb, cn).write_parquet(index_dir, partition_cols=["cell"])
    pq.write_table(
        pa.table({"cell": list(range(len(cn))), "centroid": [r.tolist() for r in cn]}),
        os.path.join(index_dir, "_centroids.parquet"),
    )
    return cn


def knn_ivf_index(
    index_dir: str,
    query_vec,
    k: int = 10,
    exclude_vec_id=None,
    nprobe: int | None = None,
) -> "ray.data.Dataset":
    """ANN over a PERSISTED cell-partitioned IVF index
    (:func:`build_ivf_index` output): read the centroid sidecar (tiny),
    pick the ``nprobe`` nearest cells, and read ONLY those cells'
    partition directories — the scan is pruned at the FILE level, so
    query cost scales with nprobe/n_centroids of the corpus regardless
    of corpus size. Inside the probed cells: exact local top-k per batch
    + a k-row final reduce (same shape as :func:`knn_bruteforce`)."""
    import os

    import pyarrow.parquet as pq

    ct = pq.read_table(os.path.join(index_dir, "_centroids.parquet"))
    cells = ct.column("cell").to_pylist()
    cn = _norm_rows(
        np.asarray([np.asarray(v, dtype=np.float64) for v in ct.column("centroid").to_pylist()])
    )
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    if nprobe is None:
        nprobe = _auto_nprobe(len(cells))
    probe = [cells[i] for i in np.argsort(-(cn @ qn))[:nprobe]]
    # partition-pruned read: only the probed cells' files (a path LIST is
    # treated as files by read_parquet, so expand each cell dir)
    import glob

    paths = []
    for c in sorted(probe):
        paths.extend(
            sorted(glob.glob(os.path.join(index_dir, f"cell={c}", "*.parquet")))
        )
    assigned = ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
    ref = ray.put(qn)

    class TopK:
        def __init__(self, ref, k, exclude):
            self.q = ray.get(ref)
            self.k, self.exclude = k, exclude

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if self.exclude is not None:
                df = df[df["vec_id"] != self.exclude]
            if df.empty:
                return pd.DataFrame({"vec_id": [], "cos_sim": []})
            m = _norm_rows(_as_matrix(df["embedding"]))
            sims = m @ self.q
            ids = df["vec_id"].to_numpy()
            order = np.lexsort((ids, -sims))[: self.k]
            return pd.DataFrame({"vec_id": ids[order], "cos_sim": sims[order]})

    local = assigned.map_batches(
        TopK,
        fn_constructor_kwargs={"ref": ref, "k": k, "exclude": exclude_vec_id},
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, pool_max()),
    )
    top = local.sort(["cos_sim", "vec_id"], descending=[True, False]).limit(k)
    return top.map_batches(
        lambda df: df.assign(cos_sim=np.round(df["cos_sim"], 6)), batch_format="pandas"
    )


def _adaptive_n_centroids(n_rows: int) -> int:
    """IVF cell count ~ 4*sqrt(N) (the FAISS guideline), clipped to
    [16, 65536]. Finer cells WIN at a fixed scan fraction on the
    near-isotropic synthetic embeddings — measured recall@10 at scan
    ~0.5 of 2k vectors: 16 cells 0.83, 64 cells 0.89, 128 cells 0.93
    (round-5 VERDICT #6) — because a fine centroid ranked close to the
    query points at actual neighbors while a coarse cell mixes
    directions. The cost is centroid-ranking FLOPs (n_cells x dim per
    query — trivial) and, in the one-shot demo path only, a finer
    assignment matmul; the served index paths pre-assign."""
    return int(np.clip(round(4.0 * np.sqrt(max(1, n_rows))), 16, 65536))


def _auto_nprobe(n_cells: int, scan_budget: float = 0.5) -> int:
    """Margin-ranked spill budget: probe the ranked cells down to an
    expected ``scan_budget`` fraction of the corpus (uniform-size
    estimate, so every serving path — one-shot, prebuilt, persisted —
    derives the IDENTICAL probe set from (n_cells, query) alone and the
    exact-parity pins hold)."""
    return max(1, int(np.ceil(scan_budget * n_cells)))


def knn_ivf(
    emb: "ray.data.Dataset",
    query_vec,
    k: int = 10,
    exclude_vec_id=None,
    n_centroids: int | None = None,
    nprobe: int | None = None,
    train_sample_budget: int = 65536,
) -> "ray.data.Dataset":
    """IVF-style ANN end-to-end: train cells, assign, probe — one shot.

    Train-side: spherical k-means on a BOUNDED deterministic sample
    (:func:`train_ivf_centroids` — the modulus scales with a metadata-only
    row count so the driver never holds more than ~``train_sample_budget``
    vectors at any corpus size). Centroids broadcast once via ``ray.put``.

    NOTE: this one-shot form re-assigns every corpus vector per query
    (~n_centroids x the brute-force FLOPs) — it demonstrates semantics and
    amortizes ONLY when the assignment is built once and reused; for a
    served index use :func:`ivf_assign` + :func:`knn_ivf_prebuilt`.

    Defaults are ADAPTIVE (round-5 VERDICT #6): ``n_centroids`` ~
    4*sqrt(N) (:func:`_adaptive_n_centroids`) and ``nprobe`` spills the
    margin-ranked cells to a ~0.5 scan budget (:func:`_auto_nprobe`).
    Measured recall@10 vs brute force on the synthetic sf0.1 embeddings:
    0.93 at the auto defaults vs 0.7-0.8 for the old fixed 16-cell /
    nprobe-8 config at the SAME scan fraction (pinned >= 0.9 in tests);
    clustered corpora read ~1.0. The prebuilt variant returns the
    identical result (verified, same cells, same auto-probe derivation).
    """
    n_rows = emb.count()  # metadata-only
    if n_rows == 0:  # empty corpus -> empty top-k
        return ray.data.from_pandas(pd.DataFrame({"vec_id": [], "cos_sim": []}))
    if n_centroids is None:
        n_centroids = _adaptive_n_centroids(n_rows)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    cn = train_ivf_centroids(emb, n_centroids, train_sample_budget)
    if nprobe is None:
        nprobe = _auto_nprobe(len(cn))
    probe_cells = np.argsort(-(cn @ qn))[:nprobe]
    ref = ray.put((qn, cn, frozenset(int(c) for c in probe_cells)))

    class ProbeTopK:
        def __init__(self, ref, k, exclude):
            self.q, self.cents, self.cells = ray.get(ref)
            self.k, self.exclude = k, exclude

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if self.exclude is not None:
                df = df[df["vec_id"] != self.exclude]
            if df.empty:
                return pd.DataFrame({"vec_id": [], "cos_sim": []})
            m = _norm_rows(_as_matrix(df["embedding"]))
            assign = np.argmax(m @ self.cents.T, axis=1)
            mask = np.isin(assign, list(self.cells))
            if not mask.any():
                return pd.DataFrame({"vec_id": [], "cos_sim": []})
            sims = m[mask] @ self.q
            ids = df["vec_id"].to_numpy()[mask]
            order = np.lexsort((ids, -sims))[: self.k]
            return pd.DataFrame({"vec_id": ids[order], "cos_sim": sims[order]})

    local = emb.map_batches(
        ProbeTopK,
        fn_constructor_kwargs={"ref": ref, "k": k, "exclude": exclude_vec_id},
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, pool_max()),
    )
    top = local.sort(["cos_sim", "vec_id"], descending=[True, False]).limit(k)
    return top.map_batches(
        lambda df: df.assign(cos_sim=np.round(df["cos_sim"], 6)), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the vector-store compression path beyond
# int8: each (normalized) vector splits into ``m`` contiguous subvectors,
# each quantized to one of ``n_codes`` per-subspace centroids, so the
# corpus scan touches m bytes/vector instead of 4*dim (32x at dim=64,
# m=8). Search is ADC (asymmetric distance computation): the query
# precomputes an (m, n_codes) table of subspace distances, and each
# encoded vector scores as m table lookups — no decode. The canonical
# 10^12-vector recipe pairs this with IVF cells (probe a few cells, ADC
# inside); the pieces compose here the same way (ivf_assign + pq codes).


def _train_pq_subspace(sample: np.ndarray, n_codes: int, iters: int = 10) -> np.ndarray:
    """Deterministic plain-L2 k-means for ONE subspace: seeded
    farthest-point init, fixed iterations, no RNG in the loop. Unlike the
    IVF trainer there is NO renormalization — subvectors of unit vectors
    are not unit, and PQ codebooks quantize raw subspace geometry."""
    rng = np.random.default_rng(np.random.SeedSequence([373737, sample.shape[1]]))
    cents = [sample[int(rng.integers(len(sample)))]]
    for _ in range(n_codes - 1):
        d = np.min([np.sum((sample - c) ** 2, axis=1) for c in cents], axis=0)
        cents.append(sample[int(np.argmax(d))])
    cents = np.array(cents, dtype=np.float64)
    for _ in range(iters):
        d2 = (
            np.sum(sample**2, axis=1)[:, None]
            - 2.0 * (sample @ cents.T)
            + np.sum(cents**2, axis=1)[None, :]
        )
        assign = np.argmin(d2, axis=1)
        for j in range(len(cents)):
            msk = assign == j
            if msk.any():
                cents[j] = sample[msk].mean(axis=0)
    return cents


def train_pq_codebooks(
    emb: "ray.data.Dataset",
    m: int = 8,
    n_codes: int = 16,
    train_sample_budget: int = 65536,
) -> np.ndarray:
    """Fit (m, n_codes, dim/m) PQ codebooks on the SAME bounded
    deterministic sample the IVF trainer uses (vec_id-modulus, canonical
    id order — layout-invariant); vectors are L2-normalized first so ADC
    L2 ranking matches the engine's cosine ranking on unit rows."""
    n_total = emb.count()
    if n_total == 0:
        raise ValueError("cannot train PQ codebooks on an empty dataset")
    mod = max(1, -(-int(n_total) // train_sample_budget))
    ids, rows = [], []
    for b in emb.map_batches(
        lambda df: df[df["vec_id"] % mod == 0], batch_format="pandas"
    ).iter_batches(batch_size=4096, batch_format="pandas"):
        if len(b):
            ids.append(b["vec_id"].to_numpy())
            rows.append(_norm_rows(_as_matrix(b["embedding"])))
    if not rows:
        head = emb.limit(train_sample_budget).to_pandas()
        ids = [head["vec_id"].to_numpy()]
        rows = [_norm_rows(_as_matrix(head["embedding"]))]
    sample = np.concatenate(rows)
    sample = sample[np.argsort(np.concatenate(ids), kind="stable")]
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return np.stack(
        [
            _train_pq_subspace(
                sample[:, s * dsub : (s + 1) * dsub], min(n_codes, len(sample))
            )
            for s in range(m)
        ]
    )


def pq_encode(emb: "ray.data.Dataset", codebooks: np.ndarray) -> "ray.data.Dataset":
    """Streaming encode: (vec_id, codes list<uint8> of length m) — m
    bytes of payload per vector. Codebooks broadcast once via ray.put."""
    m, n_codes, dsub = codebooks.shape
    ref = ray.put(codebooks)

    class Encode:
        def __init__(self, ref):
            self.cb = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            x = _norm_rows(_as_matrix(df["embedding"]))
            codes = np.empty((len(df), m), dtype=np.uint8)
            for s in range(m):
                sub = x[:, s * dsub : (s + 1) * dsub]
                c = self.cb[s]
                d2 = (
                    np.sum(sub**2, axis=1)[:, None]
                    - 2.0 * (sub @ c.T)
                    + np.sum(c**2, axis=1)[None, :]
                )
                codes[:, s] = np.argmin(d2, axis=1)
            return pd.DataFrame(
                {"vec_id": df["vec_id"].to_numpy(), "codes": list(codes)}
            )

    return emb.map_batches(
        Encode,
        fn_constructor_kwargs={"ref": ref},
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, pool_max()),
    )


def knn_pq_encoded(
    codes_ds: "ray.data.Dataset",
    codebooks: np.ndarray,
    query_vec,
    k: int = 10,
    exclude_vec_id=None,
) -> "ray.data.Dataset":
    """ADC top-k over a PRE-ENCODED corpus: the query precomputes an
    (m, n_codes) subspace-distance table; each stored vector scores as m
    uint8 table lookups (vectorized fancy-index + sum). Returns
    (vec_id, adc_dist) ascending — the compressed-scan path whose input
    is m bytes/vector."""
    m, n_codes, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    table = np.empty((m, n_codes), dtype=np.float64)
    for s in range(m):
        qs = q[s * dsub : (s + 1) * dsub]
        table[s] = np.sum((codebooks[s] - qs) ** 2, axis=1)
    t_ref = ray.put(table)

    class LocalTopK:
        def __init__(self, ref, k, exclude):
            self.t = ray.get(ref)
            self.k = k
            self.exclude = exclude

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if self.exclude is not None:
                df = df[df["vec_id"] != self.exclude]
            if df.empty:
                # typed empty: an untyped {} literal yields object dtype
                # and can fail Ray's block schema unification (ADVICE r4)
                return pd.DataFrame(
                    {
                        "vec_id": pd.Series(dtype="int64"),
                        "adc_dist": pd.Series(dtype="float64"),
                    }
                )
            codes = np.stack(df["codes"].to_numpy()).astype(np.int64)
            dist = self.t[np.arange(m)[None, :], codes].sum(axis=1)
            order = np.lexsort((df["vec_id"].to_numpy(), dist))[: self.k]
            return pd.DataFrame(
                {
                    "vec_id": df["vec_id"].to_numpy()[order],
                    "adc_dist": dist[order],
                }
            )

    local = codes_ds.map_batches(
        LocalTopK,
        fn_constructor_kwargs={"ref": t_ref, "k": k, "exclude": exclude_vec_id},
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, pool_max()),
    )
    # k rows per batch survive -> the merge is driver-tiny; a Dataset
    # sort here costs a whole extra execution (CLAUDE.md tiny-sort note)
    cand = local.to_pandas()
    if cand.empty:
        return ray.data.from_pandas(
            pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                          "adc_dist": pd.Series(dtype="float64")})
        )
    order = np.lexsort((cand["vec_id"].to_numpy(), cand["adc_dist"].to_numpy()))[:k]
    out = cand.iloc[order].reset_index(drop=True)
    out["adc_dist"] = np.round(out["adc_dist"], 6)
    return ray.data.from_pandas(out)


def knn_pq(
    emb: "ray.data.Dataset",
    query_vec,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    shortlist: int | None = None,
    exclude_vec_id=None,
    codebooks: np.ndarray | None = None,
) -> "ray.data.Dataset":
    """PQ shortlist + EXACT rerank (the FAISS refine recipe): the ADC
    scan over m-byte codes returns a ``shortlist`` (default 50*k) of
    candidates, whose full vectors are then fetched and scored exactly —
    raw ADC ranking alone cannot separate top-10 neighbors on
    near-isotropic data (measured 0.06-0.26 recall@10 at 8-16 bytes,
    residual encoding included), while the 5%-shortlist rerank measured
    recall 1.0 on the 10k clustered fixture. The compressed scan touches
    m bytes/vector; only the shortlist's vectors are re-read (a
    vec_id-partitioned point lookup at scale, a filtered scan here). In
    production the codebooks and codes persist; this composition
    exercises train -> encode -> scan -> rerank end to end. Output
    matches :func:`knn_bruteforce`: (vec_id, cos_sim) descending."""
    L = shortlist if shortlist is not None else 50 * k
    cb = codebooks if codebooks is not None else train_pq_codebooks(emb, m, n_codes)
    short = knn_pq_encoded(
        pq_encode(emb, cb), cb, query_vec, k=L, exclude_vec_id=exclude_vec_id
    ).to_pandas()
    ids = set(short["vec_id"].astype(np.int64).tolist())
    ids_ref = ray.put(ids)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["vec_id"].isin(_worker_cached_get(ids_ref))]

    sub = emb.map_batches(keep, batch_format="pandas").to_pandas()  # <= L rows
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    sims = _norm_rows(_as_matrix(sub["embedding"])) @ q
    order = np.lexsort((sub["vec_id"].to_numpy(), -sims))[:k]
    out = pd.DataFrame(
        {
            "vec_id": sub["vec_id"].to_numpy()[order],
            "cos_sim": np.round(sims[order], 6),
        }
    )
    return ray.data.from_pandas(out)


def knn_ivfpq(
    emb: "ray.data.Dataset",
    query_vec,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    shortlist: int | None = None,
    exclude_vec_id=None,
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
) -> "ray.data.Dataset":
    """The canonical 10^12-vector recipe composed for real: IVF cell
    pruning x PQ compressed scan x exact rerank. The query probes its
    ``nprobe`` nearest cells; only those cells' rows are ADC-scanned
    (m bytes/vector) for a shortlist, whose full vectors are re-read and
    scored exactly. End-to-end cost per query at scale: nprobe/n_centroids
    of the corpus touched at m bytes/vector + ``shortlist`` full vectors.
    Recall is bounded by the IVF probe (the PQ+rerank leg measured 1.0 on
    the clustered fixture); both prunings are pinned in tests. Centroids
    and codebooks train once on the bounded canonical sample and persist
    in production — pass them in to skip retraining."""
    cents = (
        centroids if centroids is not None else train_ivf_centroids(emb, n_centroids)
    )
    cb = codebooks if codebooks is not None else train_pq_codebooks(emb, m, n_codes)
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    probe = set(np.argsort(-(cents @ q))[:nprobe].tolist())
    c_ref = ray.put(cents)
    p_ref = ray.put(probe)

    def keep_probed(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        x = _norm_rows(_as_matrix(df["embedding"]))
        cell = np.argmax(x @ _worker_cached_get(c_ref).T, axis=1)
        mask = np.isin(cell, list(_worker_cached_get(p_ref)))
        return df[mask]

    pruned = emb.map_batches(keep_probed, batch_format="pandas")
    return knn_pq(
        pruned,
        query_vec,
        k=k,
        m=m,
        n_codes=n_codes,
        shortlist=shortlist,
        exclude_vec_id=exclude_vec_id,
        codebooks=cb,
    )


def build_ivfpq_index(
    emb: "ray.data.Dataset",
    index_dir: str,
    n_centroids: int = 16,
    m: int = 8,
    n_codes: int = 16,
    train_sample_budget: int = 65536,
):
    """PERSIST the IVF x PQ index: train centroids + codebooks on the
    bounded canonical sample, then ONE pass assigns each vector's cell
    and its m-byte PQ codes and writes (vec_id, codes) CELL-PARTITIONED
    under ``index_dir`` with tiny ``_centroids.parquet`` /
    ``_codebooks.parquet`` sidecars. The index stores m bytes per vector
    — full vectors stay in the source table and only the rerank
    shortlist ever re-reads them. Build once, serve many queries via
    :func:`knn_ivfpq_index`."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    cn = train_ivf_centroids(emb, n_centroids, train_sample_budget)
    cb = train_pq_codebooks(emb, m, n_codes, train_sample_budget)
    mm, kk, dsub = cb.shape
    c_ref = ray.put(cn)
    b_ref = ray.put(cb)

    def assign_encode(df: pd.DataFrame) -> pd.DataFrame:
        x = _norm_rows(_as_matrix(df["embedding"]))
        cents = ray.get(c_ref)
        books = ray.get(b_ref)
        cell = np.argmax(x @ cents.T, axis=1)
        codes = np.empty((len(df), mm), dtype=np.uint8)
        for s in range(mm):
            sub = x[:, s * dsub : (s + 1) * dsub]
            c = books[s]
            d2 = (
                np.sum(sub**2, axis=1)[:, None]
                - 2.0 * (sub @ c.T)
                + np.sum(c**2, axis=1)[None, :]
            )
            codes[:, s] = np.argmin(d2, axis=1)
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].to_numpy(),
                "cell": cell.astype(np.int64),
                "codes": list(codes),
            }
        )

    emb.map_batches(assign_encode, batch_format="pandas").write_parquet(
        index_dir, partition_cols=["cell"]
    )
    pq.write_table(
        pa.table({"cell": list(range(len(cn))), "centroid": [r.tolist() for r in cn]}),
        os.path.join(index_dir, "_centroids.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "subspace": [s for s in range(mm) for _ in range(kk)],
                "code": [c for _ in range(mm) for c in range(kk)],
                "center": [cb[s, c].tolist() for s in range(mm) for c in range(kk)],
            }
        ),
        os.path.join(index_dir, "_codebooks.parquet"),
    )
    return cn, cb


def knn_ivfpq_index(
    index_dir: str,
    emb: "ray.data.Dataset",
    query_vec,
    k: int = 10,
    nprobe: int = 4,
    shortlist: int | None = None,
    exclude_vec_id=None,
) -> "ray.data.Dataset":
    """Serve a query from a PERSISTED :func:`build_ivfpq_index`: read the
    two tiny sidecars, probe the ``nprobe`` nearest cells, read ONLY
    those cells' code files (m bytes/vector, file-level pruned), ADC-scan
    them for a shortlist, then rerank the shortlist's FULL vectors from
    the source ``emb`` exactly. Result equality with the in-memory
    :func:`knn_ivfpq` (same deterministic training) is pinned in tests."""
    import glob
    import os

    import pyarrow.parquet as pq

    ct = pq.read_table(os.path.join(index_dir, "_centroids.parquet"))
    cells = ct.column("cell").to_pylist()
    # load VERBATIM: the sidecar is written post-normalization and the
    # parquet float64 round-trip is exact; renormalizing would perturb
    # last bits and could flip probe selection on near-tie cells vs the
    # in-memory knn_ivfpq (exact-parity pin) (ADVICE r4)
    cn = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in ct.column("centroid").to_pylist()]
    )
    bt = pq.read_table(os.path.join(index_dir, "_codebooks.parquet")).to_pandas()
    mm = int(bt["subspace"].max()) + 1
    kk = int(bt["code"].max()) + 1
    bt = bt.sort_values(["subspace", "code"])
    cb = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in bt["center"].tolist()]
    ).reshape(mm, kk, -1)

    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    probe = [cells[i] for i in np.argsort(-(cn @ qn))[:nprobe]]
    paths = []
    for c in sorted(probe):
        paths.extend(sorted(glob.glob(os.path.join(index_dir, f"cell={c}", "*.parquet"))))
    codes_ds = ray.data.read_parquet(paths, columns=["vec_id", "codes"])

    L = shortlist if shortlist is not None else 50 * k
    short = knn_pq_encoded(
        codes_ds, cb, query_vec, k=L, exclude_vec_id=exclude_vec_id
    ).to_pandas()
    ids = set(short["vec_id"].astype(np.int64).tolist())
    ids_ref = ray.put(ids)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["vec_id"].isin(_worker_cached_get(ids_ref))]

    sub = emb.map_batches(keep, batch_format="pandas").to_pandas()
    sims = _norm_rows(_as_matrix(sub["embedding"])) @ qn
    order = np.lexsort((sub["vec_id"].to_numpy(), -sims))[:k]
    out = pd.DataFrame(
        {
            "vec_id": sub["vec_id"].to_numpy()[order],
            "cos_sim": np.round(sims[order], 6),
        }
    )
    return ray.data.from_pandas(out)
