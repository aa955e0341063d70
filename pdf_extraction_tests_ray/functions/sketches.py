"""Mergeable / broadcastable sketches: HyperLogLog (cardinality),
Misra-Gries (heavy hitters), Bloom filter (membership).

The mergeable-sketch pattern at 100 TB: each batch folds its rows into a
fixed-size summary, summaries merge associatively (any shuffle/combine
tree gives a result within the sketch's bound), and the answer is read
once at the end. HLL uses the bias-corrected estimator (Flajolet et al.
2007's small/large-range corrections); Misra-Gries follows Agarwal et
al.'s "Mergeable Summaries"; the Bloom filter is the bounded-size
broadcast side for membership filters (one-sided error).

Hashing: blake2b-8 of the UTF-8 repr — deterministic across processes and
runs (never Python's salted hash()).
"""

from __future__ import annotations

import hashlib

import numpy as np

DEFAULT_P = 12  # 2^12 = 4096 registers -> ~1.6% standard error


def hll_empty(p: int = DEFAULT_P) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def _hash_u64(values) -> np.ndarray:
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(
            hashlib.blake2b(repr(v).encode("utf-8"), digest_size=8).digest(), "little"
        )
    return out


def _hash_u64_md5(values) -> np.ndarray:
    """md5-based 64-bit hash: first 8 digest bytes little-endian of
    str(v) — byte-identical to DuckDB ``md5_number_upper(CAST(v AS
    VARCHAR))``, which is what makes an HLL built on it SQL-checkable
    (md5 is this repo's cross-engine oracle contract; blake2b stays the
    default for callers that never need a SQL twin)."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(
            hashlib.md5(str(v).encode("utf-8")).digest()[:8], "little"
        )
    return out


_HASHERS = {"blake2b": _hash_u64, "md5": _hash_u64_md5}


def hll_add(reg: np.ndarray, values, hash_name: str = "blake2b") -> np.ndarray:
    """Fold values into the register array IN PLACE (vectorized rho)."""
    if len(values) == 0:
        return reg
    p = int(np.log2(len(reg)))
    h = _HASHERS[hash_name](values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rho = position of the leftmost 1-bit in the remaining bits (1-based)
    rho = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    nz = rest != 0
    if nz.any():
        # leftmost set bit: 64 - floor(log2(rest)) gives the 1-based
        # position; float log2 can overshoot at 2^k boundaries (2^k - eps
        # rounds to 2^k), so clamp and correct exactly in integers
        r = rest[nz]
        top = np.minimum(np.floor(np.log2(r.astype(np.float64))).astype(np.int64), 63)
        over = (np.uint64(1) << top.astype(np.uint64)) > r
        top = top - over.astype(np.int64)
        rho[nz] = (64 - top).astype(np.uint8)
    np.maximum.at(reg, idx, rho)
    return reg


def mg_trim(counts: dict, capacity: int) -> dict:
    """Misra-Gries reduction to <= capacity counters: subtract the
    (capacity+1)-th largest count from every counter and drop the
    non-positive ones. Each trim undercounts every surviving key by its
    subtrahend; summed over any merge tree the total undercount is at
    most n/(capacity+1) (Agarwal et al., "Mergeable Summaries"). With
    capacity >= #distinct keys no trim ever fires and counts are EXACT.
    """
    if len(counts) <= capacity:
        return dict(counts)
    vals = sorted(counts.values(), reverse=True)
    sub = vals[capacity]
    return {w: c - sub for w, c in counts.items() if c > sub}


def mg_add(summary: dict, counts: dict, capacity: int) -> dict:
    """Fold a (key -> count) batch into a Misra-Gries summary, keeping it
    at <= capacity counters. Also the MERGE of two summaries (a summary
    is itself a key->count map) — associative up to the shared bound."""
    for w, c in counts.items():
        summary[w] = summary.get(w, 0) + c
    return mg_trim(summary, capacity)


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Register-wise max — associative and commutative by construction."""
    return np.maximum(a, b)


def _hash_u64_pair(values) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per value (one blake2b-16 digest,
    split) for double-hashing Bloom probes."""
    h1 = np.empty(len(values), dtype=np.uint64)
    h2 = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.blake2b(repr(v).encode("utf-8"), digest_size=16).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little")
    return h1, h2


def bloom_build(items, bits_per_item: int = 64) -> tuple[np.ndarray, int, int]:
    """Bloom filter over ``items``: returns (bit array as uint8, m bits,
    k probes). k = round(ln 2 * bits_per_item) minimizes the false-
    positive rate (~0.6185^bits_per_item: ~1e-13 at the default 64 bits/item — 8 bytes
    per item, still ~12x smaller than broadcasting gram strings). False
    positives only — a member is NEVER missed, so a decontamination
    filter built on it can only over-drop, never leak benchmark text."""
    n = max(1, len(items))
    m = n * bits_per_item
    k = max(1, int(round(0.6931 * bits_per_item)))
    bits = np.zeros((m + 7) // 8, dtype=np.uint8)
    bloom_set(bits, m, k, items)
    return bits, m, k


def bloom_set(bits: np.ndarray, m: int, k: int, items) -> None:
    """Set ``items``' probe bits in an EXISTING filter (in place) — the
    single definition of the double-hash scatter, shared by
    ``bloom_build`` and distributed partial-bloom builders (e.g.
    relational.semi_join_bloom) so the probe arithmetic can never
    drift between them."""
    if not len(items):
        return
    h1, h2 = _hash_u64_pair(items)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
        np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))


def bloom_contains(bits: np.ndarray, m: int, k: int, items) -> np.ndarray:
    """Vectorized membership test: True where ALL k probe bits are set."""
    if len(items) == 0:
        return np.zeros(0, dtype=bool)
    h1, h2 = _hash_u64_pair(items)
    hit = np.ones(len(items), dtype=bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
        byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
        hit &= (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1 > 0
        if not hit.any():
            break
    return hit


def tdigest_build(values: np.ndarray, delta: int = 200) -> np.ndarray:
    """Build a t-digest from raw values: an (n_centroids, 2) array of
    [mean, weight] rows, n_centroids <= ~2*delta. Dunning's digest with
    the k1 scale function k(q) = (delta/2pi) asin(2q-1): centroid width
    shrinks toward the tails, so tail quantiles are tightest (the region
    that matters for p99-style corpus stats).

    FULLY VECTORIZED (no Python loop over rows — this runs per batch in
    the hot path): each sorted value's q maps through k1, values sharing
    floor(k) collapse into one centroid via ``np.add.reduceat`` — the
    canonical scale-function clustering, same bound as the greedy merge."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    n = len(v)
    if n == 0:
        return np.zeros((0, 2))
    q = (np.arange(n) + 0.5) / n
    k = (delta / (2.0 * np.pi)) * np.arcsin(2.0 * q - 1.0)
    cluster = np.floor(k).astype(np.int64)
    starts = np.nonzero(np.r_[True, cluster[1:] != cluster[:-1]])[0]
    sums = np.add.reduceat(v, starts)
    counts = np.diff(np.r_[starts, n]).astype(np.float64)
    return np.stack([sums / counts, counts], axis=1)


def tdigest_merge(digests, delta: int = 200) -> np.ndarray:
    """Merge digests: concatenate centroids, sort by mean (stable; ties
    by weight for determinism given the same multiset of centroids), and
    re-compress. NOTE: unlike the HLL registers, the result depends
    (within the error bound) on how batches were cut — callers pin the
    BOUND across layouts, not bit-equality."""
    parts = [d for d in digests if len(d)]
    if not parts:
        return np.zeros((0, 2))
    allc = np.concatenate(parts)
    order = np.lexsort((allc[:, 1], allc[:, 0]))
    return _tdigest_compress(allc[order], delta)


def _tdigest_compress(cents: np.ndarray, delta: int) -> np.ndarray:
    """Greedy left-to-right merge of mean-sorted centroids under the k1
    size bound (k(q_hi) - k(q_lo) <= 1)."""
    total = cents[:, 1].sum()

    def k(q):
        return (delta / (2.0 * np.pi)) * np.arcsin(np.clip(2.0 * q - 1.0, -1, 1))

    out_m, out_w = [], []
    cur_m, cur_w = cents[0, 0], cents[0, 1]
    w_before = 0.0  # weight strictly before the current centroid
    for m, w in cents[1:]:
        q_lo = w_before / total
        q_hi = (w_before + cur_w + w) / total
        if k(q_hi) - k(q_lo) <= 1.0:
            cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            cur_m, cur_w = m, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.stack([np.array(out_m), np.array(out_w)], axis=1)


def tdigest_quantile(cents: np.ndarray, q: float) -> float:
    """Quantile estimate: linear interpolation between centroid means at
    cumulative mid-weights (first/last centroid means cap the tails)."""
    if len(cents) == 0:
        return float("nan")
    if len(cents) == 1:
        return float(cents[0, 0])
    w = cents[:, 1]
    total = w.sum()
    # cumulative weight at each centroid's midpoint
    mid = np.cumsum(w) - w / 2.0
    target = q * total
    if target <= mid[0]:
        return float(cents[0, 0])
    if target >= mid[-1]:
        return float(cents[-1, 0])
    i = int(np.searchsorted(mid, target) - 1)
    frac = (target - mid[i]) / (mid[i + 1] - mid[i])
    return float(cents[i, 0] + frac * (cents[i + 1, 0] - cents[i, 0]))


def hll_estimate(reg: np.ndarray) -> float:
    """Bias-corrected HLL estimate with small/large-range corrections."""
    m = float(len(reg))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    inv = np.ldexp(1.0, -reg.astype(np.int64))  # 2^-reg
    raw = alpha * m * m / inv.sum()
    if raw <= 2.5 * m:
        zeros = int((reg == 0).sum())
        if zeros:
            return m * np.log(m / zeros)  # linear counting
    if raw > (1 << 32) / 30.0:
        return -(2.0**64) * np.log(1.0 - raw / 2.0**64)
    return raw
