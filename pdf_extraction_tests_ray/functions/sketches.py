"""Mergeable cardinality sketches: HyperLogLog (dense, numpy registers).

The mergeable-sketch pattern at 100 TB: each batch folds its rows into a
fixed-size register array, registers merge by elementwise max (associative
+ commutative -> any shuffle/combine tree gives the identical sketch), and
the estimate is read once at the end. Standard HLL with the bias-corrected
estimator (Flajolet et al. 2007's small/large-range corrections).

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


def hll_add(reg: np.ndarray, values) -> np.ndarray:
    """Fold values into the register array IN PLACE (vectorized rho)."""
    if len(values) == 0:
        return reg
    p = int(np.log2(len(reg)))
    h = _hash_u64(values)
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


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Register-wise max — associative and commutative by construction."""
    return np.maximum(a, b)


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
