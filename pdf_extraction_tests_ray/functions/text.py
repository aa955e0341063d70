"""Vectorized text primitives: normalization, token counts, quality
scoring, language ID, fingerprints, shingles, MinHash, SimHash.

All deterministic (fixed seeds / fixed hash parameters). These power the
training-data-pipeline operators (dedup, quality filtering, lang ID) that
complement the reference's extraction semantics at corpus scale.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_WS_RE = re.compile(r"\s+")
_TOKEN_RE = re.compile(r"\w+|[^\w\s]")  # BPE-ish: words + single punct marks
# ASCII punctuation only — matches the DuckDB (RE2) oracle class exactly;
# \w-based classes diverge between Python (unicode) and RE2 (ASCII) on CJK.
_PUNCT_RE = re.compile(r"[!-/:-@\[-`{-~]")


def normalize_text(s: str) -> str:
    """lower + collapse whitespace + trim — the dedup key normalization."""
    return _WS_RE.sub(" ", s).strip().lower()


def whitespace_token_count(s: str) -> int:
    """len(split on \\s+) of trimmed text — matches DuckDB
    ``length(regexp_split_to_array(trim(text), '\\s+'))``."""
    t = s.strip()
    return len(_WS_RE.split(t)) if t else 1  # DuckDB returns [''] -> 1


def bpe_ish_token_count(s: str) -> int:
    return len(_TOKEN_RE.findall(s))


def punct_char_count(s: str) -> int:
    return len(_PUNCT_RE.findall(s))


def nonspace_char_count(s: str) -> int:
    return len(_WS_RE.sub("", s))


# --------------------------------------------------------------------------
# quality scoring (length / punctuation / stopword / word-length signals)

_EN_STOP = frozenset(
    "the a an and or of to in is are was were be been for on with as by at it this that from".split()
)


def quality_features(s: str) -> tuple[int, float, float, float]:
    """(n_words, punct_ratio, avg_word_len, stopword_ratio) — all
    deterministic; ratios over trimmed text."""
    t = s.strip()
    words = _WS_RE.split(t) if t else [""]
    n_words = len(words)
    n_chars = len(t)
    punct_ratio = punct_char_count(t) / n_chars if n_chars else 0.0
    avg_word_len = nonspace_char_count(t) / n_words if n_words else 0.0
    stopword_ratio = stopword_count(s) / n_words if n_words else 0.0
    return n_words, punct_ratio, avg_word_len, stopword_ratio


def stopword_count(s: str) -> int:
    """Count of (lowercased) English stopwords among the \\s+-split words
    of the trimmed text — the integer numerator of stopword_ratio."""
    t = s.strip()
    words = _WS_RE.split(t) if t else [""]
    return sum(1 for w in words if w.lower() in _EN_STOP)


def is_quality(n_words, punct_ratio, avg_word_len) -> bool:
    """Simple trainability gate: enough words, sane punctuation density,
    plausible word lengths (C4-style heuristics)."""
    return bool(n_words >= 10 and punct_ratio < 0.3 and 2.0 <= avg_word_len <= 12.0)


# --------------------------------------------------------------------------
# repetition / duplication signals (Gopher-style, Rae et al. 2021 §A1.1,
# at word/sentence granularity — the corpus text carries no newlines, so
# word-bigram and '.'-sentence units stand in for Gopher's line units)

_SENT_SPLIT_RE = re.compile(r"\.\s+")


def repetition_features(s: str) -> tuple[int, float, float, float]:
    """(n_words, dup_word_frac, top_bigram_frac, dup_sent_frac).

    dup_word_frac = 1 - distinct/total words; top_bigram_frac = fraction
    of words covered by the most frequent REPEATED word bigram
    (2*max_count/n when max_count >= 2, else 0 — a short doc whose every
    bigram is unique is not repetitive; count-only, so no tie-break on
    WHICH bigram is needed); dup_sent_frac = 1 - distinct/total over
    non-empty '.'-separated sentences. Every operation (split, distinct,
    max multiplicity, the divisions) is reproduced exactly by the paired
    DuckDB oracle.
    """
    t = s.strip()
    if not t:
        return 0, 0.0, 0.0, 0.0
    words = _WS_RE.split(t)
    n = len(words)
    dup_word = 1.0 - len(set(words)) / n
    top_bigram = 0.0
    if n >= 2:
        counts: dict = {}
        best = 0
        for i in range(n - 1):
            g = words[i] + " " + words[i + 1]
            c = counts.get(g, 0) + 1
            counts[g] = c
            if c > best:
                best = c
        top_bigram = 2.0 * best / n if best >= 2 else 0.0
    sents = [x for x in _SENT_SPLIT_RE.split(t) if x]
    dup_sent = 1.0 - len(set(sents)) / len(sents) if sents else 0.0
    return n, dup_word, top_bigram, dup_sent


def chunk_text(s: str, chunk_size: int, stride: int) -> list:
    """Stride-windowed word chunks: [(chunk_idx, n_tokens, chunk_text)].

    Windows start at every multiple of ``stride`` below the word count
    (so consecutive chunks overlap by ``chunk_size - stride`` words when
    stride < chunk_size — the standard long-document windowing for
    embedding/training pipelines); the final window may be shorter and,
    when chunk_size > stride, may repeat only prior words — kept anyway:
    the start-grid rule is what the DuckDB oracle reproduces exactly
    (range(0, n, stride) + 1-based inclusive list slices). Empty text
    yields no chunks."""
    t = s.strip()
    if not t:
        return []
    ws = _WS_RE.split(t)
    n = len(ws)
    out = []
    for ci, start in enumerate(range(0, n, stride), 1):
        seg = ws[start : start + chunk_size]
        out.append((ci, len(seg), " ".join(seg)))
    return out


def split_lines(s: str) -> list:
    """The corpus-wide 'line' unit shared by line-level dedup and the
    repetition metrics: non-empty '.'-whitespace-separated sentences of
    the stripped text (this corpus carries no newlines, so sentences
    stand in for C4's lines). Paired DuckDB oracles reproduce it as
    ``list_filter(regexp_split_to_array(trim(text), '\\.\\s+'), ...)``."""
    t = s.strip()
    if not t:
        return []
    return [x for x in _SENT_SPLIT_RE.split(t) if x]


def is_repetitive(top_bigram_frac, dup_sent_frac) -> bool:
    """Gopher-style repetition gate (top-2-gram threshold per Rae et al.
    2021 table A1; sentence-duplicate threshold stands in for dup-line).
    dup_word_frac is reported but not gated — ordinary English repeats
    stopwords heavily, so it separates poorly."""
    return bool(top_bigram_frac > 0.18 or dup_sent_frac > 0.30)


# --------------------------------------------------------------------------
# language ID: stopword-hit heuristic over a tiny per-language lexicon

_LANG_STOPS = {
    "en": frozenset("the and of to in is that it for on with as be are this".split()),
    "de": frozenset("der die das und ist nicht von zu mit den ein eine im für auf".split()),
    "fr": frozenset("le la les et de des un une est pas pour dans que sur avec".split()),
    "es": frozenset("el la los las y de que en un una es no por con para".split()),
}
_LANG_ORDER = ("en", "de", "fr", "es", "zh")


def detect_language(s: str) -> str:
    """Argmax of per-language stopword hits; CJK codepoint share beats the
    lexicons; ties resolve in fixed _LANG_ORDER."""
    t = s.lower()
    if t and sum(1 for c in t if "一" <= c <= "鿿") / max(1, len(t)) > 0.2:
        return "zh"
    words = _WS_RE.split(t.strip()) if t.strip() else []
    scores = {lang: sum(1 for w in words if w in stops) for lang, stops in _LANG_STOPS.items()}
    scores["zh"] = 0
    return max(_LANG_ORDER, key=lambda l: (scores[l], -_LANG_ORDER.index(l)))


# --------------------------------------------------------------------------
# fingerprints

# PII scrubbing: ordered pattern -> token chain. Patterns stay inside the
# Python-re / RE2 common subset so DuckDB regexp_replace(..., 'g')
# produces byte-identical output (no lookarounds, no unicode classes).
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),  # SSN-shaped, before phone (3-2-4)
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)
# re.ASCII: Python's \d/\b/\w are unicode-aware by default while DuckDB's
# RE2 is ASCII — the flag pins both engines to the same semantics (e.g.
# 'ü555-123-4567': unicode \b would NOT fire before the digits, RE2 would)
_PII_COMPILED = tuple((re.compile(p, re.ASCII), tok) for p, tok in PII_PATTERNS)


def scrub_pii(s: str) -> str:
    """Replace email / SSN-shaped / phone-shaped substrings with typed
    placeholder tokens, in a FIXED pattern order (order is semantics: the
    SSN shape must win before the phone shape sees the digits)."""
    for pat, tok in _PII_COMPILED:
        s = pat.sub(tok, s)
    return s


def md5_fingerprint(s: str) -> str:
    """md5 hex of the normalized text — matches DuckDB ``md5(...)``."""
    return hashlib.md5(normalize_text(s).encode("utf-8")).hexdigest()


_ROLL_BASE = np.uint64(1099511628211)
_ROLL_INIT = np.uint64(14695981039346656037)


def rolling_fingerprint(s: str) -> int:
    """FNV-1a-style rolling 64-bit hash of normalized text (int64)."""
    h = _ROLL_INIT
    for b in normalize_text(s).encode("utf-8"):
        h = np.uint64(h ^ np.uint64(b)) * _ROLL_BASE
    return int(h.astype(np.int64))


# --------------------------------------------------------------------------
# shingles + MinHash

def char_shingles(s: str, k: int = 5) -> set[int]:
    """k-char shingles of normalized text, each hashed to uint64."""
    t = normalize_text(s)
    if len(t) < k:
        return {hash_u64(t)} if t else set()
    return {hash_u64(t[i : i + k]) for i in range(len(t) - k + 1)}


def char_shingles_u64(s: str, k: int = 5) -> np.ndarray:
    """Vectorized k-BYTE shingles of normalized text as unique uint64
    polynomial rolling hashes (sorted ndarray).

    ~100x the per-shingle blake2b loop of :func:`char_shingles` — the hot
    path for corpus-scale MinHash. Byte- (not char-) level shingling and a
    different hash family than char_shingles: similarity estimates are
    equivalent, exact shingle sets are not interchangeable between the two.
    """
    t = normalize_text(s).encode("utf-8")
    if not t:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(t, dtype=np.uint8).astype(np.uint64)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)))  # short text -> one padded shingle
    n = len(b) - k + 1
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):  # k=5 vectorized passes, not n python hashes
        h = h * _ROLL_BASE + b[j : n + j]
    return np.unique(h)


def jaccard_u64(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two unique-uint64 shingle arrays."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


def word_ngrams(s: str, n: int = 1) -> set[str]:
    words = _WS_RE.split(normalize_text(s))
    if not words or words == [""]:
        return set()
    if n == 1:
        return set(words)
    return {" ".join(words[i : i + n]) for i in range(max(0, len(words) - n + 1))}


def hash_u64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little")


def hash_u64_md5(s: str) -> int:
    """md5-based 64-bit hash (first 8 digest bytes little-endian) —
    byte-identical to DuckDB ``md5_number_upper``, the repo's
    cross-engine oracle contract; blake2b stays the default hash for
    callers with no SQL twin."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


_U64_HASHERS = {"blake2b": hash_u64, "md5": hash_u64_md5}


# Universal hashing mod the Mersenne prime 2^31-1: a,b,x < 2^31 so the
# product a*x fits in uint64 and the whole signature is exact + vectorized.
_MERSENNE31 = np.uint64((1 << 31) - 1)
_N_PERM = 128
_rng = np.random.default_rng(np.random.SeedSequence([12345]))
_MINHASH_A = _rng.integers(1, int(_MERSENNE31), size=_N_PERM, dtype=np.uint64)
_MINHASH_B = _rng.integers(0, int(_MERSENNE31), size=_N_PERM, dtype=np.uint64)


def minhash_signature(shingles, n_perm: int = _N_PERM) -> np.ndarray:
    """(n_perm,) uint64 MinHash signature of a shingle set / uint64 array;
    empty input -> all-max sentinel."""
    if len(shingles) == 0:
        return np.full(n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    if isinstance(shingles, np.ndarray):
        x = shingles % _MERSENNE31
    else:
        x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles)) % _MERSENNE31
    a = _MINHASH_A[:n_perm, None]
    b = _MINHASH_B[:n_perm, None]
    hashed = (a * x[None, :] + b) % _MERSENNE31  # (n_perm, n_shingles)
    return hashed.min(axis=1)


def minhash_signature_batch(shingle_sets: list[set[int]], n_perm: int = _N_PERM) -> np.ndarray:
    """(n_docs, n_perm) signatures."""
    out = np.empty((len(shingle_sets), n_perm), dtype=np.uint64)
    for d, sh in enumerate(shingle_sets):
        out[d] = minhash_signature(sh, n_perm)
    return out


def lsh_bands(sig: np.ndarray, n_bands: int = 32) -> list[int]:
    """Hash each band of the signature to uint64 bucket keys (vectorized
    FNV-style fold over the band rows, salted by band index)."""
    n_perm = sig.shape[-1]
    rows = n_perm // n_bands
    bands = sig[: n_bands * rows].reshape(n_bands, rows)
    h = np.full(n_bands, _ROLL_INIT, dtype=np.uint64)
    for j in range(rows):
        h = (h ^ bands[:, j]) * _ROLL_BASE
    h = (h ^ np.arange(n_bands, dtype=np.uint64)) * _ROLL_BASE
    return [int(v) for v in h]


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


# --------------------------------------------------------------------------
# SimHash

def simhash64(s: str, ngram: int = 2, hash_name: str = "blake2b") -> int:
    """64-bit SimHash over word n-grams (weight 1 each); bit counting is
    one vectorized (n_feats, 64) pass, not a per-feature loop. The "md5"
    hash mode makes the fingerprint a DuckDB expression (SQL-oracled)."""
    feats = word_ngrams(s, ngram)
    if not feats:
        return 0
    hf = _U64_HASHERS[hash_name]
    hs = np.fromiter((hf(f) for f in feats), dtype=np.uint64, count=len(feats))
    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    v = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64).astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def simhash_chunks(h: int, n_chunks: int = 4) -> list[int]:
    """Split into 16-bit chunks: near-dups within hamming<=n_chunks-1 share
    at least one chunk (pigeonhole) — the LSH blocking key."""
    u = h & ((1 << 64) - 1)
    w = 64 // n_chunks
    return [(u >> (i * w)) & ((1 << w) - 1) for i in range(n_chunks)]
