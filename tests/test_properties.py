"""Property-based tests (hypothesis) for the deterministic kernels that
everything else leans on: codec round-trips, shingle/jaccard equivalence,
cleaner idempotence, bucket determinism."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extraction_tests_ray.doclogic.cleaners import dedup_sentences, normalize_ws
from pdf_extraction_tests_ray.functions import text as T
from pdf_extraction_tests_ray.relational import _bucket_of
from pdf_extraction_tests_ray.schema import pack_offset, unpack_offset

texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=400
)


@given(
    st.integers(min_value=1, max_value=999),
    st.integers(min_value=0, max_value=999),
    st.integers(min_value=0, max_value=999),
)
def test_offset_codec_roundtrip(page, y, x):
    p, yy, xx = unpack_offset(pack_offset([page], [y], [x]))
    assert (int(p[0]), int(yy[0]), int(xx[0])) == (page, y, x)


@given(texts, texts)
@settings(max_examples=60)
def test_jaccard_u64_matches_true_byte_shingle_jaccard(a, b):
    """The vectorized rolling-hash shingle Jaccard must equal the Jaccard
    of the true byte-shingle sets (hash collisions would break this)."""
    k = 5

    def true_shingles(s):
        t = T.normalize_text(s).encode("utf-8")
        if not t:
            return set()
        if len(t) < k:
            t = t + b"\x00" * (k - len(t))
        return {t[i : i + k] for i in range(len(t) - k + 1)}

    sa, sb = true_shingles(a), true_shingles(b)
    union = len(sa | sb)
    expected = (len(sa & sb) / union) if union else 1.0
    got = T.jaccard_u64(T.char_shingles_u64(a, k), T.char_shingles_u64(b, k))
    assert abs(got - expected) < 1e-12


@given(texts)
@settings(max_examples=60)
def test_dedup_sentences_idempotent(s):
    once = dedup_sentences(s)
    assert dedup_sentences(once) == once


@given(texts)
@settings(max_examples=60)
def test_normalize_ws_idempotent(s):
    once = normalize_ws(s)
    assert normalize_ws(once) == once


@given(st.lists(st.integers(min_value=-10**9, max_value=10**9), min_size=1, max_size=50))
def test_bucket_of_deterministic_and_in_range(vals):
    df = pd.DataFrame({"k": vals})
    b1 = _bucket_of(df, ["k"], 64)
    b2 = _bucket_of(df.copy(), ["k"], 64)
    assert (b1 == b2).all()
    assert ((b1 >= 0) & (b1 < 64)).all()


@given(st.lists(st.text(max_size=30), min_size=0, max_size=40))
@settings(max_examples=40)
def test_minhash_identity(words):
    """Identical shingle sets -> identical signatures; signature length fixed."""
    s = " ".join(words)
    sig1 = T.minhash_signature(T.char_shingles_u64(s))
    sig2 = T.minhash_signature(T.char_shingles_u64(s))
    assert sig1.shape == (128,)
    assert np.array_equal(sig1, sig2)


# ---------------------------------------------------------------------------
# round-2 kernels: quantile index rule, n-gram windows


@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=200),
    st.sampled_from([0.01, 0.25, 0.5, 0.9, 0.99, 1.0]),
)
@settings(max_examples=60)
def test_quantile_disc_rule_matches_duckdb(vals, q):
    """relational.grouped_quantiles uses index = max(1, ceil(q*n)) into the
    sorted values; DuckDB quantile_disc must agree on arbitrary int data
    (the rule was derived empirically — this pins it)."""
    import duckdb

    s = sorted(vals)
    n = len(s)
    ours = s[max(1, int(np.ceil(q * n))) - 1]
    theirs = duckdb.execute(
        "SELECT quantile_disc(x, ?) FROM (SELECT unnest(?) AS x)", [q, vals]
    ).fetchone()[0]
    assert ours == theirs


@given(texts)
@settings(max_examples=60)
def test_word_ngram_window_count(s):
    """word_ngrams(n=13) must produce exactly the distinct 13-word windows
    of the normalized text (the decontamination kernel)."""
    words = [w for w in T.normalize_text(s).split(" ") if w != ""]
    grams = T.word_ngrams(s, 13)
    if len(words) < 13:
        assert grams == set()
    else:
        expected = {" ".join(words[i : i + 13]) for i in range(len(words) - 12)}
        assert grams == expected


# ---------------------------------------------------------------------------
# sketch family (functions/sketches.py)


@given(st.lists(st.text(max_size=30), max_size=300), st.data())
@settings(max_examples=40)
def test_hll_merge_order_invariant(values, data):
    """Any split of the value stream, folded in any order, yields the
    BIT-IDENTICAL register array (the mergeable-sketch contract the
    distributed operator relies on)."""
    from pdf_extraction_tests_ray.functions import sketches as SK

    whole = SK.hll_add(SK.hll_empty(8), values)
    if values:
        cut = data.draw(st.integers(min_value=0, max_value=len(values)))
    else:
        cut = 0
    a = SK.hll_add(SK.hll_empty(8), values[:cut])
    b = SK.hll_add(SK.hll_empty(8), values[cut:])
    assert np.array_equal(SK.hll_merge(b, a), whole)
    assert np.array_equal(SK.hll_merge(a, b), whole)


@given(
    st.dictionaries(st.text(min_size=1, max_size=8), st.integers(1, 500), max_size=40),
    st.integers(min_value=1, max_value=10),
)
@settings(max_examples=60)
def test_mg_trim_invariants(counts, cap):
    """Trim never overcounts, never exceeds capacity, and undercounts
    every surviving key by the same subtrahend."""
    from pdf_extraction_tests_ray.functions import sketches as SK

    out = SK.mg_trim(dict(counts), cap)
    assert len(out) <= max(cap, len(counts) if len(counts) <= cap else cap)
    subs = {counts[k] - v for k, v in out.items()}
    assert all(v > 0 for v in out.values())
    assert len(subs) <= 1  # uniform subtrahend
    n = sum(counts.values())
    for k, v in out.items():
        assert v <= counts[k] and counts[k] - v <= n / (cap + 1)


@given(st.lists(st.text(max_size=20), min_size=1, max_size=200, unique=True))
@settings(max_examples=40)
def test_bloom_never_misses_members(members):
    from pdf_extraction_tests_ray.functions import sketches as SK

    bits, m, k = SK.bloom_build(members, bits_per_item=8)
    assert SK.bloom_contains(bits, m, k, members).all()


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=500,
    )
)
@settings(max_examples=40)
def test_tdigest_quantiles_monotone_and_in_range(vals):
    """Quantile estimates are monotone in q and bounded by the data range;
    total weight is conserved through build+merge."""
    from pdf_extraction_tests_ray.functions import sketches as SK

    d = SK.tdigest_merge(
        [SK.tdigest_build(vals[: len(vals) // 2]), SK.tdigest_build(vals[len(vals) // 2:])]
    )
    assert abs(d[:, 1].sum() - len(vals)) < 1e-9  # weight conservation
    qs = [SK.tdigest_quantile(d, q) for q in (0.0, 0.25, 0.5, 0.75, 1.0)]
    assert all(a <= b + 1e-9 for a, b in zip(qs, qs[1:]))
    assert min(vals) - 1e-9 <= qs[0] and qs[-1] <= max(vals) + 1e-9
