"""Generic relational capabilities: broadcast joins, hash joins, grouped
aggregates, top-k, windowed event aggregation.

The reference has no relational joins (SURVEY.md §2.5) — these are ENGINE
capabilities used by the driver conformance queries and by pipelines that
join document tables against metadata. Join strategy:

- small side  -> broadcast: ``ray.put`` the lookup ONCE, merge per batch
  inside ``map_batches`` (no shuffle).
- both large  -> ``Dataset.join`` (hash-partitioned); ``num_partitions``
  sized to the cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def pool_max(minimum: int = 8) -> int:
    """Autoscaling actor-pool ceiling sized to the CLUSTER, not a constant:
    a fixed (1, 8) cap throttles a multi-node cluster to 8 actors."""
    try:
        return max(minimum, int(ray.cluster_resources().get("CPU", minimum)))
    except Exception:
        return minimum


def broadcast_join(
    large: "ray.data.Dataset",
    small_df: pd.DataFrame,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Merge a broadcast pandas dimension table into every batch."""
    right_on = right_on or on
    ref = ray.put(small_df)

    class Join:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(self.small, how=how, left_on=on, right_on=right_on)

    return large.map_batches(Join, batch_format="pandas", concurrency=(1, pool_max()))


def join_partitions(minimum: int = 8) -> int:
    """Hash-join partition count sized to the cluster (one partition per
    ~2 CPUs) — a constant caps the shuffle's parallelism on a big cluster."""
    return max(minimum, pool_max() // 2)


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: str | None = None,
    num_partitions: int | None = None,
    join_type: str = "inner",
) -> "ray.data.Dataset":
    """Partitioned hash join for two LARGE sides (one all-to-all shuffle
    via Ray Data's native hash-shuffle join) — the fact-to-fact path when
    neither side fits a broadcast. Dimension tables should use
    :func:`broadcast_join` instead (no shuffle)."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions or join_partitions(),
        on=(on,),
        right_on=(right_on,) if right_on and right_on != on else None,
    )


def _sentinel_for(arrow_type):
    """Dtype-preserving filler value for tagged-union joins: 0 / False / ""
    of the column's OWN type, so the union concat never promotes to
    float64 (int64/uint64 payloads above 2^53 and narrow widths stay
    exact). Filler rows are always dropped by the join filter — the value
    is irrelevant, the dtype is not."""
    t = str(arrow_type)
    if t.startswith(("int", "uint")):
        return np.zeros(1, dtype=t)[0]
    if t in ("float", "double", "float32", "float64", "halffloat"):
        return 0.0
    if t == "bool":
        return False
    if t in ("string", "large_string", "utf8", "large_utf8"):
        return ""
    return None  # nested/other types: None round-trips as null


def semi_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: str | None = None,
    anti: bool = False,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Distributed SEMI (``anti=False``) / ANTI (``anti=True``) join: keep
    left rows whose key does / does not appear in ``right``. Neither side
    is broadcast, so the right side may be arbitrarily large — the scale
    path when a membership filter's key set outgrows ``ray.put``.

    Shuffle shape: the right side is reduced to DISTINCT keys per batch
    (combiner — repeated keys never leave the task), both sides are
    tagged and unioned, and ONE bucket shuffle co-locates each key's left
    rows with its (single) right-key row; the per-bucket filter is a
    vectorized ``isin``. Left payload columns ride the union with a
    DTYPE-PRESERVING sentinel fill on the right side (0 / False / "" of
    the column's own type — the filler rows are dropped by the filter, so
    the value is irrelevant but the dtype is not): the bucket concat then
    never promotes to float64, keeping int64/uint64 payloads above 2^53
    and narrow int widths EXACT with no cast-back step.
    """
    right_on = right_on or on
    lschema = left.schema()
    lcols = list(lschema.names)

    fills = {
        c: _sentinel_for(t)
        for c, t in zip(lschema.names, lschema.types)
        if c != on
    }

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df[lcols].copy()
        out["_side"] = np.int8(1)
        return out

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[right_on].drop_duplicates()
        out = pd.DataFrame({on: keys})
        for c in lcols:
            if c != on:
                out[c] = pd.Series([fills[c]] * len(out), index=out.index)
        out["_side"] = np.int8(0)
        return out[lcols + ["_side"]]

    cols = lcols + ["_side"]
    tagged = (
        left.map_batches(tag_left, batch_format="pandas")
        .select_columns(cols)
        .union(
            right.map_batches(tag_right, batch_format="pandas").select_columns(cols)
        )
    )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = _bucket_of(df, [on], num_buckets)
        return df

    def filt(g: pd.DataFrame) -> pd.DataFrame:
        side = g["_side"].to_numpy()
        rkeys = set(g.loc[side == 0, on].tolist())
        l = g[side == 1]
        hit = l[on].isin(rkeys).to_numpy()
        return l[~hit if anti else hit].drop(columns=["_bucket", "_side"])

    return (
        tagged.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(filt, batch_format="pandas")
    )


def semi_join_bloom(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: str | None = None,
    anti: bool = False,
    num_buckets: int = 64,
    bits_per_key: int = 32,
) -> "ray.data.Dataset":
    """:func:`semi_join` with a broadcast BLOOM PRE-FILTER — the classic
    bloom-join of the distributed-DB literature. Results are IDENTICAL to
    ``semi_join`` (the exact in-bucket check still runs; the bloom has
    false positives only), but the bucket shuffle now moves only the
    bloom-POSITIVE left rows:

    - semi: bloom-negative rows cannot match -> dropped before the
      shuffle (shuffle volume ~ true-hit-rate + fpr of the left table).
    - anti: bloom-negative rows definitely don't match -> emitted
      DIRECTLY, bypassing the shuffle; only positives take the exact
      check.

    Build: the RIGHT side is materialized once (its lineage otherwise
    re-executes three times: the size count, the bloom-build pass, and
    semi_join's distinct-key pass — right sides of membership filters
    are the smaller table by construction, and Ray's object store spills
    if not). The filter's size is then fixed from the metadata-served
    ``count()`` at ``bits_per_key`` bits per right row (fpr ~0.6185^bits
    ~ 1e-7 at 32); each right batch sets bits into a PARTIAL bloom over
    its distinct keys (``sketches.bloom_set`` — the one definition of the
    probe scatter) and the driver OR-merges the fixed-size partials
    streamingly — the driver never holds the key set, only
    ``count * bits_per_key / 8`` bytes (4 bytes/key at the default: the
    middle regime where the distinct-key frozenset is too big to
    broadcast but a compact filter is not; beyond that, fall back to
    plain ``semi_join``). Keys are hashed from their Python values on
    both sides, so int64/string keys compare consistently."""
    from .functions import sketches as SK

    right_on = right_on or on
    right = right.materialize()
    n = max(1, int(right.count()))
    m = n * bits_per_key
    k = max(1, int(round(0.6931 * bits_per_key)))

    def partial_bloom(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[right_on].drop_duplicates().tolist()
        bits = np.zeros((m + 7) // 8, dtype=np.uint8)
        SK.bloom_set(bits, m, k, keys)
        return pd.DataFrame({"_bloom": [bits.tobytes()]})

    merged = np.zeros((m + 7) // 8, dtype=np.uint8)
    for b in right.map_batches(partial_bloom, batch_format="pandas").iter_batches(
        batch_size=8, batch_format="pandas"
    ):
        for raw in b["_bloom"]:
            merged |= np.frombuffer(raw, dtype=np.uint8)
    bref = ray.put(merged)

    def prefilter(df: pd.DataFrame, keep_positive: bool) -> pd.DataFrame:
        if df.empty:
            return df
        hit = SK.bloom_contains(ray.get(bref), m, k, df[on].tolist())
        return df[hit] if keep_positive else df[~hit]

    positives = left.map_batches(
        lambda df: prefilter(df, True), batch_format="pandas"
    )
    checked = semi_join(
        positives, right, on, right_on, anti=anti, num_buckets=num_buckets
    )
    if not anti:
        return checked
    negatives = left.map_batches(
        lambda df: prefilter(df, False), batch_format="pandas"
    )
    return checked.union(negatives)


def anti_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: str | None = None,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """NOT EXISTS over a large right side — see :func:`semi_join`."""
    return semi_join(left, right, on, right_on, anti=True, num_buckets=num_buckets)


def _bucket_of(df: pd.DataFrame, keys, num_buckets: int) -> np.ndarray:
    """Deterministic cross-process hash bucket of the key columns
    (pandas' stable hash; never Python's salted hash())."""
    acc = None
    for k in keys:
        h = pd.util.hash_pandas_object(df[k], index=False).to_numpy()
        acc = h if acc is None else (acc * np.uint64(1000003)) ^ h
    return (acc % np.uint64(num_buckets)).astype("int64")


def bucketed_group_merge(
    ds: "ray.data.Dataset", keys, merge_fn, num_buckets: int = 64
) -> "ray.data.Dataset":
    """Bring equal keys together via a BOUNDED bucket shuffle and merge.

    ``ds`` holds per-batch PARTIAL aggregate rows; ``merge_fn`` (pandas
    in/out) combines rows sharing a key. Why not ``groupby(keys)``
    directly: Ray's grouped aggregate costs ~ms per distinct key (measured
    ~1.8 ms/key locally) — pathological for high-cardinality keys. A
    256-way bucket shuffle moves the same rows but runs O(num_buckets)
    group tasks, each merging its keys with one vectorized pandas groupby.

    Skew: a hot key lands entirely in one bucket task; for associative
    merges switch to :func:`salted_group_merge`.
    """

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = _bucket_of(df, keys, num_buckets)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return merge_fn(g.drop(columns=["_bucket"]))

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(merge, batch_format="pandas")
    )


def salted_group_merge(
    ds: "ray.data.Dataset",
    keys,
    merge_fn,
    num_buckets: int = 64,
    num_salts: int = 8,
) -> "ray.data.Dataset":
    """Skew-safe :func:`bucketed_group_merge` for ASSOCIATIVE merges.

    A pathological hot key sends all its partial rows to one bucket task
    in ``bucketed_group_merge``; here stage 1 splits every key across
    ``num_salts`` sub-groups (salt = a per-row round-robin — correctness
    needs no cross-process salt determinism because ``merge_fn`` must be
    associative+commutative, e.g. sums/counts/min/max partials), merges
    within (key, salt), then stage 2 re-merges the at-most-``num_salts``
    survivors per key. The hot key's work spreads over ``num_salts``
    tasks; every other key pays one extra tiny merge.

    NOT for order- or completeness-sensitive group bodies (sessionize,
    as-of, all-pairs blocks): splitting those groups changes semantics —
    their skew lever is a bigger ``num_buckets`` or an upstream key-range
    split, as documented per operator.
    """

    def add_salted_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_salt"] = np.arange(len(df), dtype=np.int64) % num_salts
        df["_bucket"] = (
            _bucket_of(df, list(keys), num_buckets) * num_salts + df["_salt"].to_numpy()
        )
        return df

    def merge_salted(g: pd.DataFrame) -> pd.DataFrame:
        return merge_fn(g.drop(columns=["_salt", "_bucket"]))

    stage1 = (
        ds.map_batches(add_salted_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(merge_salted, batch_format="pandas")
    )
    return bucketed_group_merge(stage1, keys, merge_fn, num_buckets=num_buckets)


def asof_join_backward(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    by: str,
    right_by: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    num_buckets: int = 64,
    right_dedupe=None,
    payload_dtypes: dict | None = None,
) -> "ray.data.Dataset":
    """Backward as-of join (Ray Data has no native one; SURVEY.md custom-op
    rule (a): composition of map_batches + groupby.map_groups).

    For each left row, match the right row with the greatest
    ``right_ts <= left_ts`` sharing the join key. ONE co-partitioning
    shuffle: both sides are tagged and unioned, bucketed by a deterministic
    hash of the key, and each bucket group runs a vectorized
    ``pd.merge_asof``. Partitioning assumption: all rows of one key land in
    one bucket (guaranteed by the hash), and a single key's rows fit in one
    group's memory — salt hot keys upstream if a key is pathological.

    Right-side ties on (key, ts) must be resolved or the tie choice is
    engine-dependent (same caveat as DuckDB ASOF). Pass ``right_dedupe``
    (pandas df in/out over [by, "_ts"] + right_cols, transport-dtype
    payloads) to resolve ties INSIDE the merge group — the bucket already
    co-locates a key's rows, so this costs no extra shuffle, unlike
    pre-deduplicating with a separate grouped aggregate. Inner semantics:
    unmatched left rows are dropped.

    Payload transport: by default every payload column rides the tagged
    union as float64 (one shared schema; exact for ints < 2^53). Pass
    ``payload_dtypes={col: "int64" | "object" | "float64"}`` for any
    subset to transport those columns TYPED instead — int64 via the
    nullable Int64 extension array (exact at full 64-bit range, re-cast
    to plain int64 after the inner join drops the NA fill) and strings
    via object/None — which also makes string payloads joinable at all.
    """
    payload_dtypes = payload_dtypes or {}
    _supported = {"int64", "int32", "string", "str", "object", "float64"}
    _bad = {c: d for c, d in payload_dtypes.items() if str(d) not in _supported}
    if _bad:
        # an unknown dtype would silently fall back to float64 NaN fill in
        # _null_fill while tag_* casts real values to it — conflicting
        # dtypes per column across blocks break Arrow schema unification
        raise ValueError(
            f"unsupported payload_dtypes {_bad}; supported: {sorted(_supported)}"
        )

    def _transport(c: str) -> str:
        d = str(payload_dtypes.get(c, "float64"))
        return {"int64": "Int64", "int32": "Int64", "string": "object", "str": "object"}.get(d, d)

    def _null_fill(dtype: str, k: int) -> pd.Series:
        if dtype == "object":
            return pd.Series([None] * k, dtype="object")
        return pd.Series([pd.NA] * k, dtype=dtype) if dtype == "Int64" else pd.Series(
            np.full(k, np.nan), dtype="float64"
        )

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[by, left_ts] + left_cols].rename(columns={left_ts: "_ts"})
        out["_side"] = 1
        for c in left_cols:
            out[c] = out[c].astype(_transport(c))
        for c in right_cols:
            out[c] = _null_fill(_transport(c), len(out)).values
        return out

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[right_by, right_ts] + right_cols].rename(
            columns={right_by: by, right_ts: "_ts"}
        )
        out["_side"] = 0
        for c in right_cols:
            out[c] = out[c].astype(_transport(c))
        for c in left_cols:
            out[c] = _null_fill(_transport(c), len(out)).values
        return out

    cols = [by, "_ts", "_side"] + left_cols + right_cols
    tagged = left.map_batches(tag_left, batch_format="pandas").select_columns(cols).union(
        right.map_batches(tag_right, batch_format="pandas").select_columns(cols)
    )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = _bucket_of(df, [by], num_buckets)
        return df

    def _final(c: str) -> str:
        # post-inner-join both sides are non-null: Int64 re-packs to int64
        d = _transport(c)
        return "int64" if d == "Int64" else d

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == 1][[by, "_ts"] + left_cols].sort_values("_ts", kind="stable")
        r = g[g["_side"] == 0][[by, "_ts"] + right_cols].sort_values("_ts", kind="stable")
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame(
                {c: pd.Series(dtype=_final(c)) for c in left_cols + right_cols}
            )
        if right_dedupe is not None:
            r = right_dedupe(r).sort_values("_ts", kind="stable")
        out = pd.merge_asof(l, r, on="_ts", by=by, direction="backward")
        out = out.dropna(subset=right_cols)
        out = out[left_cols + right_cols]
        for c in left_cols + right_cols:
            if _transport(c) == "Int64":
                out[c] = out[c].astype("int64")
        return out

    return (
        tagged.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(merge, batch_format="pandas")
    )


def grouped_topk(
    ds: "ray.data.Dataset",
    group_keys: list[str],
    sort_cols: list[str],
    ascending: list[bool],
    k: int,
) -> "ray.data.Dataset":
    """Top-k rows per group: per-block partial top-k (cheap, no shuffle)
    then a grouped final top-k over the k*num_blocks survivors. The shuffle
    moves at most k rows per (group, block) — never the full table."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(sort_cols, ascending=ascending, kind="stable")
            .groupby(group_keys, sort=False)
            .head(k)
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(sort_cols, ascending=ascending, kind="stable").head(k)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group_keys)
        .map_groups(final, batch_format="pandas")
    )


def pivot_counts(
    ds: "ray.data.Dataset",
    row_key: str,
    col_key: str,
    categories: list[str],
) -> "ray.data.Dataset":
    """PIVOT/crosstab: one wide row per ``row_key`` value with a count
    column per category of ``col_key`` (fixed, caller-declared category
    list — the output schema must be static for Arrow). Per-batch partial
    crosstab (combiner: at most one row per distinct row_key leaves each
    batch) then a small ``groupby().aggregate`` merge — the shuffle never
    moves raw rows. Rows whose ``col_key`` is outside ``categories`` are
    dropped (counted by no column); output count columns are
    ``n_<category.lower()>``, int64.
    """
    from ray.data.aggregate import Sum

    cols = [f"n_{c.lower()}" for c in categories]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(df[row_key], df[col_key])
        ct = ct.reindex(columns=categories, fill_value=0).astype("int64")
        ct.columns = cols
        return ct.reset_index()

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(row_key)
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    )


def grouped_corr(
    ds: "ray.data.Dataset",
    group: str,
    x: str,
    y: str,
    out_col: str = "corr",
    decimals: int = 6,
) -> "ray.data.Dataset":
    """Pearson correlation per group via MERGEABLE MOMENTS: each batch
    reduces to (n, Σx, Σy, Σx², Σy², Σxy) per group — six int64s — and one
    small ``groupby().aggregate`` merges them; the correlation is computed
    once per group from the exact sums. The shuffle moves one 6-number row
    per (group, batch), never raw rows.

    Exactness contract: ``x``/``y`` must be INTEGER-unit columns whose
    squared sums fit int64 (both engines then evaluate the identical
    integer-fed float expression — hash-exact vs the SQL oracle after
    rounding). For unbounded magnitudes swap the partial for Chan/Welford
    float merging at the cost of bit-exactness. Degenerate groups (zero
    variance) yield NaN, matching SQL's NULL-on-zero-denominator.
    """
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        xv = df[x].astype("int64")
        yv = df[y].astype("int64")
        d = pd.DataFrame(
            {
                group: df[group],
                "_n": np.int64(1),
                "_sx": xv,
                "_sy": yv,
                "_sxx": xv * xv,
                "_syy": yv * yv,
                "_sxy": xv * yv,
            }
        )
        return d.groupby(group, sort=False).sum().reset_index()

    cols = ["_n", "_sx", "_sy", "_sxx", "_syy", "_sxy"]
    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group)
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["_n"].to_numpy(dtype=np.float64)
        sx = df["_sx"].to_numpy(dtype=np.float64)
        sy = df["_sy"].to_numpy(dtype=np.float64)
        num = n * df["_sxy"].to_numpy(dtype=np.float64) - sx * sy
        den = np.sqrt(
            (n * df["_sxx"].to_numpy(dtype=np.float64) - sx * sx)
            * (n * df["_syy"].to_numpy(dtype=np.float64) - sy * sy)
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.round(num / den, decimals)
        out = df[[group]].copy()
        out[out_col] = c
        out["n"] = df["_n"].astype("int64")
        return out

    return agg.map_batches(finish, batch_format="pandas")


def grouped_standardize(
    ds: "ray.data.Dataset",
    group: str,
    col: str,
    keys: list[str],
    out_col: str = "z",
    decimals: int = 6,
) -> "ray.data.Dataset":
    """Per-group z-score standardization (the ML feature-normalization
    primitive): ``z = (x - mean) / std`` with POPULATION std, computed in
    the two-pass global-stat shape — pass 1 reduces each group to exact
    int64 moments (n, Σx, Σx²) via the same combiner as
    :func:`grouped_corr` (one tiny shuffle; one row per group comes back
    to the driver — groups are low-cardinality by assumption); pass 2
    broadcasts the moments and standardizes streamingly. Same exactness
    contract as grouped_corr: ``col`` must be an INTEGER-unit column with
    Σx² inside int64, and both engines evaluate the identical
    mean/var/z float expression (round ``decimals``). Zero-variance
    groups yield NaN (SQL NULL).

    Output: ``keys + [group, out_col]``.
    """
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        xv = df[col].astype("int64")
        d = pd.DataFrame(
            {group: df[group], "_n": np.int64(1), "_sx": xv, "_sxx": xv * xv}
        )
        return d.groupby(group, sort=False).sum().reset_index()

    stats = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group)
        .aggregate(
            Sum("_n", alias_name="_n"),
            Sum("_sx", alias_name="_sx"),
            Sum("_sxx", alias_name="_sxx"),
        )
        .to_pandas()
    )
    n = stats["_n"].to_numpy(dtype=np.float64)
    sx = stats["_sx"].to_numpy(dtype=np.float64)
    mean = sx / n
    var = stats["_sxx"].to_numpy(dtype=np.float64) / n - mean * mean
    with np.errstate(invalid="ignore"):
        std = np.sqrt(var)
    mref = ray.put(
        {
            g: (m, s)
            for g, m, s in zip(stats[group].tolist(), mean.tolist(), std.tolist())
        }
    )

    def standardize(df: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(mref)
        ms = df[group].map(lambda g: lookup[g][0]).to_numpy(dtype=np.float64)
        ss = df[group].map(lambda g: lookup[g][1]).to_numpy(dtype=np.float64)
        x = df[col].astype("int64").to_numpy(dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.round((x - ms) / ss, decimals)
        out = df[keys + [group]].copy()
        out[out_col] = z
        return out

    return ds.map_batches(standardize, batch_format="pandas")


def grouped_rollup(
    ds: "ray.data.Dataset",
    keys: list,
    val: str,
    total_label: str = "ALL",
) -> "ray.data.Dataset":
    """ROLLUP (multi-level aggregate) in ONE pass and ONE shuffle: each
    batch pre-aggregates the FINEST level once, derives every coarser
    level from those few partial rows (not from the raw batch — the
    re-group runs over the already-collapsed key combinations), and a
    single small ``groupby(keys)`` merges all levels. Rolled-up key
    columns carry ``total_label``, so keys must be STRING columns
    (validated — a mixed int/str object column would break the Arrow
    block conversion). Output: (keys..., n_rows, sum_<val>)."""
    from ray.data.aggregate import Sum

    _NON_STRING = ("int", "uint", "float", "double", "bool", "decimal", "date", "time")
    for c, t in zip(ds.schema().names, ds.schema().types):
        if c in keys and str(t).startswith(_NON_STRING):
            raise TypeError(
                f"grouped_rollup key {c!r} has type {t} — rolled-up levels "
                f"write the string {total_label!r} into key columns, so "
                f"keys must be strings (cast upstream)"
            )

    sum_col = f"sum_{val}"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        finest = (
            df.groupby(keys, sort=False)
            .agg(n_rows=(val, "size"), **{sum_col: (val, "sum")})
            .reset_index()
        )
        outs = [finest]
        for lvl in range(len(keys) - 1, -1, -1):
            g = finest.copy()
            for k in keys[lvl:]:
                g[k] = total_label
            outs.append(
                g.groupby(keys, sort=False)
                .agg(n_rows=("n_rows", "sum"), **{sum_col: (sum_col, "sum")})
                .reset_index()
            )
        return pd.concat(outs, ignore_index=True)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(keys)
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum(sum_col, alias_name=sum_col),
        )
    )


def grouped_cube(
    ds: "ray.data.Dataset",
    keys: list,
    val: str,
    total_label: str = "ALL",
) -> "ray.data.Dataset":
    """CUBE (all 2^k grouping sets) in ONE pass and ONE shuffle — the
    :func:`grouped_rollup` trick generalized: each batch pre-aggregates
    the finest level once and derives EVERY subset of ``keys`` from those
    few partial rows, so 2^k levels still move O(distinct finest combos)
    rows per batch. Keys must be string columns (rolled-up cells carry
    ``total_label``). Output: (keys..., n_rows, sum_<val>)."""
    from itertools import combinations

    from ray.data.aggregate import Sum

    _NON_STRING = ("int", "uint", "float", "double", "bool", "decimal", "date", "time")
    for c, t in zip(ds.schema().names, ds.schema().types):
        if c in keys and str(t).startswith(_NON_STRING):
            raise TypeError(
                f"grouped_cube key {c!r} has type {t} — rolled-up levels "
                f"write the string {total_label!r} into key columns, so "
                f"keys must be strings (cast upstream)"
            )

    sum_col = f"sum_{val}"
    subsets = [
        frozenset(c) for r in range(len(keys) + 1) for c in combinations(keys, r)
    ]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        finest = (
            df.groupby(keys, sort=False)
            .agg(n_rows=(val, "size"), **{sum_col: (val, "sum")})
            .reset_index()
        )
        outs = []
        for S in subsets:
            g = finest.copy()
            for k in keys:
                if k not in S:
                    g[k] = total_label
            outs.append(
                g.groupby(keys, sort=False)
                .agg(n_rows=("n_rows", "sum"), **{sum_col: (sum_col, "sum")})
                .reset_index()
            )
        return pd.concat(outs, ignore_index=True)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(keys)
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum(sum_col, alias_name=sum_col),
        )
    )


def grouped_running_sum(
    ds: "ray.data.Dataset",
    group: str,
    order_cols: list,
    val: str,
    out_col: str = "running_sum",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Per-key ordered WINDOW FUNCTION (SUM OVER PARTITION BY .. ORDER
    BY ..): cumulative sum of ``val`` within each ``group``, ordered by
    ``order_cols``. ONE bucket shuffle co-locates each key's rows; the
    per-bucket pass is a vectorized lexsort + ``groupby().cumsum()``.
    Include a unique tiebreaker in ``order_cols`` or the running values
    at ties are frame-definition-dependent (same caveat as SQL). All
    input columns ride through; partitioning assumption: one key's rows
    fit in one group (salt pathological keys upstream)."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = _bucket_of(df, [group], num_buckets)
        return df

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="stable").drop(columns=["_bucket"])
        g[out_col] = g.groupby(group, sort=False)[val].cumsum()
        return g

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(running, batch_format="pandas")
    )


def global_rank(
    ds: "ray.data.Dataset",
    key_col: str,
    tiebreak: str,
    out_col: str = "pos",
    prefix_chars: int = 2,
) -> "ray.data.Dataset":
    """Distributed zipWithIndex / global rank: every row gets its 0-based
    position in the total order ``(key_col, tiebreak)`` — exactly
    ``row_number() OVER (ORDER BY key, tiebreak) - 1`` — without a
    single-node sort or a driver materialization.

    Requires ``key_col`` to be a lowercase-hex digest (md5-style): its
    leading ``prefix_chars`` chars define 16^prefix_chars range buckets
    that are both ORDER-ALIGNED (bucket i's keys all sort before bucket
    i+1's) and uniform. Two passes: (1) per-batch bucket counts are
    pre-aggregated and cumsum'd driver-side into bucket offsets (tiny:
    16^prefix_chars ints, broadcast back); (2) ONE ``groupby(bucket)``
    shuffle — each bucket sorts locally and adds its offset. For
    non-digest keys, derive a digest key upstream or swap the bucket fn
    for sampled range boundaries.

    Both passes re-execute ``ds``'s lazy lineage, so the upstream must be
    DETERMINISTIC (reads + pure transforms — true of every pipeline here;
    an unseeded sample upstream would desync counts from rank rows).
    """
    nb = 16 ** prefix_chars

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = np.fromiter(
            (int(s[:prefix_chars], 16) for s in df[key_col].tolist()),
            dtype=np.int64,
            count=len(df),
        )
        return df

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("_b", sort=False).size().rename("_cnt").reset_index()
        return g

    cnt = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .map_batches(counts, batch_format="pandas")
        .to_pandas()  # <= nb rows per input block — driver-small
        .groupby("_b")["_cnt"]
        .sum()
    )
    full = cnt.reindex(range(nb), fill_value=0).to_numpy()
    offsets = np.concatenate([[0], np.cumsum(full)[:-1]]).astype("int64")
    oref = ray.put(offsets)

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, tiebreak], kind="stable")
        b = int(g["_b"].iloc[0])
        g[out_col] = ray.get(oref)[b] + np.arange(len(g), dtype="int64")
        return g.drop(columns=["_b"])

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(rank, batch_format="pandas")
    )


def grouped_rank(
    ds: "ray.data.Dataset",
    group: str,
    order_col: str,
    keys: list[str],
    out_col: str = "rank",
    descending: bool = False,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """RANK() OVER (PARTITION BY group ORDER BY order_col) — ties share a
    rank and leave gaps, exactly SQL's RANK semantics (tie-stable: the
    output is a pure function of the VALUES, no tiebreak column needed).
    ONE bucket shuffle co-locates each group; the per-bucket pass is a
    vectorized sort + first-occurrence-index scatter. Output:
    ``keys + [group, order_col, out_col]`` (int64 ranks from 1)."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[keys + [group, order_col]].copy()
        df["_bucket"] = _bucket_of(df, [group], num_buckets)
        return df

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group, order_col], ascending=[True, not descending],
                          kind="stable")
        u = g[group].to_numpy()
        v = g[order_col].to_numpy()
        n = len(g)
        if n == 0:
            g[out_col] = np.array([], dtype="int64")
            return g.drop(columns=["_bucket"])
        pos = np.arange(n, dtype="int64")
        new_grp = np.r_[True, u[1:] != u[:-1]]
        grp_start = np.maximum.accumulate(np.where(new_grp, pos, 0))
        new_val = new_grp | np.r_[True, v[1:] != v[:-1]]
        # rank = index of the tie-run's first row within its group, +1
        run_start = np.maximum.accumulate(np.where(new_val, pos, 0))
        g[out_col] = run_start - grp_start + 1
        return g.drop(columns=["_bucket"])

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(rank, batch_format="pandas")
    )


def grouped_lag_diff(
    ds: "ray.data.Dataset",
    group: str,
    ts: str,
    tiebreak: str,
    out_col: str,
    num_buckets: int = 64,
    default: int = -1,
) -> "ray.data.Dataset":
    """LAG window function: per group (ordered by ``ts`` then ``tiebreak``),
    the gap in seconds to the group's PREVIOUS row — i.e.
    ``t - LAG(t) OVER (PARTITION BY group ORDER BY ts, tiebreak)``; the
    group's first row gets ``default`` (not NULL — null-free output hashes
    exactly). ONE bucket shuffle co-locates each group (same shape as
    :func:`grouped_running_sum`); the per-bucket pass is a vectorized
    sort + diff. The explicit ``tiebreak`` column makes tied timestamps
    deterministic on both the Ray and SQL sides.

    Output: (group, tiebreak, out_col) — int64 epoch-second gaps.
    """

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                group: df[group],
                tiebreak: df[tiebreak],
                "_t": df[ts].astype("datetime64[s]").astype("int64"),
            }
        )
        out["_bucket"] = _bucket_of(out, [group], num_buckets)
        return out

    def lag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group, "_t", tiebreak], kind="stable")
        t = g["_t"].to_numpy()
        u = g[group].to_numpy()
        if len(t) == 0:
            return pd.DataFrame(
                {
                    group: u,
                    tiebreak: g[tiebreak].to_numpy(),
                    out_col: np.array([], dtype="int64"),
                }
            )
        gap = np.r_[np.int64(default), t[1:] - t[:-1]]
        gap[np.r_[True, u[1:] != u[:-1]]] = default
        return pd.DataFrame({group: u, tiebreak: g[tiebreak].to_numpy(), out_col: gap})

    return (
        ds.map_batches(prep, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(lag, batch_format="pandas")
    )


def sessionize(
    events: "ray.data.Dataset",
    by: str,
    ts: str,
    gap_s: int,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Gap-based sessionization (stateful streaming window, batch form):
    events of one key, sorted by time, split into sessions wherever the
    inter-event gap exceeds ``gap_s`` seconds.

    ONE bucket shuffle co-locates each key's events; the per-bucket pass is
    fully vectorized (sort -> diff -> boundary cumsum). Deterministic under
    timestamp ties: a zero gap never opens a session, so tie order cannot
    change the result. Partitioning assumption: one key's events fit in one
    group (salt upstream for pathological keys).

    Output: (by, session_start_s, n_events, duration_s) per session.
    """

    def to_epoch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {by: df[by], "_t": df[ts].astype("datetime64[s]").astype("int64")}
        )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = _bucket_of(df, [by], num_buckets)
        return df

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([by, "_t"], kind="stable")
        t = g["_t"].to_numpy()
        u = g[by].to_numpy()
        if len(t) == 0:
            return pd.DataFrame(
                {by: [], "session_start_s": [], "n_events": [], "duration_s": []}
            )
        new_user = np.r_[True, u[1:] != u[:-1]]
        gap = np.r_[0, t[1:] - t[:-1]]
        sid = np.cumsum(new_user | (gap > gap_s))
        out = (
            pd.DataFrame({by: u, "_t": t, "_sid": sid})
            .groupby([by, "_sid"], sort=False)
            .agg(session_start_s=("_t", "min"), n_events=("_t", "size"), _end=("_t", "max"))
            .reset_index()
        )
        out["duration_s"] = out["_end"] - out["session_start_s"]
        return out[[by, "session_start_s", "n_events", "duration_s"]]

    return (
        events.map_batches(to_epoch, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(sessions, batch_format="pandas")
    )


def _quantile_col(q: float) -> str:
    """Collision-free quantile column name: p50, p99, p99_9, p12_5 —
    int(q*100) would map 0.99 and 0.999 both to 'p99'."""
    return "p" + f"{q * 100:g}".replace(".", "_")


def grouped_quantiles(
    ds: "ray.data.Dataset",
    group: str,
    col: str,
    qs: tuple = (0.5, 0.9, 0.99),
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """EXACT distributed per-group quantiles of an integer column via
    mergeable value-count histograms.

    Shuffle shape: per-batch partial ``(group, value, count)`` rows (one
    row per distinct value per batch — the mergeable-sketch pattern; for
    unbounded-cardinality float columns swap in a t-digest partial), then
    ONE bucket shuffle keyed on ``group`` co-locates each group's
    histogram; the final pass merges counts and reads quantiles off the
    cumulative histogram. The shuffle moves histograms, never raw rows.

    Quantile definition: 1-based index ``max(1, ceil(q * n))`` into the
    sorted values — DuckDB's ``quantile_disc`` rule (verified empirically),
    so results hash-match the SQL oracle exactly (integer values, no
    interpolation).

    Output: one row per group with columns ``group, p<q*100>...``.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([group, col], sort=False).size().rename("_cnt").reset_index()
        return g

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = _bucket_of(df, [group], num_buckets)
        return df

    def final(gdf: pd.DataFrame) -> pd.DataFrame:
        out: dict = {group: []}
        for q in qs:
            out[_quantile_col(q)] = []
        for gkey, sub in gdf.groupby(group, sort=False):
            hist = sub.groupby(col, sort=True)["_cnt"].sum()
            vals = hist.index.to_numpy()
            cum = np.cumsum(hist.to_numpy())
            n = int(cum[-1])
            out[group].append(gkey)
            for q in qs:
                idx = max(1, int(np.ceil(q * n)))
                out[_quantile_col(q)].append(int(vals[int(np.searchsorted(cum, idx))]))
        return pd.DataFrame(out)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(final, batch_format="pandas")
    )


def grouped_quantiles_tdigest(
    ds: "ray.data.Dataset",
    group: str,
    col: str,
    qs: tuple = (0.5, 0.9, 0.99),
    delta: int = 200,
    deterministic: bool = False,
    rel_err: float = 0.005,
) -> "ray.data.Dataset":
    """APPROXIMATE per-group quantiles of a CONTINUOUS column via
    mergeable t-digests (functions.sketches.tdigest_*) — the scale path
    :func:`grouped_quantiles` documents: a float column with unbounded
    distinct values would make the exact value-count histogram O(rows),
    while a digest is <= ~2*delta centroids per (group, batch) regardless
    of cardinality. Shuffle: one low-cardinality ``groupby(group)``.
    Output: (group, p50, p90, ... float64).

    ``deterministic=False`` (classic): per-batch value-clustered digests,
    estimates within the digest bound (tightest at the tails — k1 scale
    function) but bits depend on batch boundaries, so tests pin the ERROR
    BOUND across layouts.

    ``deterministic=True`` (VERDICT r3 #6): the per-batch stage emits
    DDSketch-style log-binned INTEGER counts (bin = ceil(ln|v| / ln g),
    g = (1+rel_err)/(1-rel_err)) instead of data-dependent centroids;
    counts merge by integer addition (order-free), and the t-digest
    compressor + quantile interpolation run over the canonical
    bin-histogram — so the OUTPUT IS A PURE FUNCTION OF THE VALUE
    MULTISET: bit-equal across any batch/block layout or parallelism
    (pinned in tests). A canonical sort of per-batch digests alone could
    not achieve this — the digests themselves change with batch cuts; the
    price here is a bounded multiplicative error (|v_est/v| - 1 <=
    rel_err) added to the digest bound, and bin keys touching libm
    (identical within one platform; values exactly on a bin edge could
    bin differently across libms)."""
    from .functions import sketches as SK

    if deterministic:
        gamma = (1.0 + rel_err) / (1.0 - rel_err)
        lg = float(np.log(gamma))

        def partial_det(df: pd.DataFrame) -> pd.DataFrame:
            v = df[col].to_numpy(dtype=np.float64)
            sgn = np.sign(v).astype(np.int8)
            absv = np.abs(v)
            bins = np.zeros(len(v), dtype=np.int64)
            nz = absv > 0
            bins[nz] = np.ceil(np.log(absv[nz]) / lg).astype(np.int64)
            out = pd.DataFrame({group: df[group].to_numpy(), "sgn": sgn, "bin": bins})
            return (
                out.groupby([group, "sgn", "bin"], sort=False)
                .size()
                .rename("count")
                .reset_index()
            )

        def merge_det(gdf: pd.DataFrame) -> pd.DataFrame:
            agg = gdf.groupby(["sgn", "bin"], sort=True)["count"].sum().reset_index()
            sgn = agg["sgn"].to_numpy(dtype=np.float64)
            b = agg["bin"].to_numpy(dtype=np.float64)
            # DDSketch bin midpoint 2*g^i/(g+1); zero bin maps to 0.0
            centers = sgn * (2.0 * np.power(gamma, b) / (gamma + 1.0))
            w = agg["count"].to_numpy(dtype=np.float64)
            order = np.argsort(centers, kind="stable")  # centers are distinct
            d = SK._tdigest_compress(
                np.stack([centers[order], w[order]], axis=1), delta
            )
            row = {group: [gdf[group].iloc[0]]}
            for q in qs:
                row[_quantile_col(q)] = [SK.tdigest_quantile(d, q)]
            return pd.DataFrame(row)

        return (
            ds.map_batches(partial_det, batch_format="pandas")
            .groupby(group)
            .map_groups(merge_det, batch_format="pandas")
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        groups, digs = [], []
        for g, sub in df.groupby(group, sort=False):
            d = SK.tdigest_build(sub[col].to_numpy(dtype=np.float64), delta)
            groups.append(g)
            digs.append(d.tobytes())
        return pd.DataFrame({group: groups, "_dig": digs})

    def merge(gdf: pd.DataFrame) -> pd.DataFrame:
        digs = [
            np.frombuffer(b, dtype=np.float64).reshape(-1, 2)
            for b in gdf["_dig"].tolist()
        ]
        d = SK.tdigest_merge(digs, delta)
        row = {group: [gdf[group].iloc[0]]}
        for q in qs:
            row[_quantile_col(q)] = [SK.tdigest_quantile(d, q)]
        return pd.DataFrame(row)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group)
        .map_groups(merge, batch_format="pandas")
    )


def grouped_quantiles_ddsketch(
    ds: "ray.data.Dataset",
    group: str,
    col: str,
    qs: tuple = (0.5, 0.9, 0.99),
    rel_err: float = 0.005,
    as_bins: bool = False,
) -> "ray.data.Dataset":
    """DDSketch-style per-group quantiles: log-binned INTEGER counts
    (bin = ceil(ln|v| / ln g), g = (1+rel_err)/(1-rel_err)), quantile =
    first bin whose cumulative count reaches floor(q*(n-1))+1 in
    ascending value order. Relative error <= rel_err, one low-cardinality
    shuffle, and — unlike a t-digest — the answer is a PURE FUNCTION OF
    THE VALUE MULTISET with no compressor in the loop, so it carries a
    full value-hash SQL oracle.

    ``as_bins=True`` (requires strictly positive values) returns the raw
    integer bin per quantile plus n — all-int64 output, the form the
    driver oracle hashes: the bin derivation (ln + ceil) is bit-identical
    between numpy and DuckDB on this platform, while the float center
    2*g^b/(g+1) is exp/pow, which the two libms disagree on in the last
    ulps (measured 1.5e-11) — so the oracled surface stays integer and
    the float reconstruction stays on the engine side. Default returns
    float centers (sign-aware, zero bin -> 0.0)."""

    gamma = (1.0 + rel_err) / (1.0 - rel_err)
    lg = float(np.log(gamma))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        sgn = np.sign(v).astype(np.int8)
        absv = np.abs(v)
        bins = np.zeros(len(v), dtype=np.int64)
        nz = absv > 0
        bins[nz] = np.ceil(np.log(absv[nz]) / lg).astype(np.int64)
        out = pd.DataFrame({group: df[group].to_numpy(), "sgn": sgn, "bin": bins})
        return (
            out.groupby([group, "sgn", "bin"], sort=False)
            .size()
            .rename("count")
            .reset_index()
        )

    def merge(gdf: pd.DataFrame) -> pd.DataFrame:
        agg = gdf.groupby(["sgn", "bin"], sort=False)["count"].sum().reset_index()
        sgn = agg["sgn"].to_numpy(dtype=np.int64)
        b = agg["bin"].to_numpy(dtype=np.int64)
        w = agg["count"].to_numpy(dtype=np.int64)
        # ascending VALUE order: sign first, then magnitude (descending
        # for negatives — a larger |bin| is a more negative value)
        order = np.lexsort((sgn * b, sgn))
        sgn, b, w = sgn[order], b[order], w[order]
        cum = np.cumsum(w)
        n = int(cum[-1])
        row: dict = {group: [gdf[group].iloc[0]]}
        if as_bins:
            if not (sgn == 1).all():
                raise ValueError("as_bins=True requires strictly positive values")
            row["n"] = np.array([n], dtype=np.int64)
        for q in qs:
            t = int(np.floor(q * (n - 1.0))) + 1
            i = int(np.searchsorted(cum, t, side="left"))
            if as_bins:
                row[_quantile_col(q) + "_bin"] = np.array([b[i]], dtype=np.int64)
            else:
                center = float(sgn[i]) * (2.0 * np.exp(b[i] * lg) / (gamma + 1.0))
                row[_quantile_col(q)] = [0.0 if sgn[i] == 0 else center]
        return pd.DataFrame(row)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group)
        .map_groups(merge, batch_format="pandas")
    )


def grouped_distinct_count(
    ds: "ray.data.Dataset", group: str, col: str, num_buckets: int = 64
) -> "ray.data.Dataset":
    """EXACT per-group distinct count, shuffle-minimal: per-batch
    (group, value) dedupe (the combiner — repeated values never leave the
    batch), bucketed dedupe-merge on the high-cardinality (group, value)
    key, then per-bucket partial counts into a tiny final group merge.
    Output: (group, n_distinct)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[[group, col]].drop_duplicates()

    distinct = bucketed_group_merge(
        ds.map_batches(partial, batch_format="pandas"),
        [group, col],
        lambda df: df.drop_duplicates(),
        num_buckets=num_buckets,
    )

    def cnt(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(group, sort=False).size().rename("n_distinct").reset_index()

    from ray.data.aggregate import Sum

    return (
        distinct.map_batches(cnt, batch_format="pandas")
        .groupby(group)
        .aggregate(Sum("n_distinct", alias_name="n_distinct"))
    )


def grouped_approx_distinct(
    ds: "ray.data.Dataset", group: str, col: str, p: int = 12, hash_name: str = "blake2b"
) -> "ray.data.Dataset":
    """APPROXIMATE per-group distinct count via mergeable HyperLogLog
    sketches (functions.sketches): each batch folds its rows into one
    2^p-register sketch per group (the batch's row count never leaves the
    task — only #groups x 2^p bytes), registers merge by elementwise max
    (associative -> any combine order gives the identical sketch), and the
    estimate is read once per group. ~1.6% standard error at p=12; the
    scale path when the exact operator's distinct-pairs shuffle is itself
    too large. Output: (group, approx_distinct: int64)."""
    from .functions import sketches as SK

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        groups, regs = [], []
        for g, sub in df.groupby(group, sort=False):
            reg = SK.hll_empty(p)
            SK.hll_add(reg, sub[col].tolist(), hash_name=hash_name)
            groups.append(g)
            regs.append(reg.tobytes())
        return pd.DataFrame({group: groups, "_reg": regs})

    def merge(gdf: pd.DataFrame) -> pd.DataFrame:
        out_g, out_n = [], []
        for g, sub in gdf.groupby(group, sort=False):
            reg = SK.hll_empty(p)
            for b in sub["_reg"].tolist():
                reg = SK.hll_merge(reg, np.frombuffer(b, dtype=np.uint8))
            out_g.append(g)
            out_n.append(int(round(SK.hll_estimate(reg))))
        return pd.DataFrame({group: out_g, "approx_distinct": out_n})

    # group keys are low-cardinality by construction (one sketch per group
    # per batch) -> a direct groupby is the right shuffle here
    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group)
        .map_groups(merge, batch_format="pandas")
    )


def to_small_pandas(ds: "ray.data.Dataset") -> pd.DataFrame:
    """Materialize a SMALL dataset (dimension table / final aggregate)."""
    return ds.to_pandas()


# NOTE: the former ``tumbling_window_events`` helper was deleted — it
# duplicated ``queries.q_events_tumbling`` with a slower shuffle shape
# (``groupby().aggregate`` pays ~ms per distinct (event_type, window) key;
# the canonical pattern is the per-batch partial + ``bucketed_group_merge``
# used by the query). One canonical implementation per shuffle shape.


def qa_sample(ds: "ray.data.Dataset", frac: float, seed: int = 42) -> "ray.data.Dataset":
    """Seeded QA sample (SURVEY.md §2.7 engine-add): explicit seed, never
    ambient RNG. NOTE: ``random_sample`` draws per block, so the realized
    row SET varies with block boundaries (cluster size / file layout) even
    at a fixed seed — use ``queries.doc_hash_sample``-style hash sampling
    when the sample must be reproducible across engines or cluster sizes."""
    return ds.random_sample(frac, seed=seed)
