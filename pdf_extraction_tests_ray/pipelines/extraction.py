"""The flagship extraction pipeline (SURVEY.md §3 "our shape").

    read_parquet(spans table)
      -> map_batches(add_span_count)                     [vectorized Arrow]
      -> light docs: map_batches(ExtractDocuments, actor pool)
         heavy docs: map_batches(fragment)               [skew defusal]
                     -> groupby(doc_id).map_groups(assemble)   [the one
                        ordering-sensitive shuffle, keyed on doc_id]
      -> union
      -> ok rows -> write_parquet / caller; error rows -> quarantine sink

Heavy-doc splitting exists for the north rule's pathological
multi-hundred-page documents: one 10^4-span row would otherwise pin a task
for minutes while its batch-mates finish (SURVEY.md §4.2 skew row). The
threshold routes only the tail through the shuffle; everything else is
embarrassingly parallel.

Splitting is OPT-IN (``split_threshold=None`` by default). Measured on this
host (Ray 2.49.2, 480k-doc corpus): the dual-branch DAG (2 lineages + empty
sort + union, 8 operators) holds the extract stage to ~2 concurrent tasks at
num_cpus=8 — 1.5k docs/s vs 4.7k docs/s single-pass — and costs ~25% at 32
CPUs even when ZERO docs cross the threshold. A heavy doc inside a block is
an *additive* cost to one task, so bounded corpora (the reference's PDFs are
tens of pages, v10A.R:3776) are better served by block sizing; enable the
threshold only for corpora with genuinely unbounded documents.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..relational import pool_max
from ..stages.extract_stage import (
    ExtractDocuments,
    add_span_count,
    assemble_fragments,
    extract_batch,
    fragment_heavy_batch,
)

SUGGESTED_SPLIT_THRESHOLD = 4000  # spans; ~100 pages at reference density
# Whole-block batches for the stateless regex extractor: per-UDF-call
# overhead at batch_size=32 cost ~45% throughput (12.7k vs 19k docs/s
# measured at 32 cpus). Pass a small batch_size (4-32) explicitly when the
# stage holds a real model actor — there batches are VRAM-bound and rows
# are fat (SURVEY.md §7.3.6).
DEFAULT_BATCH_SIZE = None


def extract_dataset(
    ds: "ray.data.Dataset",
    cleaning_method: str = "hybrid",
    split_threshold: int | None = None,
    batch_size: int | None = DEFAULT_BATCH_SIZE,
    concurrency=None,
    pages_per_fragment: int = 25,
    llm_client_factory=None,
    llm_batch_prompts: int = 1,
) -> "ray.data.Dataset":
    """Build the lazy extraction pipeline over a spans Dataset.

    Returns the full output Dataset (including the ``error`` column);
    use :func:`split_quarantine` to separate failed docs.

    ``split_threshold=None`` disables the heavy-doc branch entirely: the
    light/heavy routing re-executes the upstream once per branch (Ray Data
    lineage), which is free over a parquet read but wasteful when the
    upstream is an expensive synthesis — callers that KNOW their docs are
    bounded skip it.
    """
    # Stage compute: by DEFAULT the extraction body runs as stateless TASKS
    # — its "warm state" is module-level compiled regex/rule tables, cached
    # per worker process by Python import, so tasks already amortize it and
    # stay elastic (measured: a fixed ncpu-sized actor pool reserves every
    # CPU and starves the read stage; an autoscaling pool ramps too slowly
    # for short jobs). Pass ``concurrency`` explicitly to get the
    # ``ExtractDocuments`` ACTOR pool — the drop-in shape for a real layout
    # model whose state is per-process GPU/weights (SURVEY.md §2.4 A1).
    def _extract_stage(dset):
        if llm_client_factory is not None:
            # A4: the client is REAL per-actor state -> always an actor pool
            from ..stages.llm_stage import ExtractDocumentsLLM

            return dset.map_batches(
                ExtractDocumentsLLM,
                fn_constructor_kwargs={
                    "cleaning_method": cleaning_method,
                    "client_factory": llm_client_factory,
                    "batch_prompts": llm_batch_prompts,
                },
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=concurrency or (1, pool_max()),
            )
        if concurrency is None:
            return dset.map_batches(
                extract_batch,
                fn_kwargs={"cleaning_method": cleaning_method},
                batch_format="pyarrow",
                batch_size=batch_size,
            )
        return dset.map_batches(
            ExtractDocuments,
            fn_constructor_kwargs={"cleaning_method": cleaning_method},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    if split_threshold is None:
        return _extract_stage(ds)

    if llm_client_factory is not None:
        # the heavy branch reassembles via fragment/assemble, which has no
        # LLM hook — letting it through would silently give heavy docs E4
        # abstracts while light docs get the E6 LLM path
        raise ValueError(
            "split_threshold cannot be combined with llm_client_factory: "
            "heavy docs would bypass the LLM region analysis; run without "
            "the split (bounded docs) or without the client"
        )

    counted = ds.map_batches(add_span_count, batch_format="pyarrow")

    def _filter_light(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(t["n_spans"], split_threshold)).drop_columns(["n_spans"])

    def _filter_heavy(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["n_spans"], split_threshold)).drop_columns(["n_spans"])

    light = counted.map_batches(_filter_light, batch_format="pyarrow")
    heavy = counted.map_batches(_filter_heavy, batch_format="pyarrow")

    out_light = _extract_stage(light)

    fragments = heavy.map_batches(
        lambda t: fragment_heavy_batch(t, pages_per_fragment),
        batch_format="pyarrow",
        batch_size=4,
    )
    out_heavy = fragments.groupby("doc_id").map_groups(
        lambda g: assemble_fragments(g, cleaning_method), batch_format="pyarrow"
    )

    return out_light.union(out_heavy)


def choose_extraction_mode(
    ds: "ray.data.Dataset",
    split_threshold: int = SUGGESTED_SPLIT_THRESHOLD,
    probe_docs: int = 10_000,
) -> str:
    """Cheap spans-count probe -> ``"single_pass"`` or ``"fragmented"``.

    A 100x-scale caller shouldn't have to know this repo's starvation
    measurements to avoid picking the wrong execution shape (VERDICT r3
    #4), so this derives it: sample up to ``probe_docs`` documents (a
    BOUNDED partial read regardless of corpus size — only the sampled
    blocks' spans column is touched, and only its list LENGTHS are
    computed), then route to the single-lineage fragmented mode iff the
    tail is heavy:

      * p99 sampled spans  > split_threshold      (heavy docs are common:
        the additive-cost argument for single-pass no longer holds), or
      * max sampled spans  > 4 * split_threshold  (one monster document
        pins a task for minutes even if the p99 is tame).

    Otherwise single-pass — the measured winner on bounded corpora (the
    dual-branch split stays opt-in; it starves the extract operator at low
    CPU counts, see the module docstring). The probe samples a SEEDED
    RANDOM BLOCK ORDER (``randomize_block_order`` is a metadata-only
    lazy reorder — no data moves, same bounded read cost), not the first
    blocks, so a corpus sorted by document size cannot hide its heavy
    tail from the p99/max test (round-5 VERDICT #5; pinned by the
    size-sorted-corpus test). Residual bias: sorting WITHIN a single
    block is invisible to any block sample — pass a larger
    ``probe_docs`` or choose the mode explicitly for adversarial
    single-block layouts.
    """
    probe = (
        ds.randomize_block_order(seed=0xD0C5)
        .limit(probe_docs)
        .map_batches(
            lambda t: pa.Table.from_pydict(
                {"n_spans": pc.list_value_length(t.column("spans")).cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )
    if not probe:
        return "single_pass"
    import numpy as np

    counts = np.asarray([r["n_spans"] for r in probe], dtype=np.int64)
    p99 = float(np.percentile(counts, 99))
    if p99 > split_threshold or int(counts.max()) > 4 * split_threshold:
        return "fragmented"
    return "single_pass"


def extract_dataset_auto(
    ds: "ray.data.Dataset",
    cleaning_method: str = "hybrid",
    split_threshold: int = SUGGESTED_SPLIT_THRESHOLD,
    probe_docs: int = 10_000,
    pages_per_fragment: int = 25,
    **kwargs,
) -> "ray.data.Dataset":
    """:func:`extract_dataset` with the execution shape chosen by
    :func:`choose_extraction_mode`'s metadata probe. Output is identical
    in either mode (pinned in tests); the probe costs one bounded partial
    read (the lineage re-executes from the source for the main pass)."""
    mode = choose_extraction_mode(ds, split_threshold, probe_docs)
    if mode == "fragmented":
        return extract_dataset_fragmented(
            ds, cleaning_method=cleaning_method, pages_per_fragment=pages_per_fragment
        )
    return extract_dataset(ds, cleaning_method=cleaning_method, **kwargs)


def extract_dataset_fragmented(
    ds: "ray.data.Dataset",
    cleaning_method: str = "hybrid",
    pages_per_fragment: int = 25,
    num_buckets: int = 256,
) -> "ray.data.Dataset":
    """Single-lineage skew-defusal mode: EVERY document flows through
    fragment -> one coarse bucket shuffle -> assemble.

    The alternative to ``extract_dataset(split_threshold=...)`` for
    corpora with genuinely unbounded documents (TODO.md heavy-doc note):
    the light/heavy branch DAG starves the extract operator at low CPU
    counts (measured 3x at 8 cpus — CLAUDE.md multi-branch note), while
    this shape is one lineage with exactly ONE all-to-all. The price is
    shuffling every span once (vs only the heavy tail): measured 4.9k
    docs/s vs 10.9k single-pass on 40k bounded docs at 32 cpus — so the
    bounded-doc default remains the single-pass ``extract_dataset``, and
    this mode is for corpora whose document-size tail would otherwise pin
    tasks for minutes.

    Ordering is per-page, so fragments order independently and reassemble
    by (doc_id, frag_id) with results identical to the single-pass path
    (pinned by tests/test_llm_and_scale_paths.py). The shuffle key is a
    coarse ``hash(doc_id) % num_buckets`` bucket — one group task per
    bucket, not per document (per-distinct-key overhead, CLAUDE.md).
    """
    from ..stages.extract_stage import assemble_fragments_bucket

    fragments = ds.map_batches(
        lambda t: fragment_heavy_batch(t, pages_per_fragment),
        batch_format="pyarrow",
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        # the canonical cross-process-deterministic bucket hash
        # (relational._bucket_of, vectorized pandas stable hash — a salted
        # hash() would scatter one doc's fragments over buckets); only the
        # doc_id column touches pandas, the list columns stay Arrow
        import pandas as pd

        from ..relational import _bucket_of

        ids = pd.DataFrame({"doc_id": t.column("doc_id").to_pandas()})
        b = _bucket_of(ids, ["doc_id"], num_buckets)
        return t.append_column("_bucket", pa.array(b, pa.int64()))

    def assemble(g: pa.Table) -> pa.Table:
        return assemble_fragments_bucket(g.drop_columns(["_bucket"]), cleaning_method)

    return (
        fragments.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(assemble, batch_format="pyarrow")
    )


def split_quarantine(out: "ray.data.Dataset"):
    """(ok, quarantined) — error rows carry the traceback, never dropped."""

    def _ok(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["error"], "")).drop_columns(["error"])

    def _bad(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["error"], ""))
        return t.select(["doc_id", "error"])

    return out.map_batches(_ok, batch_format="pyarrow"), out.map_batches(
        _bad, batch_format="pyarrow"
    )


def read_spans(path: str, format: str = "parquet", **kwargs) -> "ray.data.Dataset":
    """Source: a directory of span files (S1's replacement, SURVEY.md §2.1).
    Dispatches through the pluggable reader registry — ``format="lance"``
    at real scale, parquet in tests/bench."""
    from ..sources import read_corpus

    return read_corpus(path, format=format, **kwargs)


def run_extraction(
    input_path: str,
    output_path: str | None = None,
    quarantine_path: str | None = None,
    **kwargs,
):
    """Read -> extract -> (optionally) write ok + quarantine parquet."""
    ds = read_spans(input_path)
    out = extract_dataset(ds, **kwargs)
    if output_path is not None:
        if quarantine_path is not None:
            # one extraction pass: write full (incl. error col), split from
            # a cheap local re-read — consuming both branches would run the
            # extraction lineage twice (see state/checkpoint.py)
            import shutil
            import tempfile

            full_tmp = tempfile.mkdtemp(prefix="extract_full_")
            try:
                out.write_parquet(full_tmp)
                ok, bad = split_quarantine(ray.data.read_parquet(full_tmp))
                ok.write_parquet(output_path)
                bad.write_parquet(quarantine_path)
            finally:
                shutil.rmtree(full_tmp, ignore_errors=True)
            return None
        ok, _ = split_quarantine(out)
        ok.write_parquet(output_path)
        return None
    ok, _ = split_quarantine(out)
    return ok
