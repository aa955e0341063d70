"""The extraction ``map_batches`` stage (actor pool) + heavy-doc fragments.

Batches arrive as zero-copy Arrow tables (``batch_format="pyarrow"``); span
lists are decoded via Arrow list offsets (no per-span Python dicts). The
per-document ladder is Python+numpy (documents are independent; within-doc
steps are vectorized) — the idiomatic shape for fat nested rows, analogous
to ``map_groups`` per-group logic.

``ExtractDocuments`` is a callable CLASS so Ray runs it as an actor pool:
the format registry / compiled regex tables (the A1 "warm model" state,
v10A.R:20-31 reloads them per document — our pool loads once per actor) are
touched in ``__init__``.

Error policy (SURVEY.md §4.2): a failing document NEVER kills the task —
it yields an output row with ``error`` set and empty payload; the pipeline
routes those rows to a quarantine sink instead of the reference's silent
page-drop (v10A.R:196-198).
"""

from __future__ import annotations

import traceback

import numpy as np
import pyarrow as pa

from ..doclogic import document as doclib
from ..schema import OUTPUT_SCHEMA, SPAN_STRUCT_OUT

OUTPUT_SCHEMA_E = OUTPUT_SCHEMA.append(pa.field("error", pa.string()))

# Fragment table schema for the heavy-doc path.
FRAGMENT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("frag_id", pa.int32()),
        ("kinds", pa.list_(pa.string())),
        ("texts", pa.list_(pa.string())),
        ("media_refs", pa.list_(pa.string())),
        ("offsets", pa.list_(pa.int32())),
    ]
)


def iter_span_lists(batch: pa.Table):
    """Yield (doc_id, kinds, texts, media_refs, offsets) per row, decoding
    the ``spans`` list column through Arrow offsets (one to_pylist per
    child array, not per span dict)."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    if isinstance(spans, pa.LargeListArray) or isinstance(spans, pa.ListArray):
        offsets = spans.offsets.to_numpy(zero_copy_only=False)
        values = spans.values
    else:  # pragma: no cover - defensive
        raise TypeError(f"unexpected spans column type {type(spans)}")
    kinds = values.field("kind").to_pylist()
    texts = values.field("text").to_pylist()
    refs = values.field("media_ref").to_pylist()
    offs = values.field("offset").to_numpy(zero_copy_only=False)
    doc_ids = batch.column("doc_id").to_pylist()
    for i, did in enumerate(doc_ids):
        lo, hi = int(offsets[i]), int(offsets[i + 1])
        yield did, kinds[lo:hi], texts[lo:hi], refs[lo:hi], offs[lo:hi]


def _result_arrays(n):
    return {
        "doc_id": [],
        "span_kind": [],
        "span_text": [],
        "span_ref": [],
        "span_order": [],
        "span_offsets": [0],
        "title": [],
        "authors": [],
        "abstract": [],
        "main_text": [],
        "document_format": [],
        "boundary_start": [],
        "boundary_end": [],
        "total_pages": [],
        "total_text_regions": [],
        "error": [],
    }


def _append_result(acc, doc_id, res, error=""):
    acc["doc_id"].append(doc_id)
    spans = res.get("spans", {"kind": [], "text": [], "media_ref": [], "order": []})
    acc["span_kind"].extend(spans["kind"])
    acc["span_text"].extend(spans["text"])
    acc["span_ref"].extend(spans["media_ref"])
    acc["span_order"].extend(int(o) for o in spans["order"])
    acc["span_offsets"].append(len(acc["span_kind"]))
    acc["title"].append(res.get("title", ""))
    acc["authors"].append(res.get("authors", ""))
    acc["abstract"].append(res.get("abstract", ""))
    acc["main_text"].append(res.get("main_text", ""))
    acc["document_format"].append(res.get("document_format", ""))
    acc["boundary_start"].append(int(res.get("boundary_start", 0)))
    acc["boundary_end"].append(int(res.get("boundary_end", 0)))
    acc["total_pages"].append(int(res.get("total_pages", 0)))
    acc["total_text_regions"].append(int(res.get("total_text_regions", 0)))
    acc["error"].append(error)


def _to_output_table(acc) -> pa.Table:
    struct = pa.StructArray.from_arrays(
        [
            pa.array(acc["span_kind"], pa.string()),
            pa.array(acc["span_text"], pa.string()),
            pa.array(acc["span_ref"], pa.string()),
            pa.array(acc["span_order"], pa.int32()),
        ],
        fields=list(SPAN_STRUCT_OUT),
    )
    spans = pa.ListArray.from_arrays(pa.array(acc["span_offsets"], pa.int32()), struct)
    return pa.Table.from_arrays(
        [
            pa.array(acc["doc_id"], pa.string()),
            spans,
            pa.array(acc["title"], pa.string()),
            pa.array(acc["authors"], pa.string()),
            pa.array(acc["abstract"], pa.string()),
            pa.array(acc["main_text"], pa.string()),
            pa.array(acc["document_format"], pa.string()),
            pa.array(acc["boundary_start"], pa.int32()),
            pa.array(acc["boundary_end"], pa.int32()),
            pa.array(acc["total_pages"], pa.int32()),
            pa.array(acc["total_text_regions"], pa.int32()),
            pa.array(acc["error"], pa.string()),
        ],
        schema=OUTPUT_SCHEMA_E,
    )


def extract_batch(
    batch: pa.Table,
    cleaning_method="hybrid",
    structure_provider=None,
    format_detector=None,
) -> pa.Table:
    acc = _result_arrays(batch.num_rows)
    for doc_id, kinds, texts, refs, offs in iter_span_lists(batch):
        try:
            res = doclib.process_document(
                kinds,
                texts,
                refs,
                offs,
                cleaning_method,
                structure_provider,
                format_detector=format_detector,
            )
            _append_result(acc, doc_id, res)
        except Exception:  # quarantine, never silent loss
            _append_result(acc, doc_id, {}, error=traceback.format_exc(limit=3))
    return _to_output_table(acc)


def fit_layout_format_model(ds, lam: float = 1.0) -> np.ndarray:
    """Distill the A1 layout scorer (``detect_document_format``) into
    one-vs-rest ridge weights over the integer page-1 layout features
    (``doclogic.formats.layout_format_features``) — the round-5 learned
    layout backend. Labels are the rule scorer's own decisions
    (self-distillation, same recipe as ``fit_boilerplate_model``); the
    X'X / per-class X'y partials are exact python ints folded in ONE
    combiner pass over the span corpus, so the fit is a pure function of
    the document multiset (layout-invariant). Returns W of shape
    (len(_FORMAT_ORDER), LAYOUT_FEATURE_DIM); prediction = first-max
    argmax of W @ x in ``_FORMAT_ORDER`` order — the rule's own
    which.max tie-break. Because the rule IS a fixed-weight argmax over
    these features, the distilled model recovers it (100% agreement on
    the fixture corpus, pinned in tests)."""
    import pandas as pd

    from ..doclogic.formats import (
        _FORMAT_ORDER,
        LAYOUT_FEATURE_DIM,
        detect_document_format,
        layout_format_features,
    )
    from ..doclogic.reading_order import order_document
    from ..schema import decode_geometry

    d = LAYOUT_FEATURE_DIM
    n_cls = len(_FORMAT_ORDER)
    cls_index = {c: i for i, c in enumerate(_FORMAT_ORDER)}

    def partial(batch: pa.Table) -> "pd.DataFrame":
        xtx = [[0] * d for _ in range(d)]
        xty = [[0] * d for _ in range(n_cls)]
        for _doc_id, kinds, texts, refs, offs in iter_span_lists(batch):
            idx, _geom = order_document(kinds, texts, refs, offs)
            k = [kinds[i] for i in idx]
            t = [texts[i] for i in idx]
            geom = decode_geometry(k, t, [int(offs[i]) for i in idx])
            page, y = geom["page"], geom["y"]
            x = layout_format_features(k, t, page, y)
            label = cls_index[detect_document_format(k, t, page, y)]
            for i in range(d):
                xi = x[i]
                if not xi:
                    continue
                row = xtx[i]
                for j in range(i, d):
                    row[j] += xi * x[j]
                xty[label][i] += xi
        flat = {f"m{i}_{j}": [xtx[i][j]] for i in range(d) for j in range(i, d)}
        flat.update(
            {f"v{c}_{i}": [xty[c][i]] for c in range(n_cls) for i in range(d)}
        )
        return pd.DataFrame({k2: pd.Series(v, dtype="int64") for k2, v in flat.items()})

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    xtx = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            s = sum(int(v) for v in p[f"m{i}_{j}"].tolist())  # exact python ints
            xtx[i][j] = xtx[j][i] = float(s)
    reg = lam * np.eye(d)
    reg[0, 0] = 0.0  # never shrink the bias
    W = np.zeros((n_cls, d))
    for c in range(n_cls):
        xty = np.asarray(
            [float(sum(int(v) for v in p[f"v{c}_{i}"].tolist())) for i in range(d)]
        )
        W[c] = np.linalg.solve(xtx + reg, xty)
    return W


def make_learned_format_detector(weights: np.ndarray):
    """Wrap fitted layout weights as a ``format_detector`` callable:
    scores = W @ x, first-max argmax in ``_FORMAT_ORDER`` order (the
    rule's which.max tie-break)."""
    from ..doclogic.formats import _FORMAT_ORDER, layout_format_features

    W = np.asarray(weights, dtype=np.float64)

    def detector(kinds, texts, page, y) -> str:
        x = np.asarray(layout_format_features(kinds, texts, page, y), dtype=np.float64)
        return _FORMAT_ORDER[int(np.argmax(W @ x))]

    return detector


class ExtractDocuments:
    """Actor-pool extraction stage: ``ds.map_batches(ExtractDocuments,
    fn_constructor_kwargs=..., batch_format='pyarrow', concurrency=N)``.

    ``layout_weights_ref`` (round-5 VERDICT #8) opts the pool into the
    LEARNED layout backend: a ``ray.put`` handle to
    :func:`fit_layout_format_model` weights, materialized ONCE per actor
    in ``__init__`` (genuinely fitted per-actor state — the real-model
    load path, vs the reference reloading per document, v10A.R:20-31)
    and applied per document through the ``format_detector`` hook. The
    default (None) keeps the deterministic rule scorer and the flagship
    output byte-identical."""

    def __init__(self, cleaning_method: str = "hybrid", layout_weights_ref=None):
        # warm per-actor state (simulated A1 model load): importing doclogic
        # compiles every regex table once per actor, not per batch/doc.
        from ..doclogic import cleaners, extract, formats  # noqa: F401

        self.cleaning_method = cleaning_method
        self._format_detector = None
        if layout_weights_ref is not None:
            import ray

            self._format_detector = make_learned_format_detector(
                ray.get(layout_weights_ref)
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_batch(
            batch, self.cleaning_method, format_detector=self._format_detector
        )


# --------------------------------------------------------------------------
# heavy-doc fragment path


def add_span_count(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    n = pc.list_value_length(batch.column("spans")).cast(pa.int32())
    if "n_spans" in batch.column_names:
        return batch.set_column(batch.column_names.index("n_spans"), "n_spans", n)
    return batch.append_column("n_spans", n)


def fragment_heavy_batch(batch: pa.Table, pages_per_fragment: int = 25) -> pa.Table:
    """Explode heavy docs into page-aligned fragments, each pre-ordered.

    Ordering is per-page, so fragments order independently and reassemble
    by (doc_id, frag_id) with no cross-fragment state (SURVEY.md §7.3.3).
    """
    out = {k: [] for k in ("doc_id", "frag_id")}
    list_cols = {k: ([], [0]) for k in ("kinds", "texts", "media_refs", "offsets")}

    def emit(did, fid, kinds, texts, refs, offs):
        out["doc_id"].append(did)
        out["frag_id"].append(fid)
        for name, vals in (("kinds", kinds), ("texts", texts), ("media_refs", refs), ("offsets", offs)):
            flat, offsets = list_cols[name]
            flat.extend(vals)
            offsets.append(len(flat))

    for did, kinds, texts, refs, offs in iter_span_lists(batch):
        offs = np.asarray(offs, dtype=np.int64)
        if offs.size == 0:
            # span-less doc: emit one empty fragment so the doc still
            # produces an output row after reassembly (parity with the
            # single-pass path, which never drops a document)
            emit(did, 0, [], [], [], [])
            continue
        pages = offs // 1_000_000
        fid_of_page = (pages - 1) // pages_per_fragment
        for fid in np.unique(fid_of_page):
            m = fid_of_page == fid
            idx = np.nonzero(m)[0]
            k, t, r, o = doclib.order_spans(
                [kinds[i] for i in idx],
                [texts[i] for i in idx],
                [refs[i] for i in idx],
                offs[idx],
            )
            emit(did, int(fid), k, t, r, o)

    def _list_arr(name, typ):
        flat, offsets = list_cols[name]
        return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(flat, typ))

    return pa.Table.from_arrays(
        [
            pa.array(out["doc_id"], pa.string()),
            pa.array(out["frag_id"], pa.int32()),
            _list_arr("kinds", pa.string()),
            _list_arr("texts", pa.string()),
            _list_arr("media_refs", pa.string()),
            _list_arr("offsets", pa.int32()),
        ],
        schema=FRAGMENT_SCHEMA,
    )


def assemble_fragments_bucket(group: pa.Table, cleaning_method="hybrid") -> pa.Table:
    """``groupby(bucket).map_groups`` body for the fragment-everything
    mode: a bucket holds MANY docs' fragments (coarse hash bucket — one
    group task per bucket, not per doc: Ray's grouped ops cost ~ms per
    distinct key, pathological at one-group-per-document cardinality).
    Splits by doc_id locally and assembles each doc."""
    doc_ids = np.asarray(group.column("doc_id").to_pylist(), dtype=object)
    order = np.argsort(doc_ids, kind="stable")
    tables = []
    uniq, starts = np.unique(doc_ids[order], return_index=True)
    bounds = list(starts) + [len(order)]
    for u, lo, hi in zip(uniq, bounds[:-1], bounds[1:]):
        tables.append(
            assemble_fragments(group.take(order[lo:hi]), cleaning_method)
        )
    return pa.concat_tables(tables) if tables else _to_output_table(_result_arrays(0))


def assemble_fragments(group: pa.Table, cleaning_method="hybrid") -> pa.Table:
    """``groupby(doc_id).map_groups`` body: concat fragments in frag order,
    run doc-level extraction on the assembled ordered spans."""
    order = np.argsort(group.column("frag_id").to_numpy(zero_copy_only=False), kind="stable")
    kinds, texts, refs, offs = [], [], [], []
    k_col = group.column("kinds").to_pylist()
    t_col = group.column("texts").to_pylist()
    r_col = group.column("media_refs").to_pylist()
    o_col = group.column("offsets").to_pylist()
    for i in order:
        kinds.extend(k_col[i])
        texts.extend(t_col[i])
        refs.extend(r_col[i])
        offs.extend(o_col[i])
    doc_id = group.column("doc_id")[0].as_py()
    acc = _result_arrays(1)
    try:
        rdf = doclib.build_rdf_from_ordered(kinds, texts, refs, offs)
        res = doclib.finalize_document(rdf, cleaning_method)
        res["spans"] = {
            "kind": kinds,
            "text": texts,
            "media_ref": refs,
            "order": np.arange(len(kinds), dtype=np.int32),
        }
        _append_result(acc, doc_id, res)
    except Exception:
        _append_result(acc, doc_id, {}, error=traceback.format_exc(limit=3))
    return _to_output_table(acc)
