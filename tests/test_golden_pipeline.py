"""Golden end-to-end: the Ray pipeline must reproduce the single-doc oracle
exactly — span-sequence equality on (kind, text, media_ref, order) per doc
(the north-rule invariant) plus all scalar columns. Also: heavy-doc split
equivalence and batch-size independence."""

import numpy as np
import pytest

import ray.data

from pdf_extraction_tests_ray.pipelines.extraction import extract_dataset, split_quarantine
from tests.conftest import oracle_rows


def _collect(ds):
    rows = {}
    for batch in ds.iter_batches(batch_size=256, batch_format="pyarrow"):
        for row in batch.to_pylist():
            rows[row["doc_id"]] = row
    return rows


def _assert_matches_oracle(rows, oracle):
    assert set(rows) == {r["doc_id"] for r in oracle}
    for o in oracle:
        r = rows[o["doc_id"]]
        got = [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]]
        exp = list(
            zip(
                o["spans"]["kind"],
                o["spans"]["text"],
                o["spans"]["media_ref"],
                [int(x) for x in o["spans"]["order"]],
            )
        )
        assert got == exp, f"span mismatch for {o['doc_id']}"
        for col in (
            "title",
            "authors",
            "abstract",
            "main_text",
            "document_format",
            "boundary_start",
            "boundary_end",
            "total_pages",
            "total_text_regions",
        ):
            assert r[col] == o[col], f"{col} mismatch for {o['doc_id']}"


@pytest.mark.usefixtures("ray_session")
def test_pipeline_matches_oracle(golden_corpus):
    oracle = oracle_rows(golden_corpus)
    ds = ray.data.from_arrow(golden_corpus).repartition(8)
    out, bad = split_quarantine(extract_dataset(ds))
    rows = _collect(out)
    assert bad.count() == 0
    _assert_matches_oracle(rows, oracle)


@pytest.mark.usefixtures("ray_session")
def test_heavy_split_equivalence(golden_corpus):
    """Forcing EVERY doc through the fragment/reassemble path must give
    byte-identical results (SURVEY.md §5.2 property d / §7.3.3)."""
    small = golden_corpus.slice(0, 80)
    oracle = oracle_rows(small)
    ds = ray.data.from_arrow(small).repartition(4)
    out, bad = split_quarantine(
        extract_dataset(ds, split_threshold=0, pages_per_fragment=2)
    )
    rows = _collect(out)
    assert bad.count() == 0
    # empty docs produce no fragments -> absent from the heavy path output;
    # the oracle represents them as empty-span rows. Compare non-empty docs.
    oracle_nonempty = [o for o in oracle if len(o["spans"]["kind"]) > 0]
    assert set(rows) == {o["doc_id"] for o in oracle_nonempty}
    _assert_matches_oracle(rows, oracle_nonempty)


@pytest.mark.usefixtures("ray_session")
def test_batch_size_independence(golden_corpus):
    small = golden_corpus.slice(0, 40)
    oracle = oracle_rows(small)
    for bs in (1, 7, 64):
        ds = ray.data.from_arrow(small).repartition(3)
        out, _ = split_quarantine(extract_dataset(ds, batch_size=bs))
        _assert_matches_oracle(_collect(out), oracle)


@pytest.mark.usefixtures("ray_session")
def test_quarantine_never_drops_docs(golden_corpus):
    """Every input doc appears exactly once across ok + quarantine."""
    ds = ray.data.from_arrow(golden_corpus)
    out = extract_dataset(ds)
    n = out.count()
    assert n == golden_corpus.num_rows
