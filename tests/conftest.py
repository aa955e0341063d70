import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def golden_corpus():
    """The ~200-doc golden fixture corpus (FIXTURES.md §3) as Arrow."""
    from pdf_extraction_tests_ray.fixtures import corpus_table

    return corpus_table()


def oracle_rows(table):
    """Run the single-doc oracle over an input corpus table -> list[dict]."""
    from pdf_extraction_tests_ray.doclogic.document import process_document

    out = []
    ids = table.column("doc_id").to_pylist()
    spans_col = table.column("spans").to_pylist()
    for did, spans in zip(ids, spans_col):
        r = process_document(
            [s["kind"] for s in spans],
            [s["text"] for s in spans],
            [s["media_ref"] for s in spans],
            [s["offset"] for s in spans],
        )
        r["doc_id"] = did
        out.append(r)
    return out
