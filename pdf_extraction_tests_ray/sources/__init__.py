"""Pluggable corpus sources (SURVEY.md §2.1 S1/S2).

The reference's source is ``pdf_convert`` + a directory listing
(v10A.R:34, v10A.R:3724); our engine reads already-parsed span tables.
``read_corpus(path, format=...)`` dispatches on format:

- ``parquet`` (default) — ``ray.data.read_parquet`` on a file/directory;
  Ray shards files into blocks.
- ``lance`` — the at-scale column store named by the input hint. The
  ``lance`` package is not in this container, so the reader is
  import-gated: registered only when available, raising a clear error
  otherwise. Same rows-out contract as parquet.
- ``json`` — ``ray.data.read_json`` for line-delimited (JSONL) corpora —
  the common interchange format of web-crawl text dumps.
- ``csv`` — ``ray.data.read_csv`` for delimited exports (interop).

A real-PDF ingestion frontend (rasterize + layout + OCR) would be an
actor-pool ``map_batches`` stage ahead of these readers; out of scope for
the golden invariant (SURVEY.md §2.1 S1).
"""

from __future__ import annotations

from collections.abc import Callable

import ray.data

_READERS: dict[str, Callable] = {}


def register_reader(fmt: str, fn: Callable) -> None:
    _READERS[fmt] = fn


def read_corpus(path: str, format: str = "parquet", **kwargs) -> "ray.data.Dataset":
    try:
        reader = _READERS[format]
    except KeyError:
        raise ValueError(
            f"unknown corpus format {format!r}; registered: {sorted(_READERS)}"
        ) from None
    return reader(path, **kwargs)


register_reader("parquet", ray.data.read_parquet)
register_reader("json", ray.data.read_json)
register_reader("csv", ray.data.read_csv)

try:  # at-scale path; absent in this container
    import lance  # noqa: F401

    register_reader("lance", ray.data.read_lance)
except ImportError:
    def _lance_unavailable(path, **kwargs):
        raise NotImplementedError(
            "lance is not installed in this environment; at scale install "
            "`pylance` and this reader dispatches to ray.data.read_lance "
            "with the identical rows-out contract as parquet"
        )

    register_reader("lance", _lance_unavailable)
