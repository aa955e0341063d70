"""Ray-Data-native main-content extraction engine.

A brand-new engine with the query/data-processing capabilities of the
reference repo RENAISSANCE-UIC/PDF_Extraction_Tests (read-only at
/root/reference; abbreviations like ``v10A.R`` follow SURVEY.md): the
reference is a single-machine, single-document R pipeline (DocLayout-YOLO +
tesseract + tidyverse heuristics); this engine re-expresses its semantics as
``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
batches, with actor pools for stateful stages.

Layout:
  schema.py    — Arrow schemas + offset codec + geometry derivation
  doclogic/    — pure per-document decision logic (no Ray): reading order,
                 column detection, format rules, extractors, cleaners.
                 This doubles as the single-doc oracle for golden tests.
  stages/      — Ray Data map_batches stages (extraction actor pool, dedup,
                 text analysis, similarity search, media plumbing)
  pipelines/   — end-to-end pipeline assembly incl. heavy-doc splitting,
                 partitioned/resumable runs
  sources/     — read/write helpers
  state/       — checkpoint manifests + lineage
  relational.py— generic relational capabilities (joins/aggregates) used by
                 the driver conformance queries
  fixtures.py  — deterministic synthetic corpus generator (FIXTURES.md)
"""

__version__ = "0.1.0"
