"""Stale-documentation guards (round-3 VERDICT #2/#9).

Round 2's headline confusion came from comparing bench numbers across
corpus versions: fixtures.spans_from_flat_text changed mid-round (v1 -> v2)
and BASELINE.md kept quoting v1-corpus numbers as current. These tests make
that class of staleness RED:

- every bench JSON emitted from now on carries ``flat_spans_version``
  (structural check on bench.py's result dicts);
- BASELINE.md must contain a measurement block tagged with the CURRENT
  corpus version — bumping FLAT_SPANS_VERSION without re-baselining fails
  here until fresh numbers are recorded.
"""

import os
import re

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_bench_output_carries_corpus_version():
    src = open(os.path.join(REPO, "bench.py")).read()
    assert '"flat_spans_version"' in src, "bench result must stamp the corpus version"


def test_baseline_has_measurements_for_current_corpus_version():
    from pdf_extraction_tests_ray.fixtures import FLAT_SPANS_VERSION

    text = open(os.path.join(REPO, "BASELINE.md")).read()
    tags = {int(m) for m in re.findall(r"corpus v(\d+)", text)}
    assert FLAT_SPANS_VERSION in tags, (
        f"BASELINE.md has no measurement block tagged 'corpus v{FLAT_SPANS_VERSION}' — "
        "re-run bench.py on the current corpus and record the numbers "
        "(comparing timings across corpus versions was round 2's headline bug)"
    )
