"""SURVEY.md §5.2 property (c): output is identical regardless of
parallelism level. Runs the flagship pipeline in FRESH subprocess Ray
sessions (num_cpus=1 vs 4) over the same corpus and compares the sorted
output tables byte-for-byte. Subprocesses, not the session fixture — a Ray
local cluster's CPU count is fixed at init."""

import glob
import os
import subprocess
import sys
import textwrap

import pyarrow.dataset as pads
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    import ray
    ray.init(address="local", num_cpus=int(sys.argv[1]),
             include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    from pdf_extraction_tests_ray.pipelines.extraction import (
        extract_dataset, read_spans, split_quarantine)
    ok, _ = split_quarantine(extract_dataset(read_spans(sys.argv[2])))
    ok.write_parquet(sys.argv[3])
    ray.shutdown()
    """
).format(repo=REPO)


def _run(ncpu, corpus, out):
    subprocess.run(
        [sys.executable, "-c", RUNNER, str(ncpu), corpus, out],
        check=True,
        capture_output=True,
        text=True,
        timeout=240,
    )


def _load(root):
    files = sorted(glob.glob(os.path.join(root, "*.parquet")))
    return pads.dataset(files, format="parquet").to_table().sort_by("doc_id")


def test_output_identical_across_parallelism(tmp_path, golden_corpus):
    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    pq.write_table(golden_corpus.slice(0, 40), os.path.join(corpus, "c.parquet"))
    out1, out4 = str(tmp_path / "out1"), str(tmp_path / "out4")
    _run(1, corpus, out1)
    _run(4, corpus, out4)
    a, b = _load(out1), _load(out4)
    assert a.num_rows == 40 and b.num_rows == 40
    assert a.equals(b)
