#!/usr/bin/env python
"""``ray job submit``-able entry point for the flagship extraction job.

Usage (local sandbox / real cluster — identical code; the cluster address
comes from RAY_ADDRESS or --address):

    ray job submit --working-dir . -- \
        python jobs/run_extraction.py \
            --input /data/corpus_spans --output /data/extracted \
            --num-groups 64 --resume

On a fixed-size multi-node cluster the only knobs that change are
``--num-groups`` (commit granularity / resume unit) and the Dataset-level
concurrency, which is derived from the cluster's CPU count at runtime.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# `python jobs/run_extraction.py` puts jobs/ (not the repo root) on
# sys.path; with `ray job submit --working-dir .` the root IS the cwd.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="directory of span parquet files")
    p.add_argument("--output", required=True, help="output root (part=G dirs + manifests)")
    p.add_argument("--num-groups", type=int, default=16)
    p.add_argument("--resume", action="store_true", default=True)
    p.add_argument("--no-resume", dest="resume", action="store_false")
    p.add_argument(
        "--cleaning-method",
        default=None,
        help="span pipeline only (default: hybrid)",
    )
    p.add_argument(
        "--split-threshold",
        type=int,
        default=None,
        help="spans per doc above which the heavy-doc fragment/assemble path "
        "engages (default: off — see pipelines/extraction.py docstring)",
    )
    p.add_argument(
        "--fragmented",
        action="store_true",
        help="single-lineage fragment-everything mode for corpora with "
        "unbounded document sizes (see extract_dataset_fragmented)",
    )
    p.add_argument(
        "--auto-mode",
        action="store_true",
        help="probe the spans-count tail and pick single-pass vs fragmented "
        "automatically (see choose_extraction_mode) — the safe default for "
        "corpora of unknown document-size distribution",
    )
    p.add_argument(
        "--format",
        choices=["spans", "html"],
        default="spans",
        help="input kind: 'spans' = interleaved span parquet (flagship); "
        "'html' = (doc_id, html) pages through the DOM boilerplate-strip "
        "extractor (same grouping/manifest/quarantine machinery)",
    )
    p.add_argument("--num-cpus", type=int, default=None, help="local mode only")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        init_kwargs = dict(include_dashboard=False, ignore_reinit_error=True)
        if args.num_cpus:
            init_kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**init_kwargs)

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pdf_extraction_tests_ray.state.checkpoint import run_partitioned

    kwargs = dict(num_groups=args.num_groups, resume=args.resume)
    if args.format == "html":
        if args.fragmented or args.auto_mode or args.split_threshold is not None or args.cleaning_method:
            p.error(
                "--fragmented/--auto-mode/--split-threshold/--cleaning-method "
                "apply to span input only"
            )
        kwargs["pipeline"] = "html"
    else:
        kwargs.update(
            cleaning_method=args.cleaning_method or "hybrid",
            split_threshold=args.split_threshold,
            fragmented=args.fragmented,
            auto_mode=args.auto_mode,
        )
    summary = run_partitioned(args.input, args.output, **kwargs)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
