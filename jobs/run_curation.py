#!/usr/bin/env python
"""``ray job submit``-able entry point for the corpus-curation job
(quality filter -> exact dedup -> benchmark decontamination).

Usage (local sandbox / real cluster — identical code):

    ray job submit --working-dir . -- \
        python jobs/run_curation.py \
            --input /data/corpus --benchmark /data/eval_sets \
            --output /data/curated --num-groups 64 --resume

Partition groups are keyed on the NORMALIZED-TEXT hash so duplicate
texts always share a group and within-group dedup is globally correct —
see state.checkpoint.run_curation_partitioned. Groups are commit/resume
units; within a group the full cluster parallelism applies.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="directory of document parquet files")
    p.add_argument(
        "--benchmark", required=True, help="directory of benchmark parquet (small side)"
    )
    p.add_argument("--output", required=True, help="output root (part=G dirs + manifests)")
    p.add_argument("--num-groups", type=int, default=8)
    p.add_argument("--ngram-n", type=int, default=13)
    p.add_argument("--resume", action="store_true", default=True)
    p.add_argument("--no-resume", dest="resume", action="store_false")
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

    from pdf_extraction_tests_ray.state.checkpoint import run_curation_partitioned

    summary = run_curation_partitioned(
        args.input,
        args.benchmark,
        args.output,
        num_groups=args.num_groups,
        resume=args.resume,
        ngram_n=args.ngram_n,
    )
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
