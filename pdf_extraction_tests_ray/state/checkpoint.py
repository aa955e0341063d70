"""Resumable, partitioned extraction runs (north rule: "interrupted runs
resume without reprocessing completed partitions").

Layout::

    out_dir/
      part=<g>/ *.parquet          # output rows for partition group g
      quarantine/part=<g>/ ...     # failed docs for group g
      manifest/part-<g>.json       # lineage: inputs, counts, timings, version

A partition group is ``hash(doc_id) % num_groups`` — deterministic, so a
re-run selects exactly the same documents per group. Each group is written
to a TEMP directory and atomically renamed, then its manifest is written;
on resume, groups with a manifest are skipped entirely (their input rows
are filtered out at the read). Within a group the full Dataset parallelism
applies; groups exist only as commit units.

The group hash uses md5 (stable across processes — Python's ``hash()`` is
salted and must never be used for partitioning).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .. import __version__
from ..pipelines.extraction import extract_dataset, split_quarantine


def doc_group(doc_id: str, num_groups: int) -> int:
    return int.from_bytes(hashlib.md5(doc_id.encode("utf-8")).digest()[:8], "big") % num_groups


def _group_column(t: pa.Table, num_groups: int) -> pa.Table:
    groups = pa.array(
        [doc_group(d, num_groups) for d in t.column("doc_id").to_pylist()], pa.int32()
    )
    return t.append_column("part_group", groups)


def completed_groups(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, "manifest")
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for f in os.listdir(mdir):
        if f.startswith("part-") and f.endswith(".json"):
            done.add(int(f[len("part-") : -len(".json")]))
    return done


def run_partitioned(
    input_path: str,
    out_dir: str,
    num_groups: int = 8,
    resume: bool = True,
    **extract_kwargs,
):
    """Run extraction group-by-group with manifests; returns run summary.

    ``fragmented=True`` routes each group through
    ``extract_dataset_fragmented`` (single-lineage skew path for
    unbounded-document corpora) instead of the single-pass default.
    """
    pipeline = extract_kwargs.pop("pipeline", "spans")
    fragmented = extract_kwargs.pop("fragmented", False)
    auto_mode = extract_kwargs.pop("auto_mode", False)
    if auto_mode and (fragmented or pipeline == "html"):
        raise ValueError("auto_mode picks the execution shape itself; drop --fragmented/html")
    if pipeline == "html":
        # crawl-ingestion leg: input parquet has (doc_id, html); the DOM
        # extractor shares the span job's grouping/manifest/quarantine
        # machinery unchanged (same doc_id partitioning, same error
        # contract)
        if fragmented or extract_kwargs:
            raise ValueError(
                f"pipeline='html' takes no extraction knobs; got "
                f"{['fragmented'] if fragmented else []} + {sorted(extract_kwargs)}"
            )
        from ..stages.html_stage import extract_html_docs

        pipeline_fn = lambda d: d.map_batches(  # noqa: E731
            extract_html_docs, batch_format="pandas"
        )
    elif fragmented:
        from ..pipelines.extraction import extract_dataset_fragmented

        # the fragment path supersedes the split (everything fragments)
        if extract_kwargs.pop("split_threshold", None) is not None:
            raise ValueError("fragmented=True already fragments every doc; drop split_threshold")
        supported = {"cleaning_method", "pages_per_fragment", "num_buckets"}
        unsupported = set(extract_kwargs) - supported
        if unsupported:  # fail loudly instead of silently dropping knobs
            raise ValueError(
                f"fragmented mode does not take {sorted(unsupported)}; "
                f"supported: {sorted(supported)}"
            )
        pipeline_fn = lambda d: extract_dataset_fragmented(d, **extract_kwargs)  # noqa: E731
    elif auto_mode:
        # spans-count probe picks single-pass vs fragmented PER GROUP — a
        # bounded partial read each; output identical either way (tests)
        from ..pipelines.extraction import extract_dataset_auto

        if extract_kwargs.pop("split_threshold", None) is not None:
            raise ValueError("auto_mode derives the routing itself; drop split_threshold")
        pipeline_fn = lambda d: extract_dataset_auto(d, **extract_kwargs)  # noqa: E731
    else:
        pipeline_fn = lambda d: extract_dataset(d, **extract_kwargs)  # noqa: E731
    os.makedirs(os.path.join(out_dir, "manifest"), exist_ok=True)
    done = completed_groups(out_dir) if resume else set()
    summary = {"groups": num_groups, "skipped": sorted(done), "ran": []}

    for g in range(num_groups):
        if g in done:
            continue
        t0 = time.time()
        ds = ray.data.read_parquet(input_path)

        def pick(t: pa.Table, g=g) -> pa.Table:
            t2 = _group_column(t, num_groups)
            return t2.filter(pc.equal(t2["part_group"], g)).drop_columns(["part_group"])

        ds_g = ds.map_batches(pick, batch_format="pyarrow")
        full = pipeline_fn(ds_g)

        part_tmp = os.path.join(out_dir, f"_tmp_part={g}")
        part_final = os.path.join(out_dir, f"part={g}")
        # no "=" in the name: read_parquet would hive-parse it into a column
        full_tmp = os.path.join(out_dir, f"_tmp_full_{g}")
        q_tmp = os.path.join(out_dir, "quarantine", f"_tmp_part={g}")
        q_final = os.path.join(out_dir, "quarantine", f"part={g}")
        for p in (part_tmp, part_final, full_tmp, q_tmp, q_final):
            shutil.rmtree(p, ignore_errors=True)

        # ONE extraction pass: write the full output (incl. the error
        # column), then split ok/quarantine by RE-READING the local parquet
        # — consuming ok and bad branches directly would re-execute the
        # expensive extraction lineage once per consumer (Ray re-runs
        # upstream per branch). The re-read is cheap local IO.
        full.write_parquet(full_tmp)
        ok2, bad2 = split_quarantine(ray.data.read_parquet(full_tmp))
        ok2.write_parquet(part_tmp)
        bad_count = bad2.count()
        if bad_count:
            bad2.write_parquet(q_tmp)
        shutil.rmtree(full_tmp, ignore_errors=True)
        os.rename(part_tmp, part_final)
        if bad_count:
            os.makedirs(os.path.dirname(q_final), exist_ok=True)
            os.rename(q_tmp, q_final)

        n_rows = sum(1 for _ in _iter_doc_ids(part_final))
        manifest = {
            "group": g,
            "num_groups": num_groups,
            "input_path": os.path.abspath(input_path),
            "rows_written": n_rows,
            "quarantined": int(bad_count),
            "elapsed_sec": round(time.time() - t0, 3),
            "engine_version": __version__,
        }
        with open(os.path.join(out_dir, "manifest", f"part-{g}.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        summary["ran"].append(manifest)
    return summary


def run_curation_partitioned(
    input_path: str,
    bench_path: str,
    out_dir: str,
    num_groups: int = 8,
    resume: bool = True,
    ngram_n: int = 13,
):
    """Resumable CURATION job (quality filter -> exact-dedup apply ->
    benchmark decontamination), group-by-group with the same manifest /
    atomic-rename / resume contract as :func:`run_partitioned`.

    The partition key is the NORMALIZED-TEXT hash, not doc_id: all copies
    of a text land in one group, so within-group keep-min-doc_id dedup IS
    global dedup — the partition key is chosen to make per-partition work
    globally correct (the job-level analog of bucketed_group_merge's key
    co-location). Quality filtering and decontamination are per-document,
    so they commute with any partitioning. The benchmark gram set is
    computed ONCE (small side by the decontaminate contract) and reused
    by every group. Pinned equal to the single-pass
    ``pipelines.curation.curate_corpus`` in tests."""
    from ..functions import text as T
    from ..pipelines.curation import quality_filter
    from ..stages import curation as C
    from ..stages import dedup as D

    os.makedirs(os.path.join(out_dir, "manifest"), exist_ok=True)
    done = completed_groups(out_dir) if resume else set()
    summary = {"groups": num_groups, "skipped": sorted(done), "ran": []}

    grams = None  # computed lazily: a fully-resumed run never pays for it
    for g in range(num_groups):
        if g in done:
            continue
        if grams is None:
            grams = C.collect_benchmark_ngrams(
                ray.data.read_parquet(bench_path), n=ngram_n
            )
        t0 = time.time()
        ds = ray.data.read_parquet(input_path)

        def pick(df, g=g):
            keep = [
                int.from_bytes(
                    hashlib.md5(T.md5_fingerprint(t).encode()).digest()[:8], "big"
                )
                % num_groups
                == g
                for t in df["text"].tolist()
            ]
            import numpy as _np

            return df[_np.asarray(keep, dtype=bool)]

        ds_g = ds.map_batches(pick, batch_format="pandas")
        out = C.decontaminate(
            D.apply_exact_dedup(quality_filter(ds_g)), grams, n=ngram_n
        )

        part_tmp = os.path.join(out_dir, f"_tmp_part={g}")
        part_final = os.path.join(out_dir, f"part={g}")
        shutil.rmtree(part_tmp, ignore_errors=True)
        shutil.rmtree(part_final, ignore_errors=True)
        out.write_parquet(part_tmp)
        os.rename(part_tmp, part_final)

        n_rows = sum(1 for _ in _iter_doc_ids(part_final))
        manifest = {
            "group": g,
            "num_groups": num_groups,
            "input_path": os.path.abspath(input_path),
            "bench_path": os.path.abspath(bench_path),
            "rows_written": n_rows,
            "elapsed_sec": round(time.time() - t0, 3),
            "engine_version": __version__,
        }
        with open(os.path.join(out_dir, "manifest", f"part-{g}.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        summary["ran"].append(manifest)
    return summary


def _iter_doc_ids(part_dir: str):
    import pyarrow.parquet as pq

    for f in sorted(os.listdir(part_dir)):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(part_dir, f), columns=["doc_id"])
            yield from t.column("doc_id").to_pylist()


def read_output(out_dir: str) -> "ray.data.Dataset":
    """Read the committed output across all partition groups."""
    files = []
    for d in sorted(os.listdir(out_dir)):
        if d.startswith("part="):
            pdir = os.path.join(out_dir, d)
            files.extend(
                os.path.join(pdir, f) for f in sorted(os.listdir(pdir)) if f.endswith(".parquet")
            )
    return ray.data.read_parquet(files)


def metrics_rollup(out_dir: str) -> dict:
    """G7 — per-partition metrics rollup from the manifest ledger.

    Manifests are the run's lineage/metrics side-channel (one small JSON
    per partition — driver-side aggregation is correct here: O(num_groups)
    records, not O(rows)). Returns totals + per-group rows.
    """
    mdir = os.path.join(out_dir, "manifest")
    rows = []
    for name in sorted(os.listdir(mdir)) if os.path.isdir(mdir) else []:
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                rows.append(json.load(f))
    total_rows = sum(r["rows_written"] for r in rows)
    total_q = sum(r["quarantined"] for r in rows)
    total_sec = sum(r["elapsed_sec"] for r in rows)
    return {
        "groups_done": len(rows),
        "rows_written": total_rows,
        "quarantined": total_q,
        "elapsed_sec_sum": round(total_sec, 3),
        "docs_per_sec_sum": round(total_rows / total_sec, 2) if total_sec else None,
        "per_group": rows,
    }
