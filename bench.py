#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default mode: ray.init(num_cpus=$RAY_GRAFT_CPUS or 32), run the headline
extraction pipeline + a representative query suite over $GRAFT_SF_DIR
(default /root/testdata/sf0.1), print ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "docs_per_sec": ...}

--scaling: run the headline job in FRESH processes at two parallelism
levels (default num_cpus=4 then 16; override GRAFT_SCALING_PAIR="8,32") on
the same input — the sandbox stand-in for N vs 4N nodes — and print both
throughputs + scaling efficiency (BASELINE.md criterion).

Set GRAFT_LLM_ENDPOINT (optional GRAFT_LLM_MODEL) to time the
extract_flagship_llm row against a REAL Ollama-compatible server instead
of the deterministic fake client (env gate lives in the shared query;
loopback-smoke-tested in tests/test_llm_and_scale_paths.py).

The default pair is 4->16, not 8->32: a real N->4N cluster keeps per-node
hardware constant, and 16 worker procs still fit this host's 32 cores. At
8->32 the top level contends for SMT siblings/memory bandwidth — raw
multiprocessing (no Ray) measures only ~0.79 efficiency for 8->32 on this
host, so that pair measures the silicon, not the engine. Both numbers are
recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

QUERY_SUITE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q_customer_segment_orders",
    "q_events_tumbling",
    "q_asof_user_order",
    "q_events_sliding",
    "q_topk_per_brand",
    "q_user_sessions",
    "doc_quality",
    "doc_repetition",
    "dedup_lines",
    "doc_token_totals_by_lang",
    "q_events_distinct_users",
    "q_order_running_total",
    "q_customers_without_orders",
    "q_price_quantiles",
    "q_price_quantiles_tdigest",
    "q_price_quantiles_sketch",
    "extract_html_main",
    "dedup_exact",
    "dedup_incremental",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_embedding_pairs",
    "knn_bruteforce",
    "knn_multi",
    "knn_lsh",
    "knn_ivf",
    "knn_ivf_indexed",
    "doc_decontaminate",
    "doc_decontaminate_bloom",
    "doc_search_keywords",
    "doc_search_keywords_indexed",
    "doc_scrub_pii",
    "doc_top_terms",
    "doc_top_terms_approx",
    "doc_weighted_mix",
    "doc_stratified_sample",
    "curation_pipeline",
    "q5_regional_revenue",
    "q_order_lineitem_counts",
    "q_order_gap_seconds",
    "q_order_price_rank",
    "q_events_gapfill",
    "q_customers_with_urgent_orders_bloom",
    "doc_token_deciles",
    "doc_chunks",
    "doc_vocab_encode",
    "doc_shuffle_order",
    "dedup_semantic",
    "dedup_fuzzy_names",
    "emb_pca_project",
    # final round-2 session additions
    "dedup_minhash_apply",
    "doc_bigram_pmi",
    "doc_corpus_stats",
    "doc_bpe_encode",
    "doc_quality_scorer",
    "doc_lm_perplexity",
    "doc_length_outliers",
    "emb_quantize_int8",
    "media_ocr_glyph",
    # round-3 additions
    "extract_flagship_llm",
    "doc_bpe_roundtrip",
    "doc_pack_sequences",
    "dedup_exact_apply",
    "doc_gopher_rules",
    "extract_golden_transcript",
    "media_decode_real",
    "q_events_funnel",
    "q_events_retention",
    # round-4 additions
    "dedup_substring_cut",
    "extract_html_main_learned",
    "doc_contamination_score",
    "q_events_transitions",
    "q_events_watermark",
    "q_lineitem_cube",
    "knn_pq",
    "knn_ivfpq",
    "knn_ivfpq_indexed",
    # round-5 additions
    "dedup_containment_pairs",
    "doc_dsir_importance",
    "q_events_approx_distinct_users",
    "dedup_minhash_cross_job",
    "doc_pagerank",
]


def _consume(res):
    """Fully execute a query result without materializing on the driver."""
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        n = 0
        for b in res.iter_batches(batch_size=4096, batch_format="pyarrow"):
            n += b.num_rows
        return n
    if isinstance(res, (pd.DataFrame, pa.Table)):
        return len(res)
    return 0


def _warm_cache():
    for name in ("documents", "lineitem", "orders", "customer", "events", "embeddings"):
        p = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(p):
            with open(p, "rb") as f:
                while f.read(1 << 22):
                    pass


def prepare_corpus(sf_dir: str, replicate: int) -> str:
    """Materialize the deterministic spans corpus ONCE (untimed, shared by
    every parallelism level): the timed headline is then the real pipeline
    shape — read spans parquet -> extract -> write parquet (SURVEY.md §3)."""
    from pdf_extraction_tests_ray.fixtures import FLAT_SPANS_VERSION

    tag = os.path.basename(os.path.normpath(sf_dir))
    # the synthesizer version keys the cache: a corpus materialized by
    # older fixture code must not be reused as this version's workload
    corpus_dir = f"/tmp/graft_bench_corpus_{tag}_v{FLAT_SPANS_VERSION}_x{replicate}"
    done_marker = corpus_dir + ".done"  # outside the dir: read_parquet reads every file inside
    if os.path.exists(done_marker):
        return corpus_dir
    import shutil

    from pdf_extraction_tests_ray.queries import _spans_dataset

    shutil.rmtree(corpus_dir, ignore_errors=True)
    _spans_dataset(sf_dir, replicate).write_parquet(corpus_dir)
    with open(done_marker, "w") as f:
        f.write("ok")
    return corpus_dir


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import shutil

    from pdf_extraction_tests_ray.pipelines.extraction import (
        extract_dataset,
        read_spans,
        split_quarantine,
    )
    from pdf_extraction_tests_ray.queries import QUERIES

    _warm_cache()
    replicate = int(os.environ.get("GRAFT_BENCH_REPLICATE", "96"))
    corpus_dir = prepare_corpus(SF_DIR, replicate)

    # warm the WORKERS too (untimed): Ray spawns worker processes lazily at
    # first task and each imports the package (~1-2s each; a 32-worker spawn
    # storm costs ~15s wall measured). A steady-state cluster has warm
    # workers, so the warmup pass is sized to start the FULL pool (enough
    # blocks to run NUM_CPUS-wide) and the timed section measures compute.
    warm_out = "/tmp/graft_bench_warmup"
    shutil.rmtree(warm_out, ignore_errors=True)
    ok, _ = split_quarantine(extract_dataset(read_spans(corpus_dir).limit(60_000)))
    ok.write_parquet(warm_out)
    shutil.rmtree(warm_out, ignore_errors=True)

    # headline: read spans -> extract -> write (distributed sink).
    # best-of-2: single-run variance on this shared host is ~20%.
    # (scaling mode sets GRAFT_BENCH_RUNS=1 and interleaves levels instead)
    out_dir = "/tmp/graft_bench_out"
    headline = None
    for _ in range(int(os.environ.get("GRAFT_BENCH_RUNS", "2"))):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        ok, _ = split_quarantine(extract_dataset(read_spans(corpus_dir)))
        ok.write_parquet(out_dir)
        dt = time.perf_counter() - t0
        headline = dt if headline is None else min(headline, dt)
    import pyarrow.parquet as pq

    n_docs = sum(
        pq.read_metadata(os.path.join(out_dir, f)).num_rows
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )

    # per-query best-of-N (default 2): this host's hour-scale slow windows
    # can hit mid-suite and quadruple individual readings — the repeat
    # bounds that skew the same way the headline's best-of-2 does
    timings = {}
    suite = [] if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY") else QUERY_SUITE
    q_runs = int(os.environ.get("GRAFT_BENCH_QUERY_RUNS", "2"))
    for name in suite:
        best = None
        for _ in range(q_runs):
            t0 = time.perf_counter()
            _consume(QUERIES[name](SF_DIR))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    from pdf_extraction_tests_ray.fixtures import FLAT_SPANS_VERSION

    n_runs = int(os.environ.get("GRAFT_BENCH_RUNS", "2"))
    result = {
        "metric": f"flagship extraction wall time at sf, best of {n_runs} (docs/sec in docs_per_sec)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        # corpus version stamp: timings are only comparable between runs
        # with the SAME flat_spans_version (the round-2 headline confusion
        # was exactly a cross-version comparison — VERDICT r2 #1)
        "flat_spans_version": FLAT_SPANS_VERSION,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / headline, 2) if headline > 0 else None,
        # raw-CPU control measured in the same run: this shared host has
        # hour-scale slow windows (2-5x on parallel work; BASELINE.md) —
        # read absolute timings against this number (healthy: ~15+ from
        # inside the bench process; pool-fork of the big heap is part of
        # the measurement, so only compare against other bench runs)
        "host_control_tasks_per_sec": _host_tasks_per_sec(),
    }
    ray.shutdown()
    return result


def _pool_tasks_elapsed(n_procs: int, n_tasks: int, timeout: float = 180.0):
    """Time Pool-create + map of the control tasks (same semantics as the
    historical control numbers). fork-based pools can deadlock sporadically
    when a worker inherits a locked lock — observed once on this host, the
    map never returns — so the wait is bounded and retried once; None
    after two hangs (callers emit null rather than blocking the bench)."""
    import multiprocessing as mp

    for _ in range(2):
        t0 = time.perf_counter()
        with mp.Pool(n_procs) as p:
            try:
                p.map_async(_control_task, range(n_tasks)).get(timeout=timeout)
                return time.perf_counter() - t0
            except mp.TimeoutError:
                p.terminate()
    return None


def _host_tasks_per_sec(n_procs: int = 16, n_tasks: int = 32):
    """Plain-multiprocessing regex throughput (no Ray): the
    silicon-of-the-hour control for every timing in this output."""
    el = _pool_tasks_elapsed(n_procs, n_tasks)
    return round(n_tasks / el, 1) if el else None


def _control_task(_):
    """Raw-CPU unit of work for the host control measurement (module level
    so multiprocessing can pickle it)."""
    import re as _re

    pat = _re.compile(r"(\w+)\s+(\d+)")
    s = "word 123 other 456 " * 5000
    for _ in range(150):
        pat.findall(s)


def run_scaling():
    def run(ncpu: int) -> dict:
        # headline only: the scaling criterion is about the flagship job;
        # larger replicate so compute dominates residual fixed costs
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_HEADLINE_ONLY="1",
            GRAFT_BENCH_RUNS="1",  # one run per level; ROUNDS interleaves
            GRAFT_BENCH_REPLICATE=os.environ.get("GRAFT_BENCH_REPLICATE", "96"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def host_control(lo: int, hi: int):
        """Raw-CPU lo->hi efficiency (plain multiprocessing regex work, no
        Ray) measured the SAME hour — the silicon ceiling this shared host
        offers right now. Engine efficiency should be read against it.
        None if the (hang-guarded) control pools failed twice."""

        def tput(n: int):
            el = _pool_tasks_elapsed(n, n * 2)
            return (n * 2) / el if el else None

        tput(lo)  # warm the pool-fork path
        t_hi, t_lo = tput(hi), tput(lo)
        if not t_hi or not t_lo:
            return None
        return (t_hi / t_lo) / (hi / lo)

    pair = os.environ.get("GRAFT_SCALING_PAIR", "4,16")
    lo, hi = (int(x) for x in pair.split(","))
    # interleave levels across rounds (lo,hi,lo,hi) so slow host drift
    # hits both levels equally instead of biasing whichever ran last;
    # best throughput per level across rounds
    rounds = int(os.environ.get("GRAFT_SCALING_ROUNDS", "2"))
    r_lo = r_hi = None
    for _ in range(rounds):
        a, b = run(lo), run(hi)
        if r_lo is None or a["value"] < r_lo["value"]:
            r_lo = a
        if r_hi is None or b["value"] < r_hi["value"]:
            r_hi = b
    tput_lo = r_lo["n_docs"] / r_lo["value"]
    tput_hi = r_hi["n_docs"] / r_hi["value"]
    eff = (tput_hi / tput_lo) / (hi / lo)
    control = host_control(lo, hi)
    print(
        json.dumps(
            {
                "metric": f"scaling efficiency (throughput ratio / cpu ratio), {lo} -> {hi} cpus",
                f"sec_{lo}": r_lo["value"],
                f"sec_{hi}": r_hi["value"],
                f"docs_per_sec_{lo}": round(tput_lo, 2),
                f"docs_per_sec_{hi}": round(tput_hi, 2),
                "scaling_efficiency": round(eff, 3),
                "host_control_efficiency": round(control, 3) if control else None,
                "sf": SF_DIR,
                "flat_spans_version": r_hi.get("flat_spans_version"),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
