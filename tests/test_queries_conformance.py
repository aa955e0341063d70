"""Driver-style conformance: run every queries() entry at sf0.001 and
compare row-multisets against the paired oracle_sql() via DuckDB
(column-name-sorted, order-insensitive), mirroring CORRECTNESS_r{N}.json."""

import math

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("nan")
                else:
                    row.append(round(v, 6))
            elif hasattr(v, "item"):
                row.append(_scalar(v.item()))
            else:
                row.append(_scalar(v))
        rows.append(tuple(row))
    return sorted(rows, key=repr)


def _scalar(v):
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        return round(v, 6)
    return v


def _to_pandas(res):
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "q3_top_revenue_orders",
        "q_region_customer_balance",
        "q_orders_priority",
        "q_part_topk",
        "q_events_tumbling",
        "q_events_gapfill",
        "q_events_smoothed",
        "q_customer_segment_orders",
        "doc_token_counts",
        "doc_token_totals_by_lang",
        "doc_quality",
        "doc_repetition",
        "doc_chunks",
        "doc_langid",
        "doc_fingerprint",
        "doc_pack_group_totals",
        "dedup_exact",
        "dedup_exact_apply",
        "dedup_lines",
        "dedup_incremental",
        "dedup_shared_ngrams",
        "dedup_jaccard_clusters",
        "dedup_jaccard_apply",
        "extract_html_main",
        "dedup_jaccard_pairs",
        "dedup_minhash",
        "dedup_minhash_apply",
        "dedup_minhash_cross_job",
        "dedup_containment_pairs",
        "doc_dsir_importance",
        "doc_pagerank",
        "doc_lm_perplexity",
        "dedup_simhash",
        "dedup_fuzzy_names",
        "dedup_ngram3_jaccard_pairs",
        "dedup_embedding_pairs",
        "emb_quantize_int8",
        "knn_bruteforce",
        "knn_multi",
        "q_supplier_nation_balance",
        "q5_regional_revenue",
        "q_corr_quantity_discount",
        "q_part_price_zscore",
        "q_order_lineitem_counts",
        "q_pivot_priority_status",
        "q_order_gap_seconds",
        "q_order_price_rank",
        "q_user_sessions",
        "q_events_funnel",
        "q_events_retention",
        "q_events_transitions",
        "q_events_watermark",
        "q_asof_user_order",
        "q_events_sliding",
        "q_topk_per_brand",
        "q_quantity_range_buckets",
        "q_events_distinct_users",
        "q_events_approx_distinct_users",
        "q_price_quantiles",
        "q_price_quantiles_sketch",
        "dedup_substring_cut",
        "q_customers_without_orders",
        "q_order_running_total",
        "q_lineitem_rollup",
        "q_lineitem_cube",
        "q_customers_with_urgent_orders",
        "q_customers_with_urgent_orders_bloom",
        "doc_hash_sample",
        "doc_weighted_sample",
        "doc_weighted_mix",
        "doc_weighted_mix_tokens",
        "doc_top_terms_approx",
        "doc_search_keywords",
        "doc_search_keywords_indexed",
        "doc_scrub_pii",
        "doc_decontaminate_bloom",
        "doc_contamination_score",
        "curation_pipeline",
        "doc_length_quantiles",
        "doc_length_outliers",
        "doc_token_deciles",
        "doc_bigram_pmi",
        "doc_distinct_ngrams",
        "doc_corpus_stats",
        "doc_shuffle_order",
        "doc_train_split",
        "doc_vocab_encode",
        "doc_source_word_entropy",
        "doc_source_kl",
        "doc_decontaminate",
        "doc_stratified_sample",
        "doc_top_terms",
        "extract_order_generic",
        "extract_order_banded",
        "extract_order_publisher",
        "extract_doc_scalars",
        "extract_golden_transcript",
        "doc_pack_sequences",
        "doc_bpe_roundtrip",
        "doc_gopher_rules",
        "q_price_quantiles_tdigest",
    ],
)
def test_query_matches_oracle(name, duck):
    import __ray_entry__ as entrymod

    q = entrymod.queries()[name]
    if name.startswith("extract_"):
        # isolated dump path (never racing the driver's sf0.01 dump),
        # holding THIS sf's input
        import os

        from pdf_extraction_tests_ray.oracle_io import dump_extract_input

        path = "/tmp/graft_oracle_io/extract_input_test.parquet"
        os.environ["GRAFT_EXTRACT_DUMP"] = path
        try:
            dump_extract_input(SF_DIR, path)
            sql = entrymod.oracle_sql()[name]
        finally:
            del os.environ["GRAFT_EXTRACT_DUMP"]
    else:
        sql = entrymod.oracle_sql()[name]
    got = _canon(_to_pandas(q(SF_DIR)))
    exp = _canon(duck.execute(sql).df())
    assert len(got) == len(exp), f"{name}: row count {len(got)} != {len(exp)}"
    assert got == exp, f"{name}: value mismatch"


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize(
    "name",
    [
        "dedup_semantic",
        "emb_pca_project",
        "knn_lsh",
        "knn_pq",
        "knn_ivfpq",
        "knn_ivfpq_indexed",
        "knn_lsh_indexed",
        "knn_ivf",
        "doc_pack_sequences",
        "doc_bpe_encode",
        "doc_quality_scorer",
        "knn_ivf_indexed",
        "media_features",
        "media_decode_real",
        "media_ocr_regions",
        "media_ocr_glyph",
        "extract_ocr_backfill",
        "extract_flagship_llm",
        "extract_html_main_learned",
    ],
)
def test_rows_only_queries_run(name):
    import __ray_entry__ as entrymod

    q = entrymod.queries()[name]
    df = _to_pandas(q(SF_DIR))
    assert df is not None
    assert len(df.columns) > 0


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    import __ray_entry__ as entrymod

    ds = entrymod.entry()
    df = _to_pandas(ds.limit(5))
    assert len(df) > 0
    assert "doc_id" in df.columns and "main_text" in df.columns
