"""Pins the driver-surface ordering contract (round-3 VERDICT #1).

The correctness driver checks the FIRST 50 entries of queries() against
oracle_sql() — so every one of those 50 slots must carry a SQL oracle, and
the extraction ladder (the engine's core surface) must lead the window.
Rows-only entries are allowed only past position 50.
"""

import importlib.util
import os


def _load_entry_module():
    spec = importlib.util.spec_from_file_location(
        "rayentry_surface_test", os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_driver_window_is_fully_oracled(tmp_path, monkeypatch):
    monkeypatch.setenv("GRAFT_EXTRACT_DUMP", str(tmp_path / "extract_input.parquet"))
    mod = _load_entry_module()
    keys = list(mod.queries())
    oracles = set(mod.oracle_sql())
    window = keys[:50]
    missing = [k for k in window if k not in oracles]
    assert missing == [], f"driver window entries without SQL oracle: {missing}"
    # extraction ladder leads the window
    assert window[0] == "extract_order_banded"
    assert {"extract_order_publisher", "extract_doc_scalars", "extract_order_generic"} <= set(window[:5])
    # the core families the round-2 driver never reached are all inside
    for k in ["dedup_exact", "dedup_lines", "dedup_jaccard_apply", "knn_bruteforce", "knn_multi"]:
        assert k in window, k
    # round-4 rotation (VERDICT r3 #1): the four oracled entries the driver
    # had never checked are now inside the window ...
    for k in ["q_events_funnel", "q_events_retention", "doc_length_outliers", "doc_gopher_rules"]:
        assert k in window, k
    # ... replacing four twice-green stable rows, which stay queryable
    for k in ["doc_token_counts", "doc_chunks", "doc_fingerprint", "q_lineitem_rollup"]:
        assert k in keys and k not in window, k
    # late-round-4 rotation: the four oracled queries added after the
    # first rotation are also inside the window ...
    for k in [
        "q_events_transitions",
        "q_events_watermark",
        "q_price_quantiles_sketch",
        "dedup_substring_cut",
        "doc_contamination_score",
        "q_lineitem_cube",
    ]:
        assert k in window, k
    # ... in place of six more twice-green rows, still conformance-run
    for k in [
        "q_topk_per_brand",
        "q_price_quantiles",
        "doc_stratified_sample",
        "doc_top_terms",
        "q_events_sliding",
        "q_user_sessions",
    ]:
        assert k in keys and k not in window, k
    # the as-of join stays IN the window: its payload transport changed
    # this round, so the driver should re-verify it
    assert "q_asof_user_order" in window


def test_all_oracled_keys_exist_in_queries(tmp_path, monkeypatch):
    monkeypatch.setenv("GRAFT_EXTRACT_DUMP", str(tmp_path / "extract_input.parquet"))
    mod = _load_entry_module()
    keys = set(mod.queries())
    assert set(mod.oracle_sql()) <= keys
