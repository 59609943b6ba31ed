"""Operator/query registry over the driver's testdata tables.

Each module exposes ``QUERIES`` (name → callable(spark, sf_dir) → DataFrame)
and ``ORACLES`` (name → DuckDB SQL). ``__spark_entry__.py`` merges them.

Ordering matters: the correctness driver checks queries in registry order
and caps the number it runs per round (50 in round 2).  ``_PRIORITY`` pins
the SURVEY §2 core inventory first, then one representative per extension
family (near-dup dedup, embedding dedup, ANN, multimodal, as-of join,
TPC-H, analytic SQL, subquery SQL) so every family lands inside the
driver's window.  Long-tail variants follow and are still covered by
``tools/check_oracle.py`` over the full registry.
"""

from __future__ import annotations

from securities_pricing_data_pipeline_spark.queries import (
    analytic,
    bars,
    eventsq,
    llmq,
    relational,
    serving,
    sqlapi,
    streamq,
    tpch,
)

_MODULES = (bars, eventsq, relational, serving, llmq, tpch, analytic, sqlapi, streamq)

# First N entries are what a capped correctness driver will actually check
# (50 per round). Rotation policy (VERDICT r3 item 5, re-ranked r5 item 2):
# the union of driver-certified names across rounds 2-5 is 73/180; the full
# SURVEY core is 2x-driver-certified, so round 6 shrinks the always-pinned
# core to a 10-name canary spanning every family (projection, star join,
# window dedup, surrogate assignment, dim build, serving Q1/Q2/Q5/Q8,
# as-of) and fills the remaining 40 slots with never-driver-certified
# names in registry order, led by dedup_lsh_bucket_audit (position 51 in
# r4/r5 — missed the cap twice). Everything rotated out is still checked
# by the full-registry repo gate (tools/check_oracle.py, ORACLE_r{N}.json).
_PRIORITY = [
    # 10-name SURVEY-core canary (2x driver-certified; pinned as smoke)
    "p1_typed_projection",
    "j2_star_join",
    "a4_dedup_latest",
    "a10_surrogate_assignment",
    "dim_date_build",
    "q1_market_totals",
    "q2_rolling_liquidity",
    "q5_daily_returns",
    "q8_ohlc_series",
    "asof_event_bars",
    # 40 never-driver-certified names (registry order) — round 6 window
    "dedup_lsh_bucket_audit",
    "bars_gapfill_interp",
    "q17_twap",
    "q18_rolling_median",
    "corpus_drift_kl",
    "asof_pairs_spread",
    "events_window_funnel",
    "events_cohort_retention",
    "sim_dimsum_cosine",
    "sample_weighted_docs",
    "basket_part_pairs",
    "events_markov_transitions",
    "events_km_survival",
    "gini_volume_concentration",
    "graph_triangles_suppliers",
    "dq_benford_prices",
    "pareto_abc_parts",
    "stream_events_interval_join",
    "sql_lateral_topk_orders",
    "sketch_hll_weekly_merge",
    "sketch_hll_intersection",
    "dq_expectations_lineitem",
    "incr_symbol_totals_update",
    "quantile_sketch_close",
    "dedup_cluster_size_hist",
    "dedup_source_overlap",
    "dedup_incremental_minhash",
    "dq_profile_lineitem_exact",
    "emb_pq_codes",
    "sim_rrf_fusion",
    "text_chunk_windows",
    "q16_trend_slope",
    "events_variant_props",
    "hist_price_buckets",
    "ri_orphan_lineitems",
    "q11_vwap",
    "q12_max_drawdown",
    "q13_beta",
    "q14_top_corr_pairs",
    "q15_rsi",
    # positions 51+: round-7 rotation candidates — the remaining
    # never-driver-certified names continue in registry order
    "snapshot_diff_positions",
    "ar1_close_autocorr",
    "pit_band_lookup",
    "islands_trading_streaks",
    "pattern_down_streaks",
    "dedup_cluster_star",
    "sketch_cms_partkeys",
    "sketch_bloom_custkeys",
    "text_decontaminate",
    "text_vocab_topk",
    "text_tfidf_topterms",
    "corpus_filter_funnel",
    "sample_stratified",
    "corpus_mix_plan",
    "dedup_minhash_eval",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "text_token_count",
    "text_token_count_bpe",
    "text_winnow_fingerprint",
    "text_quality_score",
    "text_pii_scrub",
    "text_repetition_stats",
    "text_fingerprint",
    "text_lang_id",
    "text_length_quantiles",
    "sim_bruteforce_topk",
    "sim_lsh_topk",
    "multimodal_frame_sample",
    "multimodal_resize",
]

_ALL_QUERIES = {}
_ALL_ORACLES = {}
for _m in _MODULES:
    _ALL_QUERIES.update(_m.QUERIES)
    _ALL_ORACLES.update(_m.ORACLES)

_missing = [n for n in _PRIORITY if n not in _ALL_QUERIES]
if _missing:  # fail loudly at import: a stale priority list would silently
    raise RuntimeError(f"priority queries not registered: {_missing}")

QUERIES = {n: _ALL_QUERIES[n] for n in _PRIORITY}
QUERIES.update((n, f) for n, f in _ALL_QUERIES.items() if n not in QUERIES)
ORACLES = {n: _ALL_ORACLES[n] for n in QUERIES if n in _ALL_ORACLES}
