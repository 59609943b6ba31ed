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

# First N entries are what a capped correctness driver will actually check.
# Rotation policy (VERDICT r3 item 5): SURVEY §2 core rows stay pinned every
# round; everything else green in BOTH prior driver rounds rotates out to
# the long tail (still repo-gate-checked) so never-driver-certified queries
# get a driver row. Round 5: the events/asof families stay (red in the r3
# driver, fixed r4 — they need a second certified round); the r3-certified
# extension reps (dedup_minhash_lsh, dedup_embedding_cosine, sim_ivf_topk,
# multimodal_features, tpch_q1, pivot_segment_status, sql_exists_late_ship)
# rotate out; rotated in: the 3 NEW streaming-executed gate queries and the
# never-driver-checked round-4 tail additions.
_PRIORITY = [
    # events (ts physical-type-sensitive — all 8 fixed this round; keep
    # the full family in the window until driver-certified)
    "events_hourly_stats",
    "events_sessionize",
    "events_session_window",
    "events_json_props",
    "events_retention",
    "events_dau_wau",
    "events_funnel",
    # SURVEY §2.2–§2.5 relational inventory (core — always pinned)
    "p1_typed_projection",
    "p2_date_filter",
    "p3_reject_split",
    "p4_key_normalize",
    "p5_existence_gate",
    "p6_weekend_membership",
    "j1_semi_join",
    "j2_star_join",
    "j3_metrics_onerow",
    "j4_insert_if_absent",
    "a1_filtered_counts",
    "a2_distinct_keys",
    "a3_next_surrogate_id",
    "a4_dedup_latest",
    "a8_premerge_estimate",
    "a9_postmerge_recon",
    "a10_surrogate_assignment",
    "dim_date_build",
    # SURVEY §2.6 serving queries (core — always pinned; q2b/q4b are the
    # calendar-RANGE / enriched-sector shapes of core rows Q2/Q4)
    "q1_market_totals",
    "q2_rolling_liquidity",
    "q2b_rolling_calendar",
    "q3_liquidity_rank",
    "q4_segment_contribution",
    "q4b_sector_contribution",
    "q5_daily_returns",
    "q6_top_volume",
    "q7_volatility_topk",
    "q8_ohlc_series",
    "q9_price_averages",
    # as-of join family (3 fixed this round)
    "asof_event_bars",
    "asof_event_bars_fwd",
    "asof_event_bars_tol",
    # driver-green r4 only — keep for a second certified round
    "tpch_q21_waiting_suppliers",
    "graph_pagerank_suppliers",
    "scd2_price_bands",
    "sketch_hll_orderkeys",
    # rotated in round 5: streaming-executed gate queries (NEW) and the
    # round-4 tail additions that have never had a driver row
    "stream_events_hourly",
    "stream_events_dedup_keys",
    "stream_events_sessionize",
    "layout_zorder_plan",
    "text_segment_dedup",
    "export_shard_plan",
    "sim_ivf_recall_eval",
    "dedup_lsh_bucket_audit",
    # positions 51+: next rotation candidates, first of the long tail —
    # never-driver-checked round-4/5 additions lead the overflow window
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
    # r3-certified reps rotated out this round (repo-gate still checks)
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "sim_ivf_topk",
    "multimodal_features",
    "tpch_q1_pricing_summary",
    "pivot_segment_status",
    "sql_exists_late_ship",
    "bars_ohlcv",
    "bars_rollup_multigrain",
    "bars_gapfill_locf",
    "q10_zscore_anomalies",
    "flagship_liquidity_top20",
    "range_join_in_transit",
    "skew_salted_aggregate",
    "dq_profile_lineitem",
    "emb_pq_codes",
    "sim_rrf_fusion",
    "text_chunk_windows",
    "q16_trend_slope",
    "events_variant_props",
    "hist_price_buckets",
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
