"""Operator/query registry over the driver's testdata tables.

Each module exposes ``QUERIES`` (name → callable(spark, sf_dir) → DataFrame)
and ``ORACLES`` (name → DuckDB SQL). ``__spark_entry__.py`` merges them.

Ordering matters: the correctness driver checks queries in registry order
and caps the number it runs per round (50). The window is SELF-ADVANCING:
a pinned canary of SURVEY §2 core names leads, and the rest of the
registry is ordered never-driver-certified-first by reading the committed
``CORRECTNESS_r*.json`` artifacts at import time — so each driver round
automatically certifies fresh names without anyone editing this file
(round 5 regressed to zero new certifications precisely because the old
static list went stale). Names the driver certified green in any round
sink to the tail; everything stays covered by ``tools/check_oracle.py``
over the full registry (``ORACLE_r{N}.json``).
"""

from __future__ import annotations

import glob as _glob
import json as _json
import os as _os
import warnings as _warnings

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

# The always-pinned canary: SURVEY §2 core names spanning every family
# (projection, star join, window dedup, surrogate assignment, dim build,
# serving Q1/Q2/Q5/Q8, as-of). Each is 2x+ driver-certified; they lead the
# window every round as a smoke set.
_CANARY = [
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
]


def _driver_certified() -> set[str]:
    """Names certified GREEN (rows+schema+hash, no error) by any committed
    driver correctness artifact. Reads the repo-root CORRECTNESS_r*.json
    files next to this package; returns empty on any surprise so a
    malformed artifact can never break the registry import."""
    root = _os.path.dirname(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    )
    green: set[str] = set()
    paths = sorted(_glob.glob(_os.path.join(root, "CORRECTNESS_r*.json")))
    if not paths:
        # Installed (site-packages) layouts or artifact-free checkouts have
        # no committed correctness files; the window then degrades to the
        # static _PRIORITY order. Say so once rather than silently staling.
        _warnings.warn(
            "no CORRECTNESS_r*.json artifacts found next to the repo root; "
            "registry rotation falls back to the static order",
            stacklevel=2,
        )
    for path in paths:
        try:
            with open(path) as fh:
                doc = _json.load(fh)
            for name, v in doc.items():
                if (
                    isinstance(v, dict)
                    and v.get("rows_match")
                    and v.get("schema_match")
                    and v.get("hash_match")
                    and not v.get("err")
                ):
                    green.add(name)
        except (OSError, ValueError, AttributeError):
            continue
    return green


# Static fallback order for the never-certified block (round-6 snapshot):
# used only to break ties deterministically; the live order is computed
# below from the artifacts so the window self-advances every round.
_PRIORITY = [
    # round-7 additions: new operators whose first driver certification
    # should not wait behind the older backlog
    "asof_bucketed_quotes",
    "multimodal_jpeg_roundtrip",
    "multimodal_png_pixels",
    "audio_pcm_features",
    "video_mjpeg_frames",
    "sim_pq_adc_topk",
    "layout_skip_eval",
    "stream_events_late_audit",
    "sim_pq_adc_recall",
    "layout_compaction_plan",
    "dq_key_gaps",
    "stream_events_enrich",
    "layout_hilbert_plan",
    # r6-verdict call-outs: the rewritten knn eval (160.7s→1.2s — its
    # driver row IS the fix's certification), the streaming gates with
    # judge-oracle-only rows, and the post-ORACLE_r06 registrations
    "sim_knn_classify",
    "stream_events_cdc_upsert",
    "stream_events_sliding",
    "stream_events_topk_users",
    "emb_kmeans",
    "graph_communities_parts",
    # round-6 window tail (40 never-driver-certified as of r5)
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

_missing = [n for n in _CANARY + _PRIORITY if n not in _ALL_QUERIES]
if _missing:  # fail loudly at import: a stale priority list would silently
    raise RuntimeError(f"priority queries not registered: {_missing}")

# Live window order: canary first, then NEVER-driver-certified names
# (static-priority entries first for determinism, then remaining registry
# order), then the already-certified long tail. A fresh driver artifact
# landing in the repo root is enough to advance the window next round.
_certified = _driver_certified()
if not _certified:
    # Installed/site-packages layouts and artifact-free checkouts have no
    # CORRECTNESS_r*.json next to the package — the window then quietly
    # degrades to the static fallback order. Say so once, on stderr, so a
    # silently stale rotation is detectable (ADVICE r6; ordering only —
    # results are unaffected).
    import sys as _sys

    print(
        "securities_pricing_data_pipeline_spark.queries: no CORRECTNESS_r*.json artifacts found; "
        "registry rotation falls back to the static priority order",
        file=_sys.stderr,
    )
_rest = [n for n in _PRIORITY if n not in _CANARY]
_rest += [n for n in _ALL_QUERIES if n not in _CANARY and n not in _rest]
_order = (
    _CANARY
    + [n for n in _rest if n not in _certified]
    + [n for n in _rest if n in _certified]
)

QUERIES = {n: _ALL_QUERIES[n] for n in _order}
QUERIES.update((n, f) for n, f in _ALL_QUERIES.items() if n not in QUERIES)
ORACLES = {n: _ALL_ORACLES[n] for n in QUERIES if n in _ALL_ORACLES}
