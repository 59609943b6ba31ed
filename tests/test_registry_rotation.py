"""The driver-window rotation must be self-advancing: the 50-query
window the correctness driver consumes is derived from the committed
CORRECTNESS_r*.json artifacts at import time — canary first, then
never-driver-certified names — so no round can re-certify a stale list
(the round-5 failure mode)."""

from __future__ import annotations

import glob
import json
import os

from securities_pricing_data_pipeline_spark import queries as Q

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _green() -> set[str]:
    out: set[str] = set()
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        doc = json.load(open(path))
        out |= {
            k
            for k, v in doc.items()
            if isinstance(v, dict)
            and v.get("rows_match")
            and v.get("schema_match")
            and v.get("hash_match")
            and not v.get("err")
        }
    return out


def test_canary_leads_window():
    names = list(Q.QUERIES.keys())
    assert names[: len(Q._CANARY)] == Q._CANARY


def test_window_is_fully_oracle_backed():
    for name in list(Q.QUERIES.keys())[:WINDOW]:
        assert name in Q.ORACLES, f"{name} in driver window without an oracle"


def test_window_prefers_never_certified_names():
    """Post-canary window slots must be uncertified names while any
    remain — a certified name there means the rotation went stale."""
    names = list(Q.QUERIES.keys())
    green = _green()
    uncertified_total = sum(1 for n in names if n not in green and n not in Q._CANARY)
    post_canary = names[len(Q._CANARY) : WINDOW]
    expected_fresh = min(len(post_canary), uncertified_total)
    fresh = [n for n in post_canary if n not in green]
    assert len(fresh) == expected_fresh, (
        f"only {len(fresh)}/{expected_fresh} never-certified names in the "
        f"window; certified stragglers: {[n for n in post_canary if n in green]}"
    )


def test_registry_is_complete_and_consistent():
    assert set(Q.ORACLES) <= set(Q.QUERIES)
    assert all(callable(f) for f in Q.QUERIES.values())
    assert all(isinstance(s, str) and s.strip() for s in Q.ORACLES.values())


def test_artifact_free_checkout_warns_instead_of_silently_staling():
    """An installed layout (no CORRECTNESS_r*.json next to the package)
    must degrade loudly: _driver_certified warns and returns empty."""
    import warnings

    orig = Q._glob.glob
    Q._glob.glob = lambda pattern: []
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            assert Q._driver_certified() == set()
        assert any("CORRECTNESS_r*.json" in str(w.message) for w in caught)
    finally:
        Q._glob.glob = orig
