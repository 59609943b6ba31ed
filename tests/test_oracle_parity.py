"""Every registered query must hash-match its DuckDB oracle (the driver's
correctness gate, run here at sf0.001 for speed — the driver uses sf0.01)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from tools.check_oracle import duck_run, normalize  # noqa: E402

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only contract
        return
    ddf = duck_run(sf_dir, ORACLES[name])
    scols, srows = normalize(sdf)
    dcols, drows = normalize(ddf)
    assert scols == dcols, f"column mismatch: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}"
    mismatches = [(a, b) for a, b in zip(srows, drows) if a != b]
    assert not mismatches, f"{len(mismatches)} row diffs, first: {mismatches[0]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"symbol", "liquidity_rank"} <= set(df.columns)
