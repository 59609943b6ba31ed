"""ON_ERROR='CONTINUE' exact parity (``1. copy_to_raw.sql:38``): a row with
ANY unconvertible field is skipped whole — never half-loaded with a nulled
field — and surfaces in the reject audit read."""

from __future__ import annotations

import datetime as dt

from securities_pricing_data_pipeline_spark.sources.csv_source import (
    read_eod_csv,
    read_eod_csv_rejects,
)
from tests.fixtures import write_corrupt_eod_csv

D = dt.date(2026, 3, 2)


def test_continue_skips_whole_rows(spark, tmp_path):
    _, n_good, _ = write_corrupt_eod_csv(str(tmp_path), D)
    df = read_eod_csv(spark, str(tmp_path))
    rows = {r.symbol: r for r in df.collect()}
    assert len(rows) == n_good
    # cast-failure rows are gone entirely, not present with nulled fields
    assert "BADPRICE" not in rows and "BADDATE" not in rows and "SHORTROW" not in rows
    # NULL_IF sentinels are conversions, not errors
    assert rows["NULLY"].open is None and rows["NULLY"].high is None
    assert rows["GOOD1"].volume == 1000


def test_continue_rejects_audit(spark, tmp_path):
    path, _, n_bad = write_corrupt_eod_csv(str(tmp_path), D)
    rej = read_eod_csv_rejects(spark, str(tmp_path))
    recs = [r.raw_record for r in rej.collect()]
    assert len(recs) == n_bad
    assert any("not_a_number" in r for r in recs)
    assert any("not_a_date" in r for r in recs)
    assert any("SHORTROW" in r for r in recs)
    assert all(path in r._src_file for r in rej.collect())


def test_clean_corpus_unchanged(spark, tmp_path):
    """The exact-CONTINUE path must not change behavior on the standard
    fixture corpus (which has no damaged rows)."""
    from tests.fixtures import write_eod_csv

    write_eod_csv(str(tmp_path), D)
    df = read_eod_csv(spark, str(tmp_path))
    assert df.count() == 55  # 50 generated + 5 edge-case rows, none dropped
    assert read_eod_csv_rejects(spark, str(tmp_path)).count() == 0
