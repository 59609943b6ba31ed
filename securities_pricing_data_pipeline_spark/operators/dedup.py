"""A4: ranked-window dedup — keep exactly one row per key.

Reference: ``ROW_NUMBER() OVER (PARTITION BY SYMBOL, TRADE_DATE ORDER BY
_INGEST_TS DESC, _SRC_FILE DESC) ... WHERE rn = 1``
(``dags/sql/4. merge_core.sql:66-81``).

Scale: one shuffle on the key columns; with silver bucketed by symbol the
window reuses the layout. The ordering must include a total tie-break
(the reference uses ``_src_file`` desc) so re-runs are deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Keep the first row per ``keys`` under ``order_by`` (pass descending
    columns for 'latest wins')."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
