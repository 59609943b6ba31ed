"""Incremental aggregate maintenance (materialized-view delta merge).

The 100 TB contract: a gold aggregate over years of history must absorb a
new day WITHOUT re-scanning history. That works exactly when every
aggregate is decomposable into a mergeable partial — count/sum (add),
min/max (least/greatest) — the same algebra Spark's own partial
aggregation uses map-side. This operator is that algebra applied at the
TABLE level: (old aggregate table) ⊕ (delta aggregate) → new aggregate,
where the join is old-agg-sized ⋈ delta-sized, never raw-history-sized,
and the delta side is typically broadcastable.

Non-mergeable aggregates (exact medians, arg-min/first-last without a
carried ordering key) are out of contract — re-derive those from the
silver layer; the mergeable subset is what a continuously-maintained
gold table should hold (cf. the hypertable continuous-aggregate /
materialized-view maintenance pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _merge_col(kind: str, o: Column, d: Column) -> Column:
    if kind == "sum":
        combined = o + d
    elif kind == "max":
        combined = F.greatest(o, d)
    elif kind == "min":
        combined = F.least(o, d)
    else:
        raise ValueError(f"unmergeable aggregate kind: {kind!r}")
    # full-outer semantics: a key present on one side keeps that side's
    # partial unchanged (greatest/least already skip nulls; sums must not
    # null out)
    return F.when(o.isNull(), d).when(d.isNull(), o).otherwise(combined)


def merge_partial_aggs(
    old: DataFrame,
    delta: DataFrame,
    keys: list[str],
    cols: dict[str, str],
) -> DataFrame:
    """Merge two partial-aggregate tables with identical schemas.

    ``cols`` maps aggregate column name → merge kind (``sum`` | ``min`` |
    ``max``; counts merge as ``sum``). Keys absent from one side pass
    through the other side's partials unchanged (full-outer join).
    Column order of the result is keys + cols in mapping order.
    """
    o = old.select(*keys, *[F.col(c).alias(f"__o_{c}") for c in cols])
    d = delta.select(*keys, *[F.col(c).alias(f"__d_{c}") for c in cols])
    j = o.join(d, keys, "full_outer")
    return j.select(
        *keys,
        *[
            _merge_col(kind, F.col(f"__o_{c}"), F.col(f"__d_{c}")).alias(c)
            for c, kind in cols.items()
        ],
    )
