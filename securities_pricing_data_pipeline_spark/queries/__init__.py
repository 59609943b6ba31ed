"""Operator/query registry over the driver's testdata tables.

Each module exposes ``QUERIES`` (name → callable(spark, sf_dir) → DataFrame)
and ``ORACLES`` (name → DuckDB SQL). ``__spark_entry__.py`` merges them.
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
    tpch,
)

QUERIES = {}
ORACLES = {}
for _m in (bars, eventsq, relational, serving, llmq, tpch, analytic, sqlapi):
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)
