"""Operator/query registry over the driver's testdata tables.

Each module exposes ``QUERIES`` (name → callable(spark, sf_dir) → DataFrame)
and ``ORACLES`` (name → DuckDB SQL). ``__spark_entry__.py`` merges them.
"""

from __future__ import annotations

from securities_pricing_data_pipeline_spark.queries import bars, eventsq, relational, serving, llmq

QUERIES = {}
ORACLES = {}
for _m in (bars, eventsq, relational, serving, llmq):
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)
