"""Testdata drift guard (VERDICT r3 item 7).

The driver regenerates /root/testdata between rounds and has already
changed a physical type once (events.ts: INT64 TIMESTAMP(NANOS) →
timestamp[us], which broke 8 queries in round 3). This test pins the
engine's LOGICAL contract per table: every driver table must load through
``helpers.load()`` on a vanilla-default session, and the columns the
queries depend on must come out as the types the query code assumes.
A future drift fails HERE, in one obvious place, instead of as scattered
AnalysisExceptions across the registry.
"""

from __future__ import annotations

import os

import pytest

from securities_pricing_data_pipeline_spark.queries.helpers import load

# column → expected Spark dtype, per table. Only contract-bearing columns
# are pinned (the ones query code does arithmetic/joins on); extra columns
# appearing in future testdata generations are fine.
CONTRACT = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_regionkey": "int", "n_name": "string"},
    "customer": {
        "c_custkey": "bigint",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {"s_suppkey": "bigint", "s_nationkey": "int", "s_acctbal": "double"},
    "part": {"p_partkey": "bigint", "p_retailprice": "double", "p_brand": "string"},
    # date-like columns ship as naive timestamp[us]; query code compares
    # them against date/timestamp literals, so NTZ is the pinned contract —
    # if the driver moves to date32 or instant timestamps, fail here first.
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderdate": "timestamp_ntz",
        "o_totalprice": "double",
        "o_orderstatus": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_shipdate": "timestamp_ntz",
        "l_returnflag": "string",
        "l_linestatus": "string",
    },
    # ts is BIGINT *after* load()'s normalization — that IS the contract
    # (load adapts nanos-long / timestamp[us] / timestamp encodings).
    "events": {
        "event_id": "bigint",
        "ts": "bigint",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {"doc_id": "bigint", "text": "string", "source": "string", "lang": "string"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
}


@pytest.mark.parametrize("table", sorted(CONTRACT))
def test_table_loads_with_contract_types(spark, sf_dir, table):
    assert os.path.exists(f"{sf_dir}/{table}.parquet")
    df = load(spark, sf_dir, table)
    dtypes = dict(df.dtypes)
    for col, want in CONTRACT[table].items():
        assert col in dtypes, f"{table}.{col} missing from testdata"
        assert dtypes[col] == want, f"{table}.{col}: {dtypes[col]} != contract {want}"
    # and the file is actually readable end to end, not just its footer
    assert df.limit(1).count() >= 0


def test_load_adapts_date32_orders(spark, tmp_path):
    """Drift insurance: a future orders.parquet shipping o_orderdate as
    date32 (or an instant timestamp) must still load to the engine's
    TIMESTAMP_NTZ contract."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    d0 = datetime.date(1995, 3, 14)
    table = pa.table(
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([10, 20], pa.int64()),
            "o_orderdate": pa.array([d0, d0.replace(day=15)], pa.date32()),
            "o_totalprice": pa.array([1.5, 2.5], pa.float64()),
            "o_orderstatus": pa.array(["O", "F"]),
        }
    )
    pq.write_table(table, tmp_path / "orders.parquet")
    df = load(spark, str(tmp_path), "orders")
    assert dict(df.dtypes)["o_orderdate"] == "timestamp_ntz"
    got = sorted(r.o_orderdate for r in df.collect())
    assert got[0] == datetime.datetime(1995, 3, 14)


def test_load_adapts_float64_embeddings(spark, tmp_path):
    """Drift insurance: embeddings shipping as array<double> must load to
    the engine's array<float> contract."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "vec_id": pa.array([1, 2], pa.int64()),
            "embedding": pa.array([[0.1, 0.2], [0.3, 0.4]], pa.list_(pa.float64())),
            "label": pa.array([0, 1], pa.int32()),
        }
    )
    pq.write_table(table, tmp_path / "embeddings.parquet")
    df = load(spark, str(tmp_path), "embeddings")
    assert dict(df.dtypes)["embedding"] == "array<float>"
    assert df.count() == 2
