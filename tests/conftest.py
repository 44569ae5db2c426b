from __future__ import annotations

import os

import pytest

from server2_vector_search_server_spark.session import get_spark, load_tables

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests")
    yield spark


@pytest.fixture(scope="session")
def tables(spark):
    """sf0.001 tables, registered as temp views."""
    return load_tables(spark, SF_SMOKE, *TABLES)


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"'{SF_SMOKE}/{name}.parquet'")
    return con
