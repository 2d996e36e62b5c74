"""Shared fixtures: one session-scoped SparkSession (JVM startup is ~15 s;
never per-test), DuckDB connection with the driver's table views, sf dirs.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from fhir_etl_spark.session import get_spark

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_CORRECTNESS = "/root/testdata/sf0.01"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    session = get_spark(
        "fhir_etl_spark_tests",
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_TEST_DRIVER_MEM", "8g"),
            "spark.sql.shuffle.partitions": "8",
        },
    )
    yield session


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL


def make_duckdb(sf: str) -> duckdb.DuckDBPyConnection:
    """Mirror the driver's oracle setup: each table pre-registered as a view."""
    con = duckdb.connect()
    for table in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {table} AS SELECT * FROM '{sf}/{table}.parquet'"
        )
    return con


@pytest.fixture(scope="session")
def oracle_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    return make_duckdb(sf_dir)
