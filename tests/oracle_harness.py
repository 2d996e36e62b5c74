"""Local replica of the driver's correctness gate: run a registered Spark
query and its DuckDB oracle on the same parquet tables, compare row count,
column names, and order-insensitive values.

Stricter than a hash: on mismatch it reports the first differing rows, so
a failure localizes immediately.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd
from pyspark.sql import DataFrame


def _normalize_value(v: Any) -> Any:
    """Driver-strict canonicalization: int and float are DISTINCT.

    The driver serializes values before hashing, so DuckDB HUGEINT sums
    (materialized by fetch_df as float64, e.g. 3.0) hash differently from
    Spark BIGINT (3) even though Python's ``3 == 3.0``. Encoding the type
    into the canonical value makes the local gate catch exactly what the
    driver's hash would catch (the round-1 e3_sessionization red row).
    """
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", bool(v))
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return ("float", float(v))
    if isinstance(v, int):
        return ("int", int(v))
    if pd.isna(v):
        return None
    return ("str", str(v))


def canonical_rows(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    """(sorted column names, rows as tuples in sorted-column order, sorted)."""
    cols = sorted(df.columns)
    rows = [
        tuple(_normalize_value(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return cols, rows


def compare(
    spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"
) -> None:
    actual = spark_df.toPandas()
    expected = con.execute(sql).fetch_df()

    a_cols, a_rows = canonical_rows(actual)
    e_cols, e_rows = canonical_rows(expected)

    assert a_cols == e_cols, f"[{name}] column mismatch: spark={a_cols} oracle={e_cols}"
    assert len(a_rows) == len(e_rows), (
        f"[{name}] row count mismatch: spark={len(a_rows)} oracle={len(e_rows)}"
    )
    for i, (a, e) in enumerate(zip(a_rows, e_rows)):
        assert a == e, (
            f"[{name}] value mismatch at sorted row {i} (cols {a_cols}):\n"
            f"  spark : {a}\n  oracle: {e}"
        )
