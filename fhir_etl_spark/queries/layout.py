"""Storage-layout inventory: Z-order curve values (operators/layout.py).

The z-value computation is integer-exact (div-scaling + bit interleave),
so DuckDB can reproduce it bit-for-bit — the layout op's math gets a full
value-hash oracle even though the *physical* effect (file clustering) is
asserted separately in tests/test_layout.py via parquet footer stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fhir_etl_spark.operators.layout import zorder_key
from fhir_etl_spark.queries.registry import query
from fhir_etl_spark.session import load_tables

_BITS = 8
_BUCKETS = 1 << _BITS


def _interleave_sql(axes: list[str], bits: int) -> str:
    n = len(axes)
    terms = [
        f"((({axis} >> {bit}) & 1) << {bit * n + j})"
        for bit in range(bits)
        for j, axis in enumerate(axes)
    ]
    return " + ".join(terms)


@query(
    "y1_zorder_curve",
    oracle=f"""
    WITH stats AS (
      SELECT CAST(min(l_partkey) AS BIGINT) AS pmin,
             CAST(max(l_partkey) AS BIGINT) AS pmax,
             CAST(min(l_suppkey) AS BIGINT) AS smin,
             CAST(max(l_suppkey) AS BIGINT) AS smax
      FROM lineitem
    ), scaled AS (
      SELECT l_orderkey, l_linenumber,
             ((CAST(l_partkey AS BIGINT) - pmin) * {_BUCKETS}) // (pmax - pmin + 1) AS sx,
             ((CAST(l_suppkey AS BIGINT) - smin) * {_BUCKETS}) // (smax - smin + 1) AS sy
      FROM lineitem, stats
    )
    SELECT l_orderkey, l_linenumber,
           CAST({_interleave_sql(["sx", "sy"], _BITS)} AS BIGINT) AS zval
    FROM scaled
    """,
    tags=("layout", "zorder"),
)
def y1_zorder_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-values over (l_partkey, l_suppkey): the clustering key
    behind zorder_layout, checked value-exactly against the oracle."""
    lineitem = load_tables(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    return zorder_key(lineitem, ["l_partkey", "l_suppkey"], bits=_BITS).selectExpr(
        "l_orderkey", "l_linenumber", "_zvalue AS zval"
    )
