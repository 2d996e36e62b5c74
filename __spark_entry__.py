"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the operator inventory registered in
fhir_etl_spark.queries (one (Spark plan, DuckDB oracle) pair per operator
from SURVEY.md §2 plus the north-star dedup/similarity/text operators).

History note: rounds 2–4 prepended ``a0_``-prefixed coverage-rotation
aliases here so the driver's 50-query-per-round correctness window landed
on queries that still lacked a driver row. That achieved its goal —
145/145 cumulative driver-green by round 4 (CORRECTNESS_r0{1..4}.json) —
and the machinery was retired in round 5 (VERDICT r04 "What's wrong" #4):
``queries()`` now returns each registered query exactly once, sorted by
name, and whatever window the driver takes falls on base names. The only
registered queries without value oracles are the 4 rows-only-by-nature
ones (x4 approx sketches, t13 iterative BPE, d4x xxhash64 MinHash twin of
the md5-oracled d4, m11 float-FFT mel spectrogram).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the engine importable regardless of the driver's CWD.
_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from fhir_etl_spark.queries import all_queries  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: TPC-H Q3-shaped scan→filter→3-way
    join→agg→top-k (exercises S/P/J/A/O in one plan)."""
    from fhir_etl_spark.queries.relational import q3_shipping_priority

    return q3_shipping_priority(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """name → fn(spark, sf_dir) for every implemented inventory operator,
    each exactly once, sorted by name."""
    return {name: qd.fn for name, qd in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    """name → DuckDB SQL. Entries absent here (approx/hash-dependent ops:
    xxhash64 MinHash-LSH, iterative BPE, approx sketches) get the driver's
    rows-only check; their semantics are asserted in tests/ instead."""
    return {
        name: qd.oracle
        for name, qd in sorted(all_queries().items())
        if qd.oracle is not None
    }
