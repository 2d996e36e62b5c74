"""T3 (SURVEY.md §5.2): every registered inventory query vs its DuckDB
oracle — the local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from fhir_etl_spark.queries import all_queries
from tests.oracle_harness import compare

_QUERIES = all_queries()
_WITH_ORACLE = sorted(n for n, q in _QUERIES.items() if q.oracle is not None)
_ROWS_ONLY = sorted(n for n, q in _QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, oracle_con, sf_dir, name):
    qd = _QUERIES[name]
    compare(qd.fn(spark, sf_dir), oracle_con, qd.oracle, name=name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    qd = _QUERIES[name]
    df = qd.fn(spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) > 0


def test_contract_shapes():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40, f"inventory too small: {len(qs)}"
