"""Registry mapping query names to (Spark callable, DuckDB oracle SQL).

The driver contract (``__spark_entry__.py``) needs two dicts: name →
``fn(spark, sf_dir) -> DataFrame`` and name → ANSI SQL for DuckDB. Keeping
both halves of each pair adjacent (one decorator per operator) is what keeps
column aliases in sync — the driver's value-hash compares columns by NAME,
so every computed column must carry the same alias on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register ``fn`` as an inventory query, optionally with its oracle SQL."""

    def decorator(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return decorator


def all_queries() -> dict[str, QueryDef]:
    return dict(_REGISTRY)


def get_query(name: str) -> QueryDef:
    return _REGISTRY[name]
