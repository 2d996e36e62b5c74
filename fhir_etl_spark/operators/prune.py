"""Empty-pruning expression compiler (SURVEY.md §2.9 N1).

The reference's ``remove_empty_dicts`` (utils.py:138-161) recursively drops
empty dicts/lists/strings at any depth (keeping 0/False), and turns an
empty list into None. Dynamic recursion over dict shapes becomes, here, a
schema-driven expression generator: given a DataFrame column's StructType
we emit ONE nested expression that nulls out empties bottom-up. The JSON
sink then drops nulls (``ignoreNullFields``), completing the semantics.

Rules (matching the reference's truth table exactly):
- '' (empty string)      → NULL   (v or v == 0 is False for '')
- 0 / 0.0 / False        → kept   (the `or v == 0` arm; False == 0 in Python)
- [] after pruning       → NULL   (empty list → None, utils.py:158)
- struct with all fields NULL after pruning → NULL (empty dict dropped)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _prune(col: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, T.StringType):
        return F.when(col != "", col)  # '' and NULL both → NULL
    if isinstance(dtype, T.ArrayType):
        pruned_elems = F.filter(
            F.transform(col, lambda x: _prune(x, dtype.elementType)),
            lambda x: x.isNotNull(),
        )
        return F.when(col.isNotNull() & (F.size(pruned_elems) > 0), pruned_elems)
    if isinstance(dtype, T.StructType):
        rebuilt = F.struct(
            *[
                _prune(col.getField(f.name), f.dataType).alias(f.name)
                for f in dtype.fields
            ]
        )
        any_set = None
        for f in dtype.fields:
            field_set = _prune(col.getField(f.name), f.dataType).isNotNull()
            any_set = field_set if any_set is None else (any_set | field_set)
        return F.when(col.isNotNull() & any_set, rebuilt)
    # numeric / boolean / binary / timestamp: kept as-is (0 and False survive)
    return col


def prune_empty(df: DataFrame, col_name: str = "resource") -> DataFrame:
    """Apply the N1 pruning rules to a (typically struct-typed) column."""
    dtype = df.schema[col_name].dataType
    return df.withColumn(col_name, _prune(F.col(col_name), dtype))
