"""NDJSON sink (SURVEY.md §2.1 S8).

The reference writes one JSON object per line per resource type
(output_to_ndjson, oneKg_fhirizer.py:49-62). Spark's JSON sink IS NDJSON;
two modes:

- **scale** (default): ``df.write.text(dir)`` over the serialized column —
  multi-part, parallel, the only mode that exists at 100 TB.
- **parity**: coalesce(1) + rename to ``{ResourceType}.ndjson`` — matches
  the reference's single-file layout for golden diffs. A deliberate
  single-reducer ceiling, never used off the parity path.

Serialization happens exactly once (`to_json` on the struct column) — the
reference round-trips JSON 2-3× per row (utils.py:220-228); the engine IR
stays native structs until here (SURVEY.md §3.4).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fhir_etl_spark.operators.prune import prune_empty


def serialize(resources: DataFrame, col_name: str = "resource") -> DataFrame:
    """struct column → one JSON string per row, nulls dropped (N1 final layer)."""
    pruned = prune_empty(resources, col_name)
    return pruned.select(
        # a resource pruned to nothing serializes as '{}' (the reference's
        # remove_empty_dicts returns {} at the top level, utils.py:144-153)
        F.coalesce(
            F.to_json(F.col(col_name), {"ignoreNullFields": "true"}), F.lit("{}")
        ).alias("json")
    )


def write_ndjson(
    resources: DataFrame,
    folder_path: str,
    resource_type: str,
    parity: bool = True,
    col_name: str = "resource",
) -> str:
    """Write ``{folder}/{ResourceType}.ndjson`` (parity) or a part-file
    directory ``{folder}/{ResourceType}.ndjson.d/`` (scale). Returns the path."""
    os.makedirs(folder_path, exist_ok=True)
    serialized = serialize(resources, col_name)
    if not parity:
        out_dir = os.path.join(folder_path, f"{resource_type}.ndjson.d")
        serialized.write.mode("overwrite").text(out_dir)
        return out_dir

    target = os.path.join(folder_path, f"{resource_type}.ndjson")
    with tempfile.TemporaryDirectory() as tmp:
        staging = os.path.join(tmp, "out")
        serialized.coalesce(1).write.mode("overwrite").text(staging)
        parts = sorted(glob.glob(os.path.join(staging, "part-*")))
        assert len(parts) == 1, f"expected one part file, got {parts}"
        shutil.move(parts[0], target)
    return target


def read_ndjson(spark, path: str, schema=None) -> DataFrame:
    """Read NDJSON back (S7). PERMISSIVE mode + _corrupt_record column
    reproduces the reference's skip-bad-lines (document_references.py:196-199)
    without failing the job."""
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
