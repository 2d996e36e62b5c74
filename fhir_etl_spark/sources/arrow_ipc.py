"""Arrow IPC (Feather v2) file source — the zero-copy interchange format
training stacks hand around between Spark, Ray, and local tooling
(public: the Apache Arrow IPC file format spec; ``pyarrow.ipc``).

Read path is Arrow END TO END: ``spark.read.format('binaryFile')`` lists
and ships each ``.arrow`` file as one row (Spark's built-in distributed
file source — partition-per-file parallelism, no driver listing loop),
then ``mapInArrow`` opens the payload with ``pyarrow.ipc.open_file`` and
yields the embedded record batches — no pandas materialization, no
per-row Python, one Arrow batch in → N Arrow batches out. The Python
stage is a header parse + column cast over memory that is already in
Arrow layout (the whole point of IPC).

``write_ipc_file`` writes through the same atomic tmp-then-rename
protocol as the xlsx/webdataset writers.

Reference parity note: the reference has no Arrow source; this is a
north-star extension for multimodal/embedding corpus interchange.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa


def write_ipc_file(path: str, table: "pa.Table") -> None:
    """Atomically write a pyarrow Table as one Arrow IPC (Feather v2)
    file: tmp in the same directory, rename into place (the xlsx writer
    protocol — readers never observe a partial file)."""
    import pyarrow as pa

    tmp = f"{path}.tmp.{os.getpid()}"
    with pa.OSFile(tmp, "wb") as sink:
        with pa.ipc.new_file(sink, table.schema) as writer:
            writer.write_table(table)
    os.replace(tmp, path)


def read_arrow_ipc(
    spark: SparkSession, path_glob: str, schema: StructType | str
) -> DataFrame:
    """Distributed Arrow IPC read: binaryFile scan → mapInArrow decode.

    ``schema`` declares the expected columns (IPC files embed their own
    schema, but Spark needs the output schema at plan time); the decode
    selects exactly those columns and CASTS them to the declared Arrow
    types (safe casts only — a lossy mismatch raises). Files missing a
    declared column fail LOUDLY inside the task with the file path,
    never silently null-fill; corrupt payloads likewise.

    Scale shape: one input row per file (binaryFile splits the listing
    across the cluster — keep files shard-sized, the WebDataset rule);
    the decode re-emits the writer's own record batches, so downstream
    operators inherit the writer's batch granularity. There is no
    sub-file projection pushdown — an IPC file is one contiguous buffer
    (use parquet when you need column skip; IPC buys zero-copy
    interchange, not I/O pruning).
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(schema)
    names = target.names

    def decode(it: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa  # noqa: PLC0415 — executor-side import

        for batch in it:
            paths = batch.column(batch.schema.get_field_index("path"))
            contents = batch.column(batch.schema.get_field_index("content"))
            for i in range(batch.num_rows):
                src = paths[i].as_py()
                try:
                    reader = pa.ipc.open_file(
                        pa.BufferReader(contents[i].as_py())
                    )
                except pa.ArrowInvalid as exc:  # corrupt file → loud, located
                    raise ValueError(
                        f"arrow_ipc: cannot open {src}: {exc}"
                    ) from exc
                for bi in range(reader.num_record_batches):
                    rb = reader.get_batch(bi)
                    missing = [n for n in names if n not in rb.schema.names]
                    if missing:
                        raise KeyError(
                            f"arrow_ipc: {src} lacks declared columns {missing}"
                        )
                    yield pa.record_batch(
                        [
                            rb.column(rb.schema.get_field_index(n)).cast(
                                target.field(n).type
                            )
                            for n in names
                        ],
                        schema=target,
                    )

    raw = spark.read.format("binaryFile").load(path_glob)
    return raw.select("path", "content").mapInArrow(decode, schema)
