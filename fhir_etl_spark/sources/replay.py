"""Streaming replay DataSource: micro-batched playback of a parquet table.

The production shape for §2.10 streaming inputs is Kafka; in this
environment (and in every integration test) the stand-in is a replay of a
parquet table as a rate-limited stream. PySpark 4's Python DataSource
streaming API makes that a first-class source:

- offsets are ROW RANGES over the table (monotonic, replayable —
  exactly-once on restart comes free from deterministic slicing);
- each micro-batch advances the offset by ``rows_per_batch``;
- ``partitions(start, end)`` splits a batch's range into
  ``num_partitions`` slices, so the read itself is executor-parallel
  (the simple prefetch-on-driver reader API would serialize it);
- workers read their slice with pyarrow row-range pruning (row groups
  outside the slice are skipped), not a full-file scan per partition.

Usage:
    spark.dataSource.register(ParquetReplayDataSource)
    stream = (spark.readStream.format("parquet_replay")
              .option("path", f"{sf_dir}/events.parquet")
              .option("rows_per_batch", 2000).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


class RowSlice(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


def _table_num_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


class ParquetReplayStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.rows_per_batch = int(options.get("rows_per_batch", 10_000))
        self.num_partitions = int(options.get("num_partitions", 4))
        self.loop = options.get("loop", "false").lower() == "true"
        self.n_rows = _table_num_rows(self.path)
        self.fields = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"row": 0}

    # The reader object does not survive a query restart, but the offset
    # log does: every entry point that carries an offset bumps the
    # monotonic high-water mark, so latestOffset can never fall behind
    # the checkpointed position and poison the offset log backward
    # (which would re-emit already-delivered rows — the restart
    # exactly-once test pins this).
    def _bump(self, *offsets: int) -> None:
        self._high = max(getattr(self, "_high", 0), *offsets)

    def latestOffset(self) -> dict:
        # advance one batch per trigger; cap at the table end unless looping
        nxt = getattr(self, "_high", 0) + self.rows_per_batch
        if not self.loop:
            nxt = min(nxt, self.n_rows)
        self._bump(nxt)
        return {"row": nxt}

    def partitions(self, start: dict, end: dict):
        # Restart safety lives HERE (and in commit), not in offset
        # (de)serialization: pyspark 4.1's runner json-encodes offsets
        # itself and never calls back into the reader for it. After a
        # restart the engine replays the checkpointed range through
        # partitions()/commit(), whose _bump seeds the high-water mark, so
        # latestOffset can never fall behind the offset log (pinned by the
        # mid-stream AND fully-committed restart tests in test_sources).
        self._bump(start["row"], end["row"])
        lo, hi = start["row"], end["row"]
        if hi <= lo:
            return [RowSlice(self.path, lo, lo)]
        n = self.num_partitions
        width = max(1, (hi - lo + n - 1) // n)
        return [
            RowSlice(self.path, s, min(s + width, hi))
            for s in range(lo, hi, width)
        ]

    def read(self, partition: RowSlice):
        import pyarrow.parquet as pq

        if partition.end <= partition.start:
            return iter(())
        pf = pq.ParquetFile(partition.path)
        n_mod = pf.metadata.num_rows
        rows_out: list[tuple] = []
        want_lo, want_hi = partition.start, partition.end
        # map absolute replay positions onto the (possibly looped) table
        spans: list[tuple[int, int]] = []
        cur = want_lo
        while cur < want_hi:
            off = cur % n_mod
            take = min(n_mod - off, want_hi - cur)
            spans.append((off, off + take))
            cur += take
        for span_lo, span_hi in spans:
            pos = 0
            for rg in range(pf.metadata.num_row_groups):
                rg_rows = pf.metadata.row_group(rg).num_rows
                rg_lo, rg_hi = pos, pos + rg_rows
                pos = rg_hi
                if rg_hi <= span_lo or rg_lo >= span_hi:
                    continue
                tbl = pf.read_row_group(rg)
                s = max(span_lo - rg_lo, 0)
                e = min(span_hi - rg_lo, rg_rows)
                sliced = tbl.slice(s, e - s)
                cols = [sliced.column(name).to_pylist() for name in self.fields]
                rows_out.extend(zip(*cols))
        return iter(rows_out)

    def commit(self, end: dict) -> None:
        # see partitions(): the _bump here is the other half of the
        # restart-safety contract
        self._bump(end["row"])


class ParquetReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "parquet_replay"

    def schema(self) -> str:
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        arrow_schema = pq.ParquetFile(self.options["path"]).schema_arrow
        return from_arrow_schema(arrow_schema)

    def streamReader(self, schema: StructType) -> ParquetReplayStreamReader:
        return ParquetReplayStreamReader(schema, self.options)
