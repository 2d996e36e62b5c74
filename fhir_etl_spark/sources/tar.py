"""TAR shard source — the WebDataset layout multimodal training sets ship
in (tar archives of ``<key>.<ext>`` member tuples; POSIX ustar via the
stdlib ``tarfile`` module, optionally gzipped).

WebDataset convention (public: the webdataset project / POSIX tar spec):
every sample is a group of adjacent members sharing a basename key —
``000123.jpg`` + ``000123.txt`` + ``000123.json`` is one sample. The
source emits one row PER MEMBER (tar_file, key, ext, size, payload);
sample assembly stays declarative on top — ``group_webdataset_samples``
pivots members into a ``map<ext, binary>`` with one groupBy, so Catalyst
plans it instead of Python.

Spark integration mirrors sources/warc.py: a Python DataSource planning
one partition per shard — exactly the WebDataset parallelism unit (shards
are sized for one worker). Corrupt shards land in an error row, never a
job failure. ``write_webdataset_shard`` builds deterministic shards for
tests and the s13 round-trip oracle.

Reference parity note: the reference has no archive source; this is a
north-star extension for multimodal corpus ingestion.
"""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

TAR_SCHEMA = (
    "tar_file string, key string, ext string, member_index long, "
    "size long, payload binary, error string"
)


def split_member_name(name: str) -> tuple[str, str]:
    """WebDataset key split: everything up to the FIRST dot of the
    basename is the key, the rest the extension — ``a/b/0001.seg.png`` →
    (``a/b/0001``, ``seg.png``) (the convention the webdataset project
    documents: multi-dot extensions belong to the ext)."""
    dirname, basename = os.path.split(name)
    key, _, ext = basename.partition(".")
    return (f"{dirname}/{key}" if dirname else key), ext


def iter_tar_members(data: bytes):
    """Yield (name, payload) for regular members of a (possibly gzipped)
    tar archive."""
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:*") as tf:
        for member in tf:
            if not member.isreg():
                continue
            f = tf.extractfile(member)
            yield member.name, (f.read() if f is not None else b"")


def write_webdataset_shard(
    samples: list[tuple[str, dict]], gzip_shard: bool = False
) -> bytes:
    """[(key, {ext: payload})] → tar bytes, members emitted adjacent per
    key in sorted ext order (the WebDataset adjacency contract)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz" if gzip_shard else "w") as tf:
        for key, parts in samples:
            for ext in sorted(parts):
                payload = parts[ext]
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                info.mtime = 0  # deterministic bytes
                tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


class TarShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class TarShardReader(DataSourceReader):
    def __init__(self, options: dict):
        paths = options.get("paths")
        if not paths:
            raise ValueError("webdataset source requires 'paths' (comma-separated)")
        self.paths = sorted(p for p in paths.split(",") if p)

    def partitions(self):
        return [TarShardPartition(p) for p in self.paths]

    def read(self, partition: TarShardPartition):
        path = partition.path
        try:
            with open(path, "rb") as f:
                data = f.read()
            for idx, (name, payload) in enumerate(iter_tar_members(data)):
                key, ext = split_member_name(name)
                yield (path, key, ext, idx, len(payload), payload, None)
        except Exception as exc:  # noqa: BLE001 — shard-level error row
            yield (path, None, None, None, None, None,
                   f"{type(exc).__name__}: {exc}"[:200])


class WebDatasetDataSource(DataSource):
    """``spark.read.format('webdataset').option('paths', 'a.tar,b.tar')``.
    Register with ``spark.dataSource.register(WebDatasetDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "webdataset"

    def schema(self) -> str:
        return TAR_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return TarShardReader(self.options)


def group_webdataset_samples(members: DataFrame) -> DataFrame:
    """Member rows → one row per sample: (tar_file, key, parts:
    map<ext, binary>). Pure Catalyst (two groupBys + map_from_entries) —
    the assembly never touches Python.

    Duplicate-key policy: a tar may legally contain two members with the
    same name (``tar`` extraction lets the later one overwrite the
    earlier). Mirroring that, the member with the greatest
    ``member_index`` per (tar_file, key, ext) wins — a deterministic
    pre-aggregation, so ``map_from_entries`` never sees a duplicated key
    (Spark's default ``mapKeyDedupPolicy=EXCEPTION`` would otherwise
    fail the whole job on one odd shard)."""
    last_wins = (
        members.where(F.col("error").isNull())
        .groupBy("tar_file", "key", "ext")
        .agg(F.max_by(F.col("payload"), F.col("member_index")).alias("payload"))
    )
    return (
        last_wins.groupBy("tar_file", "key")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("ext"), F.col("payload")))
            ).alias("parts")
        )
    )
