"""WARC (Web ARChive, ISO 28500) source — the container format LLM
training corpora actually arrive in (Common Crawl ships WARC/WET/WAT).

Pure-stdlib implementation from the public spec:

- record grammar: ``WARC/1.x CRLF`` + named headers (Content-Length
  mandatory) + CRLF + payload + CRLF CRLF;
- Common Crawl's storage convention — each record its own gzip member,
  members concatenated — handled by a multi-member zlib loop, so one
  ``.warc.gz`` streams record-by-record without ever inflating the whole
  file;
- HTTP response payloads (``WARC-Type: response``) optionally split into
  status / headers / body, which is the part a text pipeline wants.

Spark integration is a Python DataSource (like sources/rest.py and
ftp.py): the driver plans one partition per WARC file — the Common Crawl
unit of parallelism (segment files are individually sized for exactly
this) — and each executor streams its files. Corrupt records land in
error rows (``warc_type = NULL``, ``error`` set), never failing the job.

A minimal writer (``write_warc``) builds deterministic files for tests
and the s12 round-trip oracle.

Reference parity note: the reference has no archive source; this is a
north-star extension for corpus ingestion at 100 TB (a crawl dump is
~70k WARC files → ~70k partitions, embarrassingly parallel).
"""

from __future__ import annotations

import io
import zlib
from email.parser import BytesHeaderParser

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

WARC_SCHEMA = (
    "warc_file string, warc_type string, record_id string, target_uri string, "
    "warc_date string, content_length long, http_status int, "
    "http_content_type string, payload binary, error string"
)


# --------------------------------------------------------------------------
# Record-level parsing (spec grammar, no Spark)
# --------------------------------------------------------------------------


def _split_headers(block: bytes) -> tuple[str, dict]:
    """(version line, {header: value}) from a WARC header block."""
    lines = block.split(b"\r\n")
    version = lines[0].decode("latin-1")
    if not version.startswith("WARC/"):
        raise ValueError(f"bad WARC version line {version[:40]!r}")
    headers = BytesHeaderParser().parsebytes(b"\r\n".join(lines[1:]))
    return version, {k.lower(): v for k, v in headers.items()}


def iter_warc_records(stream: io.BufferedIOBase):
    """Yield (headers: dict, payload: bytes) over an UNCOMPRESSED WARC
    stream. Raises ValueError on grammar violations."""
    while True:
        # skip inter-record blank lines
        line = stream.readline()
        while line in (b"\r\n", b"\n"):
            line = stream.readline()
        if not line:
            return
        header_lines = [line]
        while True:
            line = stream.readline()
            if not line:
                raise ValueError("truncated WARC header block")
            if line in (b"\r\n", b"\n"):
                break
            header_lines.append(line)
        _version, headers = _split_headers(b"".join(header_lines))
        try:
            length = int(headers["content-length"])
        except KeyError:
            raise ValueError("WARC record missing Content-Length") from None
        payload = stream.read(length)
        if len(payload) != length:
            raise ValueError("truncated WARC payload")
        yield headers, payload


_GZ_CHUNK = 1 << 18  # 256 KiB


def _gzip_members(data: bytes):
    """Decompress concatenated gzip members (the Common Crawl layout):
    yields one bytes object per member.

    Feeds the decompressor BOUNDED chunks off a memoryview instead of
    the whole remaining buffer: the previous ``d.decompress(data[pos:])``
    form copied the entire file tail per member (the slice plus zlib's
    ``unused_data`` echo), making an N-member archive O(N·filesize) —
    measured 9.5 s for 20k members and minutes at crawl-dump member
    counts (round-11 c5 smoke). This form is O(total bytes)."""
    view = memoryview(data)
    n = len(data)
    pos = 0
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        out = bytearray()
        start = pos
        while not d.eof:
            if pos >= n:
                raise ValueError("truncated gzip member in WARC")
            chunk = view[pos : pos + _GZ_CHUNK]
            out += d.decompress(chunk)
            pos += len(chunk)
        pos -= len(d.unused_data)  # rewind the final chunk's surplus
        if pos <= start:
            raise ValueError("empty gzip member in WARC")
        yield bytes(out)


def read_warc_bytes(data: bytes):
    """Yield (headers, payload) from raw WARC bytes, transparently
    handling plain, whole-file-gzip and member-per-record-gzip layouts."""
    if data[:2] == b"\x1f\x8b":
        for member in _gzip_members(data):
            yield from iter_warc_records(io.BytesIO(member))
    else:
        yield from iter_warc_records(io.BytesIO(data))


def parse_http_response(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) from an HTTP response payload; returns
    (None, None, payload) when it is not an HTTP message."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    head, _, body = payload.partition(b"\r\n\r\n")
    lines = head.split(b"\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = None
    for ln in lines[1:]:
        if ln.lower().startswith(b"content-type:"):
            ctype = ln.split(b":", 1)[1].strip().decode("latin-1")
    return status, ctype, body


def write_warc(
    records: list[tuple[dict, bytes]], gzip_members: bool = True
) -> bytes:
    """Serialize (headers, payload) records; ``gzip_members`` uses the
    Common Crawl member-per-record layout."""
    out = bytearray()
    for headers, payload in records:
        block = bytearray(b"WARC/1.0\r\n")
        merged = {"Content-Length": str(len(payload)), **headers}
        for k, v in merged.items():
            block += f"{k}: {v}\r\n".encode("latin-1")
        block += b"\r\n" + payload + b"\r\n\r\n"
        if gzip_members:
            gz = zlib.compressobj(wbits=31)
            out += gz.compress(bytes(block)) + gz.flush()
        else:
            out += block
    return bytes(out)


def http_response_record(
    url: str, body: bytes, record_id: str, date: str = "2025-01-01T00:00:00Z",
    content_type: str = "text/plain; charset=utf-8", status: int = 200,
) -> tuple[dict, bytes]:
    """A well-formed WARC response record wrapping an HTTP response."""
    http = (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("latin-1") + body
    return (
        {
            "WARC-Type": "response",
            "WARC-Record-ID": f"<urn:uuid:{record_id}>",
            "WARC-Date": date,
            "WARC-Target-URI": url,
        },
        http,
    )


# --------------------------------------------------------------------------
# Spark DataSource: one partition per WARC file
# --------------------------------------------------------------------------


class WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        paths = options.get("paths")
        if not paths:
            raise ValueError("warc source requires 'paths' (comma-separated)")
        self.paths = sorted(p for p in paths.split(",") if p)

    def partitions(self):
        return [WarcFilePartition(p) for p in self.paths]

    def read(self, partition: WarcFilePartition):
        path = partition.path
        try:
            with open(path, "rb") as f:
                data = f.read()
            for headers, payload in read_warc_bytes(data):
                status, ctype, body = parse_http_response(payload)
                yield (
                    path,
                    headers.get("warc-type"),
                    headers.get("warc-record-id"),
                    headers.get("warc-target-uri"),
                    headers.get("warc-date"),
                    int(headers.get("content-length", "0")),
                    status,
                    ctype,
                    body,
                    None,
                )
        except Exception as exc:  # noqa: BLE001 — file-level error row
            yield (path, None, None, None, None, None, None, None, None,
                   f"{type(exc).__name__}: {exc}"[:200])


class WarcDataSource(DataSource):
    """``spark.read.format(...).option('paths', 'a.warc.gz,b.warc.gz')``.
    Register with ``spark.dataSource.register(WarcDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "warc_archive"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return WarcReader(self.options)
