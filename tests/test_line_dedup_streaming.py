"""Streaming line-digest dedup index (VERDICT r10 #3 — the t26 twin):
stream-vs-batch equality of both the boilerplate set and the cleaned
documents, cross-increment boilerplate detection (the whole point of
the whole-history state), exactly-once under replay including the
crash window, and O(batch) commits."""

from __future__ import annotations

import os

from fhir_etl_spark.operators.dedup import (
    content_digest,
    doc_lines,
    duplicated_line_digests,
    line_dedup,
)
from fhir_etl_spark.streaming.dedup import (
    _MERGE_LEDGER,
    line_digest_index,
    merge_index_epoch,
    read_line_boilerplate_merge,
    stream_clean_documents_merge,
    stream_line_dedup_index_merge,
)

HEADER = "please accept cookies to continue"
FOOTER = "copyright twenty twenty corpus local"
ROWS = [
    (1, f"{HEADER}\nunique prose about spark plans\n{FOOTER}"),
    (2, f"{HEADER}\ndifferent words entirely here\n{FOOTER}"),
    (3, f"{HEADER}\nthird document body line\nshared tail line"),
    (4, "no boilerplate at all in this one\nshared tail line"),
    (5, "every line unique in document five"),
]


def _docs(spark, rows=None):
    return spark.createDataFrame(rows or ROWS, "doc_id long, text string")


def _stream_all(spark, tmp_path, rows=None, files=3):
    src = str(tmp_path / "src")
    _docs(spark, rows).repartition(files).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    table = str(tmp_path / "line_idx")
    q = stream_line_dedup_index_merge(spark, stream, table)
    assert q.awaitTermination(300), "stream did not finish in time"
    return table


def _batch_dup_set(spark, rows=None):
    docs = _docs(spark, rows)
    lines = doc_lines(docs).withColumn("_line_d", content_digest("line"))
    return {
        r["_line_d"] for r in duplicated_line_digests(lines).collect()
    }


def test_stream_boilerplate_equals_batch(spark, tmp_path):
    table = _stream_all(spark, tmp_path)
    got = {
        r["_line_d"] for r in read_line_boilerplate_merge(spark, table).collect()
    }
    assert got == _batch_dup_set(spark) and len(got) == 3  # header/footer/tail


def test_stream_clean_equals_batch_line_dedup(spark, tmp_path):
    table = _stream_all(spark, tmp_path)
    docs = _docs(spark)
    got = sorted(map(tuple, stream_clean_documents_merge(spark, table, docs).collect()))
    want = sorted(map(tuple, line_dedup(docs).collect()))
    assert got == want and len(got) == 5


def test_cross_increment_boilerplate_is_detected(spark, tmp_path):
    """The line shared between doc 10 (epoch A) and doc 20 (epoch B)
    only reaches doc_freq 2 across increments — a per-batch dedup would
    miss it; the whole-history index must not."""
    table = str(tmp_path / "idx")
    a = _docs(spark, rows=[(10, "cross increment banner\nalpha body")])
    b = _docs(spark, rows=[(20, "cross increment banner\nbeta body")])
    merge_index_epoch(
        spark, table, line_digest_index(a), 0, keys=["_line_d", "doc_id"]
    )
    assert read_line_boilerplate_merge(spark, table).count() == 0
    merge_index_epoch(
        spark, table, line_digest_index(b), 1, keys=["_line_d", "doc_id"]
    )
    dup = read_line_boilerplate_merge(spark, table)
    assert dup.count() == 1
    cleaned = {
        r["doc_id"]: r["clean_text"]
        for r in stream_clean_documents_merge(
            spark, table, _docs(spark, rows=[(10, "cross increment banner\nalpha body")])
        ).collect()
    }
    assert cleaned[10] == "alpha body"


def test_replay_and_crash_window_are_exactly_once(spark, tmp_path):
    from fhir_etl_spark.sinks.versioned import snapshot_history

    table = str(tmp_path / "idx")
    idx = line_digest_index(_docs(spark))
    merge_index_epoch(spark, table, idx, 0, keys=["_line_d", "doc_id"])
    before = sorted(
        map(tuple, read_line_boilerplate_merge(spark, table).collect())
    )
    versions = len(snapshot_history(table))
    # ledger fast path
    merge_index_epoch(spark, table, idx, 0, keys=["_line_d", "doc_id"])
    assert len(snapshot_history(table)) == versions
    # crash window: commit landed, ledger stamp lost → anti join no-op
    os.remove(os.path.join(table, _MERGE_LEDGER))
    merge_index_epoch(spark, table, idx, 0, keys=["_line_d", "doc_id"])
    assert (
        sorted(map(tuple, read_line_boilerplate_merge(spark, table).collect()))
        == before
    )
    # the replays committed no new rows (an empty delta appends nothing)
    assert len(snapshot_history(table)) == versions


def test_commits_are_o_batch(spark, tmp_path):
    """Version history = one append per non-empty epoch; each commit
    carries only that epoch's genuinely-new pairs."""
    from fhir_etl_spark.sinks.versioned import snapshot_history

    table = str(tmp_path / "idx")
    a = _docs(spark, rows=[(1, "alpha\nshared line")])
    b = _docs(spark, rows=[(2, "beta\nshared line")])  # 1 new digest + 1 dup pair
    merge_index_epoch(spark, table, line_digest_index(a), 0, keys=["_line_d", "doc_id"])
    merge_index_epoch(spark, table, line_digest_index(b), 1, keys=["_line_d", "doc_id"])
    hist = snapshot_history(table)
    assert len(hist) == 2
