"""MERGE-backed streaming dedup index (VERDICT r08 #4): stream-vs-batch
BIT-equality, exactly-once under epoch replay (ledger fast path AND the
crash-window where the commit landed but the ledger stamp was lost),
O(batch) commits (version history = one append per non-empty epoch),
and snapshot-consistent verdict reads."""

from __future__ import annotations

import os

from fhir_etl_spark.operators.dedup import doc_band_index, lsh_bucket_keepers
from fhir_etl_spark.streaming.dedup import (
    _MERGE_LEDGER,
    merge_band_index_epoch,
    read_dedup_verdicts_merge,
    stream_lsh_dedup_index_merge,
)

BASE = "the quick brown fox jumps over the lazy dog again and again "
ROWS = [
    (1, BASE * 3),
    (2, BASE * 3),  # near-dup of 1
    (3, "completely different words about spark engines at scale " * 3),
    (4, "short"),  # sentinel path (fewer than k tokens)
]


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def _index_rows(spark, table_path):
    from fhir_etl_spark.sinks.versioned import read_snapshot

    return sorted(
        (r["doc_id"], r["band"], r["bucket"])
        for r in read_snapshot(spark, table_path).collect()
    )


def test_stream_merge_equals_batch_bit_for_bit(spark, tmp_path):
    docs = _docs(spark)
    src = str(tmp_path / "src")
    docs.repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    table = str(tmp_path / "merge_idx")
    q = stream_lsh_dedup_index_merge(spark, stream, table)
    assert q.awaitTermination(300), "stream did not finish in time"

    got = _index_rows(spark, table)
    want = sorted(
        (r["doc_id"], r["band"], r["bucket"])
        for r in doc_band_index(docs).collect()
    )
    # BIT equality, not set equality: no duplicate rows may exist
    assert got == want

    verdicts = {
        r["doc_id"]: r["kept"]
        for r in read_dedup_verdicts_merge(spark, table).collect()
    }
    batch_verdicts = {
        r["doc_id"]: r["kept"]
        for r in lsh_bucket_keepers(doc_band_index(docs)).collect()
    }
    assert verdicts == batch_verdicts and len(verdicts) == 4


def test_replay_is_exactly_once_via_ledger(spark, tmp_path):
    table = str(tmp_path / "idx")
    docs = _docs(spark)
    idx = doc_band_index(docs)
    merge_band_index_epoch(spark, table, idx, epoch_id=0)
    before = _index_rows(spark, table)
    from fhir_etl_spark.sinks.versioned import snapshot_history

    versions_before = len(snapshot_history(table))
    # replayed epoch: ledger short-circuits — no new version, no dupes
    merge_band_index_epoch(spark, table, idx, epoch_id=0)
    assert _index_rows(spark, table) == before
    assert len(snapshot_history(table)) == versions_before


def test_crash_window_replay_is_noop_via_merge(spark, tmp_path):
    """Commit landed, ledger stamp lost (the crash window): the anti
    join still makes the re-applied epoch a no-op."""
    table = str(tmp_path / "idx")
    docs = _docs(spark)
    idx = doc_band_index(docs)
    merge_band_index_epoch(spark, table, idx, epoch_id=0)
    before = _index_rows(spark, table)
    os.remove(os.path.join(table, _MERGE_LEDGER))  # simulate lost stamp
    merge_band_index_epoch(spark, table, idx, epoch_id=0)
    assert _index_rows(spark, table) == before


def test_overlapping_batches_upsert_not_duplicate(spark, tmp_path):
    table = str(tmp_path / "idx")
    d12 = spark.createDataFrame(ROWS[:2], "doc_id long, text string")
    d234 = spark.createDataFrame(ROWS[1:], "doc_id long, text string")
    merge_band_index_epoch(spark, table, doc_band_index(d12), epoch_id=0)
    merge_band_index_epoch(spark, table, doc_band_index(d234), epoch_id=1)
    got = _index_rows(spark, table)
    want = sorted(
        (r["doc_id"], r["band"], r["bucket"])
        for r in doc_band_index(_docs(spark)).collect()
    )
    assert got == want


def test_commits_are_o_batch_appends(spark, tmp_path):
    """Every non-empty epoch is ONE append commit; state is never
    rewritten (mode 'append' all the way down)."""
    from fhir_etl_spark.sinks.versioned import snapshot_history

    table = str(tmp_path / "idx")
    for e, row in enumerate(ROWS[:3]):
        d = spark.createDataFrame([row], "doc_id long, text string")
        merge_band_index_epoch(spark, table, doc_band_index(d), epoch_id=e)
    hist = snapshot_history(table)
    assert [h["mode"] for h in hist] == ["append"] * 3
    assert [h["version"] for h in hist] == [0, 1, 2]
