"""Streaming count-min counter state (the x16 twin): stream-vs-batch
equality of the counter table and of point queries, exactly-once under
replay for ADDITIVE state (where insert-if-absent idempotence does not
apply — a double-applied epoch double-counts), the crash window where
the commit landed but the ledger stamp was lost, monotone-epoch
semantics, and compaction that preserves both totals and absorbed-epoch
detection."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fhir_etl_spark.operators.sketch import cms_counters, cms_point_query
from fhir_etl_spark.streaming.dedup import (
    _MERGE_LEDGER,
    compact_counter_state,
    merge_counter_epoch,
    read_counter_state,
    stream_cms_counters_merge,
)

VALUES = (
    ["alpha"] * 7 + ["beta"] * 3 + ["gamma"] * 2 + ["delta"] * 1
) * 3  # 39 values across the whole "corpus"


def _vals_df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v string")


def _counter_dict(df):
    return {(r["row"], r["col"]): r["cnt"] for r in df.collect()}


def _stream_all(spark, tmp_path, files=3):
    src = str(tmp_path / "src")
    _vals_df(spark, VALUES).repartition(files).write.mode(
        "overwrite"
    ).parquet(src)
    stream = (
        spark.readStream.schema("v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    table = str(tmp_path / "cms_state")
    q = stream_cms_counters_merge(spark, stream, table, "v")
    assert q.awaitTermination(300), "stream did not finish in time"
    return table


def test_stream_counters_equal_batch(spark, tmp_path):
    table = _stream_all(spark, tmp_path)
    got = _counter_dict(read_counter_state(spark, table, ["row", "col"]))
    want = _counter_dict(cms_counters(_vals_df(spark, VALUES), "v"))
    assert got == want


def test_stream_point_queries_equal_batch(spark, tmp_path):
    table = _stream_all(spark, tmp_path)
    probes = spark.createDataFrame(
        [("alpha",), ("beta",), ("absent",)], "term string"
    )
    counters = read_counter_state(spark, table, ["row", "col"])
    est = {
        r["term"]: r["cms_estimate"]
        for r in cms_point_query(counters, probes).collect()
    }
    # collision-free at 4x1024 over 4 values → exact
    assert est == {"alpha": 21, "beta": 9, "absent": 0}


def test_replayed_epoch_is_not_double_counted(spark, tmp_path):
    table = str(tmp_path / "cms_state")
    delta = cms_counters(_vals_df(spark, ["alpha", "alpha", "beta"]), "v")
    merge_counter_epoch(spark, table, delta, 0, keys=["row", "col"])
    before = _counter_dict(read_counter_state(spark, table, ["row", "col"]))
    merge_counter_epoch(spark, table, delta, 0, keys=["row", "col"])  # replay
    after = _counter_dict(read_counter_state(spark, table, ["row", "col"]))
    assert after == before


def test_crash_window_replay_detected_from_data(spark, tmp_path):
    # commit landed, ledger stamp lost: replay must STILL be a no-op,
    # because absorbed-epoch detection reads max(epoch_id) off the data
    table = str(tmp_path / "cms_state")
    delta = cms_counters(_vals_df(spark, ["alpha"] * 5), "v")
    merge_counter_epoch(spark, table, delta, 7, keys=["row", "col"])
    os.remove(os.path.join(table, _MERGE_LEDGER))  # lose the stamp
    before = _counter_dict(read_counter_state(spark, table, ["row", "col"]))
    merge_counter_epoch(spark, table, delta, 7, keys=["row", "col"])
    after = _counter_dict(read_counter_state(spark, table, ["row", "col"]))
    assert after == before


def test_later_epochs_accumulate(spark, tmp_path):
    table = str(tmp_path / "cms_state")
    d1 = cms_counters(_vals_df(spark, ["alpha"] * 2), "v")
    d2 = cms_counters(_vals_df(spark, ["alpha"] * 3 + ["beta"]), "v")
    merge_counter_epoch(spark, table, d1, 0, keys=["row", "col"])
    merge_counter_epoch(spark, table, d2, 1, keys=["row", "col"])
    counters = read_counter_state(spark, table, ["row", "col"])
    probes = spark.createDataFrame([("alpha",), ("beta",)], "term string")
    est = {
        r["term"]: r["cms_estimate"]
        for r in cms_point_query(counters, probes).collect()
    }
    assert est == {"alpha": 5, "beta": 1}


def test_compaction_preserves_totals_and_replay_safety(spark, tmp_path):
    table = str(tmp_path / "cms_state")
    d1 = cms_counters(_vals_df(spark, ["alpha"] * 2), "v")
    d2 = cms_counters(_vals_df(spark, ["beta"] * 4), "v")
    merge_counter_epoch(spark, table, d1, 0, keys=["row", "col"])
    merge_counter_epoch(spark, table, d2, 1, keys=["row", "col"])
    before = _counter_dict(read_counter_state(spark, table, ["row", "col"]))
    compact_counter_state(spark, table, ["row", "col"])
    after = _counter_dict(read_counter_state(spark, table, ["row", "col"]))
    assert after == before
    # one generation: every physical row carries the max absorbed epoch
    from fhir_etl_spark.sinks.versioned import read_snapshot

    raw = read_snapshot(spark, table)
    assert raw.select("epoch_id").distinct().count() == 1
    # a late replay of an absorbed epoch is still a no-op post-compaction
    os.remove(os.path.join(table, _MERGE_LEDGER))
    merge_counter_epoch(spark, table, d1, 0, keys=["row", "col"])
    assert (
        _counter_dict(read_counter_state(spark, table, ["row", "col"]))
        == before
    )


def test_commits_are_o_batch_not_o_corpus(spark, tmp_path):
    # each epoch appends at most |batch-distinct (row,col)| rows —
    # never a rewrite of prior state
    from fhir_etl_spark.sinks.versioned import read_snapshot

    table = str(tmp_path / "cms_state")
    d1 = cms_counters(_vals_df(spark, ["alpha"] * 100), "v")  # 4 cells
    d2 = cms_counters(_vals_df(spark, ["beta"] * 100), "v")  # 4 cells
    merge_counter_epoch(spark, table, d1, 0, keys=["row", "col"])
    n1 = read_snapshot(spark, table).count()
    merge_counter_epoch(spark, table, d2, 1, keys=["row", "col"])
    n2 = read_snapshot(spark, table).count()
    assert n1 == 4 and n2 == 8  # appended exactly the delta cells
