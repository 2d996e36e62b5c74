"""Structured Streaming: windowed aggs driven to completion on the events
parquet, streaming-vs-batch equivalence, foreachBatch upsert, stateful op."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from fhir_etl_spark.streaming.windows import (
    run_to_memory,
    session_counts,
    sliding_counts,
    stream_events,
    stream_upsert_ndjson,
    tumbling_counts,
)


@pytest.fixture()
def events_stream(spark, sf_dir):
    return stream_events(spark, sf_dir)


def test_tumbling_stream_matches_batch(spark, sf_dir, events_stream):
    q = run_to_memory(tumbling_counts(events_stream), "tumbling_out")
    try:
        got = {
            (str(r["window_start"]), r["event_type"]): (r["n"], r["total_value"])
            for r in spark.sql("SELECT * FROM tumbling_out").collect()
        }
        from fhir_etl_spark.queries.events import e1_tumbling_window

        batch = {
            (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
            for r in e1_tumbling_window(spark, sf_dir).collect()
        }
        # append mode withholds windows newer than the final watermark; all
        # emitted windows must agree exactly with the batch plan
        assert got, "stream emitted nothing"
        for key, val in got.items():
            assert batch[key] == val
        assert len(got) >= len(batch) * 0.8
    finally:
        q.stop()


def test_sliding_and_session_streams_run(spark, events_stream):
    q1 = run_to_memory(sliding_counts(events_stream), "sliding_out")
    q2 = run_to_memory(session_counts(events_stream), "session_out")
    try:
        assert spark.sql("SELECT count(*) n FROM sliding_out").first()["n"] > 0
        assert spark.sql("SELECT count(*) n FROM session_out").first()["n"] > 0
    finally:
        q1.stop()
        q2.stop()


def test_stream_upsert_foreachbatch(spark, sf_dir, tmp_path, events_stream):
    """Events → minimal resources → streaming merge-by-id into NDJSON."""
    resources = events_stream.select(
        F.struct(
            F.concat(F.lit("user-"), F.col("user_id").cast("string")).alias("id"),
            F.col("event_type").alias("v"),
        ).alias("resource")
    )
    q = stream_upsert_ndjson(spark, resources, str(tmp_path), "Patient")
    q.awaitTermination()
    with open(f"{tmp_path}/Patient.ndjson") as f:
        rows = [json.loads(l) for l in f if l.strip()]
    ids = {r["id"] for r in rows}
    assert len(ids) == len(rows)  # merged by id: no duplicates
    assert all(i.startswith("user-") for i in ids)


def test_stateful_user_profiles(spark, sf_dir, events_stream):
    from fhir_etl_spark.streaming.stateful import user_profiles

    q = run_to_memory(user_profiles(events_stream), "profiles_out", output_mode="update")
    try:
        rows = spark.sql(
            "SELECT user_id, max(n_events) AS n FROM profiles_out GROUP BY user_id"
        ).collect()
        assert rows
    finally:
        q.stop()
    # cross-check one user against a batch count
    from fhir_etl_spark.session import load_tables

    events_batch = load_tables(spark, sf_dir, "events")
    expect = {
        r["user_id"]: r["n"]
        for r in events_batch.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    got = {r["user_id"]: r["n"] for r in rows}
    # the final state per user must equal the total batch count
    assert got == expect

def test_fhirize_runs_on_stream(spark, tmp_path):
    """The fhirize projections are stream-compatible plans: the same
    operator fhirizes a readStream source and merges into NDJSON via the
    streaming upsert — incremental FHIR ETL with zero operator changes."""
    import json as _json

    from fhir_etl_spark.operators.fhirize import fhirize_patient_1kg
    from fhir_etl_spark.sinks.ndjson import serialize

    src = tmp_path / "incoming"
    src.mkdir()
    (src / "batch1.csv").write_text(
        "Sample\tGender\tPopulation Description\tPopulation\tDNA Source from Coriell\tMain project LC platform\n"
        "HG00096\tmale\tBritish\tGBR\t\tILLUMINA\n"
    )
    stream = (
        spark.readStream.option("sep", "\t")
        .option("header", True)
        .schema(
            "Sample string, Gender string, `Population Description` string, "
            "Population string, `DNA Source from Coriell` string, "
            "`Main project LC platform` string"
        )
        .csv(str(src))
    )
    resources = fhirize_patient_1kg(stream)
    q = (
        serialize(resources)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("fhir_stream_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [
        _json.loads(r["json"])
        for r in spark.sql("SELECT * FROM fhir_stream_out").collect()
    ]
    assert rows[0]["id"] == "fb96f2a9-8ec2-5784-ba62-16f168155434"  # golden HG00096


def test_continuous_rollup_matches_batch(spark, sf_dir, tmp_path, events_stream):
    """The incrementally-maintained rollup equals the one-shot batch
    aggregate over the same data (mergeable-partials correctness)."""
    from fhir_etl_spark.streaming.rollup import continuous_rollup, read_rollup

    table = str(tmp_path / "rollup")
    q = continuous_rollup(spark, events_stream, table)
    q.awaitTermination()

    got = {
        (str(r["window_start"]), r["event_type"]): (r["n"], round(r["total_value"], 2))
        for r in read_rollup(spark, table).collect()
    }
    from fhir_etl_spark.session import load_tables

    events = load_tables(spark, sf_dir, "events")
    expected = {
        (str(r["ws"]), r["event_type"]): (r["n"], round(r["total_value"], 2))
        for r in events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "total_value")
        .collect()
    }
    assert got == expected


def test_merge_rollup_additive(spark):
    """Partial-aggregate merge is additive across batches."""
    from fhir_etl_spark.streaming.rollup import merge_rollup

    a = spark.createDataFrame(
        [("2024-01-01 00:00:00", "click", 3, 5.0)],
        "window_start string, event_type string, n long, total_value double",
    ).withColumn("window_start", F.col("window_start").cast("timestamp"))
    b = spark.createDataFrame(
        [("2024-01-01 00:00:00", "click", 2, 1.5), ("2024-01-01 01:00:00", "view", 1, 9.0)],
        "window_start string, event_type string, n long, total_value double",
    ).withColumn("window_start", F.col("window_start").cast("timestamp"))
    merged = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["total_value"])
        for r in merge_rollup(a, b).collect()
    }
    assert merged == {
        ("2024-01-01 00:00:00", "click"): (5, 6.5),
        ("2024-01-01 01:00:00", "view"): (1, 9.0),
    }


def test_stream_dedup_within_watermark(spark, sf_dir, tmp_path):
    """Duplicate delivery (same file dropped twice) collapses to exactly one
    row per event_id, with state bounded by the watermark."""
    import shutil

    from fhir_etl_spark.streaming.windows import EVENTS_SCHEMA, dedup_within_watermark

    dup_dir = tmp_path / "dup_feed"
    dup_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", dup_dir / "delivery_1.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", dup_dir / "delivery_2.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(dup_dir))
        .withColumn("ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long")))
    )
    q = run_to_memory(dedup_within_watermark(stream), "dedup_stream_out")
    try:
        got = spark.sql(
            "SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_stream_out"
        ).first()
        batch_n = (
            spark.read.schema(EVENTS_SCHEMA)
            .parquet(f"{sf_dir}/events.parquet")
            .count()
        )
        assert got["n"] == batch_n, "each event_id must survive exactly once"
        assert got["d"] == batch_n
    finally:
        q.stop()


def test_stream_stream_attribution_matches_batch(spark, sf_dir, events_stream):
    """Watermarked stream-stream interval join (clicks ⋈ purchases) emits
    exactly the pair set the batch twin computes with the same
    expressions (inner flavor: rows emit as soon as both sides arrive)."""
    from fhir_etl_spark.session import load_tables
    from fhir_etl_spark.streaming.joins import stream_stream_attribution

    clicks = events_stream.filter(F.col("event_type") == "click")
    purchases = events_stream.filter(F.col("event_type") == "purchase")
    q = run_to_memory(
        stream_stream_attribution(clicks, purchases), "attribution_out"
    )
    try:
        got = {
            (r["purchase_id"], r["click_id"])
            for r in spark.sql(
                "SELECT purchase_id, click_id FROM attribution_out"
            ).collect()
        }
    finally:
        q.stop()

    events = load_tables(spark, sf_dir, "events")
    expected = {
        (r["purchase_id"], r["click_id"])
        for r in stream_stream_attribution(
            events.filter(F.col("event_type") == "click"),
            events.filter(F.col("event_type") == "purchase"),
        ).collect()
    }
    assert got == expected and len(expected) > 0


def test_stream_static_enrichment_join(spark, sf_dir, events_stream):
    """Stream-static join: each micro-batch joins against a static dim
    (re-resolved per batch — the standard enrichment pattern; no state
    store involved). Result equals the batch twin exactly."""
    from fhir_etl_spark.session import load_tables

    static_dim = spark.createDataFrame(
        [(i, f"tier_{i % 3}") for i in range(150)], "user_id long, tier string"
    )
    enriched = events_stream.join(static_dim, "user_id").groupBy("tier").count()
    q = run_to_memory(enriched, "stream_static_out", output_mode="complete")
    try:
        got = {
            (r["tier"], r["count"])
            for r in spark.sql("SELECT * FROM stream_static_out").collect()
        }
    finally:
        q.stop()

    events = load_tables(spark, sf_dir, "events")
    expected = {
        (r["tier"], r["count"])
        for r in events.join(static_dim, "user_id").groupBy("tier").count().collect()
    }
    assert got == expected and len(expected) == 3


def test_rolling_zscore_stream_matches_batch(spark, sf_dir, events_stream):
    """The applyInPandasWithState anomaly scorer replayed over the events
    table equals the batch w8 window query row-for-row (same trailing-20
    frame, same min-periods/threshold); z compared at 2e-4 (the engines
    round independently)."""
    from fhir_etl_spark.queries import all_queries
    from fhir_etl_spark.streaming.anomaly import rolling_zscore_stream

    q = run_to_memory(
        rolling_zscore_stream(events_stream), "zscore_out", output_mode="update"
    )
    try:
        stream_rows = {
            r["event_id"]: r for r in spark.sql("SELECT * FROM zscore_out").collect()
        }
    finally:
        q.stop()

    batch_rows = {
        r["event_id"]: r
        for r in all_queries()["w8_rolling_zscore"].fn(spark, sf_dir).collect()
    }
    assert set(stream_rows) == set(batch_rows)
    n_anomalies = 0
    for eid, b in batch_rows.items():
        s = stream_rows[eid]
        assert s["is_anomaly"] == b["is_anomaly"], eid
        if b["z_r"] is None:
            assert s["z_r"] is None, eid
        else:
            assert abs(s["z_r"] - b["z_r"]) <= 2e-4, (eid, s["z_r"], b["z_r"])
        n_anomalies += int(b["is_anomaly"])
    assert n_anomalies > 0  # the fixture contains genuine outliers


def test_rolling_zscore_stream_null_values_and_min_periods(spark, tmp_path):
    """NULL-valued events occupy a frame slot, are never scored, and
    never poison the baseline (round-6 review finding: NaN crept into
    state forever); min_periods < 1 rejected."""
    import pytest as _pytest

    from fhir_etl_spark.streaming.anomaly import rolling_zscore_stream

    with _pytest.raises(ValueError, match="min_periods"):
        rolling_zscore_stream(spark.readStream.format("rate").load(), min_periods=0)

    rows = [(i, 1_000_000 * i, 7, float(v) if v is not None else None)
            for i, v in enumerate([1.0, 2.0, None, 3.0, 100.0])]
    src_dir = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, value double"
    ).selectExpr(
        "event_id", "timestamp_micros(ts_us) AS ts", "user_id", "value"
    ).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
        .parquet(src_dir)
    )
    q = run_to_memory(
        rolling_zscore_stream(stream, window=20, min_periods=2),
        "zscore_null_out", output_mode="update",
    )
    try:
        got = {
            r["event_id"]: r
            for r in spark.sql("SELECT * FROM zscore_null_out").collect()
        }
    finally:
        q.stop()
    assert got[2]["z_r"] is None and not got[2]["is_anomaly"]  # NULL event
    # event 3 scores against {1,2} (the NULL occupied a slot, no poison)
    assert got[3]["z_r"] is not None and abs(got[3]["z_r"] - 2.1213) < 1e-3
    assert got[4]["is_anomaly"]  # 100 vs baseline {1,2,3}


def test_cusum_stream_matches_reference(spark, tmp_path):
    """transformWithStateInPandas CUSUM replayed over a table equals the
    local sequential reference per user — incl. drift detection, the
    post-alarm reset, and NULL passthrough."""
    from fhir_etl_spark.streaming.cusum import cusum_reference, cusum_stream

    # user 7: level 0 then a +2 drift; user 8: constant (never alarms);
    # a NULL mid-stream must not disturb the accumulators
    vals7 = [0.1, -0.2, 0.0, None, 2.1, 2.2, 1.9, 2.3, 2.0, 0.0]
    vals8 = [0.0] * 6
    rows = [(100 + i, 1_000_000 * i, 7, v) for i, v in enumerate(vals7)]
    rows += [(200 + i, 1_000_000 * i, 8, v) for i, v in enumerate(vals8)]
    src_dir = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, value double"
    ).selectExpr(
        "event_id", "timestamp_micros(ts_us) AS ts", "user_id", "value"
    ).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, value double"
        ).parquet(src_dir)
    )
    q = run_to_memory(
        cusum_stream(stream, mu0=0.0, k=0.5, h=3.0),
        "cusum_out", output_mode="update",
    )
    try:
        got = {
            r["event_id"]: r for r in spark.sql("SELECT * FROM cusum_out").collect()
        }
    finally:
        q.stop()

    for base, vals in ((100, vals7), (200, vals8)):
        ref = cusum_reference(vals, mu0=0.0, k=0.5, h=3.0)
        for i, (sp, sn, alarm) in enumerate(ref):
            r = got[base + i]
            assert (r["s_pos"], r["s_neg"], r["alarm"]) == (sp, sn, alarm), (
                base + i, r, (sp, sn, alarm)
            )
    assert any(got[100 + i]["alarm"] for i in range(len(vals7)))
    assert not any(got[200 + i]["alarm"] for i in range(len(vals8)))


def test_cusum_tws_tier_gated_cleanly(spark):
    """The transformWithState tier must raise a clear gate error when
    the protobuf runtime is absent (this container), never a deep
    worker crash."""
    import pytest as _pytest

    from fhir_etl_spark.streaming.cusum import cusum_stream, tws_runtime_available

    stream = spark.readStream.format("rate").load()
    if tws_runtime_available():
        _pytest.skip("protobuf present — tws tier usable here")
    with _pytest.raises(NotImplementedError, match="protobuf"):
        cusum_stream(stream, mu0=0.0, api="tws")
    with _pytest.raises(ValueError, match="api must be"):
        cusum_stream(stream, mu0=0.0, api="bogus")


def test_stream_upsert_restart_from_checkpoint(spark, tmp_path, monkeypatch):
    """Failure injection for the S9 streaming path (VERDICT r06 #8): kill
    the query mid-stream AFTER an epoch's merge applied but BEFORE its
    commit was recorded, restart from the checkpoint, and require the
    final NDJSON to hold every id exactly once — the offset log must
    resume at the first uncommitted epoch, and the idempotent merge-by-id
    must converge the half-applied epoch instead of duplicating it."""
    import json

    import fhir_etl_spark.sinks.upsert as upsert_mod
    from fhir_etl_spark.streaming.windows import stream_upsert_ndjson

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir(), out.mkdir()
    for fid in range(3):
        with open(src / f"batch-{fid}.json", "w") as f:
            for i in range(4):
                f.write(json.dumps(
                    {"resource": {"id": f"p{fid}-{i}", "v": f"f{fid}"}}
                ) + "\n")
    all_ids = {f"p{fid}-{i}" for fid in range(3) for i in range(4)}

    def stream():
        return (
            spark.readStream.schema("resource struct<id string, v string>")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )

    real = upsert_mod.create_or_extend
    calls = []

    def crash_after_second_apply(*args, **kwargs):
        calls.append(1)
        path = real(*args, **kwargs)  # merge APPLIES...
        if len(calls) == 2:
            raise RuntimeError("injected crash after apply, before commit")
        return path

    monkeypatch.setattr(upsert_mod, "create_or_extend", crash_after_second_apply)
    q = stream_upsert_ndjson(spark, stream(), str(out), "Patient",
                             checkpoint=str(ckpt))
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination()
    assert len(calls) == 2  # two epochs ran; only the first committed

    # restart: same checkpoint, healthy sink
    monkeypatch.setattr(upsert_mod, "create_or_extend", real)
    run2 = []
    monkeypatch.setattr(
        upsert_mod, "create_or_extend",
        lambda *a, **k: (run2.append(1), real(*a, **k))[1],
    )
    q2 = stream_upsert_ndjson(spark, stream(), str(out), "Patient",
                              checkpoint=str(ckpt))
    q2.awaitTermination()

    with open(out / "Patient.ndjson") as f:
        rows = [json.loads(line) for line in f if line.strip()]
    ids = [r["id"] for r in rows]
    assert sorted(ids) == sorted(all_ids)      # nothing lost
    assert len(ids) == len(set(ids))           # nothing duplicated
    # the committed epoch 0 was NOT re-merged: restart re-ran only the
    # uncommitted epochs (the crashed one + the never-started one)
    assert len(run2) == 2


def test_stream_kmv_sketch_equals_batch_sketch(spark, sf_dir, tmp_path):
    """Mergeable sketches meet streaming: folding per-micro-batch KMV
    sketches must reproduce the batch-built sketch BIT-FOR-BIT (the
    min-k union law — no approximation stacking across epochs). The
    source is split into 4 files streamed one per trigger, so the fold
    genuinely runs across MULTIPLE epochs; quantile reads off the
    streamed state work directly."""
    from pyspark.sql import functions as F

    from fhir_etl_spark.operators.sketch import (
        kmv_quantiles,
        kmv_sample_sketch,
    )
    from fhir_etl_spark.session import load_tables
    from fhir_etl_spark.streaming.sketch import stream_kmv_sketch

    events = load_tables(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    src = str(tmp_path / "src")
    events.withColumn("part", F.col("event_id") % 4).repartition(
        4, "part"
    ).drop("part").write.parquet(src)

    stream = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "kmv_state")
    q = stream_kmv_sketch(
        spark, stream, ["event_type"], "value", ["event_id"],
        state_path=state, k=32, checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 2  # multiple epochs actually folded

    def rows(df):
        return {
            r["event_type"]: [(e["h"], e["v"]) for e in r["sample"]]
            for r in df.collect()
        }

    streamed = rows(spark.read.parquet(state))
    batch = rows(
        kmv_sample_sketch(
            load_tables(spark, sf_dir, "events"),
            ["event_type"], "value", ["event_id"], k=32,
        )
    )
    assert streamed == batch  # exact, across however many epochs ran

    sq = {
        r["event_type"]: r["q50"]
        for r in kmv_quantiles(
            spark.read.parquet(state), ["event_type"], [0.5]
        ).collect()
    }
    assert sq and all(v is not None for v in sq.values())


def test_kmv_merge_replay_idempotent(spark):
    """The replay-safety law the streaming fold rests on: folding the
    SAME sketch in twice must be a no-op (dedup on hashed row identity
    before the min-k rank — a multiset rank would double-count)."""
    from fhir_etl_spark.operators.sketch import kmv_merge, kmv_sample_sketch

    df = spark.range(500).selectExpr(
        "'g' AS g", "id AS rid", "cast(id * 13 % 500 as double) AS v"
    )
    sk = kmv_sample_sketch(df, ["g"], "v", ["rid"], k=32)

    def rows(s):
        return {r["g"]: [(e["h"], e["v"]) for e in r["sample"]] for r in s.collect()}

    replayed = kmv_merge(sk.unionByName(sk), ["g"], k=32)
    assert rows(replayed) == rows(sk)


def test_fold_parquet_state_crash_recovery(spark, tmp_path):
    """The swap protocol's two crash windows: (a) state stranded in
    .old.{epoch} (crash between the renames) is recovered before the
    next fold reads; (b) a stale .old dir from a crashed replay of the
    SAME epoch is cleared instead of wedging the rename with ENOTEMPTY."""
    import os

    from fhir_etl_spark.streaming.state import fold_parquet_state

    state = str(tmp_path / "state")

    def fold_const(n):
        return lambda prev: (
            spark.range(n) if prev is None
            else prev.unionByName(spark.range(n)).distinct()
        )

    fold_parquet_state(spark, state, 0, fold_const(5))
    assert spark.read.parquet(state).count() == 5

    # (a) crash between retire and rename-in: state dir is gone
    os.rename(state, f"{state}.old.1")
    fold_parquet_state(spark, state, 2, fold_const(7))
    # recovery saw the 5 committed rows, fold added ids 5..6
    assert spark.read.parquet(state).count() == 7

    # (b) stale .old.3 from a crashed replay of epoch 3 + state present
    os.makedirs(f"{state}.old.3")
    with open(f"{state}.old.3/garbage", "w") as f:
        f.write("stale")
    fold_parquet_state(spark, state, 3, fold_const(9))
    assert spark.read.parquet(state).count() == 9
    assert not os.path.exists(f"{state}.old.3")


def test_stream_lsh_dedup_index_equals_batch(spark, sf_dir, tmp_path):
    """Round-8 incremental dedup: streaming the corpus in 4 file-chunks
    and folding per-batch banded index rows must reproduce the
    WHOLE-CORPUS index bit-for-bit (banding is per-doc, so the union
    law is exact, not approximate), and the keeper verdicts read off
    the streamed state must equal the batch operator row-for-row."""
    from pyspark.sql import functions as F

    from fhir_etl_spark.operators.dedup import doc_band_index, lsh_bucket_keepers
    from fhir_etl_spark.session import load_tables
    from fhir_etl_spark.streaming.dedup import (
        read_dedup_verdicts,
        stream_lsh_dedup_index,
    )

    docs = load_tables(spark, sf_dir, "documents").select("doc_id", "text")
    # plant a doc too short to shingle: it must STILL get a verdict row
    # (sentinel singleton bucket — the total-contract guarantee)
    short = spark.createDataFrame([(999_999, "too short")], "doc_id long, text string")
    docs = docs.unionByName(short)
    src = str(tmp_path / "src")
    docs.withColumn("part", F.col("doc_id") % 4).repartition(4, "part").drop(
        "part"
    ).write.parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "lsh_state")
    q = stream_lsh_dedup_index(spark, stream, state)
    assert q.awaitTermination(300), "stream did not finish in time"
    assert len(q.recentProgress) >= 2  # genuinely multiple epochs

    streamed_idx = {
        (r["doc_id"], r["band"], r["bucket"])
        for r in spark.read.parquet(state).collect()
    }
    batch_banded = doc_band_index(docs)
    batch_idx = {
        (r["doc_id"], r["band"], r["bucket"]) for r in batch_banded.collect()
    }
    assert streamed_idx == batch_idx  # exact union law

    got = {
        r["doc_id"]: r["kept"]
        for r in read_dedup_verdicts(spark, state).collect()
    }
    want = {
        r["doc_id"]: r["kept"]
        for r in lsh_bucket_keepers(batch_banded).collect()
    }
    assert got == want
    assert not all(got.values())  # the corpus has actual near-dup buckets
    assert got[999_999] is True  # sentinel: short doc present and kept
    assert len(got) == docs.count()  # verdicts are TOTAL over documents


def test_recover_removes_stale_old_dirs_when_state_live(spark, tmp_path):
    """Round-8 review: a crash between the swap's rename-in and its old
    cleanup leaked one state-sized .old dir per crash (recovery stayed
    correct — max-epoch pick — but the debris accumulated forever).
    _recover now clears stale olds whenever the live state exists."""
    import os

    from fhir_etl_spark.streaming.state import fold_parquet_state

    state = str(tmp_path / "state")
    fold_parquet_state(spark, state, 1, lambda prev: spark.range(3))
    # debris from a hypothetical crash-after-rename-in at an old epoch
    os.makedirs(f"{state}.old.0")
    with open(f"{state}.old.0/leftover", "w") as f:
        f.write("debris")
    fold_parquet_state(
        spark, state, 2,
        lambda prev: spark.range(4) if prev is None else prev.unionByName(spark.range(4)),
    )
    assert not os.path.exists(f"{state}.old.0")
    assert spark.read.parquet(state).count() == 7


def test_fold_parquet_state_epoch_replay_skipped(spark, tmp_path):
    """Round-8 advice fix: replaying an epoch the state already absorbed
    (crash after the swap completed but before the stream's commit) is a
    SKIP, not a re-fold — which makes even NON-idempotent additive folds
    exactly-once under replay. The _LAST_EPOCH ledger inside the state
    dir is what records absorption (underscore-prefixed: parquet readers
    ignore it)."""
    import os

    from fhir_etl_spark.streaming.state import fold_parquet_state

    state = str(tmp_path / "state")

    def add_rows(n):
        # deliberately NOT idempotent: every application appends n rows
        return lambda prev: (
            spark.range(n) if prev is None else prev.unionByName(spark.range(n))
        )

    fold_parquet_state(spark, state, 7, add_rows(5))
    assert spark.read.parquet(state).count() == 5
    assert os.path.exists(f"{state}/_LAST_EPOCH")

    # replay of epoch 7: must be skipped (previously would double to 10)
    fold_parquet_state(spark, state, 7, add_rows(5))
    assert spark.read.parquet(state).count() == 5

    # the NEXT epoch folds normally
    fold_parquet_state(spark, state, 8, add_rows(3))
    assert spark.read.parquet(state).count() == 8


def test_streaming_folds_default_a_checkpoint(spark, tmp_path, events_stream):
    """Round-8 advice fix: the state swap's crash-recovery guarantee
    requires the engine to be ABLE to replay a lost-commit epoch, so the
    fold entry points must not run checkpoint-less by default —
    continuous_rollup and stream_kmv_sketch both derive one from their
    state path when none is given."""
    import os

    from fhir_etl_spark.streaming.rollup import continuous_rollup
    from fhir_etl_spark.streaming.sketch import stream_kmv_sketch

    table = str(tmp_path / "rollup")
    q = continuous_rollup(spark, events_stream, table)
    assert q.awaitTermination(120), "rollup stream did not finish in time"
    assert os.path.isdir(f"{table}.checkpoint"), "derived checkpoint missing"

    state = str(tmp_path / "kmv_state")
    q2 = stream_kmv_sketch(
        spark,
        events_stream,
        ["event_type"],
        "value",
        ["event_id"],
        state,
        k=16,
    )
    assert q2.awaitTermination(120), "kmv stream did not finish in time"
    assert os.path.isdir(f"{state}.checkpoint"), "derived checkpoint missing"


def test_ewma_stream_matches_batch_bit_for_bit(spark, sf_dir, events_stream):
    """The streaming EWMA replayed over the events table equals the batch
    w9 fold EXACTLY (==, no tolerance): both paths run the same two IEEE
    multiplies + add per step in the same association order, so there is
    no engine rounding to forgive — see streaming/smoothing.py."""
    from fhir_etl_spark.queries import all_queries
    from fhir_etl_spark.streaming.smoothing import ewma_stream

    q = run_to_memory(ewma_stream(events_stream), "ewma_out", output_mode="update")
    try:
        stream_rows = {
            r["event_id"]: r for r in spark.sql("SELECT * FROM ewma_out").collect()
        }
    finally:
        q.stop()

    batch_rows = {
        r["event_id"]: r for r in all_queries()["w9_ewma"].fn(spark, sf_dir).collect()
    }
    assert set(stream_rows) == set(batch_rows) and len(batch_rows) > 0
    for eid, b in batch_rows.items():
        s = stream_rows[eid]
        assert s["ewma"] == b["ewma"], (eid, s["ewma"], b["ewma"])
        assert s["value"] == b["value"]


def test_ewma_stream_alpha_validation(spark):
    from fhir_etl_spark.streaming.smoothing import ewma_stream

    with pytest.raises(ValueError, match="alpha"):
        ewma_stream(spark.readStream.format("rate").load(), alpha=0.0)


def test_holt_stream_matches_batch_bit_for_bit(spark, sf_dir, events_stream):
    """The streaming Holt fold replayed over the events table equals the
    batch w10 query EXACTLY (==, no tolerance) on level, trend, and
    forecast — same IEEE op sequence, same association order; see
    streaming/smoothing.holt_stream."""
    from fhir_etl_spark.queries import all_queries
    from fhir_etl_spark.streaming.smoothing import holt_stream

    q = run_to_memory(holt_stream(events_stream), "holt_out", output_mode="update")
    try:
        stream_rows = {
            r["event_id"]: r for r in spark.sql("SELECT * FROM holt_out").collect()
        }
    finally:
        q.stop()

    batch_rows = {
        r["event_id"]: r
        for r in all_queries()["w10_holt_trend"].fn(spark, sf_dir).collect()
    }
    assert set(stream_rows) == set(batch_rows) and len(batch_rows) > 0
    for eid, b in batch_rows.items():
        s = stream_rows[eid]
        assert s["level"] == b["level"], (eid, s["level"], b["level"])
        assert s["trend"] == b["trend"]
        assert s["forecast"] == b["forecast"]
        assert s["value"] == b["value"]


def test_holt_stream_param_validation(spark):
    from fhir_etl_spark.streaming.smoothing import holt_stream

    with pytest.raises(ValueError, match="beta"):
        holt_stream(spark.readStream.format("rate").load(), beta=1.5)


def test_scene_cuts_stream_matches_batch_bit_for_bit(spark, sf_dir, tmp_path):
    """The streaming shot-boundary fold replayed over the m14 frame
    histograms equals the batch scene_cuts window EXACTLY (integers —
    no tolerance at all)."""
    from pyspark.sql import functions as F

    from fhir_etl_spark.operators.multimodal import scene_cuts
    from fhir_etl_spark.queries.multimodal import m14_scene_change  # noqa: F401
    from fhir_etl_spark.streaming.scenes import scene_cuts_stream

    # stage the real m14 histogram table (built via the GIF codec path)
    from fhir_etl_spark.operators.multimodal import (
        decode_image,
        luma_histogram,
        split_gif_frames,
    )
    from fhir_etl_spark.queries.multimodal import _MEDIA_SCHEMA
    import fhir_etl_spark.queries.multimodal as MM

    documents = __import__("fhir_etl_spark.session", fromlist=["load_tables"]).load_tables(
        spark, "/root/testdata/sf0.001", "documents"
    ).limit(60)

    # reuse the m14 builder inline (same formulas)
    import numpy as np
    import pandas as pd

    def build(it):
        from fhir_etl_spark.functions.gif import encode_gif

        pal = np.stack(
            [np.array([(i * 37) % 256, (i * 59) % 256, (i * 83) % 256])
             for i in range(16)]
        ).astype(np.uint8)
        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                h, w = 8 + doc_id % 15, 8 + doc_id % 11
                nf, cut = 6 + doc_id % 5, 2 + doc_id % 3
                yy, xx = np.mgrid[0:h, 0:w]
                frames = []
                for f in range(nf):
                    if f < cut:
                        idx = ((doc_id + f + yy * 5 + xx * 3) % 8).astype(np.uint8)
                    else:
                        idx = np.full((h, w), 13, np.uint8)
                    frames.append(idx)
                blobs.append(encode_gif(frames, pal))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": blobs})

    media = documents.select("doc_id").mapInPandas(build, _MEDIA_SCHEMA)
    frames = split_gif_frames(media, bytes_col="media", id_col="doc_id")
    hists = luma_histogram(decode_image(frames, bytes_col="frame")).select(
        F.col("doc_id").alias("clip_id"), "frame_index", "hist"
    )
    stage = str(tmp_path / "hists")
    hists.write.parquet(stage)

    stream = spark.readStream.schema(
        "clip_id long, frame_index int, hist array<bigint>"
    ).parquet(stage)
    q = run_to_memory(
        scene_cuts_stream(stream), "scene_out", output_mode="update"
    )
    try:
        got = {
            (r["clip_id"], r["frame_index"]): (r["l1_delta"], r["is_cut"])
            for r in spark.sql("SELECT * FROM scene_out").collect()
        }
    finally:
        q.stop()

    batch = {
        (r["clip_id"], r["frame_index"]): (r["l1_delta"], r["is_cut"])
        for r in scene_cuts(
            spark.read.parquet(stage), "clip_id", "frame_index"
        ).collect()
    }
    assert set(got) == set(batch) and len(batch) > 0
    for k, v in batch.items():
        assert got[k] == v, (k, got[k], v)
    assert any(v[1] for v in batch.values())  # the planted cuts fired


def test_spacesaving_stream_exact_when_capacity_suffices(spark, sf_dir, events_stream):
    """With capacity >= the group's distinct items, SpaceSaving IS exact
    counting: the final sketch equals the batch groupBy counts with zero
    error for every (event_type, user bucket) pair."""
    from fhir_etl_spark.session import load_tables
    from fhir_etl_spark.streaming.frequency import heavy_hitters_stream

    stream = events_stream.selectExpr(
        "event_type AS group", "CAST(user_id % 7 AS STRING) AS item",
        "ts", "event_id",
    )
    q = run_to_memory(
        heavy_hitters_stream(stream, capacity=64, group_col="group",
                             item_col="item"),
        "hh_out",
        output_mode="update",
    )
    try:
        # update mode re-emits per batch; the LAST estimate per key wins —
        # take max(est) since counts only grow
        rows = spark.sql(
            "SELECT group, item, max(est_count) AS est, max(max_err) AS err "
            "FROM hh_out GROUP BY group, item"
        ).collect()
    finally:
        q.stop()
    got = {(r["group"], r["item"]): (r["est"], r["err"]) for r in rows}

    events = load_tables(spark, sf_dir, "events")
    batch = {
        (r["event_type"], str(r["b"])): r["n"]
        for r in events.selectExpr("event_type", "user_id % 7 AS b")
        .groupBy("event_type", "b")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert set(got) == set(batch) and len(batch) > 0
    for k, n in batch.items():
        assert got[k] == (n, 0), (k, got[k], n)


def test_spacesaving_eviction_bounds(spark, tmp_path):
    """Planted overflow: capacity 2, stream a a a b b c — c evicts the
    min counter (b at 2) and inherits 2+1 with err 2. The classic bounds
    est >= true and est <= true + err must hold for every tracked item."""
    import pandas as pd

    from fhir_etl_spark.streaming.frequency import heavy_hitters_stream

    rows = [("g", t, i) for i, t in enumerate("aaabbc")]
    df = pd.DataFrame(rows, columns=["group", "item", "event_id"])
    df["ts"] = range(len(df))
    stage = str(tmp_path / "hh")
    spark.createDataFrame(df).write.parquet(stage)
    stream = spark.readStream.schema(
        "group string, item string, event_id long, ts long"
    ).parquet(stage)
    q = run_to_memory(
        heavy_hitters_stream(stream, capacity=2), "hh_ev", output_mode="update"
    )
    try:
        got = {
            r["item"]: (r["est_count"], r["max_err"])
            for r in spark.sql(
                "SELECT item, max(est_count) AS est_count, max(max_err) AS max_err "
                "FROM hh_ev GROUP BY item"
            ).collect()
        }
    finally:
        q.stop()
    true = {"a": 3, "b": 2, "c": 1}
    # a survives exactly; c evicted b and inherited its count
    assert got["a"] == (3, 0)
    assert got["c"] == (3, 2)
    assert "b" not in got or got["b"][0] >= true["b"]
    for item, (est, err) in got.items():
        assert est >= true[item] and est <= true[item] + err


def test_spacesaving_capacity_validation(spark):
    from fhir_etl_spark.streaming.frequency import heavy_hitters_stream

    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters_stream(
            spark.readStream.format("rate").load(), capacity=0
        )
