"""Repro tests for the round-11 ADVICE items:

1. (medium) compact_counter_state raced with a concurrent
   merge_counter_epoch append: the compaction overwrite must be pinned
   to the snapshot it was derived from (require_parent) so the race
   fails LOUDLY (ConcurrentWriteError) and the raced epoch's counts
   survive — never a silent permanent undercount of additive state.
2. (low) the plan-audit broadcast allowlist must scope the generic
   names 'ranked' and 'counters' to their one documented call site
   ((path, name) pairs), not globally — a future F.broadcast(ranked)
   on a scaling table elsewhere must be flagged.
3. (low) c6's cid packing (doc_id*100000 + chunk_index) must enforce
   its 100k-chunks/doc contract at runtime: a violating chunk_index
   raises USER_RAISED_EXCEPTION instead of silently aliasing another
   document's chunk ids into the BM25 corpus join.
"""

from __future__ import annotations

import ast
import pathlib

import pytest

import pyspark.sql.functions as F

# --- 1: compaction vs concurrent epoch append ----------------------------


def test_compact_counter_state_raced_append_fails_loudly(spark, tmp_path):
    from fhir_etl_spark.sinks import versioned
    from fhir_etl_spark.streaming.dedup import (
        compact_counter_state,
        merge_counter_epoch,
        read_counter_state,
    )

    table = str(tmp_path / "cms_state")
    d0 = spark.createDataFrame([(0, 1, 10), (0, 2, 20)], "row int, col int, cnt long")
    merge_counter_epoch(spark, table, d0, 0, keys=["row", "col"])

    d1 = spark.createDataFrame([(0, 1, 5)], "row int, col int, cnt long")
    real_read = versioned.read_snapshot
    raced = {"done": False}

    def read_then_race(spark_, table_path, version=None):
        out = real_read(spark_, table_path, version)
        if not raced["done"]:
            raced["done"] = True
            # the raced merge lands AFTER the compaction captured its
            # parent but BEFORE its overwrite commits
            merge_counter_epoch(spark_, table_path, d1, 1, keys=["row", "col"])
        return out

    versioned.read_snapshot, orig = read_then_race, versioned.read_snapshot
    try:
        with pytest.raises(versioned.ConcurrentWriteError):
            compact_counter_state(spark, table, keys=["row", "col"])
    finally:
        versioned.read_snapshot = orig

    # the raced epoch's counts were NOT discarded
    totals = {
        (r["row"], r["col"]): r["cnt"]
        for r in read_counter_state(spark, table, keys=["row", "col"]).collect()
    }
    assert totals == {(0, 1): 15, (0, 2): 20}
    # and epoch-1 replay still short-circuits (max epoch_id survived)
    merge_counter_epoch(spark, table, d1, 1, keys=["row", "col"])
    totals2 = {
        (r["row"], r["col"]): r["cnt"]
        for r in read_counter_state(spark, table, keys=["row", "col"]).collect()
    }
    assert totals2 == totals


def test_compact_counter_state_unraced_still_works(spark, tmp_path):
    from fhir_etl_spark.sinks.versioned import snapshot_history
    from fhir_etl_spark.streaming.dedup import (
        compact_counter_state,
        merge_counter_epoch,
        read_counter_state,
    )

    table = str(tmp_path / "cms_state")
    for epoch in range(3):
        d = spark.createDataFrame([(0, 1, 1)], "row int, col int, cnt long")
        merge_counter_epoch(spark, table, d, epoch, keys=["row", "col"])
    compact_counter_state(spark, table, keys=["row", "col"])
    rows = read_counter_state(spark, table, keys=["row", "col"]).collect()
    assert [(r["row"], r["col"], r["cnt"]) for r in rows] == [(0, 1, 3)]
    assert snapshot_history(table)[-1]["mode"] == "overwrite"


# --- 2: broadcast allowlist scoping ---------------------------------------


def _audit_sets():
    """Extract ALLOWED_BASES / SCOPED_ALLOWED literals from the audit
    test's AST (they are locals of test_no_broadcast_hints_on_scaling_
    tables, pinned here so a refactor can't silently re-globalize)."""
    src = (pathlib.Path(__file__).parent / "test_plans.py").read_text()
    tree = ast.parse(src)
    out = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            t = node.targets[0]
            if isinstance(t, ast.Name) and t.id in ("ALLOWED_BASES", "SCOPED_ALLOWED"):
                out[t.id] = ast.literal_eval(node.value)
    return out


def test_generic_names_are_scoped_not_global():
    sets = _audit_sets()
    assert "ranked" not in sets["ALLOWED_BASES"]
    assert "counters" not in sets["ALLOWED_BASES"]
    assert ("queries/capstone.py", "ranked") in sets["SCOPED_ALLOWED"]
    assert ("operators/sketch.py", "counters") in sets["SCOPED_ALLOWED"]
    # every scoped pair points at a real file that really broadcasts it
    root = pathlib.Path(__file__).parent.parent / "fhir_etl_spark"
    for rel, name in sets["SCOPED_ALLOWED"]:
        assert f"broadcast({name}" in (root / rel).read_text(), (rel, name)


# --- 3: c6 chunk-id packing guard -----------------------------------------


def test_chunk_pack_within_contract(spark):
    from fhir_etl_spark.queries.capstone import _chunk_index_guard, _pack_chunk_id

    df = spark.createDataFrame(
        [(7, 0), (7, 99999), (3, 42)], "doc_id long, chunk_index long"
    )
    got = {
        r["cid"]
        for r in df.where(_chunk_index_guard(F.col("chunk_index")))
        .select(
            _pack_chunk_id(F.col("doc_id"), F.col("chunk_index")).alias("cid")
        )
        .collect()
    }
    assert got == {700000, 799999, 300042}


def test_chunk_pack_overflow_raises_loudly(spark):
    from fhir_etl_spark.queries.capstone import _chunk_index_guard, _pack_chunk_id

    df = spark.createDataFrame([(7, 100000)], "doc_id long, chunk_index long")
    with pytest.raises(Exception, match="USER_RAISED_EXCEPTION|chunk_index"):
        df.where(_chunk_index_guard(F.col("chunk_index"))).select(
            _pack_chunk_id(F.col("doc_id"), F.col("chunk_index")).alias("cid")
        ).collect()


def test_chunk_pack_guard_is_filter_only_and_jvm_side(spark):
    """The guard must live ONLY in Filter nodes (one comparison per
    chunk-source replay), never inside the cid expression: embedding
    raise_error in cid let InferFiltersFromJoinKeys duplicate the
    guarded CASE into isnotnull() filters and join-key projections —
    measured 2× wall on c6 at sf10-shape. Pin the mechanism: no
    isnotnull(CASE...) inference over the guard, every raise_error
    line is a Filter, and the plan stays Python-free."""
    from fhir_etl_spark.queries import all_queries

    df = all_queries()["c6_rag_pipeline"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "isnotnull(CASE WHEN" not in plan
    for line in plan.splitlines():
        if "raise_error" in line:
            assert "Filter" in line, line[:160]
    exec_plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in exec_plan
