"""Repro tests for the round-9 ADVICE items (all four closed in round
10; the fourth — bench.py's cold ann_store cache flagging phantom
v11/v12 regressions — is closed in bench.py itself by warming the
model cache untimed before the timing loop)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_bm25_numerator_survives_int64_overflow(spark):
    """ADVICE r09 #1: at deployment scale the contrib numerator
    idf_micro·22·tf·avgdl_milli exceeds int64 (~1e19 > 2^63) — Spark
    non-ANSI silently wrapped it negative, corrupting ranking where
    DuckDB errors. Planted shape: N = 5e9 docs (idf_micro ≈ 2.33e7), a
    spammy tf = 40 000, avgdl_milli = 500 000 → numerator ≈ 1.03e19.
    The DECIMAL(38,0) widening must produce the exact integer quotient
    (hand-replayed in Python bigints) and a POSITIVE score."""
    from fhir_etl_spark.operators.retrieval import bm25_topk

    n_docs = 5_000_000_000
    avgdl_milli = 500_000
    tf, dl = 40_000, 40_000
    postings = spark.createDataFrame(
        [(1, "spam", tf, dl), (2, "spam", 3, 10)],
        "id long, term string, tf long, dl long",
    )
    dfreq = spark.createDataFrame([("spam", 2)], "term string, df long")
    stats = spark.createDataFrame(
        [(n_docs, n_docs * 500, avgdl_milli)],
        "n_docs long, total_tokens long, avgdl_milli long",
    )
    queries = spark.createDataFrame([(7, "spam")], "query_id long, query string")
    got = {
        r["doc_id"]: r["score_micro"]
        for r in bm25_topk(postings, dfreq, stats, queries, k=10).collect()
    }

    idf_micro = round((math.log(2.0 * n_docs + 2.0) - math.log(2.0 * 2 + 1.0)) * 1e6)
    num = idf_micro * 22 * tf * avgdl_milli
    assert num > 2**63 - 1  # the planted shape genuinely overflows int64
    expect1 = num // (10 * tf * avgdl_milli + 3 * avgdl_milli + 9000 * dl)
    expect2 = (idf_micro * 22 * 3 * avgdl_milli) // (
        10 * 3 * avgdl_milli + 3 * avgdl_milli + 9000 * 10
    )
    assert got == {1: expect1, 2: expect2}
    assert all(v > 0 for v in got.values())


def test_bm25_overflow_shape_matches_duckdb_oracle(spark):
    """The same planted-overflow postings replayed in DuckDB with the
    oracle's HUGEINT widening — both engines must produce the identical
    quotient (the cross-engine contract the wrap was breaking)."""
    import duckdb

    from fhir_etl_spark.operators.retrieval import bm25_topk

    n_docs, avgdl_milli, tf, dl = 5_000_000_000, 500_000, 40_000, 40_000
    postings = spark.createDataFrame(
        [(1, "spam", tf, dl)], "id long, term string, tf long, dl long"
    )
    dfreq = spark.createDataFrame([("spam", 1)], "term string, df long")
    stats = spark.createDataFrame(
        [(n_docs, n_docs * 500, avgdl_milli)],
        "n_docs long, total_tokens long, avgdl_milli long",
    )
    queries = spark.createDataFrame([(7, "spam")], "query_id long, query string")
    got = bm25_topk(postings, dfreq, stats, queries, k=10).collect()[0]["score_micro"]

    idf_micro = round((math.log(2.0 * n_docs + 2.0) - math.log(3.0)) * 1e6)
    # literals cast to BIGINT: the real oracle's tf/a/dl are BIGINT
    # columns; bare int literals here would be INT32 and overflow in
    # the denominator before the widening under test is even reached
    want = duckdb.sql(
        f"""SELECT CAST((CAST({idf_micro} AS HUGEINT) * 22
                         * CAST({tf} AS BIGINT) * CAST({avgdl_milli} AS BIGINT))
             // (10 * CAST({tf} AS BIGINT) * CAST({avgdl_milli} AS BIGINT)
                 + 3 * CAST({avgdl_milli} AS BIGINT)
                 + 9000 * CAST({dl} AS BIGINT))
             AS BIGINT) AS s"""
    ).fetchone()[0]
    assert got == want


def test_distributed_dense_rank_null_keys(spark):
    """ADVICE r09 #2: countDistinct(*keys) skips NULL-containing
    tuples, so a null-keyed partition's offset came up one short and
    every downstream rank shifted. The struct-count fix must make
    distributed ranks equal the single-window dense_rank reference
    (ascending NULLS FIRST) on a corpus WITH null keys."""
    from pyspark.sql import Window

    from fhir_etl_spark.operators.ranking import distributed_dense_rank

    rows = [(i, None if i % 7 == 0 else f"k{i % 23:02d}") for i in range(300)]
    df = spark.createDataFrame(rows, "id long, key string").repartition(8)
    got = {
        r["id"]: r["rank"]
        for r in distributed_dense_rank(df, ["key"], out_col="rank").collect()
    }
    ref = {
        r["id"]: r["rank"]
        for r in df.withColumn(
            "rank", F.dense_rank().over(Window.orderBy(F.asc_nulls_first("key"))) - 1
        ).collect()
    }
    assert got == ref
    # NULLS FIRST: every null-keyed row holds rank 0
    assert all(got[i] == 0 for i in range(0, 300, 7))


def test_distributed_dense_rank_multicol_null_keys(spark):
    """Multi-column keys with NULLs in different positions are distinct
    groups — the struct count must agree with dense_rank there too."""
    from pyspark.sql import Window

    from fhir_etl_spark.operators.ranking import distributed_dense_rank

    rows = []
    for i in range(200):
        a = None if i % 5 == 0 else i % 4
        b = None if i % 3 == 0 else i % 6
        rows.append((i, a, b))
    df = spark.createDataFrame(rows, "id long, a int, b int").repartition(8)
    got = {
        r["id"]: r["rank"]
        for r in distributed_dense_rank(df, ["a", "b"], out_col="rank").collect()
    }
    ref = {
        r["id"]: r["rank"]
        for r in df.withColumn(
            "rank",
            F.dense_rank().over(
                Window.orderBy(F.asc_nulls_first("a"), F.asc_nulls_first("b"))
            )
            - 1,
        ).collect()
    }
    assert got == ref


def test_classifier_null_text_is_loud(spark):
    """ADVICE r09 #3: NULL text made hashed_grams concat NULL →
    size() = -1 → score NULL → the row SILENTLY fell to the negative
    label (diverging from the DuckDB oracle's NULL). Loud-NULL now:
    the plan raises, matching quantile_buckets/ewma."""
    from fhir_etl_spark.operators.classifier import linear_classifier_scores

    df = spark.createDataFrame(
        [(1, "some english text here"), (2, None)], "doc_id long, text string"
    )
    scored = linear_classifier_scores(df, [100, -50] * 64, 10, salt="ft22")
    with pytest.raises(Exception, match="NULL text"):
        scored.collect()
    # non-null rows still score normally
    ok = linear_classifier_scores(
        df.where(F.col("text").isNotNull()), [100, -50] * 64, 10, salt="ft22"
    ).collect()
    assert len(ok) == 1 and ok[0]["n_grams"] > 0


def test_classifier_empty_text_scores_zero(spark):
    """Empty (non-NULL) text stays the deterministic baseline: zero
    grams, zero score, the negative label — NOT an error (only
    unscorable NULLs are loud)."""
    from fhir_etl_spark.operators.classifier import linear_classifier_scores

    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    got = linear_classifier_scores(df, [100, -50] * 64, 10, salt="ft22").collect()
    assert len(got) == 1
    assert got[0]["n_grams"] == 0
    assert got[0]["score_micro"] == 0
    assert got[0]["label"] == "other"


# --- t25 blocklist gate (round-10 addition) -----------------------------


def test_blocklist_token_exactness_no_substring_matches(spark):
    """'class' must NOT match a blocklisted 'ass'-style term: single
    terms match whole lowercased tokens only; phrases are the substring
    tier."""
    from fhir_etl_spark.operators.text import blocklist_flags

    df = spark.createDataFrame(
        [
            (1, "the classic slowest approach"),   # no exact token hit
            (2, "the SLOW batch path"),            # 2 distinct terms, cased
            (3, "slow slow slow"),                 # 1 DISTINCT term
            (4, "a full ROW SCAN happened here"),  # phrase, cased
            (5, "clean document"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_terms_hit"], r["n_phrases_hit"], r["blocked"])
        for r in blocklist_flags(
            df, terms=("slow", "batch"), phrases=("row scan",)
        ).collect()
    }
    assert got[1] == (0, 0, False)
    assert got[2] == (2, 0, True)
    assert got[3] == (1, 0, True)
    assert got[4] == (0, 1, True)
    assert got[5] == (0, 0, False)


def test_blocklist_validation(spark):
    import pytest

    from fhir_etl_spark.operators.text import blocklist_flags

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty blocklist"):
        blocklist_flags(df, terms=())
    with pytest.raises(ValueError, match="multi-word"):
        blocklist_flags(df, terms=("two words",))


def test_blocklist_plan_is_map_only(spark, sf_dir):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.plan_audit import audit

    from fhir_etl_spark.queries import all_queries

    a = audit(all_queries()["t25_blocklist_gate"].fn(spark, "/root/testdata/sf0.001"))
    assert a["shuffles"] == 0 and a["bcast"] == 0 and a["python"] == "no"
