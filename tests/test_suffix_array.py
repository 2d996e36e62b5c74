"""d13 suffix-array ExactSubstr: the distributed dense-rank primitive
against a single-node reference, suffix-array equivalence with the
k-gram formulation on randomized corpora (the provable-identity claim
the shared oracle relies on), and degenerate inputs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from fhir_etl_spark.operators.dedup import substring_dedup, suffix_array_dedup
from fhir_etl_spark.operators.ranking import distributed_dense_rank


def test_distributed_dense_rank_matches_reference(spark):
    rng = random.Random(7)
    rows = [(i, rng.randrange(20), rng.randrange(5)) for i in range(500)]
    df = spark.createDataFrame(rows, "i long, a int, b int").repartition(13)
    got = {
        r["i"]: r["rk"]
        for r in distributed_dense_rank(df, ["a", "b"], "rk").collect()
    }
    keys = sorted({(a, b) for _, a, b in rows})
    want_rank = {k: i for i, k in enumerate(keys)}
    for i, a, b in rows:
        assert got[i] == want_rank[(a, b)]


def test_distributed_dense_rank_is_partitioning_invariant(spark):
    rows = [(i, i % 17) for i in range(200)]
    df1 = spark.createDataFrame(rows, "i long, k int").repartition(3)
    df2 = spark.createDataFrame(rows, "i long, k int").repartition(29)
    r1 = {r["i"]: r["rk"] for r in distributed_dense_rank(df1, ["k"], "rk").collect()}
    r2 = {r["i"]: r["rk"] for r in distributed_dense_rank(df2, ["k"], "rk").collect()}
    assert r1 == r2


def _random_corpus(seed: int, n_docs: int = 25, vocab: int = 12):
    """Small vocabulary forces heavy cross-doc repetition — the regime
    where span merging, long LCPs, and pad handling all get exercised."""
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    boiler = " ".join(rng.choices(words, k=10))
    rows = []
    for d in range(n_docs):
        n = rng.randrange(0, 30)
        body = " ".join(rng.choices(words, k=n))
        if d % 3 == 0:
            body = f"{body} {boiler}"
        if d % 7 == 0:
            body = f"{boiler} {body}"
        rows.append((d, body))
    rows.append((n_docs, ""))  # empty doc
    rows.append((n_docs + 1, boiler))  # fully-duplicated doc
    return rows


def test_suffix_array_equals_kgram_on_random_corpora(spark):
    for seed in (1, 2, 3):
        rows = _random_corpus(seed)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        for k in (3, 6):
            a = {
                r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
                for r in substring_dedup(df, k=k).collect()
            }
            b = {
                r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
                for r in suffix_array_dedup(df, min_len=k).collect()
            }
            assert a == b, (seed, k, {d: (a[d], b[d]) for d in a if a[d] != b[d]})


def test_width4_base_handles_sub4_token_docs(spark):
    """r13: the base rank table is built at WIDTH 4 map-side with ''
    pads — docs shorter than the base width (0–3 tokens) must still
    rank, dedup, and reassemble identically to the k-gram formulation
    (pads only ever match pads; the remaining-length clamp bounds every
    pad match)."""
    rows = [
        (1, "a b"), (2, "a b"), (3, "a"), (4, ""), (5, "a b c"),
        (6, "a b c"), (7, "b c"), (8, "x y z"), (9, "c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (2, 3):
        a = {
            r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
            for r in substring_dedup(df, k=k).collect()
        }
        b = {
            r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
            for r in suffix_array_dedup(df, min_len=k).collect()
        }
        assert a == b, (k, {d: (a[d], b[d]) for d in a if a[d] != b[d]})


def test_all_docs_shorter_than_min_len_pass_through(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, "x")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in suffix_array_dedup(df, min_len=8).collect()}
    assert len(got) == 3
    for d, txt in ((1, "a b"), (2, ""), (3, "x")):
        assert got[d]["n_removed"] == 0 and got[d]["clean_text"] == txt


def test_min_span_below_min_len_raises(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="below min_len"):
        suffix_array_dedup(df, min_len=8, min_span_tokens=4)


def test_longer_min_span_keeps_short_repeats(spark):
    """The Lee et al. 50-token policy knob: a duplicated 4-token run is
    detected (min_len=4) but kept when the maximal covered span is
    shorter than min_span_tokens."""
    df = spark.createDataFrame(
        [(1, "p q r s unique tail one"), (2, "p q r s other words two")],
        "doc_id long, text string",
    )
    strict = {
        r["doc_id"]: r["n_removed"]
        for r in suffix_array_dedup(df, min_len=4).collect()
    }
    lenient = {
        r["doc_id"]: r["n_removed"]
        for r in suffix_array_dedup(df, min_len=4, min_span_tokens=6).collect()
    }
    assert strict == {1: 4, 2: 4}
    assert lenient == {1: 0, 2: 0}
