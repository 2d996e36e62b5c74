"""t23 BM25 retrieval: exact integer scoring replayed in Python on a
hand-built corpus, tie-break determinism, unknown-term behavior, the
broadcast-into-postings plan contract, and the DSIR-style check that
every idf_micro sits far from its rounding boundary (cross-engine ln
stability)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fhir_etl_spark.operators.retrieval import bm25_index, bm25_topk


def _py_bm25(docs: dict[int, str], query: str, k: int = 10):
    toks = {d: t.split() for d, t in docs.items()}
    n = len(docs)
    total = sum(len(t) for t in toks.values())
    a = (1000 * total) // n
    dfreq: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            dfreq[term] = dfreq.get(term, 0) + 1
    scores: dict[int, int] = {}
    for term in dict.fromkeys(query.split()):
        idf = round((math.log(2.0 * n + 2.0) - math.log(2.0 * dfreq.get(term, 0) + 1.0)) * 1e6)
        for d, t in toks.items():
            tf = t.count(term)
            if tf:
                dl = len(t)
                scores[d] = scores.get(d, 0) + (idf * 22 * tf * a) // (
                    10 * tf * a + 3 * a + 9000 * dl
                )
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(d, s, i + 1) for i, (d, s) in enumerate(ranked)]


DOCS = {
    1: "spark scan table spark spark",
    2: "table scan merge batch window table",
    3: "vector stream vector",
    4: "spark",
    5: "merge merge merge merge merge merge merge merge",
}


def _spark_topk(spark, query: str, k: int = 10):
    docs = spark.createDataFrame(
        [(d, t) for d, t in DOCS.items()], "doc_id long, text string"
    )
    q = spark.createDataFrame([(1, query)], "query_id int, query string")
    postings, dfreq, stats = bm25_index(docs)
    return [
        (r["doc_id"], r["score_micro"], r["rank"])
        for r in bm25_topk(postings, dfreq, stats, q, k=k)
        .orderBy("rank")
        .collect()
    ]


def test_hand_computed_scores_match(spark):
    for query in ("spark table", "merge", "vector stream spark"):
        assert _spark_topk(spark, query) == _py_bm25(DOCS, query), query


def test_duplicate_query_terms_collapse(spark):
    assert _spark_topk(spark, "spark spark spark") == _py_bm25(DOCS, "spark")


def test_unknown_term_contributes_nothing(spark):
    assert _spark_topk(spark, "spark zzzzz") == _py_bm25(DOCS, "spark")


def test_tie_break_is_doc_id(spark):
    # docs 10 and 11 identical → identical scores; rank order by id
    docs = spark.createDataFrame(
        [(11, "x y"), (10, "x y"), (1, "x x x")], "doc_id long, text string"
    )
    q = spark.createDataFrame([(1, "x")], "query_id int, query string")
    got = bm25_topk(*bm25_index(docs), q).orderBy("rank").collect()
    ids = [r["doc_id"] for r in got]
    assert ids[1:] == [10, 11] and got[1]["score_micro"] == got[2]["score_micro"]


def test_plan_broadcasts_queries_into_postings(spark):
    """The scale contract: the per-query join must be a broadcast-hash
    join (corpus side never shuffles per query) and top-k must be a
    WindowGroupLimit, not a global sort."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.plan_audit import audit

    from fhir_etl_spark.queries import all_queries

    a = audit(all_queries()["t23_bm25_topk"].fn(spark, "/root/testdata/sf0.001"))
    assert a["bhj"] >= 1
    assert a["smj"] == 0
    assert a["wgl"] >= 1
    assert a["python"] == "no"


def test_idf_micro_far_from_rounding_boundary(spark):
    """Cross-engine ln stability (the DSIR argument): a 1-ulp libm
    difference moves idf by ~1e-10 micro units, so every idf's
    fractional part must sit well away from .5."""
    from fhir_etl_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.01", "documents")
    _, dfreq, stats = bm25_index(docs)
    n = stats.collect()[0]["n_docs"]
    for r in dfreq.collect():
        raw = (math.log(2.0 * n + 2.0) - math.log(2.0 * r["df"] + 1.0)) * 1e6
        frac = abs(raw - round(raw))
        assert abs(frac - 0.5) > 1e-3, (r["term"], raw)
