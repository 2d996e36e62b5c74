"""Training-pipeline operators: packing invariants, decontamination
semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from fhir_etl_spark.operators.contamination import decontaminate
from fhir_etl_spark.operators.packing import pack_sequences
from fhir_etl_spark.operators.text import token_count
from fhir_etl_spark.session import load_tables

BUDGET = 256


def _packed(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents").withColumn(
        "n_tokens", token_count(F.col("text"))
    )
    return (
        pack_sequences(docs, "n_tokens", budget=BUDGET, n_shards=4),
        docs,
    )


def test_packing_partitions_all_docs_once(spark, sf_dir):
    packed, docs = _packed(spark, sf_dir)
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()


def test_packing_respects_budget(spark, sf_dir):
    """No sequence exceeds the budget unless it holds a single oversized
    doc; offsets are the prefix sums of the sequence's docs."""
    packed, _ = _packed(spark, sf_dir)
    seqs = (
        packed.groupBy("seq_id")
        .agg(
            F.sum("n_tokens").alias("total"),
            F.count("*").alias("n_docs"),
            F.min("seq_offset").alias("first_offset"),
            F.max(F.col("seq_offset") + F.col("n_tokens")).alias("end"),
        )
        .collect()
    )
    for r in seqs:
        if r["n_docs"] > 1:
            assert r["total"] <= BUDGET, r
        assert r["first_offset"] == 0
        assert r["end"] == r["total"]  # contiguous, no gaps/overlap


def test_packing_deterministic_under_repartition(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents").withColumn(
        "n_tokens", token_count(F.col("text"))
    )
    a = pack_sequences(docs, "n_tokens", budget=BUDGET, n_shards=4).collect()
    b = pack_sequences(
        docs.repartition(11), "n_tokens", budget=BUDGET, n_shards=4
    ).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}


def test_decontaminate_removes_exact_copies(spark, sf_dir):
    """A benchmark doc's verbatim text in the corpus must be dropped; a
    corpus doc sharing no 5-gram must survive."""
    docs = load_tables(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 97 == 0).limit(5)
    # corpus = clones of the benchmark (leaked) + unrelated synthetic rows
    leaked = benchmark.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    clean = spark.createDataFrame(
        [(2_000_000 + i, f"unique clean document number {i} zzz qqq xxx yyy www")
         for i in range(5)],
        "doc_id long, text string",
    )
    corpus = leaked.unionByName(clean)
    kept = decontaminate(corpus, benchmark, k=5)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert kept_ids == {r["doc_id"] for r in clean.collect()}


def test_repetition_signals_known_doc(spark):
    """Pin the Gopher-rule math on a constructed document: 'a b a b a b'
    has 5 bigrams (top 'a b' x3 -> 0.6) and 4 trigrams (2 distinct -> 0.5);
    a 2-token doc is dropped (signals undefined below 3 tokens)."""
    from fhir_etl_spark.operators.text import repetition_signals

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "too short")], "doc_id long, text string"
    )
    rows = repetition_signals(df).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 1
    assert rows[0]["top_bigram_frac"] == 0.6
    assert rows[0]["dup_trigram_frac"] == 0.5


def test_gopher_char_repetition_worked_examples(spark):
    """Pin the char-weighted Gopher math (round-8 t17) on constructed
    documents:

    doc 1 'aa b aa b xx' — top 2-gram 'aa b' ×2, gram word chars 3 →
      top_char_num 6 of word_chars 8 → 6·5 > 8 → reject. No duplicated
      5-gram (only one 5-gram exists) → coverage 0.
    doc 2 'p q r s t p q r s t' — the 5-gram 'p q r s t' occurs twice
      (positions 1 and 6); its occurrences cover ALL 10 tokens → coverage
      10 of 10, union semantics (the overlapping duplicated 5-grams
      starting at 2..5 must not over- or double-count) → reject.
    doc 3 'one two three' — too short for any 5-gram; top 2-gram ties
      ('one two' vs 'two three', both ×1) break to the lexicographically
      smaller 'one two' (6 word chars of 11 total); 6·5 = 30 > 11, so
      even a no-repetition short doc trips the 20% rule — exactly why
      Gopher pairs these filters with a minimum-length gate.
    """
    from fhir_etl_spark.operators.text import gopher_char_repetition

    df = spark.createDataFrame(
        [
            (1, "aa b aa b xx"),
            (2, "p q r s t p q r s t"),
            (3, "one two three"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_char_repetition(df).collect()}

    r1 = got[1]
    assert (r1["word_chars"], r1["top_gram"], r1["top_count"]) == (8, "aa b", 2)
    assert r1["top_char_num"] == 6 and r1["top_gram_reject"]  # 30 > 8
    assert r1["dup_covered_chars"] == 0 and not r1["dup_gram_reject"]

    r2 = got[2]
    assert r2["word_chars"] == 10 and r2["n_tokens"] == 10
    assert r2["dup_covered_chars"] == 10  # union over overlapping dups
    assert r2["dup_gram_reject"]  # 200 > 30
    assert r2["top_gram"] == "p q" and r2["top_count"] == 2

    r3 = got[3]
    assert r3["top_gram"] == "one two"  # tie at count 1 -> lexicographic
    assert r3["top_char_num"] == 6 and r3["word_chars"] == 11
    assert r3["top_gram_reject"]  # 30 > 11: short docs trip the 20% rule
    assert r3["dup_covered_chars"] == 0


def test_pii_scrub_known_strings(spark):
    """Counts are taken before redaction. The email pattern requires an
    alphabetic TLD, so a numeric-host address (bob@10.0.0.1) is not an
    email — its host still gets scrubbed by the IP pass, the safe failure
    direction."""
    from fhir_etl_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail bob@10.0.0.1 and carol@example.org here"),
            (2, "call +1-555-0142 from 192.168.1.77 twice 192.168.1.78"),
            (3, "nothing sensitive"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert rows[1]["n_emails"] == 1 and rows[1]["n_ips"] == 1
    assert rows[1]["clean_text"] == "mail bob@<IP> and <EMAIL> here"
    assert rows[2]["n_phones"] == 1 and rows[2]["n_ips"] == 2
    assert rows[2]["clean_text"] == "call <PHONE> from <IP> twice <IP>"
    assert rows[3]["clean_text"] == "nothing sensitive"


def test_bpe_classic_example(spark):
    """Sennrich et al.'s worked example: merge order and counts match the
    paper's algorithm exactly (ties broken by pair string ascending)."""
    from fhir_etl_spark.operators.bpe import bpe_encode, bpe_train

    corpus = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(1, corpus)], "doc_id long, text string")
    merges = bpe_train(df, n_merges=5)
    assert [(m[0], m[1]) for m in merges] == [
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"),
    ]
    assert merges[0][2] == 9 and merges[3][2] == 7

    enc = bpe_encode(
        spark.createDataFrame([(1, "lowest newest")], "id long, text string"), merges
    )
    assert enc.collect()[0]["bpe_tokens"] == [
        "low", "est</w>", "n", "e", "w", "est</w>",
    ]


def test_bpe_invariants_on_corpus(spark, sf_dir):
    """Corpus-level properties: more merges never increase the token
    count, and decoding (concat symbols, strip sentinels) restores the
    lowercased text."""
    from pyspark.sql import functions as F

    from fhir_etl_spark.operators.bpe import END_OF_WORD, bpe_encode, bpe_train
    from fhir_etl_spark.session import load_tables

    docs = load_tables(spark, sf_dir, "documents").limit(50).cache()
    merges = bpe_train(docs, n_merges=6)
    assert len(merges) == 6

    n0 = bpe_encode(docs, []).select(F.sum(F.size("bpe_tokens"))).first()[0]
    n3 = bpe_encode(docs, merges[:3]).select(F.sum(F.size("bpe_tokens"))).first()[0]
    n6 = bpe_encode(docs, merges).select(F.sum(F.size("bpe_tokens"))).first()[0]
    assert n0 >= n3 >= n6 and n6 < n0  # merges strictly compress overall

    decoded = bpe_encode(docs, merges).select(
        "doc_id",
        F.regexp_replace(
            F.concat_ws("", "bpe_tokens"), END_OF_WORD, " "
        ).alias("rt"),
        F.lower(F.regexp_replace("text", r"\s+", " ")).alias("want"),
    )
    bad = decoded.filter(F.trim("rt") != F.trim("want")).count()
    assert bad == 0


def test_chunk_documents_edges(spark):
    """Chunking edge cases: short doc → one whole chunk; boundary doc
    (n = chunk) → one chunk (tail suppressed); overlap honored; empty
    doc emits nothing."""
    from fhir_etl_spark.operators.text import chunk_documents

    toks = lambda n: " ".join(f"w{i}" for i in range(n))  # noqa: E731
    df = spark.createDataFrame(
        [(1, toks(10)), (2, toks(64)), (3, toks(70)), (4, "")],
        "doc_id long, text string",
    )
    out = {}
    for r in chunk_documents(df, chunk_tokens=64, overlap=16).collect():
        out.setdefault(r["doc_id"], []).append(r)
    assert len(out[1]) == 1 and out[1][0]["n_chunk_tokens"] == 10
    assert len(out[2]) == 1  # start 48 adds nothing beyond 0..64
    assert len(out[3]) == 2
    c0, c1 = sorted(out[3], key=lambda r: r["chunk_index"])
    assert (c0["chunk_start"], c0["n_chunk_tokens"]) == (0, 64)
    assert (c1["chunk_start"], c1["n_chunk_tokens"]) == (48, 22)
    assert c0["chunk_text"].split()[48:] == c1["chunk_text"].split()[:16]  # overlap
    assert 4 not in out


def test_compression_ratio_discriminates(spark):
    """The deflate-ratio signal separates the three regimes curation
    cares about: templated/repetitive ≪ natural text ≪ random bytes; and
    it is deterministic run to run."""
    import random

    from fhir_etl_spark.operators.text import compression_ratio

    random.seed(7)
    words = ("fox dog corpus lazy model researcher training quick brown "
             "jumps annotate diligence seventeen unusual while with the a "
             "of and curious gradient shard token sample").split()
    natural = " ".join(random.choice(words) for _ in range(400))
    repetitive = "spam ham " * 320
    rand = "".join(chr(random.randint(0x21, 0x7E)) for _ in range(2500))
    df = spark.createDataFrame(
        [(1, natural), (2, repetitive), (3, rand), (4, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert out[2]["z_ratio"] < 0.05 < out[1]["z_ratio"] < 0.5 < out[3]["z_ratio"]
    assert out[4]["n_bytes"] == 0 and out[4]["z_ratio"] is None
    again = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert all(out[k]["z_bytes"] == again[k]["z_bytes"] for k in out)
