"""Training-pipeline hygiene queries: benchmark decontamination, text
normalization, sequence packing (operators/contamination.py, packing.py,
text.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_etl_spark.queries.registry import query
from fhir_etl_spark.session import load_tables


@query(
    "d8_contamination",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS shingle
      FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
      WHERE len(t) >= 3
    )
    SELECT c.doc_id, count(*) AS n_hits
    FROM (SELECT * FROM sh WHERE doc_id % 97 <> 0) c
    JOIN (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0) b
      ON c.shingle = b.shingle
    GROUP BY c.doc_id
    """,
    tags=("training", "dedup", "join"),
)
def d8_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any 3-gram with the
    'benchmark' slice (every 97th doc), with the distinct-shingle hit
    count (k=3 keeps the synthetic corpus's hit set large enough to be a
    real oracle — 171 docs at sf0.01; production uses k=8..13). The
    benchmark shingle set broadcasts; the corpus is filtered map-side —
    no corpus shuffle."""
    from fhir_etl_spark.operators.contamination import contamination_hits

    documents = load_tables(spark, sf_dir, "documents")
    benchmark = documents.filter(F.col("doc_id") % 97 == 0)
    corpus = documents.filter(F.col("doc_id") % 97 != 0)
    return contamination_hits(corpus, benchmark, k=3)


@query(
    "t5_normalize_text",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
             ' +', ' ', 'g')) AS norm_text
    FROM documents
    """,
    tags=("training", "text"),
)
def t5_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization for dedup/fingerprint keys: lowercase → strip
    non-alphanumerics → collapse runs of spaces → trim. Pure codegen
    projection (both regexes are ASCII classes, so Java and RE2 agree)."""
    documents = load_tables(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return documents.select("doc_id", norm.alias("norm_text"))


_DS5_ORACLE = r"""
    WITH RECURSIVE base AS (
      SELECT doc_id, shard, n_tokens,
             row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS rn
      FROM (
        SELECT doc_id,
               CAST(CAST('0x' || substr(md5('pack' || CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT)
                    % 1000000 % 8 AS INTEGER) AS shard,
               CAST(len(list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'),
                                    x -> x <> '')) AS BIGINT) AS n_tokens,
               md5('pack:ord' || CAST(doc_id AS VARCHAR)) AS ord
        FROM documents
      )
    ), walk AS (
      -- state machine: (seq_after, used_after) carried row to row in
      -- per-shard hash order; expressions are fully expanded because
      -- DuckDB's lateral column aliases misresolve inside a recursive
      -- member (verified: lateral form silently yields wrong offsets)
      SELECT shard, rn, doc_id, n_tokens,
             CAST(0 AS BIGINT) AS seq_cur,
             CAST(0 AS BIGINT) AS off,
             CAST(CASE WHEN n_tokens >= 2048 THEN 1 ELSE 0 END AS BIGINT) AS seq_after,
             CAST(CASE WHEN n_tokens >= 2048 THEN 0 ELSE n_tokens END AS BIGINT) AS used_after
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.shard, b.rn, b.doc_id, b.n_tokens,
             CASE WHEN w.used_after > 0 AND w.used_after + b.n_tokens > 2048
                  THEN w.seq_after + 1 ELSE w.seq_after END,
             CASE WHEN w.used_after > 0 AND w.used_after + b.n_tokens > 2048
                  THEN 0 ELSE w.used_after END,
             (CASE WHEN w.used_after > 0 AND w.used_after + b.n_tokens > 2048
                   THEN w.seq_after + 1 ELSE w.seq_after END)
             + CASE WHEN (CASE WHEN w.used_after > 0 AND w.used_after + b.n_tokens > 2048
                               THEN 0 ELSE w.used_after END) + b.n_tokens >= 2048
                    THEN 1 ELSE 0 END,
             CASE WHEN (CASE WHEN w.used_after > 0 AND w.used_after + b.n_tokens > 2048
                             THEN 0 ELSE w.used_after END) + b.n_tokens >= 2048
                  THEN 0
                  ELSE (CASE WHEN w.used_after > 0 AND w.used_after + b.n_tokens > 2048
                             THEN 0 ELSE w.used_after END) + b.n_tokens END
      FROM walk w JOIN base b ON b.shard = w.shard AND b.rn = w.rn + 1
    )
    SELECT doc_id, shard,
           CAST(shard * 1099511627776 + seq_cur AS BIGINT) AS seq_id,
           off AS seq_offset, n_tokens
    FROM walk
    """


@query("ds5_pack_sequences", oracle=_DS5_ORACLE, tags=("training", "stateful"))
def ds5_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy first-fit packing of documents into 2048-token sequences
    (whitespace token counts), 8 shards. Sequential-per-shard recurrence →
    applyInPandas (parallel across shards); the oracle replays the exact
    state machine as a DuckDB recursive CTE over per-shard row numbers
    (recursion depth = max rows per shard), so even this imperative
    operator is value-checked end to end. Unit tests additionally pin the
    packing invariants (tests/test_training.py)."""
    from fhir_etl_spark.operators.packing import pack_sequences
    from fhir_etl_spark.operators.text import token_count

    documents = load_tables(spark, sf_dir, "documents")
    with_counts = documents.withColumn("n_tokens", token_count(F.col("text")))
    return pack_sequences(with_counts, "n_tokens", budget=2048, n_shards=8)


@query(
    "d11_bloom_decontaminate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS shingle
      FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
      WHERE len(t) >= 3
    ), cont AS (
      SELECT DISTINCT c.doc_id
      FROM (SELECT * FROM sh WHERE doc_id % 97 <> 0) c
      JOIN (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0) b
        ON c.shingle = b.shingle
    )
    SELECT doc_id, source, n_chars FROM documents
    WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM cont)
    """,
    tags=("training", "dedup", "sketch"),
)
def d11_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d8's decontamination via a Bloom-bitset prefilter
    (operators/contamination.bloom_decontaminate): the benchmark shingle
    set compresses to a ≤512 KiB broadcast bitmap, the corpus shingle
    stream is pre-pruned by map-side codegen bit tests, and only the
    survivors reach the exact verify join — bit-identical to the exact
    path (the oracle is the plain exact anti join), but the broadcast no
    longer scales with benchmark text size. Returns the SURVIVING corpus
    docs, the complement of d8's hit set."""
    from fhir_etl_spark.operators.contamination import bloom_decontaminate

    documents = load_tables(spark, sf_dir, "documents")
    benchmark = documents.filter(F.col("doc_id") % 97 == 0)
    corpus = documents.filter(F.col("doc_id") % 97 != 0)
    return bloom_decontaminate(corpus, benchmark, k=3).select(
        "doc_id", "source", "n_chars"
    )


def _t5b_oracle() -> str:
    """Replay the decorate + fold in DuckDB from the same frozen tables
    (functions/unicode_fold) — the mapping is code, so the oracle
    literal is generated from it, never hand-copied."""
    from fhir_etl_spark.functions.unicode_fold import (
        LIGATURES,
        TRANSLATE_FROM,
        TRANSLATE_TO,
    )

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    fw = ", ".join(lit(chr(0xFF21 + i)) for i in range(26))
    decorated = (
        f"[{fw}][1 + doc_id % 26] || 'х' || 'e' || chr(769) "
        "|| chr(12288) || 'ﬁ' || ' ' || text"
    )
    expr = f"({decorated})"
    for k, v in LIGATURES.items():
        expr = f"replace({expr}, {lit(k)}, {lit(v)})"
    return f"""
    SELECT doc_id,
           translate({expr}, {lit(TRANSLATE_FROM)}, {lit(TRANSLATE_TO)})
             AS norm_text
    FROM documents
    """


@query("t5b_nfkc_fold", oracle=_t5b_oracle(), tags=("training", "text", "unicode"))
def t5b_nfkc_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFKC-class normalization (width fold + confusable homoglyphs +
    ligature expansion + combining-mark strip) from the frozen tables
    in functions/unicode_fold — the multilingual tier above t5's
    ASCII-class normalize. The synthetic corpus is pure ASCII (the fold
    would be the identity), so the query first DECORATES every doc with
    a deterministic non-ASCII prefix derived from doc_id — a fullwidth
    letter, a Cyrillic х, e + COMBINING ACUTE, an ideographic space,
    the ﬁ ligature — and the oracle replays both the decoration and the
    fold; every mapping class is therefore value-checked on every row.
    Plan: one map-only codegen projection (replace chain + translate)."""
    from fhir_etl_spark.operators.text import nfkc_fold

    documents = load_tables(spark, sf_dir, "documents")
    fw = F.array(*[F.lit(chr(0xFF21 + i)) for i in range(26)])
    decorated = F.concat(
        F.element_at(fw, (F.col("doc_id") % 26 + 1).cast("int")),
        F.lit("х"),
        F.lit("é"),
        F.lit("　"),
        F.lit("ﬁ"),
        F.lit(" "),
        F.col("text"),
    )
    return documents.select(
        "doc_id", nfkc_fold(decorated).alias("norm_text")
    )


@query(
    "d14_contamination_report",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS shingle
      FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
      WHERE len(t) >= 3
    ), b AS (SELECT * FROM sh WHERE doc_id % 97 = 0),
    c AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
    tot AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM b GROUP BY doc_id
    ), hits AS (
      SELECT b.doc_id,
             CAST(count(DISTINCT b.shingle) AS BIGINT) AS n_hit_shingles,
             CAST(count(DISTINCT c.doc_id) AS BIGINT) AS n_contaminating_docs
      FROM b JOIN c ON b.shingle = c.shingle
      GROUP BY b.doc_id
    )
    SELECT t.doc_id, t.n_shingles,
           coalesce(h.n_hit_shingles, 0) AS n_hit_shingles,
           (1000 * coalesce(h.n_hit_shingles, 0)) // t.n_shingles AS overlap_pct_milli,
           coalesce(h.n_contaminating_docs, 0) AS n_contaminating_docs
    FROM tot t LEFT JOIN hits h USING (doc_id)
    """,
    tags=("training", "dedup", "report"),
)
def d14_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The eval-side contamination table (d8's reporting twin — Brown
    2020 Appendix C): for every BENCHMARK document (every 97th doc),
    its distinct 3-gram count, how many of those leak into the corpus,
    the integer-milli overlap fraction, and how many distinct corpus
    docs contaminate it. Eval owners read this to discount benchmark
    rows; d8/d11 read the other direction to drop corpus rows. Same
    broadcast-benchmark shape as d8 — the corpus never shuffles."""
    from fhir_etl_spark.operators.contamination import contamination_report

    documents = load_tables(spark, sf_dir, "documents")
    benchmark = documents.filter(F.col("doc_id") % 97 == 0)
    corpus = documents.filter(F.col("doc_id") % 97 != 0)
    return contamination_report(corpus, benchmark, k=3)
