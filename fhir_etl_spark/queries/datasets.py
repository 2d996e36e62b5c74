"""Training-dataset assembly as driver-gate queries (operators/datasets.py).

Every assignment is a pure function of the row key (md5 bucket), so the
DuckDB oracle reproduces the EXACT row-level decision — these are not
rows-only checks; the oracle verifies each row's split/sample/shard/pos.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_etl_spark.queries.registry import query
from fhir_etl_spark.session import load_tables

# DuckDB twin of operators/datasets.hash_bucket (BUCKETS = 1e6)
_BUCKET = (
    "CAST('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 8) "
    "AS UBIGINT) % 1000000"
)


@query(
    "ds1_hash_split",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN b < 800000 THEN 'train'
                WHEN b < 900000 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, {_BUCKET.format(salt='split', key='doc_id')} AS b
          FROM documents)
    """,
    tags=("datasets", "split"),
)
def ds1_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment — stable per-row
    under re-runs, repartitioning, and dataset growth (cumulative-range
    property keeps val/test membership fixed when train grows)."""
    from fhir_etl_spark.operators.datasets import split_assign

    documents = load_tables(spark, sf_dir, "documents")
    return split_assign(
        documents, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")


@query(
    "ds2_stratified_sample",
    oracle=f"""
    SELECT event_id, event_type
    FROM (SELECT event_id, event_type,
                 {_BUCKET.format(salt='sample', key='event_id')} AS b
          FROM events)
    WHERE b < CASE event_type
                WHEN 'error' THEN 500000
                WHEN 'purchase' THEN 200000
                ELSE 50000 END
    """,
    tags=("datasets", "sample"),
)
def ds2_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: upweight rare strata (error 50%,
    purchase 20%), downsample the rest to 5% — the class-rebalance step of
    a training pipeline, as a pure filter (no shuffle, no RNG)."""
    from fhir_etl_spark.operators.datasets import stratified_sample

    events = load_tables(spark, sf_dir, "events")
    return stratified_sample(
        events,
        "event_type",
        "event_id",
        {"error": 0.5, "purchase": 0.2},
        default_fraction=0.05,
    ).select("event_id", "event_type")


@query(
    "ds3_weighted_mix",
    oracle=f"""
    SELECT doc_id, src FROM (
      SELECT doc_id, 'web' AS src,
             {_BUCKET.format(salt='mix:web', key='doc_id')} AS b
      FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3')
      UNION ALL
      SELECT doc_id, 'curated' AS src,
             {_BUCKET.format(salt='mix:curated', key='doc_id')} AS b
      FROM documents WHERE source = 'src4'
    )
    WHERE (src = 'web' AND b < 300000) OR (src = 'curated' AND b < 900000)
    """,
    tags=("datasets", "mix"),
)
def ds3_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing at target rates: a big 'web' slice kept at 30%, a
    small 'curated' slice at 90% — per-source hash-downsampling + tagged
    zero-shuffle union (unionByName aligns heterogeneous schemas)."""
    from fhir_etl_spark.operators.datasets import weighted_mix

    documents = load_tables(spark, sf_dir, "documents")
    web = documents.filter(F.col("source").isin("src0", "src1", "src2", "src3"))
    curated = documents.filter(F.col("source") == "src4")
    return weighted_mix(
        {"web": (web, 0.3), "curated": (curated, 0.9)}, key="doc_id"
    ).select("doc_id", "src")


@query(
    "ds4_shard_shuffle",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id,
             CAST({_BUCKET.format(salt='shuffle', key='doc_id')} % 8 AS INT)
               AS shard,
             md5('shuffle:pos' || CAST(doc_id AS VARCHAR)) AS ord
      FROM documents
    )
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id)
                AS INT) AS pos
    FROM hashed
    """,
    tags=("datasets", "shuffle"),
)
def ds4_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible shuffle into 8 ordered shards: ONE hash shuffle +
    per-shard local sort (no global range sort — the ORDER BY rand()
    anti-pattern at 100 TB). The oracle verifies every (shard, pos)
    assignment row-by-row."""
    from fhir_etl_spark.operators.datasets import shard_shuffle

    documents = load_tables(spark, sf_dir, "documents")
    return shard_shuffle(documents, "doc_id", n_shards=8).select(
        "doc_id", "shard", "pos"
    )


# the d3/d6 near-dup pair mining + transitive closure, reused as the
# cluster key for the leakage-safe split below
_CLUSTERS_CTE = """
    pairs AS (
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS t
        FROM documents
      ), sh AS (
        SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS shingle
        FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
        WHERE len(t) >= 3
      ), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      SELECT a, b FROM inter
        JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
      WHERE round(inter / (sa.n + sb.n - inter), 4) >= 0.5
    ), edges AS (
      SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs
    ), reach AS (
      WITH RECURSIVE r(node, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.label FROM edges e JOIN r ON e.dst = r.node
      ) SELECT * FROM r
    ), clusters AS (
      SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node
    )
"""


@query(
    "ds6_leakage_safe_split",
    oracle=f"""
    WITH {_CLUSTERS_CTE},
    grouped AS (
      SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS group_key
      FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
    )
    SELECT doc_id,
           CASE WHEN b < 800000 THEN 'train'
                WHEN b < 900000 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, {_BUCKET.format(salt='split', key='group_key')} AS b
          FROM grouped)
    """,
    tags=("datasets", "split", "dedup"),
)
def ds6_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware 80/10/10 split: the split key is the near-dup cluster
    id, so near-duplicate documents can never straddle train/test (the
    leakage a per-row split silently permits). The oracle recomputes the
    clusters via recursive-CTE transitive closure and verifies every row's
    assignment."""
    from fhir_etl_spark.operators.datasets import leakage_safe_split
    from fhir_etl_spark.operators.dedup import ngram_jaccard_pairs

    documents = load_tables(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(documents, threshold=0.5)
    return leakage_safe_split(
        documents, pairs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")


@query(
    "ds7_source_quota",
    oracle="""
    SELECT doc_id, source, pos FROM (
      SELECT doc_id, source,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5('cap' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS INT) AS pos
      FROM documents
    ) WHERE pos <= 15
    """,
    tags=("datasets", "sample"),
)
def ds7_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contribution cap (max 15 docs per source, deterministic
    hash order) — no single domain may dominate the mix. Compiles to
    WindowGroupLimit: map tasks pre-prune to their local top-15 per source
    before the exchange (pinned in test_plans)."""
    from fhir_etl_spark.operators.datasets import quota_cap

    documents = load_tables(spark, sf_dir, "documents")
    return quota_cap(
        documents, "source", per_key=15, order_key="doc_id", pos_col="pos"
    ).select("doc_id", "source", "pos")


@query(
    "ds8_quality_weighted_sample",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source, n_chars,
             least(greatest(n_chars / 400.0, 0.0), 1.0) AS p
      FROM documents
    )
    SELECT doc_id, source, n_chars
    FROM scored
    WHERE CAST('0x' || substr(md5('qws' || CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT)
          % 1000000 < CAST(p * 1000000 AS BIGINT)
    """,
    tags=("datasets", "sample"),
)
def ds8_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance sampling: keep probability scales with
    a quality proxy (length here), decided per row by deterministic md5
    bucketing — map-side filter, zero shuffle, reproducible anywhere
    (operators/datasets.quality_weighted_sample)."""
    from fhir_etl_spark.operators.datasets import quality_weighted_sample

    documents = load_tables(spark, sf_dir, "documents")
    return quality_weighted_sample(
        documents.select("doc_id", "source", "n_chars"),
        weight=F.col("n_chars") / 400.0,
    )


@query(
    "ds9_temperature_mix",
    oracle=f"""
    -- thresholds replayed from the same T=2 temperature formula the
    -- Spark side computes driver-side: p_i ∝ (n_i/total)^(1/2),
    -- keep-rate_i ∝ p_i/n_i scaled so max rate = 0.9, threshold =
    -- round(rate*1e6). pow/division agree across engines to ~1e-16;
    -- round() at integer bucket granularity absorbs it.
    WITH sizes AS (
      SELECT source, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY source
    ), tot AS (SELECT sum(n) AS total FROM sizes),
    rates AS (
      SELECT source, (pow(n / total, 0.5) /
                      (SELECT sum(pow(n / total, 0.5)) FROM sizes, tot)) / n AS r
      FROM sizes, tot
    ), thresh AS (
      SELECT source,
             CAST(round(r * 0.9 / (SELECT max(r) FROM rates) * 1000000)
                  AS BIGINT) AS t
      FROM rates
    )
    SELECT d.doc_id, d.source AS src
    FROM documents d JOIN thresh ON d.source = thresh.source
    WHERE {_BUCKET.format(salt="tmix:' || d.source || '", key="d.doc_id")} < thresh.t
    """,
    tags=("datasets", "mix"),
)
def ds9_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced corpus mixing (the mBERT/XLM-R T=2 rule):
    per-source keep rates from operators/datasets.temperature_weights
    (p_i ∝ size_i^(1/T), realized as one-pass hash filters via
    weighted_mix, max rate capped at 0.9). Sizes come from one bounded
    groupBy-collect (a handful of sources); everything after is the
    zero-shuffle tagged union."""
    from fhir_etl_spark.operators.datasets import temperature_weights, weighted_mix

    documents = load_tables(spark, sf_dir, "documents")
    sizes = {
        r["source"]: r["n"]
        for r in documents.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    rates = temperature_weights(sizes, temperature=2.0, cap=0.9)
    sources = {
        name: (documents.filter(F.col("source") == name), rate)
        for name, rate in rates.items()
    }
    return weighted_mix(sources, key="doc_id", salt="tmix").select(
        "doc_id", F.col("source").alias("src")
    )


_DSIR_TOKS = (
    "list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '')"
)


@query(
    "ds10_dsir_importance",
    oracle=f"""
    WITH tb AS MATERIALIZED (
      SELECT doc_id, lang = 'en' AS is_target,
             CAST('0x' || substr(md5('dsir' || tok), 1, 8) AS UBIGINT) % 256 AS b
      FROM (SELECT doc_id, lang, unnest({_DSIR_TOKS}) AS tok FROM documents)
    ), raw AS (
      SELECT b, count(*) AS r FROM tb GROUP BY b
    ), tgt AS (
      SELECT b, count(*) AS t FROM tb WHERE is_target GROUP BY b
    ), buckets AS MATERIALIZED (
      SELECT g.b, coalesce(raw.r, 0) AS r, coalesce(tgt.t, 0) AS t
      FROM (SELECT unnest(generate_series(0, 255)) AS b) g
      LEFT JOIN raw ON raw.b = g.b
      LEFT JOIN tgt ON tgt.b = g.b
    ), tot AS (
      SELECT CAST(sum(r) AS BIGINT) AS rt, CAST(sum(t) AS BIGINT) AS tt
      FROM buckets
    ), wt AS MATERIALIZED (
      SELECT b,
             CAST(round((ln(t + 1.0) - ln(tt + 256.0) - ln(r + 1.0)
                         + ln(rt + 256.0)) * 1e6) AS BIGINT) AS w_micro
      FROM buckets CROSS JOIN tot
    ), dbc AS (
      SELECT doc_id, b, count(*) AS c FROM tb GROUP BY doc_id, b
    )
    SELECT doc_id, score_micro FROM (
      SELECT dbc.doc_id,
             CAST(sum(c * w_micro) AS BIGINT) AS score_micro
      FROM dbc JOIN wt ON wt.b = dbc.b
      GROUP BY dbc.doc_id
    )
    ORDER BY score_micro DESC, doc_id
    LIMIT 25
    """,
    tags=("datasets", "importance"),
)
def ds10_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie 2023): score every document by how
    English-target its hashed-unigram profile is vs the raw corpus, take
    the top 25 deterministically. Integer micro-log domain end to end —
    see operators/datasets.dsir_bucket_weights for the exactness
    contract; tests/test_timeseries_importance.py asserts every bucket
    weight sits far from its rounding boundary at both SFs."""
    from fhir_etl_spark.operators.datasets import dsir_importance

    documents = load_tables(spark, sf_dir, "documents")
    scores = dsir_importance(documents, target=F.col("lang") == "en")
    return scores.orderBy(F.desc("score_micro"), "doc_id").limit(25)


_DS11_TOKS = "list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '')"

_DS11_ORACLE = f"""
    WITH avail AS MATERIALIZED (
      SELECT source, CAST(sum(len({_DS11_TOKS})) AS BIGINT) AS available_tokens
      FROM documents GROUP BY source
    ), wt AS MATERIALIZED (
      SELECT source, available_tokens,
             CAST(CAST(substr(source, 4) AS INT) + 1 AS BIGINT) AS weight
      FROM avail
    ), tw AS (
      SELECT CAST(sum(weight) AS BIGINT) AS total FROM wt
    ), des AS (
      SELECT source, available_tokens, weight,
             (CAST(100000 AS BIGINT) * weight) // tw.total AS desired_tokens
      FROM wt CROSS JOIN tw
    ), ep AS (
      SELECT *, least((desired_tokens * CAST(1000000 AS BIGINT))
                        // available_tokens,
                      CAST(3000000 AS BIGINT)) AS epochs_micro
      FROM des
    ), alloc AS (
      SELECT *, least(desired_tokens,
                      (available_tokens * epochs_micro)
                        // CAST(1000000 AS BIGINT)) AS allocated_tokens
      FROM ep
    )
    SELECT source, available_tokens, weight, desired_tokens, epochs_micro,
           allocated_tokens,
           desired_tokens - allocated_tokens AS deficit_tokens
    FROM alloc
    """


@query("ds11_token_budget_mix", oracle=_DS11_ORACLE, tags=("datasets", "mixture"))
def ds11_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture token allocation over the documents corpus:
    per-source weights rise with the source index (src0 → 1 … src19 →
    20), a 100k-token budget, and a 3-epoch repetition cap — so
    high-weight sources exceed their available tokens, hit the cap, and
    report a deficit (the real decision this table drives). All BIGINT
    integer DIV arithmetic; the oracle recomputes weights from the
    source names and replays every division. The source-name collect is
    one bounded action (≤ |sources| rows — the v9 absmax pattern)."""
    from fhir_etl_spark.operators.datasets import token_budget_mix

    documents = load_tables(spark, sf_dir, "documents")
    sources = [
        r["source"] for r in documents.select("source").distinct().collect()
    ]
    weights = {s: int(s[3:]) + 1 for s in sorted(sources)}
    return token_budget_mix(documents, weights, token_budget=100_000)


def _ds13_oracle() -> str:
    # the t13p training-replay chain (8 merges — the SAME store entry
    # t13p commits, so a stale/mangled merge table value-mismatches
    # here too) feeding the ds11 integer-DIV arithmetic on EXACT BPE
    # counts; budget deliberately differs from ds11 (200k vs 100k)
    from fhir_etl_spark.queries.text import _bpe_cte_chain

    return (
        _bpe_cte_chain(8)
        + """, counts AS MATERIALIZED (
      SELECT doc_id, CAST(sum(len(syms)) AS BIGINT) AS n_bpe
      FROM enc GROUP BY doc_id
    ), avail AS MATERIALIZED (
      SELECT d.source,
             CAST(sum(coalesce(c.n_bpe, 0)) AS BIGINT) AS available_tokens
      FROM documents d LEFT JOIN counts c ON d.doc_id = c.doc_id
      GROUP BY d.source
    ), wt AS MATERIALIZED (
      SELECT source, available_tokens,
             CAST(CAST(substr(source, 4) AS INT) + 1 AS BIGINT) AS weight
      FROM avail
    ), tw AS (
      SELECT CAST(sum(weight) AS BIGINT) AS total FROM wt
    ), des AS (
      SELECT source, available_tokens, weight,
             (CAST(200000 AS BIGINT) * weight) // tw.total AS desired_tokens
      FROM wt CROSS JOIN tw
    ), ep AS (
      SELECT *, least((desired_tokens * CAST(1000000 AS BIGINT))
                        // available_tokens,
                      CAST(3000000 AS BIGINT)) AS epochs_micro
      FROM des
    ), alloc AS (
      SELECT *, least(desired_tokens,
                      (available_tokens * epochs_micro)
                        // CAST(1000000 AS BIGINT)) AS allocated_tokens
      FROM ep
    )
    SELECT source, available_tokens, weight, desired_tokens, epochs_micro,
           allocated_tokens,
           desired_tokens - allocated_tokens AS deficit_tokens
    FROM alloc
    """
    )


@query(
    "ds13_bpe_token_budget",
    oracle=_ds13_oracle(),
    tags=("datasets", "mixture", "tokenizer", "store"),
)
def ds13_bpe_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ds11's mixture allocation priced in EXACT tokenizer tokens
    (VERDICT r10: "token-exact counting under a frozen vocab is what
    ds11's budget allocation needs in production"): the persisted
    8-merge BPE vocabulary (the same fingerprint-keyed store entry
    t13p commits — train once, budget forever) encodes every document
    map-only, and the per-source available_tokens are the sums the
    TRAINER will actually see, not a whitespace proxy. Same BIGINT
    integer-DIV arithmetic as ds11 with a 200k budget; the oracle
    replays the full 8-merge training loop AND every division, so a
    stale store, a wrong merge, or a mis-count anywhere in the encode
    path value-mismatches. Scale shape: the encode is zero-shuffle
    codegen; the budget table is one partial-agg exchange over
    (source, count) pairs — never text."""
    from fhir_etl_spark.operators.bpe import bpe_build_or_load, bpe_encode
    from fhir_etl_spark.operators.datasets import token_budget_mix

    documents = load_tables(spark, sf_dir, "documents")
    merges = bpe_build_or_load(spark, documents, n_merges=8)
    counted = bpe_encode(documents, merges).select(
        "source", F.size("bpe_tokens").cast("long").alias("n_bpe")
    )
    sources = [
        r["source"] for r in documents.select("source").distinct().collect()
    ]
    weights = {s: int(s[3:]) + 1 for s in sorted(sources)}
    return token_budget_mix(
        counted, weights, token_budget=200_000, count_col="n_bpe"
    )


def _ds12_oracle() -> str:
    # the v7 Lloyd's chain as a CTE + the t2 quality formula + the cap
    # window — every stage replayed (imports keep the kmeans CTEs and
    # tokenizer SQL bit-synced with the v7/t2 oracles)
    from fhir_etl_spark.queries.similarity import _V7_ORACLE
    from fhir_etl_spark.queries.text import _TOKS_SQL

    return f"""
    WITH v7 AS ({_V7_ORACLE}),
    q AS (
      SELECT doc_id,
             (4*least(n_tok, 100)*nc*nt
            + 300*(nc - least(5*n_punct, nc))*nt
            + 300*least(5*n_stop, nt)*nc) / (1000*nc*nt) AS quality
      FROM (
        SELECT doc_id, n_tok, n_punct, n_stop,
               greatest(n_chars, 1) AS nc, greatest(n_tok, 1) AS nt
        FROM (
          SELECT doc_id,
                 len({_TOKS_SQL}) AS n_tok,
                 length(text) AS n_chars,
                 len(regexp_extract_all(text, '[^\\w \\t\\n\\x0b\\f\\r]')) AS n_punct,
                 len(list_filter({_TOKS_SQL},
                      x -> list_contains(['the','a','of','and','to','in','is','that','for','it'], x)))
                      AS n_stop
          FROM documents
        )
      )
    ), j AS (
      SELECT v7.vec_id, v7.cluster_id, q.quality
      FROM v7 JOIN q ON q.doc_id = v7.vec_id
    )
    SELECT vec_id, cluster_id, quality, pos FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY cluster_id ORDER BY quality DESC, vec_id)
             AS INT) AS pos
      FROM j) WHERE pos <= 40
    """


@query(
    "ds12_cluster_cap_sample",
    oracle=_ds12_oracle(),
    tags=("datasets", "sample", "clustering"),
)
def ds12_cluster_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-capped diversity sampling (DataComp-style: k-means in
    embedding space, keep each cluster's top-40 by the t2 quality
    score): dense semantic regions — near-duplicate masses — collapse
    to their best members while sparse regions survive whole; the
    curation move BETWEEN SemDeDup (v8: drop ε-close mates) and raw
    quality filtering (t2 alone ignores diversity). Composition of
    kmeans_assign (broadcast centroids, corpus never shuffles to
    score), one id-keyed scalar join, and a rank-≤-k window that
    compiles to WindowGroupLimit (map-side pre-prune — a degenerate
    mega-cluster costs bounded shuffle). Oracle replays Lloyd's chain
    (v7's exact CTEs), the quality division, and the cap window."""
    from fhir_etl_spark.operators.datasets import cluster_cap_sample
    from fhir_etl_spark.operators.similarity import kmeans_assign
    from fhir_etl_spark.operators.text import quality_score

    embeddings, documents = (
        load_tables(spark, sf_dir, "embeddings"),
        load_tables(spark, sf_dir, "documents"),
    )
    clusters = kmeans_assign(embeddings, k=8, n_iterations=2)
    quality = documents.select("doc_id", quality_score("text").alias("quality"))
    return cluster_cap_sample(clusters, quality, per_cluster=40)


# --- ds14: length-bucketed batch assembly ---------------------------------
# Deterministic trainer-side batching: docs bucket by token-length bin,
# shard by doc_id mod 16 (the scale story: per-(bucket, shard) windows —
# a batch assembler must NEVER need a global sort; one shard's ordering
# is one task), batches of 16 fill in doc_id order, and each batch pads
# to its own max length. The report prices that padding: per bucket,
# padded_tokens vs real tokens. Every assignment is a pure function of
# (doc_id, n_tokens), so the oracle replays row-level batch membership
# and the exact integer padding arithmetic.
_DS14_TOKS = "list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '')"
_DS14_BATCH = 16
_DS14_BOUNDS = (16, 32, 64, 128, 256)
_DS14_BUCKET_SQL = (
    "CASE "
    + " ".join(
        f"WHEN n < {b} THEN {0 if i == 0 else _DS14_BOUNDS[i - 1]}"
        for i, b in enumerate(_DS14_BOUNDS)
    )
    + f" ELSE {_DS14_BOUNDS[-1]} END"
)


@query(
    "ds14_length_bucket_batches",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, len({_DS14_TOKS}) AS n FROM documents
    ), nz AS (
      SELECT doc_id, n, {_DS14_BUCKET_SQL} AS bucket, doc_id % 16 AS shard
      FROM toks WHERE n >= 1
    ), rk AS (
      SELECT *, row_number() OVER (PARTITION BY bucket, shard
                                   ORDER BY doc_id) AS rn
      FROM nz
    ), pb AS (
      SELECT bucket, shard, (rn - 1) // {_DS14_BATCH} AS batch,
             count(*) AS cnt, max(n) AS mx, sum(n) AS sm
      FROM rk GROUP BY bucket, shard, batch
    )
    SELECT bucket,
           CAST(sum(cnt) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_batches,
           CAST(sum(sm) AS BIGINT) AS total_tokens,
           CAST(sum(mx * cnt) AS BIGINT) AS padded_tokens,
           CAST(sum(mx * cnt) AS BIGINT) / CAST(sum(sm) AS BIGINT)
             AS pad_overhead
    FROM pb GROUP BY bucket
    """,
    tags=("datasets", "batching"),
)
def ds14_length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assembly with padding-waste pricing — the
    trainer-side step after packing/sampling: bucket docs by
    token-length bin (CASE literals, not floor(log2(·)) — float log at
    power-of-two boundaries is engine-dependent), assemble batches of
    16 in doc_id order within (bucket, shard=doc_id%16), pad each batch
    to its own max. Per-bucket padded-vs-real token accounting shows
    what bucketing saves over naive global padding. The shard key keeps
    every window task-local (no global sort anywhere — the kmv
    two-phase lesson applied to batching); integer DIV batch indexing
    replays exactly in both engines."""
    from fhir_etl_spark.operators.text import tokens

    documents = load_tables(spark, sf_dir, "documents")
    toks = documents.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n")
    ).where(F.col("n") >= 1)
    bucket = (
        F.when(F.col("n") < 16, F.lit(0))
        .when(F.col("n") < 32, F.lit(16))
        .when(F.col("n") < 64, F.lit(32))
        .when(F.col("n") < 128, F.lit(64))
        .when(F.col("n") < 256, F.lit(128))
        .otherwise(F.lit(256))
    )
    nz = toks.select(
        "doc_id", "n", bucket.alias("bucket"), F.pmod("doc_id", F.lit(16)).alias("shard")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("bucket", "shard").orderBy("doc_id")
    rk = nz.withColumn("rn", F.row_number().over(w))
    pb = (
        rk.withColumn("batch", F.expr(f"(rn - 1) DIV {_DS14_BATCH}"))
        .groupBy("bucket", "shard", "batch")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max("n").alias("mx"),
            F.sum("n").alias("sm"),
        )
    )
    return pb.groupBy("bucket").agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_batches"),
        F.sum("sm").cast("long").alias("total_tokens"),
        F.sum(F.col("mx") * F.col("cnt")).cast("long").alias("padded_tokens"),
        (
            F.sum(F.col("mx") * F.col("cnt")).cast("long")
            / F.sum("sm").cast("long")
        ).alias("pad_overhead"),
    )
