"""Similarity-search inventory over the `embeddings` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_etl_spark.operators.similarity import cosine_topk, lsh_topk
from fhir_etl_spark.queries.registry import query
from fhir_etl_spark.session import load_tables

# Fixed probe vectors: the corpus rows with these ids act as queries
# (deterministic, present at every SF since ids are dense from 0).
_QUERY_IDS = (1, 2, 3)


@query(
    "v1_cosine_topk",
    oracle=f"""
    SELECT query_id, vec_id, sim, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                          CAST(q.embedding AS DOUBLE[])), 6) AS sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                                     CAST(q.embedding AS DOUBLE[])), 6) DESC,
                        c.vec_id) AS rank
      FROM embeddings c
      CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                  WHERE vec_id IN {_QUERY_IDS}) q
    ) WHERE rank <= 5
    """,
    tags=("similarity",),
)
def v1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for three probe vectors. Similarity
    is rounded before ranking (tie-break vec_id) so Spark and DuckDB rank
    identically despite float-sum ordering."""
    embeddings = load_tables(spark, sf_dir, "embeddings")
    queries = embeddings.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # dim=64 unrolls the per-pair dot into codegen (bit-identical sums —
    # _sum_chain matches the fold's association order exactly)
    return cosine_topk(embeddings, queries, k=5, dim=64)


@query(
    "v9_int8_quantized_ann",
    oracle=f"""
    WITH g AS MATERIALIZED (
      SELECT 127.0 / max(list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                                 x -> abs(x)))) AS s
      FROM embeddings
    ), c8 AS MATERIALIZED (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * g.s + 0.5) AS BIGINT)) AS q
      FROM embeddings, g
    ), q8 AS (
      SELECT vec_id AS query_id, q FROM c8 WHERE vec_id IN {_QUERY_IDS}
    ), scored AS (
      SELECT q8.query_id, c8.vec_id,
             CAST(list_dot_product(CAST(c8.q AS DOUBLE[]),
                                   CAST(q8.q AS DOUBLE[])) AS BIGINT) AS int_dot
      FROM c8 CROSS JOIN q8
    )
    SELECT query_id, vec_id, int_dot, rank FROM (
      SELECT scored.*,
             row_number() OVER (
               PARTITION BY query_id ORDER BY int_dot DESC, vec_id
             ) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    tags=("similarity", "quantization"),
)
def v9_int8_quantized_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 addition: int8 scalar-quantized brute-force ANN — the
    memory-bandwidth-optimized tier of similarity search (FAISS-SQ8
    style: one global absmax scale, integer dot products, 4× fewer
    bytes through scan/shuffle than float32). Fully integer ranking, so
    the oracle replays it with zero rounding steps; see
    operators/similarity.int8_topk for why the scale is global."""
    from fhir_etl_spark.operators.similarity import int8_topk

    embeddings = load_tables(spark, sf_dir, "embeddings")
    queries = embeddings.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return int8_topk(embeddings, queries, k=5, dim=64)


@query(
    "v3_embedding_neardup",
    oracle="""
    SELECT a.vec_id AS a, b.vec_id AS b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 300 AND b.vec_id < 300
      AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6) >= 0.55
    """,
    tags=("similarity", "dedup"),
)
def v3_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs over a bounded id slice (the oracle
    is the O(n²) ground truth; the corpus-scale path runs the same operator
    inside LSH buckets)."""
    from fhir_etl_spark.operators.similarity import embedding_neardup_pairs

    embeddings = load_tables(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    return embedding_neardup_pairs(embeddings, threshold=0.55)


# --- v4 oracle: IVF probe replayed in DuckDB ------------------------------
# Every stage of ivf_topk is deterministic: centroids are the first 16
# corpus rows by id (normalized), assignment is argmax of the ROUNDED
# normalized dot (ties → larger list_id, mirroring the reverse-struct-sort
# in operators/similarity.nearest_lists), queries probe their 2 best lists.
# All of it is list math DuckDB replays; similarity rounds to 6 decimals
# before every comparison so float summation-order skew (~1e-15) cannot
# reorder either engine. Recall < 1 by design — but the RESULT is exact.
_V4_ORACLE = f"""
    WITH cent AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id,
             CAST(embedding AS DOUBLE[]) AS cvec
      FROM embeddings ORDER BY vec_id LIMIT 16
    ), ncent AS (
      SELECT list_id,
             list_transform(cvec, x -> x / (CASE WHEN sqrt(list_sum(list_transform(cvec, y -> y * y))) = 0.0
                                            THEN 1.0 ELSE sqrt(list_sum(list_transform(cvec, y -> y * y))) END)) AS ncvec
      FROM cent
    ), corpus_sims AS (
      SELECT e.vec_id, e.embedding, n.list_id,
             round(list_dot_product(CAST(e.embedding AS DOUBLE[]), n.ncvec), 6) AS csim
      FROM embeddings e CROSS JOIN ncent n
    ), assigned AS (
      SELECT vec_id, embedding, list_id AS _list FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY csim DESC, list_id DESC) AS rn
        FROM corpus_sims
      ) WHERE rn = 1
    ), probed AS (
      SELECT vec_id AS query_id, embedding AS qvec, list_id AS _list FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY csim DESC, list_id DESC) AS rn
        FROM corpus_sims WHERE vec_id IN {_QUERY_IDS}
      ) WHERE rn <= 2
    ), scored AS (
      SELECT p.query_id, a.vec_id,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(p.qvec AS DOUBLE[])), 6) AS sim
      FROM assigned a JOIN probed p ON a._list = p._list
    )
    SELECT query_id, vec_id, sim, rank FROM (
      SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """


@query("v4_ivf_topk", oracle=_V4_ORACLE, tags=("similarity", "approx"))
def v4_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-5. Recall < 1 by design, but centroid
    pick, assignment, and probing are all deterministic rounded math, so
    the oracle replays them exactly (see _V4_ORACLE); tests additionally
    pin self-match and probe behavior."""
    from fhir_etl_spark.operators.similarity import ivf_topk

    embeddings = load_tables(spark, sf_dir, "embeddings")
    queries = embeddings.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(embeddings, queries, k=5)


# --- v2 oracle: hyperplane signatures replayed in DuckDB ------------------
# The LSH signature is deterministic math, not a black-box hash: bit i is
# sign(vec · plane_i) with the planes seeded literals (random_hyperplanes
# seed=42). DuckDB replays the same dot products with list_dot_product over
# the same literal plane arrays, so bucket membership — and therefore the
# approximate result set — is value-oracled end to end. repr() round-trips
# each plane coefficient exactly; a sign flip would need |dot| below float
# summation-order skew (~1e-15 against O(1) magnitudes) — verified across
# all three SFs by tools/vanilla_sweep.py.
def _v2_oracle() -> str:
    from fhir_etl_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(dim=64, n_planes=8, seed=42)
    bits = " + ".join(
        "(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), [{lits}]) >= 0.0"
        " THEN {pow} ELSE 0 END)".format(
            lits=", ".join(repr(x) for x in plane), pow=1 << i
        )
        for i, plane in enumerate(planes)
    )
    return f"""
    WITH sigs AS (
      SELECT vec_id, embedding, ({bits}) AS sig FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, embedding AS qvec, sig
      FROM sigs WHERE vec_id IN {_QUERY_IDS}
    ), scored AS (
      SELECT q.query_id, c.vec_id,
             round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                          CAST(q.qvec AS DOUBLE[])), 6) AS sim
      FROM sigs c JOIN q ON c.sig = q.sig
    )
    SELECT query_id, vec_id, sim, rank FROM (
      SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """


# --- v5 oracle: banded-LSH near-dup pairs replayed in DuckDB --------------
# Same signature-replay trick as _v2_oracle, once per band (independent
# plane sets, seeds 42+b): candidates are exactly the (band, sig)-equal
# bucket mates, scored with rounded cosine, distinct across bands.
def _v5_oracle(n_planes: int = 6, n_bands: int = 4, seed: int = 42,
               threshold: float = 0.4) -> str:
    from fhir_etl_spark.operators.similarity import random_hyperplanes

    def sig_expr(planes: list[list[float]]) -> str:
        return " + ".join(
            "(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), [{lits}]) >= 0.0"
            " THEN {pow} ELSE 0 END)".format(
                lits=", ".join(repr(x) for x in plane), pow=1 << i
            )
            for i, plane in enumerate(planes)
        )

    banded = "\n      UNION ALL ".join(
        f"SELECT vec_id, embedding, {b} AS band,"
        f" ({sig_expr(random_hyperplanes(64, n_planes, seed + b))}) AS sig"
        " FROM embeddings"
        for b in range(n_bands)
    )
    return f"""
    WITH banded AS (
      {banded}
    )
    SELECT DISTINCT x.vec_id AS a, y.vec_id AS b,
           round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                        CAST(y.embedding AS DOUBLE[])), 6) AS sim
    FROM banded x JOIN banded y
      ON x.band = y.band AND x.sig = y.sig AND x.vec_id < y.vec_id
    WHERE round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                       CAST(y.embedding AS DOUBLE[])), 6) >= {threshold}
    """


@query("v5_lsh_bucketed_neardup", oracle=_v5_oracle(), tags=("similarity", "dedup"))
def v5_lsh_bucketed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale embedding near-dup: banded hyperplane LSH buckets the
    corpus (4 independent 6-plane bands), brute-force cosine runs only
    inside (band, signature)-equal buckets. The synthetic embeddings have
    no planted near-dups, so the threshold (0.4) sits in the occupied
    tail of the sim distribution; recall-vs-brute-force on PLANTED dups
    is pinned by tests/test_scale_paths.py."""
    from fhir_etl_spark.operators.similarity import lsh_bucketed_neardup

    embeddings = load_tables(spark, sf_dir, "embeddings")
    return lsh_bucketed_neardup(
        embeddings, threshold=0.4, n_planes=6, n_bands=4, dim=64
    )


@query("v2_lsh_topk", oracle=_v2_oracle(), tags=("similarity", "approx"))
def v2_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed approximate top-5. Recall < 1 by design,
    but the RESULT is deterministic (seeded literal planes), so the oracle
    replays the signature math in DuckDB (see _v2_oracle); tests assert
    the self-match and bucket behavior."""
    embeddings = load_tables(spark, sf_dir, "embeddings")
    queries = embeddings.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(embeddings, queries, k=5, dim=64)


@query(
    "v6_knn_classify",
    oracle="""
    WITH neigh AS (
      SELECT query_id, vec_id, label, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id, c.label,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                                       CAST(q.embedding AS DOUBLE[])), 6) DESC,
                          c.vec_id) AS rank
        FROM embeddings c
        CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20) q
        WHERE c.vec_id >= 20
      ) WHERE rank <= 5
    ), votes AS (
      SELECT query_id, label, count(*) AS votes FROM neigh GROUP BY query_id, label
    ), winner AS (
      SELECT query_id, label AS pred_label, CAST(votes AS BIGINT) AS votes FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY votes DESC, label) AS rn
        FROM votes
      ) WHERE rn = 1
    )
    SELECT w.query_id, w.pred_label, w.votes, e.label AS true_label
    FROM winner w JOIN embeddings e ON w.query_id = e.vec_id
    """,
    tags=("similarity", "ml"),
)
def v6_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN classification over the embedding column: 20 held-out
    query vectors, each labeled by the majority vote of its 5 nearest
    corpus neighbors (rounded cosine; ties → lower vec_id, then lower
    label — fully deterministic, so the vote is value-oracle-able).

    Composition: cosine_topk (queries broadcast, corpus never shuffles)
    → neighbor→label join → per-query vote agg → one-row-per-query
    window pick → label join back. The corpus-scale variant swaps
    cosine_topk for ivf_topk/lsh_topk with the same downstream vote —
    the voting pipeline is score-source-agnostic."""
    from pyspark.sql import Window

    from fhir_etl_spark.operators.similarity import cosine_topk

    embeddings = load_tables(spark, sf_dir, "embeddings")
    queries = embeddings.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = embeddings.filter(F.col("vec_id") >= 20)
    neigh = cosine_topk(corpus, queries, k=5).join(
        corpus.select("vec_id", "label"), "vec_id"
    )
    votes = neigh.groupBy("query_id", "label").agg(
        F.count("*").cast("long").alias("votes")
    )
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("label"))
    )
    winner = (
        votes.withColumn("_rn", rn)
        .filter(F.col("_rn") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "votes")
    )
    truth = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    # broadcast the BOUNDED side (≤ n_queries rows); truth scales with the
    # corpus and must stay streamable
    return truth.join(F.broadcast(winner), "query_id").select(
        "query_id", "pred_label", "votes", "true_label"
    )


_V7_ORACLE = """
    WITH corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cent0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v AS cv
      FROM (SELECT * FROM corpus ORDER BY vec_id LIMIT 8)
    ), d1 AS (
      SELECT vec_id, v, c,
             round(list_sum(list_transform(generate_series(1, len(v)),
                   i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 6) AS d
      FROM corpus CROSS JOIN cent0
    ), a1 AS (
      SELECT vec_id, v, c FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
        FROM d1) WHERE rn = 1
    ), m1 AS (
      SELECT c, i, round(avg(v[i]), 4) AS m
      FROM a1, unnest(generate_series(1, len(v))) AS g(i)
      GROUP BY c, i
    ), cent1 AS (
      SELECT c, list(m ORDER BY i) AS cv FROM m1 GROUP BY c
    ), d2 AS (
      SELECT vec_id, c,
             round(list_sum(list_transform(generate_series(1, len(v)),
                   i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 6) AS d
      FROM corpus CROSS JOIN cent1
    )
    SELECT vec_id, c AS cluster_id, d AS dist_r FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
      FROM d2) WHERE rn = 1
    """


@query("v7_kmeans_assign", oracle=_V7_ORACLE, tags=("similarity", "ml", "clustering"))
def v7_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 2-iteration Lloyd's k-means (k=8) over the embedding
    corpus — the clustering pass behind SemDeDup-style curation. Every
    stage (first-k init, rounded-distance argmin with lower-cluster
    tie-break, rounded centroid means) is replayed by the DuckDB oracle
    CTE chain; see operators/similarity.kmeans_assign for the scale
    shape (broadcast centroids, corpus never shuffles for scoring)."""
    from fhir_etl_spark.operators.similarity import kmeans_assign

    embeddings = load_tables(spark, sf_dir, "embeddings")
    return kmeans_assign(embeddings, k=8, n_iterations=2)


# --- v8 oracle: SemDeDup replayed in DuckDB --------------------------------
# Reuses the v7 Lloyd's chain (identical CTEs — same init, same rounded
# argmin/means), then replays the SemDeDup prune: keep-priority rank
# (dist DESC, id) per cluster, drop any member whose 6-dp-rounded cosine
# to a HIGHER-priority cluster-mate reaches the threshold. The cap path
# (max_cluster_size) is answer-identical at these SFs (largest cluster
# ≪ cap), so the oracle omits it.
_V8_ORACLE = """
    WITH corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cent0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v AS cv
      FROM (SELECT * FROM corpus ORDER BY vec_id LIMIT 8)
    ), d1 AS (
      SELECT vec_id, v, c,
             round(list_sum(list_transform(generate_series(1, len(v)),
                   i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 6) AS d
      FROM corpus CROSS JOIN cent0
    ), a1 AS (
      SELECT vec_id, v, c FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
        FROM d1) WHERE rn = 1
    ), m1 AS (
      SELECT c, i, round(avg(v[i]), 4) AS m
      FROM a1, unnest(generate_series(1, len(v))) AS g(i)
      GROUP BY c, i
    ), cent1 AS (
      SELECT c, list(m ORDER BY i) AS cv FROM m1 GROUP BY c
    ), d2 AS (
      SELECT vec_id, c,
             round(list_sum(list_transform(generate_series(1, len(v)),
                   i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 6) AS d
      FROM corpus CROSS JOIN cent1
    ), assign AS (
      SELECT vec_id, c AS cluster_id, d FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
        FROM d2) WHERE rn = 1
    ), pri AS (
      SELECT vec_id, cluster_id, d,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY d DESC, vec_id) AS rk
      FROM assign
    ), nv AS (
      SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      FROM corpus
    ), drops AS (
      SELECT DISTINCT px.vec_id
      FROM pri px
      JOIN pri py ON px.cluster_id = py.cluster_id AND py.rk < px.rk
      JOIN nv vx ON vx.vec_id = px.vec_id
      JOIN nv vy ON vy.vec_id = py.vec_id
      WHERE round(list_sum(list_transform(generate_series(1, len(vx.v)),
                    i -> vx.v[i] * vy.v[i])) / (vx.nrm * vy.nrm), 6) >= 0.35
    )
    SELECT p.vec_id, p.cluster_id, p.d AS dist_r,
           (dr.vec_id IS NULL) AS kept
    FROM pri p LEFT JOIN drops dr ON dr.vec_id = p.vec_id
    """


# v8b oracle: the v8 replay with (a) k derived from the corpus
# (LIMIT-subquery) and (b) the TRAINING round's assign/update running
# over the first-S-by-id SAMPLE while the final assignment scores the
# full corpus — exactly kmeans_assign(train_rows=S).
_V8B_ORACLE = (
    _V8_ORACLE.replace(
        "LIMIT 8",
        "LIMIT (SELECT greatest(8, count(*) // 200) FROM corpus)",
    )
    .replace(
        "), d1 AS (",
        """), samp AS (
      SELECT * FROM corpus ORDER BY vec_id
      LIMIT (SELECT least(count(*), 40 * greatest(8, count(*) // 200))
             FROM corpus)
    ), d1 AS (""",
    )
    .replace("FROM corpus CROSS JOIN cent0", "FROM samp CROSS JOIN cent0")
)


@query(
    "v8b_semdedup_scaled_k",
    oracle=_V8B_ORACLE,
    tags=("similarity", "dedup", "ml", "scale"),
)
def v8b_semdedup_scaled_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the DEPLOYMENT k-means policy — the fix for the
    round-9 sf10 finding (v8's pinned k=8 pushed all clustering into
    the re-split recursion at 100×: 546 s, BENCH_sf10_r09.json):

    - k = max(8, n // 200): cluster count grows with the corpus so
      cluster sizes stay ~200 and the within-cluster pair scan stays
      Σc² ≈ 200·n — linear;
    - train_rows = min(n, 40·k): Lloyd's update rounds average over a
      bounded first-by-id sample (the FAISS train-on-sample
      convention), so training costs O(k·d) per SAMPLE row and the
      full corpus is scored exactly once, in the final assignment.

    Same operator, same end-to-end DuckDB replay — the oracle derives
    k and the sample size from the corpus itself (LIMIT subqueries)
    and runs the update round over the sample CTE, so BOTH policies
    are value-checked at every SF (at sf0.01, n=500 → k=8, S=320: the
    sampled path is already exercised, not just the degenerate
    S=n case). The two n-counts are one bounded action each."""
    from fhir_etl_spark.operators.similarity import (
        semdedup_keep,
        semdedup_scaled_params,
    )

    embeddings = load_tables(spark, sf_dir, "embeddings")
    n = embeddings.count()
    k, train_rows = semdedup_scaled_params(n)
    return semdedup_keep(
        embeddings, k=k, n_iterations=2, threshold=0.35,
        train_rows=train_rows, dim=64,
    )


@query("v8_semdedup", oracle=_V8_ORACLE, tags=("similarity", "dedup", "ml"))
def v8_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) end to end — the FIXED-k PRICED
    REFERENCE, not the deployment path (VERDICT r10 #5): **reach for
    v8b_semdedup_scaled_k instead** — same operator, same oracle
    method, but k-means sized by semdedup_scaled_params so the pair
    scan stays linear (pinned k=8 measured 546 s at sf10-shape where
    v8b runs 21.7 s; v8 is kept as the honestly-priced fixed-shape
    baseline the scale docs cite). Pipeline: deterministic k-means
    clustering (the v7 pass) → per-cluster keep-priority ranking
    (farthest-from-centroid first) → within-cluster cosine prune at
    τ=0.35. The oracle replays every stage — clustering, ranking, the
    ordered-scan drop rule — so a wrong cluster, a flipped priority, or
    a mis-rounded cosine all hash-mismatch. See
    operators/similarity.semdedup_keep for the Σc²-not-n² scale shape."""
    from fhir_etl_spark.operators.similarity import semdedup_keep

    embeddings = load_tables(spark, sf_dir, "embeddings")
    return semdedup_keep(embeddings, k=8, n_iterations=2, threshold=0.35)


# --- v10 oracle: greedy MMR replay, one CTE block per selection round ----
# Every round references the previous selected/remaining sets twice —
# MATERIALIZED throughout (the chained-CTE inlining lesson).
_V10_ROUNDS = "".join(
    f""", w{i} AS MATERIALIZED (
      SELECT r.query_id, r.vec_id,
             max(round(list_cosine_similarity(r.emb, s.emb), 6)) AS pen
      FROM r{i - 1} r JOIN s{i - 1} s ON s.query_id = r.query_id
      GROUP BY r.query_id, r.vec_id
    ), k{i} AS MATERIALIZED (
      SELECT c.query_id, c.vec_id, c.sim, c.emb, {i} AS mmr_rank
      FROM (
        SELECT w.query_id, w.vec_id,
               row_number() OVER (PARTITION BY w.query_id
                                  ORDER BY 0.5 * c2.sim - 0.5 * w.pen DESC,
                                           w.vec_id) AS rn
        FROM w{i} w JOIN cand c2
          ON c2.query_id = w.query_id AND c2.vec_id = w.vec_id
      ) t JOIN cand c ON c.query_id = t.query_id AND c.vec_id = t.vec_id
      WHERE t.rn = 1
    ), s{i} AS MATERIALIZED (
      SELECT * FROM s{i - 1} UNION ALL SELECT * FROM k{i}
    ), r{i} AS MATERIALIZED (
      SELECT r.* FROM r{i - 1} r
      LEFT JOIN k{i} x ON x.query_id = r.query_id AND x.vec_id = r.vec_id
      WHERE x.vec_id IS NULL
    )"""
    for i in range(2, 6)
)
_V10_ORACLE = f"""
    WITH cand AS MATERIALIZED (
      SELECT query_id, vec_id, sim, emb FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                            CAST(q.embedding AS DOUBLE[])), 6) AS sim,
               CAST(c.embedding AS DOUBLE[]) AS emb,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                                       CAST(q.embedding AS DOUBLE[])), 6) DESC,
                          c.vec_id) AS rank
        FROM embeddings c
        CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                    WHERE vec_id IN {_QUERY_IDS}) q
      ) WHERE rank <= 20
    ), s1 AS MATERIALIZED (
      SELECT query_id, vec_id, sim, emb, 1 AS mmr_rank FROM (
        SELECT cand.*,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, vec_id) AS rn
        FROM cand
      ) WHERE rn = 1
    ), r1 AS MATERIALIZED (
      SELECT c.* FROM cand c
      LEFT JOIN s1 s ON s.query_id = c.query_id AND s.vec_id = c.vec_id
      WHERE s.vec_id IS NULL
    ){_V10_ROUNDS}
    SELECT query_id, vec_id, sim, mmr_rank FROM s5
    """


@query("v10_mmr_rerank", oracle=_V10_ORACLE, tags=("similarity", "iterative"))
def v10_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance top-5 over a 20-candidate cosine pool
    for the three probe vectors: greedy relevance-minus-redundancy
    selection (lam = 0.5), the retrieval-side diversity twin of v8's
    SemDeDup prune. Dyadic lam + the v1 rounded-cosine construction
    keep every greedy score engine-exact; the oracle replays all four
    selection rounds. See operators/similarity.mmr_rerank for the
    bounded-candidate scale shape."""
    from fhir_etl_spark.operators.similarity import mmr_rerank

    embeddings = load_tables(spark, sf_dir, "embeddings")
    queries = embeddings.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return mmr_rerank(embeddings, queries, k=5, n_candidates=20, lam=0.5, dim=64)


# --- v11 oracle: PQ retrained + ADC-scanned entirely in DuckDB ---------------
# Distances use the EXPANDED micro-L2² (‖a‖² − 2·a·w + ‖w‖², each sum
# left-to-right) — the exact formula the Spark side computes (see
# operators/similarity._pq_micro_dist_lit for why the direct form blew
# Janino's method limit); keeping the formula identical keeps the
# cross-engine noise ~1e-13 against the 1e-6 rounding quantum.
# Replays pq_train_encode + pq_adc_topk end to end: the same first-16-by-id
# seed slices, two Lloyd's rounds per subspace with integer micro-distance
# argmins (ties → lower code), 4-dp centroid means, then the per-query
# LUT and the Σ_s LUT[s][code_s] BIGINT scan. AS MATERIALIZED on every
# reused CTE (cent1 feeds both the final assignment and the LUT; DuckDB
# would otherwise inline the whole training chain once per consumer).
_V11_ORACLE = f"""
    WITH corpus AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), subs AS MATERIALIZED (
      SELECT vec_id, s, v[16 * s + 1 : 16 * (s + 1)] AS sv
      FROM corpus, unnest([0, 1, 2, 3]) AS u(s)
    ), seed AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v
      FROM (SELECT * FROM corpus ORDER BY vec_id LIMIT 16)
    ), cent0 AS MATERIALIZED (
      SELECT s, c, v[16 * s + 1 : 16 * (s + 1)] AS cv
      FROM seed, unnest([0, 1, 2, 3]) AS u(s)
    ), d1 AS (
      SELECT vec_id, s, sv, c,
             CAST(round((list_sum(list_transform(sv, x -> x * x))
                  - 2.0 * list_sum(list_transform(generate_series(1, 16),
                        i -> sv[i] * cv[i]))
                  + list_sum(list_transform(cv, x -> x * x))) * 1e6, 0)
                  AS BIGINT) AS dm
      FROM subs JOIN cent0 USING (s)
    ), a1 AS MATERIALIZED (
      SELECT vec_id, s, sv, c FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dm, c) AS rn
        FROM d1) WHERE rn = 1
    ), m1 AS (
      SELECT s, c, i, round(avg(sv[i]), 4) AS mu
      FROM a1, unnest(generate_series(1, 16)) AS g(i)
      GROUP BY s, c, i
    ), cent1 AS MATERIALIZED (
      SELECT s, c, list(mu ORDER BY i) AS cv FROM m1 GROUP BY s, c
    ), d2 AS (
      SELECT vec_id, s, c,
             CAST(round((list_sum(list_transform(sv, x -> x * x))
                  - 2.0 * list_sum(list_transform(generate_series(1, 16),
                        i -> sv[i] * cv[i]))
                  + list_sum(list_transform(cv, x -> x * x))) * 1e6, 0)
                  AS BIGINT) AS dm
      FROM subs JOIN cent1 USING (s)
    ), codes AS MATERIALIZED (
      SELECT vec_id, s, c FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dm, c) AS rn
        FROM d2) WHERE rn = 1
    ), q AS (
      SELECT vec_id AS query_id, v AS qv FROM corpus
      WHERE vec_id IN {_QUERY_IDS}
    ), lut AS MATERIALIZED (
      SELECT query_id, s, c,
             CAST(round((list_sum(list_transform(qv[16 * s + 1 : 16 * (s + 1)],
                        x -> x * x))
                  - 2.0 * list_sum(list_transform(generate_series(1, 16),
                        i -> qv[16 * s + i] * cv[i]))
                  + list_sum(list_transform(cv, x -> x * x))) * 1e6, 0)
                  AS BIGINT) AS ld
      FROM q CROSS JOIN cent1
    ), scored AS (
      SELECT query_id, vec_id, CAST(sum(ld) AS BIGINT) AS adc_micro
      FROM codes JOIN lut USING (s, c)
      GROUP BY query_id, vec_id
    )
    SELECT query_id, vec_id, adc_micro, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_micro, vec_id) AS rank
      FROM scored) WHERE rank <= 5
    """


@query("v11_pq_ann", oracle=_V11_ORACLE, tags=("similarity", "ml", "quantization"))
def v11_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011 / FAISS PQ): train
    m=4 × 16-codeword codebooks with the deterministic per-subspace
    Lloyd's recipe, encode the corpus to 4 bytes of code per vector
    (64× smaller than float32), then ADC top-5 for the three probe
    vectors via per-query integer lookup tables. Integer micro-
    distances end to end, so the oracle retrains the codebooks from
    scratch and matches bit-exactly. See operators/similarity
    pq_train_encode / pq_adc_topk for the 100 TB shape (codes scan is
    map-only; codebooks and LUTs always broadcast)."""
    from fhir_etl_spark.operators.ann_store import (
        corpus_fingerprint,
        load_or_train,
    )
    from fhir_etl_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train_encode,
    )

    embeddings = load_tables(spark, sf_dir, "embeddings")
    # Train-once/serve-forever: the deterministic Lloyd training runs
    # only when (corpus files, hyperparameters) have no persisted model;
    # a hit goes straight to the map-only encode (operators/ann_store).
    params = {"dim": 64, "m": 4, "sub_k": 16, "n_iterations": 2}
    codebook, _ = load_or_train(
        spark,
        "pq",
        corpus_fingerprint(f"{sf_dir}/embeddings.parquet"),
        params,
        lambda: (
            pq_train_encode(embeddings, **params)[1],
            None,
        ),
    )
    codes = pq_encode(embeddings, codebook, dim=64, m=4)
    queries = embeddings.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_adc_topk(codes, codebook, queries, k=5, m=4, sub_len=16)


# --- v12 oracle: IVF-PQ replayed end to end in DuckDB ------------------------
# Coarse assign (expanded micro-L2 argmin over the first-8-by-id coarse
# centroids), residuals, PQ codebook retraining ON residuals (the v11
# chain), encoding, per-query probe selection (2 nearest lists), per-list
# residual LUTs, and the pruned ADC scan — every distance the expanded
# ‖a‖² − 2·a·w + ‖w‖² micro form the Spark side computes.
_V12_ORACLE = f"""
    WITH corpus AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), coarse AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS l, v AS cv
      FROM (SELECT * FROM corpus ORDER BY vec_id LIMIT 8)
    ), fd AS (
      SELECT vec_id, l,
             CAST(round((list_sum(list_transform(v, x -> x * x))
                  - 2.0 * list_sum(list_transform(generate_series(1, 64),
                        i -> v[i] * cv[i]))
                  + list_sum(list_transform(cv, x -> x * x))) * 1e6, 0)
                  AS BIGINT) AS dm
      FROM corpus CROSS JOIN coarse
    ), fassign AS MATERIALIZED (
      SELECT vec_id, l FROM (
        SELECT vec_id, l, row_number() OVER (PARTITION BY vec_id
                                             ORDER BY dm, l) AS rn
        FROM fd) WHERE rn = 1
    ), resid AS MATERIALIZED (
      SELECT c.vec_id, a.l,
             list_transform(generate_series(1, 64), i -> c.v[i] - co.cv[i]) AS rv
      FROM corpus c JOIN fassign a USING (vec_id) JOIN coarse co ON co.l = a.l
    ), subs AS MATERIALIZED (
      SELECT vec_id, l, s, rv[16 * s + 1 : 16 * (s + 1)] AS sv
      FROM resid, unnest([0, 1, 2, 3]) AS u(s)
    ), seed AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, rv
      FROM (SELECT * FROM resid ORDER BY vec_id LIMIT 16)
    ), cent0 AS MATERIALIZED (
      SELECT s, c, rv[16 * s + 1 : 16 * (s + 1)] AS cv
      FROM seed, unnest([0, 1, 2, 3]) AS u(s)
    ), d1 AS (
      SELECT vec_id, s, sv, c,
             CAST(round((list_sum(list_transform(sv, x -> x * x))
                  - 2.0 * list_sum(list_transform(generate_series(1, 16),
                        i -> sv[i] * cv[i]))
                  + list_sum(list_transform(cv, x -> x * x))) * 1e6, 0)
                  AS BIGINT) AS dm
      FROM subs JOIN cent0 USING (s)
    ), a1 AS MATERIALIZED (
      SELECT vec_id, s, sv, c FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dm, c) AS rn
        FROM d1) WHERE rn = 1
    ), m1 AS (
      SELECT s, c, i, round(avg(sv[i]), 4) AS mu
      FROM a1, unnest(generate_series(1, 16)) AS g(i)
      GROUP BY s, c, i
    ), cent1 AS MATERIALIZED (
      SELECT s, c, list(mu ORDER BY i) AS cv FROM m1 GROUP BY s, c
    ), d2 AS (
      SELECT vec_id, l, s, c,
             CAST(round((list_sum(list_transform(sv, x -> x * x))
                  - 2.0 * list_sum(list_transform(generate_series(1, 16),
                        i -> sv[i] * cv[i]))
                  + list_sum(list_transform(cv, x -> x * x))) * 1e6, 0)
                  AS BIGINT) AS dm
      FROM subs JOIN cent1 USING (s)
    ), codes AS MATERIALIZED (
      SELECT vec_id, l, s, c FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dm, c) AS rn
        FROM d2) WHERE rn = 1
    ), q AS (
      SELECT vec_id AS query_id, v AS qv FROM corpus
      WHERE vec_id IN {_QUERY_IDS}
    ), qp AS MATERIALIZED (
      SELECT query_id, l, qv FROM (
        SELECT q.query_id, co.l, q.qv,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 CAST(round((list_sum(list_transform(q.qv, x -> x * x))
                      - 2.0 * list_sum(list_transform(generate_series(1, 64),
                            i -> q.qv[i] * co.cv[i]))
                      + list_sum(list_transform(co.cv, x -> x * x))) * 1e6, 0)
                      AS BIGINT), co.l) AS rn
        FROM q CROSS JOIN coarse co) WHERE rn <= 2
    ), qres AS MATERIALIZED (
      SELECT qp.query_id, qp.l,
             list_transform(generate_series(1, 64),
                            i -> qp.qv[i] - co.cv[i]) AS qr
      FROM qp JOIN coarse co ON co.l = qp.l
    ), lut AS MATERIALIZED (
      SELECT query_id, qres.l, s, c,
             CAST(round((list_sum(list_transform(qr[16 * s + 1 : 16 * (s + 1)],
                        x -> x * x))
                  - 2.0 * list_sum(list_transform(generate_series(1, 16),
                        i -> qr[16 * s + i] * cv[i]))
                  + list_sum(list_transform(cv, x -> x * x))) * 1e6, 0)
                  AS BIGINT) AS ld
      FROM qres CROSS JOIN cent1
    ), scored AS (
      SELECT lut.query_id, codes.vec_id, CAST(sum(ld) AS BIGINT) AS adc_micro
      FROM codes
      JOIN lut ON lut.l = codes.l AND lut.s = codes.s AND lut.c = codes.c
      GROUP BY lut.query_id, codes.vec_id
    )
    SELECT query_id, vec_id, adc_micro, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_micro, vec_id) AS rank
      FROM scored) WHERE rank <= 5
    """


@query("v12_ivfpq_ann", oracle=_V12_ORACLE, tags=("similarity", "ml", "quantization"))
def v12_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (Jégou et al. 2011 §IV / FAISS IVFPQ): 8 coarse lists,
    residual product quantization (m=4 × 16 codewords), 2-probe ADC
    top-5 for the three probe vectors — the composition of the v4 IVF
    prune and the v11 PQ compression that serves the billion-vector
    tier. Integer micro-distances end to end; the oracle replays coarse
    assignment, residuals, codebook retraining, probing, per-list LUTs,
    and the pruned scan. See operators/similarity.ivf_pq_build/_search
    for the 100 TB shape (map-only encode, the _list equi-join IS the
    inverted-index prune)."""
    from fhir_etl_spark.operators.ann_store import (
        corpus_fingerprint,
        load_or_train,
    )
    from fhir_etl_spark.operators.similarity import (
        ivf_pq_build,
        ivf_pq_encode,
        ivf_pq_search,
    )

    embeddings = load_tables(spark, sf_dir, "embeddings")
    # Train-once/serve-forever (the v11 pattern): a persisted
    # (coarse, codebook) model skips the Lloyd rounds; encode is the
    # map-only ivf_pq_encode either way.
    params = {"dim": 64, "n_list": 8, "m": 4, "sub_k": 16, "n_iterations": 2}
    codebook, coarse = load_or_train(
        spark,
        "ivfpq",
        corpus_fingerprint(f"{sf_dir}/embeddings.parquet"),
        params,
        lambda: (lambda built: (built[2], built[1]))(
            ivf_pq_build(embeddings, **params)
        ),
    )
    codes = ivf_pq_encode(embeddings, coarse, codebook, dim=64, m=4)
    queries = embeddings.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_pq_search(
        codes, coarse, codebook, queries, k=5, n_probe=2, m=4, sub_len=16
    )


def _v13_words_sql(vec: str) -> list[str]:
    """DuckDB twin of binary_sign_sketch_sql at dim=64: two 32-bit words
    (1-based list indexing, same strict > 0 sign test)."""
    out = []
    for w in range(2):
        terms = []
        for j in range(32):
            i = 32 * w + j + 1
            terms.append(
                f"(CASE WHEN {vec}[{i}] > 0 "
                f"THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END << {j})"
            )
        out.append(" + ".join(terms))
    return out


_V13_CW = _v13_words_sql("CAST(c.embedding AS DOUBLE[])")
_V13_QW = _v13_words_sql("CAST(q.embedding AS DOUBLE[])")

_V13_ORACLE = f"""
    SELECT query_id, vec_id, hamming, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             CAST(bit_count(xor({_V13_CW[0]}, {_V13_QW[0]}))
                + bit_count(xor({_V13_CW[1]}, {_V13_QW[1]})) AS BIGINT) AS hamming,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY bit_count(xor({_V13_CW[0]}, {_V13_QW[0]}))
                      + bit_count(xor({_V13_CW[1]}, {_V13_QW[1]})),
                        c.vec_id) AS rank
      FROM embeddings c
      CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                  WHERE vec_id IN {_QUERY_IDS}) q
    ) WHERE rank <= 5
    """


@query("v13_binary_ann", oracle=_V13_ORACLE, tags=("similarity", "quantization"))
def v13_binary_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit binary ANN: sign sketches packed into two 32-bit words
    (32× smaller than float32), Hamming top-5 via bit_count(xor) — the
    coarsest rung of the engine's quantization ladder (v9 int8, v11 PQ,
    v12 IVF-PQ), all-integer and bit-exactly oracled. See
    operators/similarity.binary_hamming_topk (and the 32-bit-word note:
    1<<63 wraps in Spark but RAISES in DuckDB)."""
    from fhir_etl_spark.operators.similarity import binary_hamming_topk

    embeddings = load_tables(spark, sf_dir, "embeddings")
    queries = embeddings.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return binary_hamming_topk(embeddings, queries, k=5, dim=64)


# --- v17: binary-prefilter → exact-cosine cascade -------------------------
_V17_CANDIDATES = 32

_V17_ORACLE = f"""
    WITH cand AS (
      SELECT query_id, vec_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY bit_count(xor({_V13_CW[0]}, {_V13_QW[0]}))
                        + bit_count(xor({_V13_CW[1]}, {_V13_QW[1]})),
                          c.vec_id) AS hrank
        FROM embeddings c
        CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                    WHERE vec_id IN {_QUERY_IDS}) q
      ) WHERE hrank <= {_V17_CANDIDATES}
    )
    SELECT query_id, vec_id, sim, rank FROM (
      SELECT cand.query_id, cand.vec_id,
             round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                          CAST(q.embedding AS DOUBLE[])), 6) AS sim,
             row_number() OVER (
               PARTITION BY cand.query_id
               ORDER BY round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                                     CAST(q.embedding AS DOUBLE[])), 6) DESC,
                        cand.vec_id) AS rank
      FROM cand
      JOIN embeddings c ON cand.vec_id = c.vec_id
      JOIN embeddings q ON cand.query_id = q.vec_id
    ) WHERE rank <= 5
    """


@query("v17_cascade_ann", oracle=_V17_ORACLE, tags=("similarity", "quantization"))
def v17_cascade_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deployment cascade composed from the ladder's ends: 1-bit
    Hamming prefilter (v13's sketch — the only full corpus scan, 32×
    compressed) to top-32 candidates, exact rounded-cosine re-rank
    (v1's float discipline) to top-5. Candidate fetch broadcasts the
    id list into a map-side join — the float corpus never shuffles and
    is never cross-joined (operators/similarity.cascade_hamming_cosine).
    The oracle replays both stages, so a recall regression in the
    binary stage OR a rounding drift in the re-rank value-mismatches."""
    from fhir_etl_spark.operators.similarity import cascade_hamming_cosine

    embeddings = load_tables(spark, sf_dir, "embeddings")
    queries = embeddings.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cascade_hamming_cosine(
        embeddings, queries, k=5, candidates=_V17_CANDIDATES, dim=64
    )


# --- v14: feature-hashing embeddings + cosine retrieval ------------------
# The zero-model embedding (Weinberger 2009 feature hashing / fastText
# sentence vectors without pretrained weights): hashed signed n-gram
# counts as array<long>, then integer dot / norm + ONE correctly-rounded
# float step for the cosine. The query vector is computed at module load
# by the PYTHON twin of operators/datasets.hash_bucket from a literal
# query string, and rides into BOTH engines as the same literal.
_V14_DIM = 64
_V14_SALT = "he1"
_V14_QUERY_TEXT = "spark table scan stream merge window sort"


def _v14_bucket_sign(gram: str, salt: str, dim: int) -> tuple[int, int]:
    """ONE md5 per gram (the r12 build-cost fix): bucket from digest hex
    1–8, sign from hex 9–16 — the exact twin of the operator's codegen."""
    import hashlib

    h = hashlib.md5((salt + gram).encode()).hexdigest()
    return int(h[:8], 16) % dim, (int(h[8:16], 16) % 2) * 2 - 1


def _v14_query_vec() -> list[int]:
    toks = _V14_QUERY_TEXT.split(" ")
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    q = [0] * _V14_DIM
    for g in grams:
        b, sign = _v14_bucket_sign(g, _V14_SALT, _V14_DIM)
        q[b] += sign
    return q


_V14_Q = _v14_query_vec()
_V14_Q2 = sum(v * v for v in _V14_Q)
_V14_Q_SQL = ", ".join(
    f"({i + 1}, {v})" for i, v in enumerate(_V14_Q) if v != 0
)


def _v14_oracle() -> str:
    from fhir_etl_spark.queries.text import _TOKS_SQL

    return f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    grams AS (
      SELECT doc_id,
             t || list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]) AS g
      FROM toks
    ), pairs AS (
      SELECT doc_id,
             1 + CAST(CAST('0x' || substr(h, 1, 8)
                 AS UBIGINT) % {_V14_DIM} AS INT) AS b,
             CAST(CAST('0x' || substr(h, 9, 8)
                 AS UBIGINT) % 2 AS BIGINT) * 2 - 1 AS s
      FROM (SELECT doc_id, md5('{_V14_SALT}' || gr) AS h
            FROM grams, unnest(g) AS u(gr))
    ), emb AS (
      SELECT doc_id, b, CAST(sum(s) AS BIGINT) AS v FROM pairs GROUP BY doc_id, b
    ), q(b, qv) AS (VALUES {_V14_Q_SQL}),
    scored AS (
      SELECT e.doc_id,
             CAST(coalesce(sum(e.v * q.qv), 0) AS BIGINT) AS dot,
             CAST(sum(e.v * e.v) AS BIGINT) AS l2sq
      FROM emb e LEFT JOIN q USING (b)
      GROUP BY e.doc_id
    )
    SELECT doc_id, dot, l2sq,
           dot / sqrt(CAST(l2sq * {_V14_Q2} AS DOUBLE)) AS cos
    FROM scored WHERE l2sq > 0
    ORDER BY cos DESC, doc_id LIMIT 10
    """


@query(
    "v14_hashed_embedding_topk",
    oracle=_v14_oracle(),
    tags=("similarity", "text", "embedding"),
)
def v14_hashed_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing embeddings + cosine retrieval — where embeddings
    COME FROM before a trained encoder exists (Weinberger 2009; the
    fastText sentence-vector construction): signed hashed 1+2-gram
    counts per document (r12 shape: one md5 per gram, ONE codegen
    hash-aggregation of dim conditional sums whose exchange is the
    embedding table itself — 50.5 → 9.7 s at sf10-shape; see
    operators/similarity.hashed_embedding for the two measured-and-
    rejected shapes), then integer dot/norms against a literal query
    vector and one correctly-rounded float step for the cosine (the t2
    single-division argument → bit-exact oracle). Top-10 via
    TakeOrderedAndProject. Composes with every v-tier consumer (v1
    brute force, v5 banding, v9 quantization) as the corpus bootstrap
    embedding."""
    from fhir_etl_spark.operators.similarity import (
        hashed_embedding,
        hashed_embedding_topk,
    )

    documents = load_tables(spark, sf_dir, "documents")
    emb = hashed_embedding(
        documents, dim=_V14_DIM, salt=_V14_SALT, max_n=2
    )
    return hashed_embedding_topk(emb, _V14_Q, k=10)


def _hashed_query_vec(
    text: str, dim: int = _V14_DIM, salt: str = _V14_SALT
) -> list[int]:
    """Python twin of operators/similarity.hashed_embedding for a literal
    query string (1+2-grams, signed md5 buckets) — the vector rides into
    BOTH engines as the same literal (the v14 pattern, generalized to
    any query text for v16's dense arm)."""
    toks = text.split(" ")
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    q = [0] * dim
    for g in grams:
        b, sign = _v14_bucket_sign(g, salt, dim)
        q[b] += sign
    return q


# --- v16 oracle: RRF hybrid fusion replayed in DuckDB ----------------------
# The sparse arm nests the full t23 BM25 replay as one CTE (the c2/c5
# stage-nesting pattern); the dense arm generalizes the v14 hashed-
# embedding chain to one (qid, bucket, value) VALUES table; fusion is
# two correctly-rounded divisions + one IEEE add per (query, doc) —
# bit-identical doubles — floored into integer nanos (floor(x+0.5), the
# int8_quantize half-up trick, because round() is half-even in DuckDB
# and half-up in Spark).
def _v16_oracle(pool: int = 20, k: int = 10, rrf_k: int = 60) -> str:
    from fhir_etl_spark.queries.text import (
        _T23_Q_SQL,
        _T23_QUERIES,
        _TOKS_SQL,
        _bm25_oracle_sql,
    )

    qv_rows, q2_rows = [], []
    for qid, qtext in _T23_QUERIES:
        vec = _hashed_query_vec(qtext)
        q2 = sum(v * v for v in vec)
        assert q2 > 0, f"v16: query {qid!r} hashed to a zero vector"
        q2_rows.append(f"({qid}, {q2})")
        qv_rows.extend(
            f"({qid}, {b + 1}, {v})" for b, v in enumerate(vec) if v != 0
        )
    return f"""
    WITH sparse AS MATERIALIZED ({_bm25_oracle_sql(_T23_Q_SQL, pool)}),
    dtoks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    grams AS (
      SELECT doc_id,
             t || list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]) AS g
      FROM dtoks
    ), pairs AS (
      SELECT doc_id,
             1 + CAST(CAST('0x' || substr(h, 1, 8)
                 AS UBIGINT) % {_V14_DIM} AS INT) AS b,
             CAST(CAST('0x' || substr(h, 9, 8)
                 AS UBIGINT) % 2 AS BIGINT) * 2 - 1 AS s
      FROM (SELECT doc_id, md5('{_V14_SALT}' || gr) AS h
            FROM grams, unnest(g) AS u(gr))
    ), emb AS (
      SELECT doc_id, b, CAST(sum(s) AS BIGINT) AS v FROM pairs GROUP BY doc_id, b
    ), l2 AS (
      SELECT doc_id, CAST(sum(v * v) AS BIGINT) AS l2sq FROM emb GROUP BY doc_id
    ), qv(qid, b, val) AS (VALUES {", ".join(qv_rows)}),
    q2(qid, q2) AS (VALUES {", ".join(q2_rows)}),
    dots AS (
      SELECT q.qid, e.doc_id, CAST(sum(e.v * q.val) AS BIGINT) AS dot
      FROM emb e JOIN qv q USING (b) GROUP BY q.qid, e.doc_id
    ), dense_scored AS (
      SELECT q2.qid, l2.doc_id,
             coalesce(d.dot, 0) / sqrt(CAST(l2.l2sq * q2.q2 AS DOUBLE)) AS cos
      FROM l2 CROSS JOIN q2
      LEFT JOIN dots d ON d.qid = q2.qid AND d.doc_id = l2.doc_id
      WHERE l2.l2sq > 0
    ), dense AS (
      SELECT qid AS query_id, doc_id, rnk AS dense_rank FROM (
        SELECT qid, doc_id,
               CAST(row_number() OVER (
                 PARTITION BY qid ORDER BY cos DESC, doc_id) AS INT) AS rnk
        FROM dense_scored
      ) WHERE rnk <= {pool}
    ), fused AS (
      SELECT coalesce(s.query_id, d.query_id) AS query_id,
             coalesce(s.doc_id, d.doc_id) AS doc_id,
             s.rank AS bm25_rank, d.dense_rank,
             CAST(floor((coalesce(CAST(1 AS DOUBLE) / ({rrf_k} + s.rank), 0)
                       + coalesce(CAST(1 AS DOUBLE) / ({rrf_k} + d.dense_rank), 0))
                        * 1e9 + 0.5) AS BIGINT) AS rrf_nano
      FROM sparse s FULL OUTER JOIN dense d
        ON s.query_id = d.query_id AND s.doc_id = d.doc_id
    )
    SELECT query_id, doc_id, bm25_rank, dense_rank, rrf_nano, fused_rank FROM (
      SELECT fused.*,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY rrf_nano DESC, doc_id) AS INT) AS fused_rank
      FROM fused
    ) WHERE fused_rank <= {k}
    """


@query(
    "v16_rrf_hybrid",
    oracle=_v16_oracle(),
    tags=("similarity", "retrieval", "text"),
)
def v16_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack 2009): the
    BM25 sparse arm (t23's inverted index, integer-micro scores) and the
    hashed-embedding dense arm (v14's zero-model vectors, one
    correctly-rounded cosine) each rank a pool of 20 per query; fusion
    scores ``Σ 1/(60 + rank)`` over the arms that retrieved the doc —
    the standard production answer to "lexical match OR semantic match
    should surface it". All three t23 query texts run both arms.

    Exactness: each RRF term is one correctly-rounded IEEE division and
    the sum one IEEE add — bit-identical doubles — floored to integer
    nanos (half-up floor, the engine-stable rounding). Scale shape: the
    sparse arm is t23's broadcast-postings scan; the dense arm is ONE
    map-only projection computing all query dots (the queries ride as
    codegen literals) + one rank-pool window (WindowGroupLimit); fusion
    joins two ≤ pool·|queries|-row sides — corpus text never shuffles."""
    from pyspark.sql import Window

    from fhir_etl_spark.operators.retrieval import bm25_index, bm25_topk
    from fhir_etl_spark.operators.similarity import hashed_embedding
    from fhir_etl_spark.queries.text import _T23_QUERIES

    pool, k, rrf_k = 20, 10, 60
    documents = load_tables(spark, sf_dir, "documents")

    postings, dfreq, stats = bm25_index(documents)
    queries = spark.createDataFrame(
        list(_T23_QUERIES), "query_id int, query string"
    )
    sparse = bm25_topk(postings, dfreq, stats, queries, k=pool).select(
        "query_id", "doc_id", F.col("rank").cast("int").alias("bm25_rank")
    )

    emb = hashed_embedding(documents, dim=_V14_DIM, salt=_V14_SALT, max_n=2)
    entries = []
    for qid, qtext in _T23_QUERIES:
        vec = _hashed_query_vec(qtext)
        dot = None
        for i, v in enumerate(vec):
            if v == 0:
                continue
            term = F.element_at("emb", i + 1) * F.lit(int(v)).cast("long")
            dot = term if dot is None else dot + term
        entries.append(
            F.struct(
                F.lit(qid).cast("int").alias("query_id"),
                dot.alias("dot"),
                F.lit(sum(v * v for v in vec)).cast("long").alias("q2"),
            )
        )
    l2sq = F.aggregate(
        F.col("emb"), F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )
    scored = (
        emb.select("doc_id", l2sq.alias("l2sq"), F.explode(F.array(*entries)).alias("s"))
        .filter(F.col("l2sq") > 0)
        .select(
            F.col("s.query_id").alias("query_id"),
            "doc_id",
            (
                F.col("s.dot")
                / F.sqrt((F.col("l2sq") * F.col("s.q2")).cast("double"))
            ).alias("cos"),
        )
    )
    wd = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("doc_id"))
    dense = (
        scored.withColumn("dense_rank", F.row_number().over(wd).cast("int"))
        .filter(F.col("dense_rank") <= pool)
        .select("query_id", "doc_id", "dense_rank")
    )

    fused = sparse.join(dense, ["query_id", "doc_id"], "full_outer")
    rrf = (
        F.coalesce(
            F.lit(1.0) / (F.col("bm25_rank") + F.lit(rrf_k)).cast("double"),
            F.lit(0.0),
        )
        + F.coalesce(
            F.lit(1.0) / (F.col("dense_rank") + F.lit(rrf_k)).cast("double"),
            F.lit(0.0),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_nano"), F.col("doc_id")
    )
    return (
        fused.withColumn(
            "rrf_nano", F.floor(rrf * F.lit(1e9) + F.lit(0.5)).cast("long")
        )
        .withColumn("fused_rank", F.row_number().over(wf).cast("int"))
        .filter(F.col("fused_rank") <= k)
        .select(
            "query_id", "doc_id", "bm25_rank", "dense_rank", "rrf_nano", "fused_rank"
        )
    )
