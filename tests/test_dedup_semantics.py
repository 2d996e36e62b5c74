"""Semantic assertions for the hash-dependent dedup/similarity operators
(the driver can only rows-check these — the recall/precision pins live here).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fhir_etl_spark.operators.dedup import (
    exact_dedup,
    hamming64,
    lsh_candidate_pairs,
    minhash_jaccard,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from fhir_etl_spark.operators.similarity import cosine_topk, lsh_topk


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill and the birds sing in the garden outside "
    "every single morning before the sun rises over the quiet hills"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact duplicate
        (3, BASE.replace("quick", "swift")),  # near-duplicate (1 token)
        (4, BASE.replace("morning", "evening").replace("cat", "dog")),  # near-dup
        (5, "completely different text about spark query engines and shuffles"),
        (6, "another unrelated document mentioning benchmarks and parquet files"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_semantics(docs):
    out = {r["doc_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert out[1] == 2  # doc 2 folded into doc 1 (min id representative)
    assert 2 not in out
    assert out[5] == 1


def test_minhash_lsh_finds_near_dups(docs):
    sigs = minhash_signatures(docs)
    pairs = lsh_candidate_pairs(sigs)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (1, 2) in got  # exact dup always collides
    assert (1, 3) in got or (1, 4) in got  # near-dups caught by banding
    assert (5, 6) not in got  # unrelated docs don't collide
    est = {
        (r["a"], r["b"]): r["jaccard_est"]
        for r in minhash_jaccard(sigs, pairs).collect()
    }
    assert est[(1, 2)] == 1.0


def test_ngram_jaccard_exact(docs):
    got = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs).collect()}
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got and 0.5 <= got[(1, 3)] < 1.0
    assert all(a != 5 and b != 5 for a, b in got)


def test_prefix_filter_equals_full_mine_on_synthetic(docs):
    """The prefix-filtered miner (AllPairs lemma) must return the EXACT
    pair set and values of the full posting-list mine — losslessness is
    the whole contract (c4/c5 route through it with unchanged oracles)."""
    from fhir_etl_spark.operators.dedup import ngram_jaccard_pairs_prefix

    full = {
        (r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs).collect()
    }
    pref = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs_prefix(docs).collect()
    }
    assert pref == full and (1, 2) in pref


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_prefix_filter_equals_full_mine_on_corpus(spark, sf_dir, threshold):
    """Corpus-level losslessness at several thresholds (the prefix length
    ⌈t·|A|⌉ arithmetic differs per threshold — an off-by-one in any of
    them drops a real pair here)."""
    from fhir_etl_spark.operators.dedup import ngram_jaccard_pairs_prefix
    from fhir_etl_spark.session import load_tables

    documents = load_tables(spark, sf_dir, "documents")
    full = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(documents, threshold=threshold).collect()
    }
    pref = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs_prefix(documents, threshold=threshold).collect()
    }
    assert pref == full
    assert len(full) > 0  # non-vacuous: the corpus has real near-dups


def test_ngram_jaccard_df_cap_preserves_recall(docs, sf_dir, spark):
    """The hot-shingle DF cap must not change the answer when the cap
    exceeds the corpus's max shingle document frequency — the default 1000
    vs the exact (None) run return identical pair sets on the synthetic
    documents table (max trigram DF is 25 at sf0.1)."""
    from fhir_etl_spark.session import load_tables

    real_docs = load_tables(spark, sf_dir, "documents")
    exact = {
        (r["a"], r["b"], r["jaccard"])
        for r in ngram_jaccard_pairs(real_docs, max_shingle_df=None).collect()
    }
    capped = {
        (r["a"], r["b"], r["jaccard"])
        for r in ngram_jaccard_pairs(real_docs).collect()
    }
    assert capped == exact and len(capped) > 0
    # an aggressive cap only ever REMOVES pairs (conservative under-count),
    # never invents them
    tight = {
        (r["a"], r["b"])
        for r in ngram_jaccard_pairs(real_docs, max_shingle_df=2).collect()
    }
    assert tight <= {(a, b) for a, b, _ in exact}


def test_simhash_distance(docs, spark):
    sh = simhash(docs)
    pairs = (
        sh.alias("x")
        .crossJoin(sh.alias("y"))
        .select(
            F.col("x.doc_id").alias("a"),
            F.col("y.doc_id").alias("b"),
            hamming64(F.col("x.simhash"), F.col("y.simhash")).alias("d"),
        )
        .collect()
    )
    dist = {(r["a"], r["b"]): r["d"] for r in pairs}
    assert dist[(1, 2)] == 0  # identical text → identical simhash
    assert dist[(1, 3)] < dist[(1, 5)]  # near-dup closer than unrelated


def test_lsh_topk_self_match(spark, sf_dir):
    from fhir_etl_spark.session import load_tables

    embeddings = load_tables(spark, sf_dir, "embeddings")
    queries = embeddings.filter(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = lsh_topk(embeddings, queries, k=3, dim=64).collect()
    assert approx[0]["vec_id"] == 7 and approx[0]["sim"] == 1.0
    exact = cosine_topk(embeddings, queries, k=3).collect()
    assert exact[0]["vec_id"] == 7  # brute force agrees on the self-match

def test_ivf_topk_self_match_and_recall(spark, sf_dir):
    from fhir_etl_spark.operators.similarity import cosine_topk, ivf_topk
    from fhir_etl_spark.session import load_tables

    embeddings = load_tables(spark, sf_dir, "embeddings")
    queries = embeddings.filter(F.col("vec_id").isin(1, 2, 3)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = ivf_topk(embeddings, queries, k=5).collect()
    by_query = {}
    for r in approx:
        by_query.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_query.items():
        assert rows[0]["vec_id"] == qid and rows[0]["sim"] == 1.0
    # probing its own list always finds the query vector itself
    assert set(by_query) == {1, 2, 3}


def test_int8_topk_matches_exact_dot_ranking(spark, sf_dir):
    """Round-8 v9: int8 quantization must (a) bound components to
    [-127, 127] with at least one component hitting ±127 (the absmax
    scale is tight), and (b) rank like the exact FLOAT dot product it
    approximates — int8_topk's metric is the raw dot (NOT cosine: under
    one global scale int_dot ∝ float_dot, while cosine divides by
    per-vector norms), so the apples-to-apples reference is the float
    dot ranking, where the only divergence quantization could cause is
    a sub-0.4%-of-scale tie flip; the corpus's neighbor margins are far
    wider."""
    import math

    from fhir_etl_spark.operators.similarity import int8_quantize, int8_topk
    from fhir_etl_spark.session import load_tables

    embeddings = load_tables(spark, sf_dir, "embeddings")
    q8 = int8_quantize(embeddings).select(
        F.array_max("q8").alias("mx"), F.array_min("q8").alias("mn")
    )
    agg = q8.agg(F.max("mx"), F.min("mn")).first()
    assert agg[0] <= 127 and agg[1] >= -127
    assert max(agg[0], -agg[1]) == 127  # tight absmax scale

    queries = embeddings.filter(F.col("vec_id").isin(1, 2, 3)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = int8_topk(embeddings, queries, k=3).collect()
    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append(r["vec_id"])
    assert set(by_query) == {1, 2, 3}

    # exact float-dot top-3 reference, computed driver-side
    corpus = {
        r["vec_id"]: r["embedding"] for r in embeddings.collect()
    }
    for qid in (1, 2, 3):
        qv = corpus[qid]
        dots = sorted(
            ((sum(a * b for a, b in zip(v, qv)), -i) for i, v in corpus.items()),
            reverse=True,
        )
        expect = [-n for _, n in dots[:3]]
        assert by_query[qid] == expect, (qid, by_query[qid], expect)
    assert math.isfinite(sum(corpus[1]))  # sanity on fixture decode


def test_banded_buckets_rejects_oversized_band_geometry(spark):
    """Round-8 guard: bands x rows_per_band beyond the signature width
    would slice EMPTY band arrays that hash identically for every doc —
    total false-collision, silently. Must raise loudly instead."""
    import pytest

    from fhir_etl_spark.operators.dedup import banded_buckets, minhash_signatures

    docs = spark.createDataFrame(
        [(1, "one two three four five six"), (2, "seven eight nine ten")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, num_hashes=16)
    with pytest.raises(Exception, match="need >= 32 hashes"):
        banded_buckets(sigs, bands=8, rows_per_band=4).collect()
    # exact fit is fine
    assert banded_buckets(sigs, bands=4, rows_per_band=4).count() == 8


def test_md5_twin_minhash_same_semantics(docs):
    """The md5-twin hash (the d4 oracle path) is the same estimator as the
    xxhash64 default: exact dups collide with jaccard_est 1.0, near-dups
    are caught by banding, unrelated docs stay apart."""
    sigs = minhash_signatures(docs, hash_fn="md5")
    pairs = lsh_candidate_pairs(sigs, hash_fn="md5")
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert (5, 6) not in got
    est = {
        (r["a"], r["b"]): r["jaccard_est"]
        for r in minhash_jaccard(sigs, pairs).collect()
    }
    assert est[(1, 2)] == 1.0


def test_md5_twin_simhash_distance(docs):
    """md5-twin SimHash (the d5 oracle path) preserves the distance
    ordering the xxhash64 default promises."""
    sh = simhash(docs, hash_fn="md5")
    dist = {
        (r["a"], r["b"]): r["d"]
        for r in sh.alias("x")
        .crossJoin(sh.alias("y"))
        .select(
            F.col("x.doc_id").alias("a"),
            F.col("y.doc_id").alias("b"),
            hamming64(F.col("x.simhash"), F.col("y.simhash")).alias("d"),
        )
        .collect()
    }
    assert dist[(1, 2)] == 0
    assert dist[(1, 3)] < dist[(1, 5)]


@pytest.fixture(scope="module")
def planted_corpus(spark):
    """200 16-dim vectors: 50 bases each with a high-cosine perturbed copy
    (planted near-dups), plus 100 unrelated vectors. Seeded → deterministic."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for _ in range(50):
        base = rng.normal(size=16)
        noise = rng.normal(size=16) * 0.05
        rows.append((vid, [float(x) for x in base]))
        rows.append((vid + 1, [float(x) for x in base + noise]))
        vid += 2
    for _ in range(100):
        rows.append((vid, [float(x) for x in rng.normal(size=16)]))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_lsh_bucketed_neardup_recall_vs_brute_force(planted_corpus):
    """The composed scale path (lsh_bucketed_neardup) must (a) return a
    SUBSET of the brute-force pairs — bucketing can only prune, never
    invent — and (b) recover most planted high-cosine pairs: per-band
    collision at cos 0.95 is (1 − θ/π)^8 ≈ 0.42, so 6 bands give
    1 − (1 − 0.42)^6 ≈ 0.96 expected recall."""
    from fhir_etl_spark.operators.similarity import (
        embedding_neardup_pairs,
        lsh_bucketed_neardup,
    )

    brute = {
        (r["a"], r["b"]): r["sim"]
        for r in embedding_neardup_pairs(planted_corpus, threshold=0.95).collect()
    }
    assert len(brute) >= 40  # the planted pairs are actually there
    bucketed = {
        (r["a"], r["b"]): r["sim"]
        for r in lsh_bucketed_neardup(
            planted_corpus, threshold=0.95, n_planes=8, n_bands=6, dim=16
        ).collect()
    }
    assert set(bucketed) <= set(brute)
    for pair, sim in bucketed.items():
        assert sim == brute[pair]  # identical rounded cosine per pair
    recall = len(bucketed) / len(brute)
    assert recall >= 0.7, f"recall {recall:.2f} below floor"


def test_lsh_bucketed_neardup_degenerate_bucket_guard(spark, planted_corpus):
    """Scale guard (VERDICT r04 #1): a planted cluster of identical
    embeddings lands every copy in the same (band, sig) bucket of every
    band; without a cap the self-join materializes d·(d−1)/2 pairs. With
    ``max_bucket_size`` below the cluster size the degenerate bucket is
    dropped entirely — pair counts stay bounded — while every cap ABOVE
    the corpus's true max bucket occupancy is answer-identical."""
    import numpy as np

    from fhir_etl_spark.operators.similarity import lsh_bucketed_neardup

    rng = np.random.default_rng(11)
    ident = [float(x) for x in rng.normal(size=16)]
    rows = [(i, ident) for i in range(300)]  # 300 identical → one bucket/band
    rows += [(300 + i, [float(x) for x in rng.normal(size=16)]) for i in range(50)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    capped = lsh_bucketed_neardup(
        corpus, threshold=0.9, n_planes=8, n_bands=4, dim=16, max_bucket_size=100
    ).collect()
    # 300·299/2 = 44,850 identical pairs would survive an uncapped run;
    # the capped run drops the degenerate bucket, so only pairs among the
    # 50 random vectors (and none of the identical cluster) can remain.
    capped_ids = {r["a"] for r in capped} | {r["b"] for r in capped}
    assert not any(i < 300 for i in capped_ids)
    assert len(capped) < 1000

    # Answer-identity for caps above the true max bucket occupancy:
    # the planted_corpus (200 vectors, no degenerate cluster) must give
    # bit-identical results with the guard on (cap=1000 default) and off.
    guarded = {
        (r["a"], r["b"], r["sim"])
        for r in lsh_bucketed_neardup(
            planted_corpus, threshold=0.95, n_planes=8, n_bands=6, dim=16
        ).collect()
    }
    unguarded = {
        (r["a"], r["b"], r["sim"])
        for r in lsh_bucketed_neardup(
            planted_corpus,
            threshold=0.95,
            n_planes=8,
            n_bands=6,
            dim=16,
            max_bucket_size=None,
        ).collect()
    }
    assert guarded == unguarded


def test_chunk_dedup_keeps_earliest_copy_only(spark):
    from fhir_etl_spark.operators.dedup import chunk_dedup

    shared = "one two three four five"  # exactly one 5-token chunk
    rows = [
        (1, shared),
        (2, shared),                       # whole doc duplicated → emptied
        (3, shared + " six seven eight nine ten"),  # 2 chunks, first is a dup
        (4, "unique text that stays here"),
    ]
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in chunk_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"),
            chunk_tokens=5,
        ).collect()
    }
    assert out[1] == (shared, 0)           # earliest copy keeps the chunk
    assert out[2] == ("", 1)               # later copy loses it entirely
    assert out[3] == ("six seven eight nine ten", 1)
    assert out[4] == ("unique text that stays here", 0)


def test_chunk_dedup_noop_on_unique_corpus(spark):
    from fhir_etl_spark.operators.dedup import chunk_dedup

    rows = [(i, f"alpha{i} beta{i} gamma{i}") for i in range(20)]
    out = chunk_dedup(
        spark.createDataFrame(rows, "doc_id long, text string"), chunk_tokens=3
    )
    assert out.filter("n_removed > 0").count() == 0
    assert out.filter("clean_text != ''").count() == 20


def test_kmeans_separated_blobs(spark):
    """Two well-separated blobs → k=2 k-means recovers them exactly, with
    cluster_id = the blob containing the lowest ids (init = first-k)."""
    from fhir_etl_spark.operators.similarity import kmeans_assign

    rows = []
    for i in range(10):  # blob A near (0, 0, 0, 0)
        rows.append((i, [0.0 + 0.01 * i, 0.0, 0.0, 0.01 * (i % 3)]))
    for i in range(10, 20):  # blob B near (10, 10, 10, 10)
        rows.append((i, [10.0 + 0.01 * i, 10.0, 10.0, 10.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["cluster_id"] for r in kmeans_assign(df, k=2, n_iterations=3).collect()}
    # init: centroids = rows 0 and 1 (both blob A); after the first
    # update the far blob pulls one centroid over — classic Lloyd's
    a_clusters = {out[i] for i in range(10)}
    b_clusters = {out[i] for i in range(10, 20)}
    assert len(a_clusters) == 1 and len(b_clusters) == 1
    assert a_clusters != b_clusters


def test_kmeans_hash_sample_init_beats_pathological_first_k(spark):
    """VERDICT r04 #5: first-k-by-id init seeds every centroid inside ONE
    region when low ids all come from one source. On a planted 4-blob
    fixture whose first k ids all sit in blob 0, the seeded hash-sample
    init must reach strictly lower inertia (sum of squared distances) —
    and the oracle-default first_k path must be bit-identical to an
    explicit init='first_k' call (the v7 oracle is unaffected)."""
    import numpy as np

    from fhir_etl_spark.operators.similarity import kmeans_assign

    rng = np.random.default_rng(3)
    rows = []
    for vid in range(200):
        blob = vid // 50  # ids 0..49 are ALL blob 0 → first_k is pathological
        center = np.zeros(8)
        center[blob] = 25.0
        rows.append((vid, [float(x) for x in center + rng.normal(scale=0.5, size=8)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def inertia(init, seed=42):
        out = kmeans_assign(
            df, k=4, n_iterations=4, init=init, init_seed=seed
        ).collect()
        return sum(r["dist_r"] for r in out), {
            (r["vec_id"], r["cluster_id"], r["dist_r"]) for r in out
        }

    bad, bad_rows = inertia("first_k")
    good, _ = inertia("hash_sample")
    assert good < bad * 0.5, f"hash_sample {good:.1f} not better than first_k {bad:.1f}"

    default_rows = {
        (r["vec_id"], r["cluster_id"], r["dist_r"])
        for r in kmeans_assign(df, k=4, n_iterations=4).collect()
    }
    assert default_rows == bad_rows  # default == explicit first_k, bit-identical


def test_substring_dedup_semantics(spark):
    """ExactSubstr policy: a 10-gram planted in three docs is removed
    from all of them (a fully-duplicated doc becomes empty text, not a
    missing row); unique and shorter-than-k docs pass through whole."""
    from fhir_etl_spark.operators.dedup import substring_dedup

    boiler = " ".join(f"tok{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            (1, f"alpha beta {boiler} gamma"),
            (2, f"delta {boiler} epsilon zeta"),
            (3, boiler),
            (4, "totally unique words only here right"),
            (5, "x x x"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in substring_dedup(df, k=10).collect()}
    assert out[1]["clean_text"] == "alpha beta gamma"
    assert out[2]["clean_text"] == "delta epsilon zeta"
    assert out[3]["clean_text"] == "" and out[3]["n_removed"] == 10
    assert out[4]["n_removed"] == 0
    assert out[5]["n_removed"] == 0 and out[5]["clean_text"] == "x x x"
    # hash-keyed production path agrees with the oracle-able text-keyed path
    hashed = {r["doc_id"]: r for r in substring_dedup(df, k=10, gram_key="hash").collect()}
    assert all(hashed[i]["clean_text"] == out[i]["clean_text"] for i in out)


def test_semdedup_keep_rule_and_cap(spark):
    """SemDeDup keep semantics on planted geometry: within a cluster of
    near-identical vectors exactly ONE survives — the farthest-from-
    centroid (highest keep priority), ties to the lower id; orthogonal
    members survive regardless; the max_cluster_size cap keeps over-cap
    members UN-deduped (loud, not silently paired or dropped)."""
    from pyspark.sql import functions as F

    from fhir_etl_spark.operators.similarity import semdedup_keep

    # 2 clusters, far apart (k-means with k=2 separates them exactly):
    #   cluster A at ~(10, 0, ...): ids 0,1,2 identical + id 3 slightly
    #     farther from the blob mean -> id 3 has max dist_r, kept; and
    #     0,1,2 all cos~1 to it -> only the trio's... (3 kept, 0/1/2
    #     judged against 3 and each other; all cos >= tau -> 3 kept alone)
    #   cluster B at ~(0, 10, ...): ids 10, 11 nearly orthogonal offsets
    #     -> cos between them low, both kept
    dim = 8

    def vec(base, bump, eps):
        v = [0.0] * dim
        v[base] = 10.0
        v[bump] += eps
        return v

    # ids 0 and 1 span the two blobs so the oracle-replayable first_k
    # init seeds one centroid per blob (two identical seeds would merge
    # the clusters in one Lloyd's round)
    rows = [
        (0, vec(0, 1, 0.0)),     # A trio
        (1, vec(1, 2, 3.0)),     # B: big angular offset from the other B
        (2, vec(0, 1, 0.0)),     # A trio
        (3, vec(0, 1, 0.0)),     # A trio
        (4, vec(0, 1, 0.5)),     # farthest from the A-blob mean, cos to
                                 # the trio = 100/(10*sqrt(100.25)) ~ 0.99875
        (11, vec(1, 3, -3.0)),   # B: cos to id 1 well under 0.995
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r
        for r in semdedup_keep(
            df, k=2, n_iterations=2, threshold=0.995
        ).collect()
    }
    assert [got[i]["kept"] for i in (0, 2, 3)] == [False, False, False]
    assert got[4]["kept"]  # the diverse member of the near-dup set wins
    assert got[1]["kept"] and got[11]["kept"]
    a_cluster = {got[i]["cluster_id"] for i in (0, 2, 3, 4)}
    b_cluster = {got[i]["cluster_id"] for i in (1, 11)}
    assert len(a_cluster) == 1 and len(b_cluster) == 1 and a_cluster != b_cluster

    # identical-trio tie-break: dist_r ties exactly -> lowest id keeps
    trio = [(0, vec(0, 1, 0.0)), (1, vec(0, 1, 0.0)), (2, vec(0, 1, 0.0))]
    df2 = spark.createDataFrame(trio, "vec_id long, embedding array<double>")
    got2 = {
        r["vec_id"]: r["kept"]
        for r in semdedup_keep(df2, k=1, n_iterations=1, threshold=0.995).collect()
    }
    assert got2 == {0: True, 1: False, 2: False}

    # cap=1 degenerate edge: identical trio re-splits, k-means cannot
    # separate identical vectors (all to sub 0), the rank-chunk backstop
    # makes three single-member blocks -> no pairs, everyone kept (the
    # documented ≤-one-keeper-per-cap-block recall bound at its extreme)
    got3 = {
        r["vec_id"]: r["kept"]
        for r in semdedup_keep(
            df2, k=1, n_iterations=1, threshold=0.995, max_cluster_size=1
        ).collect()
    }
    assert got3 == {0: True, 1: True, 2: True}


def test_semdedup_oversized_cluster_resplit(spark):
    """VERDICT r07 #6: an over-cap cluster must be RE-SPLIT (second
    k-means within it), not truncated — the old policy kept every
    rank>cap member un-deduped, losing recall exactly where dedup
    matters most. Planted shape: ONE first-level cluster (k=1) holding
    two tight near-duplicate blobs of 20; cap=10 forces the re-split.

    Old behavior: 10 in-scope members -> ~2 keepers, PLUS 30 over-cap
    members all kept -> ≥30 kept. New behavior: the sub-k-means
    separates the blobs, every member participates in the prune, and
    only per-sub-cluster keepers survive (≤ resplit_k)."""
    from fhir_etl_spark.operators.similarity import semdedup_keep

    dim = 8

    def vec(axis, i, eps):
        v = [0.0] * dim
        v[axis] = 10.0
        v[(axis + 1) % dim] = eps * (i % 3)  # tiny within-blob jitter
        return v

    # interleaved ids so first-k seeding sees both blobs
    rows = [(i, vec(0 if i % 2 == 0 else 4, i, 0.01)) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = semdedup_keep(
        df, k=1, n_iterations=2, threshold=0.99,
        max_cluster_size=10, resplit_k=4,
    ).collect()
    assert len(got) == 40  # nobody disappears from the output
    n_kept = sum(1 for r in got if r["kept"])
    # every member was deduped: keepers bounded by sub-clusters plus
    # any rank-chunk blocks inside still-oversized subs (≤ resplit_k +
    # ceil(40/10) here), far below the ≥30 the truncation policy kept
    assert 2 <= n_kept <= 8, f"kept {n_kept}"


def test_semdedup_degenerate_identical_mass_chunked(spark):
    """The re-split's backstop: a mass of IDENTICAL vectors cannot be
    separated by k-means (every distance ties -> all to sub 0), so it is
    chunked by rank into cap-sized blocks — every member participates in
    the prune, and exactly one keeper survives per block (30 identical,
    cap=10 -> 3 keepers; the old truncation kept 21)."""
    from fhir_etl_spark.operators.similarity import semdedup_keep

    v = [1.0, 2.0, 3.0, 4.0]
    df = spark.createDataFrame(
        [(i, v) for i in range(30)], "vec_id long, embedding array<double>"
    )
    got = semdedup_keep(
        df, k=1, n_iterations=1, threshold=0.9,
        max_cluster_size=10, resplit_k=2,
    ).collect()
    assert len(got) == 30
    assert sum(1 for r in got if r["kept"]) == 3


def test_semdedup_resplit_with_dim_unrolled(spark):
    """Round-10 regression (VERDICT r09 #1): the over-cap re-split must
    work WITH ``dim`` set — the v8b deployment path threads
    ``dim``/``train_rows`` through semdedup_keep, and round 9's final
    commit left ``_grouped_kmeans_sub`` without a ``dim`` parameter
    (NameError at plan build on any corpus with an over-cap cluster).
    Beyond not crashing, the dim-unrolled distance chain must be
    BIT-IDENTICAL to the zip_with fold (``_sum_chain`` preserves the
    association order), so the two runs must agree row-for-row."""
    from fhir_etl_spark.operators.similarity import semdedup_keep

    dim = 8

    def vec(axis, i, eps):
        v = [0.0] * dim
        v[axis] = 10.0
        v[(axis + 1) % dim] = eps * (i % 3)
        return v

    rows = [(i, vec(0 if i % 2 == 0 else 4, i, 0.01)) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kwargs = dict(
        k=1, n_iterations=2, threshold=0.99,
        max_cluster_size=10, resplit_k=4, train_rows=20,
    )
    got_dim = semdedup_keep(df, dim=dim, **kwargs).collect()
    got_hof = semdedup_keep(df, dim=None, **kwargs).collect()
    key = lambda r: r["vec_id"]  # noqa: E731
    assert sorted(got_dim, key=key) == sorted(got_hof, key=key)
    n_kept = sum(1 for r in got_dim if r["kept"])
    assert 2 <= n_kept <= 8, f"kept {n_kept}"


def test_pq_codes_shape_and_adc_self_match(spark, sf_dir):
    """Round-8 v11: PQ encoding must emit exactly m in-range codes per
    vector, and ADC self-distance is PROVABLY minimal — ADC(q, q) =
    Σ_s min_c ||q_s − c||² ≤ ADC(q, x) for every x (each subterm is the
    argmin the encoder itself took) — so each probe's top-1 ADC value
    equals the corpus-wide minimum for that query."""
    from fhir_etl_spark.operators.similarity import pq_adc_topk, pq_train_encode
    from fhir_etl_spark.session import load_tables

    embeddings = load_tables(spark, sf_dir, "embeddings")
    codes, codebook = pq_train_encode(embeddings, dim=64, m=4, sub_k=16, n_iterations=2)
    stats = codes.select(
        F.size("codes").alias("n"),
        F.array_max("codes").alias("mx"),
        F.array_min("codes").alias("mn"),
    ).agg(F.min("n"), F.max("n"), F.max("mx"), F.min("mn")).first()
    assert stats[0] == 4 and stats[1] == 4
    assert stats[2] <= 15 and stats[3] >= 0

    queries = embeddings.filter(F.col("vec_id").isin(1, 2, 3)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # top-k over the whole corpus: rank-1 adc must equal the global min
    n = embeddings.count()
    full = pq_adc_topk(codes, codebook, queries, k=n, m=4, sub_len=16)
    rows = full.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {1, 2, 3}
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        self_adc = next(r["adc_micro"] for r in rs if r["vec_id"] == qid)
        assert self_adc == rs[0]["adc_micro"]


def test_pq_adc_separates_planted_clusters(spark):
    """Planted two-cluster corpus: every same-cluster member must
    out-rank every cross-cluster member under ADC — the quantization
    error (≤ intra-cluster spread) can never bridge a 20-unit-per-dim
    gap. This is the recall property that makes PQ usable as a 100 TB
    pruning index."""
    import random as _random

    from fhir_etl_spark.operators.similarity import pq_adc_topk, pq_train_encode

    rng = _random.Random(7)
    rows = []
    for i in range(40):
        center = 10.0 if i % 2 == 0 else -10.0
        rows.append((i, [center + rng.uniform(-1, 1) for _ in range(16)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    codes, codebook = pq_train_encode(df, dim=16, m=4, sub_k=4, n_iterations=2)
    queries = df.filter(F.col("vec_id").isin(0, 1)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = pq_adc_topk(
        codes, codebook, queries, k=20, m=4, sub_len=4, sub_k=4
    ).collect()
    for r in got:
        same_cluster = (r["vec_id"] % 2) == (r["query_id"] % 2)
        assert same_cluster, (
            f"query {r['query_id']} rank {r['rank']}: cross-cluster "
            f"vec {r['vec_id']} leaked into the same-cluster top-20"
        )


def test_pq_rejects_bad_geometry(spark):
    from fhir_etl_spark.operators.similarity import pq_train_encode

    df = spark.createDataFrame([(1, [0.0] * 10)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="must divide"):
        pq_train_encode(df, dim=10, m=4)
    with pytest.raises(ValueError, match="n_iterations"):
        pq_train_encode(df, dim=10, m=2, n_iterations=0)


def test_ivfpq_self_match_and_probe_prune(spark, sf_dir):
    """Round-8 v12: each probe's own vector must surface at the ADC
    minimum (its nearest coarse list is probe #1 and its residual
    self-distance is the per-list minimum), and every returned candidate
    must belong to one of the query's probed lists (the _list equi-join
    IS the inverted-index prune)."""
    from fhir_etl_spark.operators.similarity import ivf_pq_build, ivf_pq_search
    from fhir_etl_spark.session import load_tables

    embeddings = load_tables(spark, sf_dir, "embeddings")
    codes, coarse, codebook = ivf_pq_build(
        embeddings, dim=64, n_list=8, m=4, sub_k=16, n_iterations=2
    )
    queries = embeddings.filter(F.col("vec_id").isin(1, 2, 3)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n = embeddings.count()
    got = ivf_pq_search(
        codes, coarse, codebook, queries, k=n, n_probe=2, m=4, sub_len=16
    ).collect()
    lists = {r["vec_id"]: r["_list"] for r in codes.collect()}
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {1, 2, 3}
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        # candidate set = members of exactly the probed lists
        probed_lists = {lists[r["vec_id"]] for r in rs}
        assert len(probed_lists) <= 2
        assert lists[qid] in probed_lists  # own list is always probed
        self_adc = next(r["adc_micro"] for r in rs if r["vec_id"] == qid)
        assert self_adc == rs[0]["adc_micro"]
        # pruning really pruned: fewer candidates than the corpus
        assert len(rs) < n


def test_ivfpq_planted_clusters_separate(spark):
    """Two planted clusters -> two coarse regions: same-cluster members
    out-rank cross-cluster ones under residual-PQ ADC whenever both
    lists are probed."""
    import random as _random

    from fhir_etl_spark.operators.similarity import ivf_pq_build, ivf_pq_search

    rng = _random.Random(11)
    rows = []
    for i in range(48):
        center = 10.0 if i % 2 == 0 else -10.0
        rows.append((i, [center + rng.uniform(-1, 1) for _ in range(16)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    codes, coarse, codebook = ivf_pq_build(
        df, dim=16, n_list=4, m=4, sub_k=4, n_iterations=2
    )
    queries = df.filter(F.col("vec_id").isin(0, 1)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ivf_pq_search(
        codes, coarse, codebook, queries, k=10, n_probe=4,
        m=4, sub_len=4, sub_k=4,
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        for r in rs[:10]:
            assert (r["vec_id"] % 2) == (qid % 2), (
                f"query {qid}: cross-cluster vec {r['vec_id']} at rank {r['rank']}"
            )


def test_ivfpq_geometry_validation(spark):
    from fhir_etl_spark.operators.similarity import ivf_pq_build

    df = spark.createDataFrame([(1, [0.0] * 10)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="must divide"):
        ivf_pq_build(df, dim=10, m=4)
    with pytest.raises(ValueError, match="n_iterations"):
        ivf_pq_build(df, dim=10, m=2, n_iterations=0)


def test_binary_ann_sign_structure(spark):
    """Planted sign structure: cluster A all-positive, cluster B
    all-negative, one query mixed-but-mostly-positive — A members must
    fill the top ranks (Hamming 0 to the A pattern), B members the
    bottom (Hamming = dim)."""
    from fhir_etl_spark.operators.similarity import binary_hamming_topk

    rows = []
    for i in range(10):
        rows.append((i, [1.0] * 16))          # cluster A
        rows.append((100 + i, [-1.0] * 16))   # cluster B
    rows.append((500, [1.0] * 15 + [-1.0]))   # query: 15/16 positive
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id = 500").selectExpr("vec_id AS query_id", "embedding")
    got = sorted(
        binary_hamming_topk(df, q, k=21, dim=16).collect(),
        key=lambda r: r["rank"],
    )
    assert got[0]["vec_id"] == 500 and got[0]["hamming"] == 0
    a_ranks = [r["rank"] for r in got if 0 <= r["vec_id"] < 100]
    b_ranks = [r["rank"] for r in got if r["vec_id"] >= 100 and r["vec_id"] < 500]
    assert max(a_ranks) < min(b_ranks)
    assert all(r["hamming"] == 1 for r in got if 0 <= r["vec_id"] < 100)
    assert all(r["hamming"] == 15 for r in got if 100 <= r["vec_id"] < 200)

    from fhir_etl_spark.operators.similarity import binary_sign_sketch_sql
    import pytest as _p

    with _p.raises(ValueError, match="dim"):
        binary_sign_sketch_sql("v", 0)
