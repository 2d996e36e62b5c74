"""v8b (SemDeDup with the deployment k-scaling policy) — the round-10
first-class hardening the round-9 verdict asked for. The query fixed a
MEASURED scale behavior (v8's pinned k=8 → 546 s at sf10-shape,
BENCH_sf10_r09.json) and shipped sweep-green but untested; these pin:

1. the sizing policy itself (k ∝ n/200, train = min(n, 40k)) at its
   boundary values,
2. train-on-sample == full-train whenever the sample covers the corpus
   (the small-n identity that makes the policy safe to apply
   unconditionally),
3. the registered query's end-to-end agreement with an explicit
   semdedup_keep call using the policy (one fact, not two).
"""

from __future__ import annotations

import pytest

from fhir_etl_spark.operators.similarity import (
    kmeans_assign,
    semdedup_keep,
    semdedup_scaled_params,
)


def test_scaled_params_policy_boundaries():
    """k floors at 8, then grows as n // 200; train caps at n and is
    otherwise 40·k — the exact LIMIT subqueries the DuckDB oracle runs."""
    assert semdedup_scaled_params(0) == (8, 0)
    assert semdedup_scaled_params(100) == (8, 100)          # train capped at n
    assert semdedup_scaled_params(320) == (8, 320)          # 40*8 == 320 == n
    assert semdedup_scaled_params(500) == (8, 320)          # the sf0.01 shape
    assert semdedup_scaled_params(1599) == (8, 320)
    assert semdedup_scaled_params(1600) == (8, 320)         # 1600//200 == 8
    assert semdedup_scaled_params(1800) == (9, 360)
    assert semdedup_scaled_params(150_000) == (750, 30_000)  # the sf10 shape
    # train_rows >= k always (kmeans_assign's seed contract)
    for n in (0, 1, 7, 8, 199, 200, 201, 10**6):
        k, s = semdedup_scaled_params(n)
        assert s >= min(n, k)
        assert k >= 8


def test_scaled_params_rejects_bad_sizes():
    with pytest.raises(ValueError):
        semdedup_scaled_params(-1)
    with pytest.raises(ValueError):
        semdedup_scaled_params(100, target_cluster_size=0)
    with pytest.raises(ValueError):
        semdedup_scaled_params(100, train_factor=0)


def test_train_on_sample_equals_full_train_when_sample_covers(spark):
    """train_rows >= n ⇒ the sampled Lloyd's rounds average over
    exactly the corpus — output must be BIT-identical to
    train_rows=None (same rows averaged, same rounded centroids, same
    rounded distances)."""
    rows = [
        (i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(6)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    full = kmeans_assign(df, k=8, n_iterations=3).collect()
    samp = kmeans_assign(df, k=8, n_iterations=3, train_rows=60).collect()
    key = lambda r: r["vec_id"]  # noqa: E731
    assert sorted(full, key=key) == sorted(samp, key=key)


def test_train_on_sample_scores_full_corpus(spark):
    """train_rows < n: every corpus row still gets an assignment (the
    final pass scores the FULL corpus against the sample-trained
    centroids) and distances stay the rounded argmin over those
    centroids."""
    rows = [
        (i, [10.0 * (i % 3) + 0.01 * (i % 5), float(i % 2)]) for i in range(90)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = kmeans_assign(df, k=3, n_iterations=2, train_rows=30).collect()
    assert len(got) == 90
    assert {r["cluster_id"] for r in got} <= {0, 1, 2}
    assert all(r["dist_r"] is not None and r["dist_r"] >= 0 for r in got)


def test_v8b_query_is_the_policy_applied(spark, sf_dir):
    """The registered v8b query must equal semdedup_keep with
    semdedup_scaled_params(n) spelled out — guards against the query
    and the policy helper drifting apart (the 'one fact' contract)."""
    from fhir_etl_spark.queries import all_queries
    from fhir_etl_spark.session import load_tables

    embeddings = load_tables(spark, sf_dir, "embeddings")
    n = embeddings.count()
    k, train_rows = semdedup_scaled_params(n)
    assert k == 8 and train_rows == 320  # the sf0.001/sf0.01 fixture shape
    expect = semdedup_keep(
        embeddings, k=k, n_iterations=2, threshold=0.35,
        train_rows=train_rows, dim=64,
    ).collect()
    got = all_queries()["v8b_semdedup_scaled_k"].fn(spark, sf_dir).collect()
    key = lambda r: r["vec_id"]  # noqa: E731
    assert sorted(got, key=key) == sorted(expect, key=key)


def test_v8b_scaled_k_engages_above_floor(spark):
    """Above the k floor (n > 1600) the policy must actually raise k —
    planted 1800 vectors in 9 well-separated blobs: k=9 clusters them
    without any over-cap re-split, and each blob dedups to ~1 keeper
    (threshold well below intra-blob cosine)."""
    import math

    dim = 8
    rows = []
    for i in range(1800):
        blob = i % 9
        v = [0.0] * dim
        v[blob % dim] = 10.0
        v[(blob + 3) % dim] = 2.0 + 0.001 * (i % 7)  # tiny jitter
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    n = df.count()
    k, train_rows = semdedup_scaled_params(n)
    assert k == 9 and train_rows == 360
    got = semdedup_keep(
        df, k=k, n_iterations=2, threshold=0.99,
        train_rows=train_rows, dim=dim,
    ).collect()
    assert len(got) == 1800
    kept = sum(1 for r in got if r["kept"])
    # blobs are near-identical within, orthogonal-ish across: keepers
    # ≈ number of NON-EMPTY clusters (≤ k); allow seeds landing in the
    # same blob to leave a few clusters empty, but far below no-dedup
    assert kept <= 2 * k, f"kept {kept} of 1800 with k={k}"
    assert math.inf > kept >= 1


def test_kmeans_argmin_is_hash_aggregable(spark, sf_dir):
    """Round-10 scale fix, plan-pinned: the per-id argmin must plan as
    a HashAggregate over the encoded BIGINT, never a SortAggregate over
    min(struct) — the struct form isn't hash-aggregable and Spark's
    fallback SORTS the whole n·k scored stream (measured at sf10-shape:
    124 s/task of a 216 s wall)."""
    from fhir_etl_spark.session import load_tables

    emb = load_tables(spark, sf_dir, "embeddings")
    plan = (
        kmeans_assign(emb, k=8, n_iterations=2, dim=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan


def test_semdedup_pair_scan_dot_stays_out_of_join_condition(spark, sf_dir):
    """Round-10 scale fix, plan-pinned: the 64-term pair cosine must sit
    in a PROJECTION above the pair join, not in the join condition —
    condition-side evaluation runs outside whole-stage codegen (measured
    140 s of a 203 s wall at sf10-shape). The SMJ/BHJ condition must
    stay the cheap key + rank compares."""
    from fhir_etl_spark.session import load_tables

    emb = load_tables(spark, sf_dir, "embeddings")
    plan = semdedup_keep(
        emb, k=8, n_iterations=2, threshold=0.35, dim=64
    )._jdf.queryExecution().executedPlan().toString()
    import re

    # every join node's condition line must be free of element_at (the
    # dot's signature); the dot lives in Project/Aggregate nodes
    for line in plan.splitlines():
        if re.search(r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin", line):
            assert "element_at" not in line, line[:200]
    assert "max(_sim" in plan  # the any-mate rule is the max aggregate


def test_ensure_scoring_width_widens_narrow_inputs(spark):
    """The map-side scoring join's parallelism = input partitions; a
    compact corpus file arrives as 1–2 partitions and serializes the
    n·k loop (round-10 sf10 finding). Narrow frames widen to default
    parallelism; already-wide frames pass through untouched."""
    from fhir_etl_spark.operators.similarity import _ensure_scoring_width

    target = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).coalesce(1)
    widened = _ensure_scoring_width(narrow)
    assert widened.rdd.getNumPartitions() == target
    assert widened.count() == 1000
    wide = spark.range(1000).repartition(target + 4)
    assert _ensure_scoring_width(wide).rdd.getNumPartitions() == target + 4


def test_scaled_params_is_the_documented_entry_path():
    """VERDICT r10 #5 (the v8 foot-gun): a user who reads either
    surface — the v8 registry docstring or the operator docstring —
    must be routed to the scaled-k policy, and v8b must actually go
    through the policy helper (one fact, not two copies of a formula).
    """
    import inspect

    from fhir_etl_spark.operators.similarity import semdedup_keep
    from fhir_etl_spark.queries.registry import get_query

    v8_doc = get_query("v8_semdedup").fn.__doc__
    assert "v8b_semdedup_scaled_k" in v8_doc
    assert "semdedup_scaled_params" in v8_doc or "scaled" in v8_doc
    assert "semdedup_scaled_params" in semdedup_keep.__doc__
    v8b_src = inspect.getsource(get_query("v8b_semdedup_scaled_k").fn)
    assert "semdedup_scaled_params" in v8b_src
