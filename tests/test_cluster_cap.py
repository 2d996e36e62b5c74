"""ds12 — cluster-capped diversity sampling (operators/datasets.
cluster_cap_sample): per-embedding-cluster contribution cap keeping the
highest-quality members."""

from __future__ import annotations

import pytest

from fhir_etl_spark.operators.datasets import cluster_cap_sample


def _frames(spark):
    # cluster 0: 4 members, cluster 1: 2, cluster 2: 1
    clusters = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 0), (5, 1), (6, 1), (7, 2)],
        "vec_id long, cluster_id int",
    )
    quality = spark.createDataFrame(
        [(1, 0.9), (2, 0.5), (3, 0.7), (4, 0.7), (5, 0.1), (6, 0.2), (7, 0.3)],
        "doc_id long, quality double",
    )
    return clusters, quality


def test_cap_keeps_best_quality_per_cluster(spark):
    clusters, quality = _frames(spark)
    out = {
        r["vec_id"]: (r["cluster_id"], r["pos"])
        for r in cluster_cap_sample(clusters, quality, per_cluster=2).collect()
    }
    # cluster 0: 0.9 (id 1) then the 0.7 tie broken by LOWER id (3, not 4)
    assert out == {1: (0, 1), 3: (0, 2), 5: (1, 2), 6: (1, 1), 7: (2, 1)}


def test_sparse_clusters_survive_whole(spark):
    clusters, quality = _frames(spark)
    out = cluster_cap_sample(clusters, quality, per_cluster=10).collect()
    assert len(out) == 7  # no cluster reaches the cap → nothing dropped


def test_per_cluster_validation(spark):
    clusters, quality = _frames(spark)
    with pytest.raises(ValueError, match="per_cluster"):
        cluster_cap_sample(clusters, quality, per_cluster=0)


def test_cap_compiles_to_window_group_limit(spark):
    """The rank-≤-k filter must compile to WindowGroupLimit so map tasks
    pre-prune to their local top-k per cluster BEFORE the exchange — a
    degenerate mega-cluster costs bounded shuffle volume (the quota_cap
    plan contract)."""
    clusters, quality = _frames(spark)
    plan = (
        cluster_cap_sample(clusters, quality, per_cluster=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan
