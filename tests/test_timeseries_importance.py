"""Unit tests for the round-8 additions: EWMA fold (operators/timeseries),
DSIR importance weighting, label-propagation communities, and the CCNet
perplexity-bucket split. Each operator's semantics are pinned here by a
worked example small enough to check by hand; cross-engine exactness is
pinned by the vanilla sweep / driver gate."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


class TestEwma:
    def test_worked_example(self, spark):
        from fhir_etl_spark.operators.timeseries import ewma

        df = spark.createDataFrame(
            [
                Row(k=1, t=3, v=2.0),
                Row(k=1, t=1, v=4.0),
                Row(k=1, t=2, v=8.0),
                Row(k=2, t=1, v=10.0),
            ]
        )
        out = ewma(df, ["k"], ["t"], "v", alpha=0.25)
        got = {(r.k, r.t): r.ewma for r in out.collect()}
        # k=1 in t-order: s1=4, s2=.25*8+.75*4=5, s3=.25*2+.75*5=4.25
        assert got == {(1, 1): 4.0, (1, 2): 5.0, (1, 3): 4.25, (2, 1): 10.0}

    def test_preserves_order_and_value_columns(self, spark):
        from fhir_etl_spark.operators.timeseries import ewma

        df = spark.createDataFrame([Row(k=1, t=1, v=3.0), Row(k=1, t=2, v=5.0)])
        out = ewma(df, ["k"], ["t"], "v", alpha=0.5)
        assert set(out.columns) == {"k", "t", "v", "ewma"}
        rows = sorted(out.collect(), key=lambda r: r.t)
        assert [r.v for r in rows] == [3.0, 5.0]
        assert [r.ewma for r in rows] == [3.0, 4.0]

    def test_null_value_raises(self, spark):
        from fhir_etl_spark.operators.timeseries import ewma

        df = spark.createDataFrame(
            [Row(k=1, t=1, v=1.0), Row(k=1, t=2, v=None)],
            schema="k int, t int, v double",
        )
        with pytest.raises(Exception, match="NULL in value column"):
            ewma(df, ["k"], ["t"], "v", alpha=0.25).collect()

    def test_alpha_validation(self, spark):
        from fhir_etl_spark.operators.timeseries import ewma

        df = spark.range(1).selectExpr("0 k", "0 t", "1.0 v")
        for bad in (0.0, -0.5, 1.5):
            with pytest.raises(ValueError, match="alpha"):
                ewma(df, ["k"], ["t"], "v", alpha=bad)

    def test_alpha_one_is_identity(self, spark):
        from fhir_etl_spark.operators.timeseries import ewma

        df = spark.createDataFrame(
            [Row(k=1, t=i, v=float(i * 7 % 5)) for i in range(1, 6)]
        )
        out = ewma(df, ["k"], ["t"], "v", alpha=1.0)
        assert all(r.ewma == r.v for r in out.collect())


class TestOrcRoundtrip:
    def test_pushdown_and_partition_pruning(self, spark, sf_dir, tmp_path):
        """The scale properties that justify the ORC tier: data filters reach
        the ORC scan (PushedFilters) and lang partitions prune at planning
        time (PartitionFilters) — same contract the parquet scans are held
        to in test_plans."""
        from fhir_etl_spark.session import load_tables

        docs = load_tables(spark, sf_dir, "documents")
        out = str(tmp_path / "orc")
        docs.write.mode("overwrite").partitionBy("lang").orc(out)
        back = spark.read.orc(out).filter(
            (F.col("lang") == "en") & (F.col("n_chars") > 100)
        )
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan and "n_chars" in plan.split(
            "PushedFilters"
        )[1].split("]")[0]
        assert "lang" in plan.split("PartitionFilters")[1].split("]")[0]
        # and the roundtrip preserves row identity
        assert back.count() == docs.filter(
            (F.col("lang") == "en") & (F.col("n_chars") > 100)
        ).count()


class TestDsir:
    def test_bucket_weights_shape_and_smoothing(self, spark):
        from fhir_etl_spark.operators.datasets import dsir_bucket_weights

        df = spark.createDataFrame(
            [Row(doc_id=1, text="aa bb aa", lang="en"),
             Row(doc_id=2, text="cc dd", lang="de")]
        )
        wt = dsir_bucket_weights(df, F.col("lang") == "en", n_buckets=16)
        rows = wt.collect()
        assert len(rows) == 16  # every bucket present, including empty ones
        assert sum(r.r for r in rows) == 5 and sum(r.t for r in rows) == 3
        # empty buckets carry the pure smoothing weight ln((rt+B)/(tt+B))
        import math
        empty = [r for r in rows if r.r == 0]
        expected = round((math.log(1.0) - math.log(3 + 16.0)
                          - math.log(1.0) + math.log(5 + 16.0)) * 1e6)
        assert all(r.w_micro == expected for r in empty)

    def test_target_like_docs_score_higher(self, spark):
        from fhir_etl_spark.operators.datasets import dsir_importance

        # target vocabulary is disjoint from raw-only vocabulary; a doc made
        # of target tokens must outscore a doc made of raw-only tokens
        rows = [Row(doc_id=i, text="alpha beta gamma", lang="en") for i in range(10)]
        rows += [Row(doc_id=100 + i, text="zeta eta theta", lang="de") for i in range(10)]
        df = spark.createDataFrame(rows)
        scores = {r.doc_id: r.score_micro for r in
                  dsir_importance(df, F.col("lang") == "en").collect()}
        assert scores[0] > scores[100]
        # identical docs score identically (pure function of content)
        assert scores[0] == scores[9] and scores[100] == scores[109]

    def test_bucket_matches_duckdb(self, spark):
        """The Spark conv(md5)-bucket and the oracle's UBIGINT-cast bucket
        agree token for token."""
        import duckdb

        from fhir_etl_spark.operators.datasets import hash_bucket

        toks = ["the", "spark", "Straße", "λ", "123", ""]
        df = spark.createDataFrame([(t,) for t in toks], ["tok"])
        got = {
            r.tok: r.b
            for r in df.select(
                "tok", hash_bucket(F.col("tok"), salt="dsir", n_buckets=256).alias("b")
            ).collect()
        }
        for t in toks:
            (want,) = duckdb.sql(
                "SELECT CAST('0x' || substr(md5('dsir' || ?), 1, 8) AS UBIGINT) % 256",
                params=[t],
            ).fetchone()
            assert got[t] == want, t

    @pytest.mark.parametrize(
        "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    )
    def test_weights_far_from_rounding_boundary(self, spark, sf):
        """The exactness guard: every bucket's ln-ratio*1e6 must sit well
        away from a .5 boundary, so a 1-ulp libm difference between the
        JVM and DuckDB can never flip the rounded micro-log weight."""
        from fhir_etl_spark.operators.datasets import dsir_bucket_weights
        from fhir_etl_spark.session import load_tables

        docs = load_tables(spark, sf, "documents")
        wt = dsir_bucket_weights(docs, F.col("lang") == "en")
        # recompute the unrounded value and measure fractional distance
        import math

        rows = wt.collect()
        rt = sum(r.r for r in rows)
        tt = sum(r.t for r in rows)
        for r in rows:
            raw = (math.log(r.t + 1.0) - math.log(tt + 256.0)
                   - math.log(r.r + 1.0) + math.log(rt + 256.0)) * 1e6
            frac = abs(raw - math.floor(raw) - 0.5)
            assert frac > 1e-3, (r.b, raw)


class TestLabelPropagation:
    def _edges(self, spark, pairs):
        sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
        return spark.createDataFrame(sym, ["src", "dst"])

    def test_two_triangles_with_bridge(self, spark):
        """Hand-worked 3-round synchronous LPA: two triangles joined by a
        bridge resolve to communities {1,2,3}->1 and {4,5,6}->3."""
        from fhir_etl_spark.operators.graph import label_propagation

        edges = self._edges(
            spark, [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
        )
        got = {r.node: r.community for r in label_propagation(edges, 3).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}

    def test_directed_sink_keeps_own_label(self, spark):
        from fhir_etl_spark.operators.graph import label_propagation

        edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
        got = {r.node: r.community for r in label_propagation(edges, 2).collect()}
        assert got == {1: 1, 2: 1}

    def test_tie_breaks_to_smallest_label(self, spark):
        from fhir_etl_spark.operators.graph import label_propagation

        # node 3 sees labels {1, 2} once each -> must adopt 1
        edges = self._edges(spark, [(1, 3), (2, 3)])
        got = {r.node: r.community for r in label_propagation(edges, 1).collect()}
        assert got[3] == 1


class TestQuantileBuckets:
    def test_worked_example_with_ties(self, spark):
        from fhir_etl_spark.operators.text import quantile_buckets

        # scores: 1 x4, 2 x3, 3 x2 (n=9; tercile thresholds ceil(3)=3, ceil(6)=6)
        rows = [Row(i=i, s=1.0) for i in range(4)]
        rows += [Row(i=10 + i, s=2.0) for i in range(3)]
        rows += [Row(i=20 + i, s=3.0) for i in range(2)]
        out = quantile_buckets(spark.createDataFrame(rows), "s")
        got = {r.i: r.bucket for r in out.collect()}
        assert all(got[i] == "head" for i in range(4))
        assert all(got[10 + i] == "middle" for i in range(3))
        assert all(got[20 + i] == "tail" for i in range(2))

    def test_ties_never_straddle_a_cut(self, spark):
        from fhir_etl_spark.operators.text import quantile_buckets

        df = spark.createDataFrame([Row(i=i, s=7.0) for i in range(30)])
        out = quantile_buckets(df, "s")
        assert {r.bucket for r in out.collect()} == {"head"}

    def test_balanced_on_distinct_scores(self, spark):
        from fhir_etl_spark.operators.text import quantile_buckets

        df = spark.createDataFrame([Row(i=i, s=float(i)) for i in range(9)])
        out = quantile_buckets(df, "s")
        from collections import Counter

        counts = Counter(r.bucket for r in out.collect())
        assert counts == {"head": 3, "middle": 3, "tail": 3}

    def test_label_validation(self, spark):
        from fhir_etl_spark.operators.text import quantile_buckets

        with pytest.raises(ValueError, match="at least 2"):
            quantile_buckets(spark.range(3), "id", labels=("only",))


class TestMmrRerank:
    def _frames(self, spark):
        corpus = spark.createDataFrame(
            [
                Row(vec_id=10, embedding=[0.98, 0.199]),   # most relevant
                Row(vec_id=11, embedding=[0.979, 0.2]),    # near-dup of 10
                Row(vec_id=12, embedding=[0.9, -0.4359]),  # diverse, less relevant
            ]
        )
        queries = spark.createDataFrame(
            [Row(query_id=1, embedding=[1.0, 0.0])]
        )
        return corpus, queries

    def test_diverse_pick_beats_near_dup(self, spark):
        """Plain top-2 = {10, 11} (the near-dup pair); MMR's redundancy
        penalty must swap the duplicate for the diverse vector 12."""
        from fhir_etl_spark.operators.similarity import cosine_topk, mmr_rerank

        corpus, queries = self._frames(spark)
        plain = {
            r.vec_id
            for r in cosine_topk(corpus, queries, k=2, dim=2).collect()
        }
        assert plain == {10, 11}
        got = {
            r.mmr_rank: r.vec_id
            for r in mmr_rerank(
                corpus, queries, k=2, n_candidates=3, lam=0.5, dim=2
            ).collect()
        }
        assert got == {1: 10, 2: 12}

    def test_lam_one_reduces_to_topk(self, spark):
        from fhir_etl_spark.operators.similarity import cosine_topk, mmr_rerank

        corpus, queries = self._frames(spark)
        mmr = mmr_rerank(corpus, queries, k=3, n_candidates=3, lam=1.0, dim=2)
        topk = cosine_topk(corpus, queries, k=3, dim=2)
        assert {(r.mmr_rank, r.vec_id) for r in mmr.collect()} == {
            (r.rank, r.vec_id) for r in topk.collect()
        }

    def test_parameter_validation(self, spark):
        from fhir_etl_spark.operators.similarity import mmr_rerank

        corpus, queries = self._frames(spark)
        with pytest.raises(ValueError, match="lam"):
            mmr_rerank(corpus, queries, lam=0.0)
        with pytest.raises(ValueError, match="candidate pool"):
            mmr_rerank(corpus, queries, k=9, n_candidates=3)


class TestHolt:
    def test_worked_example(self, spark):
        from fhir_etl_spark.operators.timeseries import holt_smoothing

        df = spark.createDataFrame(
            [
                Row(k=1, t=1, v=4.0),
                Row(k=1, t=2, v=8.0),
                Row(k=1, t=3, v=2.0),
                Row(k=2, t=1, v=10.0),
            ]
        )
        out = holt_smoothing(df, ["k"], ["t"], "v", alpha=0.25, beta=0.5)
        got = {(r.k, r.t): (r.level, r.trend, r.forecast) for r in out.collect()}
        # k=1 hand-fold (alpha=.25, beta=.5):
        # t1: l=4, b=0
        # t2: l=.25*8+.75*4=5,       b=.5*(5-4)+.5*0=0.5
        # t3: l=.25*2+.75*5.5=4.625, b=.5*(4.625-5)+.5*.5=0.0625
        assert got[(1, 1)] == (4.0, 0.0, 4.0)
        assert got[(1, 2)] == (5.0, 0.5, 5.5)
        assert got[(1, 3)] == (4.625, 0.0625, 4.6875)
        assert got[(2, 1)] == (10.0, 0.0, 10.0)

    def test_constant_series_has_zero_trend(self, spark):
        from fhir_etl_spark.operators.timeseries import holt_smoothing

        df = spark.createDataFrame([Row(k=1, t=i, v=7.0) for i in range(1, 9)])
        out = holt_smoothing(df, ["k"], ["t"], "v", alpha=0.25, beta=0.5)
        for r in out.collect():
            assert r.level == 7.0 and r.trend == 0.0 and r.forecast == 7.0

    def test_linear_series_trend_converges(self, spark):
        # x_i = 2*i: the trend state must approach the true slope 2
        from fhir_etl_spark.operators.timeseries import holt_smoothing

        df = spark.createDataFrame(
            [Row(k=1, t=i, v=2.0 * i) for i in range(1, 40)]
        )
        out = holt_smoothing(df, ["k"], ["t"], "v", alpha=0.25, beta=0.5)
        last = max(out.collect(), key=lambda r: r.t)
        assert abs(last.trend - 2.0) < 0.05
        assert abs(last.forecast - (last.level + last.trend)) == 0.0

    def test_null_and_param_validation(self, spark):
        from fhir_etl_spark.operators.timeseries import holt_smoothing

        df = spark.createDataFrame([Row(k=1, t=1, v=None)], "k int, t int, v double")
        with pytest.raises(Exception, match="poison"):
            holt_smoothing(df, ["k"], ["t"], "v", alpha=0.25, beta=0.5).collect()
        ok = spark.createDataFrame([Row(k=1, t=1, v=1.0)])
        with pytest.raises(ValueError, match="beta"):
            holt_smoothing(ok, ["k"], ["t"], "v", alpha=0.25, beta=0.0)


class TestOlsTrend:
    def test_perfect_line_recovers_slope(self, spark):
        from fhir_etl_spark.operators.timeseries import ols_trend

        # y = 3 + 2x exactly (centi-scale: 300 + 200x)
        df = spark.createDataFrame(
            [Row(k=1, t=i, v=3.0 + 2.0 * i) for i in range(1, 6)]
        )
        r = ols_trend(df, ["k"], ["t"], "v").collect()[0]
        assert r["n"] == 5
        # slope in micro CENTI-units per step: 2.0 -> 200 centi -> 2e8? no:
        # y_centi = 100*(3+2x) -> slope 200 centi/step -> 200_000_000 micro
        assert r["slope_micro"] == 200 * 1_000_000
        assert r["intercept_micro"] == 300 * 1_000_000

    def test_negative_slope_and_truncation(self, spark):
        from fhir_etl_spark.operators.timeseries import ols_trend

        df = spark.createDataFrame(
            [Row(k=1, t=1, v=1.0), Row(k=1, t=2, v=0.0), Row(k=1, t=3, v=0.0)]
        )
        r = ols_trend(df, ["k"], ["t"], "v").collect()[0]
        # exact: slope = -0.5 centi-units -> -50 centi/step -> -5e7 micro
        assert r["slope_micro"] == -50 * 1_000_000
        # single-row keys dropped
        one = spark.createDataFrame([Row(k=9, t=1, v=5.0)])
        assert ols_trend(one, ["k"], ["t"], "v").count() == 0
        import pytest as _p

        with _p.raises(ValueError, match="value_scale"):
            ols_trend(df, ["k"], ["t"], "v", value_scale=0)


class TestSequencePattern:
    def test_state_machine_worked_example(self, spark):
        from fhir_etl_spark.queries.events import e9_sequence_pattern  # noqa: F401
        # drive the same fold through a tiny planted table via the
        # operator body: reuse the query over a temp parquet dir
        import os
        import tempfile

        rows = [
            # user 1: v c p | v e c p (error resets mid-pattern) -> 1 conv
            (1, 1, "view"), (2, 1, "click"), (3, 1, "purchase"),
            (4, 1, "view"), (5, 1, "error"), (6, 1, "click"), (7, 1, "purchase"),
            # user 2: v c p v c p -> 2 convs, first at rn 3
            (10, 2, "view"), (11, 2, "click"), (12, 2, "purchase"),
            (13, 2, "view"), (14, 2, "click"), (15, 2, "purchase"),
            # user 3: p c v -> 0
            (20, 3, "purchase"), (21, 3, "click"), (22, 3, "view"),
        ]
        df = spark.createDataFrame(
            [
                (eid, __import__("datetime").datetime(2024, 1, 1, 0, 0, eid % 60),
                 uid, t, 1.0, "{}")
                for eid, uid, t in rows
            ],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        with tempfile.TemporaryDirectory() as d:
            df.write.parquet(os.path.join(d, "events.parquet"))
            got = {
                r["user_id"]: r
                for r in e9_sequence_pattern(spark, d).collect()
            }
        assert (got[1]["n_conversions"], got[1]["first_rn"]) == (1, 3)
        assert (got[2]["n_conversions"], got[2]["first_rn"]) == (2, 3)
        assert (got[3]["n_conversions"], got[3]["first_rn"]) == (0, -1)
