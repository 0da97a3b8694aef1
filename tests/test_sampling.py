"""Deterministic sampling operators (operators/sampling.py,
operators/sketches.py bottom-k family): invariants the DuckDB
differential gate can't see — partition invariance, the exact-k copies
identity of PPS systematic, mergeability of the bottom-k sample, and
statistical weight-proportionality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3logs_parquet_spark.operators.sampling import (
    mixture_sample,
    weighted_systematic_sample,
)
from s3logs_parquet_spark.operators.sketches import bottomk_sample, sampled_quantiles


def _ids(df, col="id"):
    return sorted(r[col] for r in df.select(col).collect())


class TestWeightedSystematicSample:
    def test_total_copies_is_exactly_k(self, spark):
        # with total_weight >= k every one of the k selection points
        # lands inside some row's segment: sum(n_copies) == k exactly
        df = spark.range(1000).withColumn("w", F.pmod(F.col("id"), F.lit(7)) + 1)
        out = weighted_systematic_sample(df, "w", k=37, id_col="id")
        assert out.agg(F.sum("n_copies")).first()[0] == 37

    def test_partition_invariance(self, spark):
        df = spark.range(500).withColumn("w", F.pmod(F.col("id"), F.lit(5)) + 1)
        a = weighted_systematic_sample(df, "w", k=20, id_col="id")
        b = weighted_systematic_sample(df.repartition(13), "w", k=20, id_col="id")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_heavy_rows_oversampled(self, spark):
        # 100 heavy rows (w=50) vs 900 light rows (w=1): heavy mass is
        # 5000/5900 of the line, so of 59 points ~50 fall on heavy rows
        df = spark.range(1000).withColumn(
            "w", F.when(F.col("id") < 100, F.lit(50)).otherwise(F.lit(1))
        )
        out = weighted_systematic_sample(df, "w", k=59, id_col="id")
        heavy = out.filter(F.col("id") < 100).agg(F.sum("n_copies")).first()[0]
        assert 40 <= heavy <= 59

    def test_certainty_unit_multiplicity(self, spark):
        # one row carries ~all the weight: with k=10 it must absorb
        # multiple selection points
        df = spark.range(10).withColumn(
            "w", F.when(F.col("id") == 3, F.lit(10_000)).otherwise(F.lit(1))
        )
        out = weighted_systematic_sample(df, "w", k=10, id_col="id")
        big = out.filter(F.col("id") == 3).first()
        assert big is not None and big["n_copies"] >= 8

    def test_nonpositive_weight_raises(self, spark):
        df = spark.range(10).withColumn(
            "w", F.when(F.col("id") == 5, F.lit(0)).otherwise(F.lit(1))
        )
        with pytest.raises(Exception, match="nonpositive weight"):
            weighted_systematic_sample(df, "w", k=3, id_col="id").collect()

    def test_k_larger_than_total_weight_caps_at_k(self, spark):
        # W < k: step clamps to 1, every unit of weight is a point but
        # the f() clamp caps total picks at min(W, k)
        df = spark.range(5).withColumn("w", F.lit(2))
        out = weighted_systematic_sample(df, "w", k=100, id_col="id")
        assert out.agg(F.sum("n_copies")).first()[0] == 10


class TestMixtureSample:
    def test_quota_math_matches_manual(self, spark):
        import math

        rows = [(i, "big") for i in range(400)] + [(i + 1000, "small") for i in range(25)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = mixture_sample(df, "source", "doc_id", k_total=30, alpha=0.5)
        got = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        w_big, w_small = math.isqrt(400), math.isqrt(25)
        tw = w_big + w_small
        assert got["big"] == max(1, 30 * w_big // tw)
        assert got["small"] == max(1, 30 * w_small // tw)
        # temperature flattening: small's share of the sample (>= 1/6)
        # far exceeds its raw share of the corpus (25/425 ≈ 6%)
        assert got["small"] / (got["big"] + got["small"]) > 25 / 425

    def test_partition_invariance(self, spark):
        df = spark.range(300).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), F.pmod(F.col("id"), F.lit(7))).alias("source"),
        )
        a = mixture_sample(df, "source", "doc_id", k_total=21)
        b = mixture_sample(df.repartition(11), "source", "doc_id", k_total=21)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_rank_is_within_group_hash_order(self, spark):
        df = spark.range(100).select(
            F.col("id").alias("doc_id"),
            F.pmod(F.col("id"), F.lit(2)).cast("string").alias("source"),
        )
        out = mixture_sample(df, "source", "doc_id", k_total=10)
        for r in out.collect():
            assert 1 <= r["sample_rank"] <= r["quota"]


class TestBottomKQuantiles:
    def test_bottomk_mergeable(self, spark):
        df = spark.range(2000).withColumnRenamed("id", "event_id")
        a = df.filter(F.col("event_id") < 1000)
        b = df.filter(F.col("event_id") >= 1000)
        whole = _ids(bottomk_sample(df, "event_id", 64), "event_id")
        merged = _ids(
            bottomk_sample(
                bottomk_sample(a, "event_id", 64).unionByName(
                    bottomk_sample(b, "event_id", 64)
                ),
                "event_id",
                64,
            ),
            "event_id",
        )
        assert whole == merged

    def test_exact_when_sample_covers_data(self, spark):
        # k >= n: the sample IS the data, so estimates are the exact
        # lower empirical quantiles
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate([5, 1, 9, 3, 7, 2, 8, 4, 6, 0])],
            "event_id long, value double",
        )
        out = {
            r["p"]: r["est_value"]
            for r in sampled_quantiles(df, "value", "event_id", k=100, probs=(0.0, 0.5, 1.0)).collect()
        }
        assert out[0.0] == 0.0 and out[0.5] == 4.0 and out[1.0] == 9.0

    def test_partition_invariance_and_null_excluded(self, spark):
        df = spark.range(1000).select(
            F.col("id").alias("event_id"),
            F.when(F.pmod("id", F.lit(10)) == 0, F.lit(None)).otherwise(
                F.col("id").cast("double")
            ).alias("value"),
        )
        a = sampled_quantiles(df, "value", "event_id", k=128)
        b = sampled_quantiles(df.repartition(17), "value", "event_id", k=128)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
        assert all(r["est_value"] is not None for r in a.collect())

    def test_estimate_within_sampling_error(self, spark):
        # uniform values 0..9999: p50 estimate from a 256-row sample
        # should land within a few hundred of 5000 (O(n/sqrt(k)))
        df = spark.range(10_000).select(
            F.col("id").alias("event_id"), F.col("id").cast("double").alias("value")
        )
        est = {
            r["p"]: r["est_value"]
            for r in sampled_quantiles(df, "value", "event_id", k=256).collect()
        }
        assert abs(est[0.5] - 5000) < 1500
        assert abs(est[0.9] - 9000) < 1000
