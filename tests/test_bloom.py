"""Bloom-filter runtime join prefilter (operators/bloom.py).

The operator's contract is three-sided: (1) NO false negatives —
probing then joining must equal joining directly; (2) bounded false
positives at the documented sizing; (3) the probe is map-only — zero
exchanges in its plan, the whole point of prefiltering before the
join's shuffle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3logs_parquet_spark.operators.bloom import bloom_build, bloom_probe


def _dim(spark, n=1000):
    return spark.range(0, n).select((F.col("id") * 7).alias("key"))


def _fact(spark, n=50_000):
    return spark.range(0, n).select(
        F.pmod(F.col("id") * 13, F.lit(35_000)).alias("key"), F.col("id").alias("v")
    )


def test_no_false_negatives_probe_then_join_equals_join(spark):
    dim = _dim(spark)
    fact = _fact(spark)
    bits = bloom_build(dim, "key")
    probed = bloom_probe(fact, "key", bits)
    got = sorted((r["key"], r["v"]) for r in probed.join(dim, "key", "left_semi").collect())
    want = sorted((r["key"], r["v"]) for r in fact.join(dim, "key", "left_semi").collect())
    assert got == want and len(got) > 0


def test_false_positive_rate_bounded(spark):
    """At 2^17 bits / 5 hashes over 1000 keys (load ~4%/bit), the FP
    rate is ~(0.04)^5 — generously bound at 1% of non-matching rows."""
    dim = _dim(spark)
    fact = _fact(spark)
    bits = bloom_build(dim, "key")
    n_fact = fact.count()
    n_match = fact.join(dim, "key", "left_semi").count()
    n_probed = bloom_probe(fact, "key", bits).count()
    assert n_probed >= n_match  # superset (no FN)
    assert n_probed - n_match <= 0.01 * (n_fact - n_match)


def test_probe_plan_is_map_only(spark):
    """The probe must add NO exchange of any kind — the filter rides
    the scan stage."""
    fact = _fact(spark)
    bits = bloom_build(_dim(spark), "key")
    plan = bloom_probe(fact, "key", bits)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_null_keys_dropped_like_join_equality(spark):
    dim = _dim(spark, 10)
    fact = spark.createDataFrame(
        [(None, 1), (0, 2), (7, 3), (5, 4)], "key long, v long"
    )
    bits = bloom_build(dim, "key")
    kept = {r["v"] for r in bloom_probe(fact, "key", bits).collect()}
    assert 1 not in kept          # NULL key dropped
    assert {2, 3} <= kept         # real members kept


def test_build_validates_n_bits(spark):
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(_dim(spark, 10), "key", n_bits=100)


def test_string_keys(spark):
    """xxhash64 accepts any atomic type — string keys round-trip too."""
    dim = spark.createDataFrame([("a",), ("b",), ("c",)], "key string")
    fact = spark.createDataFrame([("a",), ("x",), ("c",), ("y",)], "key string")
    bits = bloom_build(dim, "key", n_bits=64 * 16)
    kept = {r["key"] for r in bloom_probe(fact, "key", bits).collect()}
    assert {"a", "c"} <= kept
