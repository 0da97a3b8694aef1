"""Sequence-packing operator invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3logs_parquet_spark.functions.text_analysis import whitespace_token_count
from s3logs_parquet_spark.operators.packing import pack_documents


def _packed(spark, sf_dir, max_tokens=64, n_shards=8):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", whitespace_token_count(F.col("text")).alias("n_tokens")
    )
    return d, pack_documents(d, "doc_id", "n_tokens", max_tokens=max_tokens, n_shards=n_shards)


def test_every_doc_assigned_once(spark, sf_dir):
    d, packed = _packed(spark, sf_dir)
    assert packed.count() == d.count()
    assert packed.select("doc_id").distinct().count() == d.count()


def test_budget_respected_except_oversized_singletons(spark, sf_dir):
    max_tokens = 64
    _d, packed = _packed(spark, sf_dir, max_tokens=max_tokens)
    over = (
        packed.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("tot") > max_tokens)
    )
    # any over-budget pack must be a single oversized document
    assert over.filter(F.col("n") > 1).count() == 0
    assert over.join(packed, "pack_id").filter(F.col("n_tokens") <= max_tokens).count() == 0


def test_pack_tokens_column_consistent(spark, sf_dir):
    _d, packed = _packed(spark, sf_dir)
    recomputed = packed.groupBy("pack_id").agg(F.sum("n_tokens").alias("tot"))
    joined = packed.join(recomputed, "pack_id").filter(F.col("pack_tokens") != F.col("tot"))
    assert joined.count() == 0


def test_deterministic_across_runs(spark, sf_dir):
    _d, p1 = _packed(spark, sf_dir)
    _d, p2 = _packed(spark, sf_dir)
    assert p1.exceptAll(p2).count() == 0 and p2.exceptAll(p1).count() == 0


def test_packing_efficiency_reasonable(spark, sf_dir):
    max_tokens = 64
    _d, packed = _packed(spark, sf_dir, max_tokens=max_tokens)
    stats = packed.groupBy("pack_id").agg(F.sum("n_tokens").alias("tot")).agg(
        F.avg("tot").alias("avg_fill")
    ).collect()[0]
    # FFD within shards should fill packs reasonably (> 50% of budget)
    assert stats["avg_fill"] > max_tokens * 0.5
