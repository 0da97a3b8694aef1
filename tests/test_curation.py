"""Curation pipeline invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3logs_parquet_spark.functions.text_analysis import langid, quality_score
from s3logs_parquet_spark.plans.curation import curate_documents


def test_curation_invariants(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = curate_documents(docs).cache()
    n = out.count()
    assert 0 < n <= docs.count()
    # survivors unique, all en, all above threshold, valid splits
    assert out.select("doc_id").distinct().count() == n
    assert out.filter(F.col("lang_pred") != "en").count() == 0
    assert out.filter(F.col("quality") < 0.5).count() == 0
    assert {r["split"] for r in out.select("split").distinct().collect()} <= {"train", "val", "test"}
    # deterministic across runs
    out2 = curate_documents(docs)
    assert out.exceptAll(out2).count() == 0 and out2.exceptAll(out).count() == 0


def test_curation_drops_planted_duplicates(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    # plant an exact duplicate of an existing doc with a higher id
    src = docs.filter(F.col("doc_id") == docs.agg(F.min("doc_id")).collect()[0][0])
    dup = src.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    out = curate_documents(docs.unionByName(dup))
    # the planted copy must never survive (min-id canonical wins)
    assert out.filter(F.col("doc_id") >= 10_000_000).count() == 0
