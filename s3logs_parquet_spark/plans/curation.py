"""The corpus-curation pipeline: the training-data operators composed
into one job — what a user actually runs over 100 TB of raw documents.

    quality filter → exact dedup (canonical = min doc_id per text)
      → near-dup filter (MinHash-LSH clusters, keep cluster minimum)
      → language filter → leakage-safe split assignment

Every stage is one of the engine's tested operators; the composition is
still a single lazy plan (plus the materialized signature checkpoint
inside the LSH stage). Packing (operators/packing.py) typically follows
per split; it stays out of this function so the curated frame remains
fully SQL-expressible for the differential oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from s3logs_parquet_spark.functions.hashing import hash32
from s3logs_parquet_spark.functions.text_analysis import with_quality_and_lang
from s3logs_parquet_spark.operators.dedup import (
    connected_components_clusters,
    exact_dedup,
    minhash_lsh_pairs,
)


def curate_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    languages: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.3,
    num_hashes: int = 32,
    bands: int = 8,
    lsh_max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Returns the curated frame: (doc_id, lang_pred, quality, split).

    Deterministic end to end — filters and survivors are pure functions
    of content — so re-runs, other engines, and resumed jobs agree row
    for row.

    ``lsh_max_bucket_size`` (default 10k) bounds the LSH candidate join
    against boilerplate floods with the 'star' policy: an oversized
    band bucket links members to its min-id representative instead of
    emitting B²/2 pairs. For the cluster-minimum dedup this pipeline
    performs, star links preserve exactly what matters — bucket
    connectivity — while a 1M-doc boilerplate corpus without the cap
    generates ~1.8e12 candidate pairs and dies in shuffle spill. Inert
    below the cap (test scales see identical output); pass None for the
    unguarded exact join."""
    # shared-work gate: words + per-language stopword hits computed
    # once (values identical to quality_score()/langid() — see
    # with_quality_and_lang's docstring; ~4x on the gate stage)
    scored = with_quality_and_lang(docs, text_col)
    kept = scored.filter(
        (F.col("quality") >= min_quality) & F.col("lang_pred").isin(*languages)
    )

    # exact dedup: canonical row = min doc_id per identical text.
    # id_col routes the narrow path: the survivor aggregate shuffles
    # (digest, id) only — document text never rides that exchange.
    exact = exact_dedup(kept, text_col, keep_order_col=id_col, id_col=id_col)

    # near-dup: keep only each cluster's minimum doc_id
    pairs = minhash_lsh_pairs(
        exact,
        id_col,
        text_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=3,
        jaccard_threshold=jaccard_threshold,
        max_bucket_size=lsh_max_bucket_size,
        oversize_policy="star",
    )
    labels = connected_components_clusters(pairs, exact.select(id_col), id_col)
    canonical = labels.filter(F.col(id_col) == F.col("cluster_id")).select(id_col)
    survivors = exact.join(canonical, id_col, "left_semi")

    # leakage-safe split: hash of the doc id (survivors are cluster
    # minima, so doc_id IS the cluster id here)
    bucket = F.pmod(hash32(F.col(id_col).cast("string")), F.lit(100))
    split = (
        F.when(bucket < 80, F.lit("train")).when(bucket < 90, F.lit("val")).otherwise(F.lit("test"))
    )
    return survivors.select(id_col, "lang_pred", "quality", split.alias("split"))
