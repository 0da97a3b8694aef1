"""Deterministic cardinality sketch: KMV (k-minimum-values).

Spark's `approx_count_distinct` is HyperLogLog++ — fine in
production, but its register layout makes the estimate
engine-specific, so it can only be tested structurally. KMV
(Bar-Yossef et al., "Counting distinct elements in a data stream",
RANDOM'02) estimates |S| from the k smallest values of a uniform hash
over S: if h_(k) is the k-th smallest hash normalized to [0,1),
E[|S|] ≈ (k-1)/h_(k). With the engine-portable md5-derived hash
(functions/hashing.py) the estimate is a pure deterministic function
of the data — bit-identical in any engine, so a DuckDB differential
oracle can check the VALUE, not just the shape.

Scale shape: distinct (group, value) reduction (one hash exchange,
map-side combined) → per-group k smallest via a rank window (sort
exchange keyed by group). Both shuffles are keyed by the group —
uniform and high-cardinality in the intended use (per-partition /
per-day cardinality reports). For global (single-group) sketches at
100 TB, flip to the two-level formulation: per-partition k-mins via
the same window over (group, spark_partition_id), then merge — the
standard mergeable-sketch property of KMV.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from s3logs_parquet_spark.functions.hashing import hash32

_HASH_SPACE = float(1 << 32)  # hash32 is uniform over [0, 2^32)


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate of ``value_col``.

    Returns (group_cols..., n_seen, est_distinct) where ``n_seen`` is
    the exact number of distinct hashes retained (= exact distinct
    count when a group has fewer than k distinct values — the
    standard KMV small-set rule) and ``est_distinct`` the estimate.
    """
    group_cols = list(group_cols)
    hashed = (
        df.select(*group_cols, hash32(F.col(value_col).cast("string")).alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("_h")
    topk = hashed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    per_group = topk.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.max(F.col("_h")).alias("_hk"),
    )
    norm = (F.col("_hk").cast("double") + F.lit(1.0)) / F.lit(_HASH_SPACE)
    est = F.when(F.col("n_seen") < k, F.col("n_seen").cast("double")).otherwise(
        (F.lit(float(k - 1))) / norm
    )
    return per_group.select(
        *group_cols,
        F.col("n_seen"),
        F.round(est, 4).alias("est_distinct"),
    )
