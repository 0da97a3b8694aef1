"""Windowing / grouping operators G1-G5 (SURVEY.md §2.5).

The reference's grouping machinery — sorted-vector range splits
(utils.rs:616-645), per-(bucket, window) file groups (:982-1022),
streaming BTreeMap partition maps (output.rs:673-693) — all collapse
into DataFrame column derivations + groupBy/partitionBy: Spark's hash
exchange IS the reference's staging tier. Crucially we do NOT replicate
the reference's global sort (O1, utils.rs:607): it exists only to make
range-splitting easy single-threaded, and at 100 TB a global sort is a
needless full shuffle. Window assignment here is a stateless map.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from s3logs_parquet_spark.config import ALLBUCKETS, EngineConfig
from s3logs_parquet_spark.functions.timeops import window_start
from s3logs_parquet_spark.schema import BUCKET_FIELD


def with_agg_window(
    df: DataFrame, ts_col: str = "ts", align_seconds: int = 900, out_col: str = "agg_window"
) -> DataFrame:
    """G1/G2 — assign each row its tumbling-window start (epoch s).

    Replaces the reference's sort+split (utils.rs:607-645): the window id
    is a pure function of the timestamp, so no ordering requirement and
    no shuffle; downstream groupBy/partitionBy hashes on it.
    """
    return df.withColumn(out_col, window_start(F.col(ts_col), align_seconds))


def bucket_key(cfg: EngineConfig, bucket_col: str | None = None) -> Column:
    """G3 — grouping bucket: the row's source bucket, or the ALLBUCKETS
    sentinel when merge is on (default true; s3logs/src/utils.rs:693-700,
    README.md:54). Positional under a config-file schema: the source
    bucket is the 2nd loaded field (utils.rs:44), whatever its name."""
    if cfg.merge_orig_buckets:
        return F.lit(ALLBUCKETS)
    if bucket_col is None:
        bucket_col = cfg.schema_fields[1] if cfg.schema_fields else BUCKET_FIELD
    return F.col(bucket_col)


def with_bucket_key(df: DataFrame, cfg: EngineConfig, out_col: str = "bucket_key") -> DataFrame:
    return df.withColumn(out_col, bucket_key(cfg))


def group_counts(df: DataFrame, *keys: str) -> DataFrame:
    """G6 — the reference's count-consistency invariant
    (utils.rs:641-643) as an aggregate: rows per group; total equals
    input count by construction (map-side combined)."""
    return df.groupBy(*[F.col(k) for k in keys]).agg(F.count(F.lit(1)).alias("n_rows"))


def sliding_means(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window: str = "15 minutes",
    slide: str = "1 minute",
) -> DataFrame:
    """G7 — the monitor task's sliding-window means
    (s3logd-stream/src/mon.rs:40-129) as a built-in sliding window agg."""
    return (
        df.groupBy(F.window(F.col(ts_col), window, slide).alias("w"))
        .agg(
            F.avg(value_col).alias("avg_value"),
            F.sum(value_col).alias("sum_value"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "avg_value",
            "sum_value",
            "n_rows",
        )
    )
