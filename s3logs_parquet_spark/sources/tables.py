"""Parquet table loader for the testdata star schema.

The events table is written with TIMESTAMP(NANOS), which Spark's
parquet reader rejects outright. We flip the documented escape hatch
(spark.sql.legacy.parquet.nanosAsLong) at runtime, read the physical
INT64 nanos, and convert to a proper timestamp at microsecond
precision (floor) — matching how DuckDB surfaces TIMESTAMP_NS to
clients. All other tables pass through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name != "events":
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df
