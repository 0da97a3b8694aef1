"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query smoke check at sf0.001
queries()    — every implemented operator from SURVEY.md §2 + the
               training-data extension families, as (spark, sf_dir) →
               DataFrame callables
oracle_sql() — DuckDB twins for the differential correctness gate
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from s3logs_parquet_spark.plans.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full log-pipeline round-trip (parse → window →
    dedup → aggregate) on /root/testdata/sf0.001."""
    fn, _ = QUERIES["s3log_pipeline_roundtrip"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
