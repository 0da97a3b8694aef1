"""Fused-ETL scale bench: the reference's primary operating metric
(BASELINE.md observed-throughput, lines/s) at tens of millions of
lines — parse → window → dedup → partitioned parquet, end-to-end.

Shape matches the PERF.md round-1..3 capstone so rounds stay
comparable: N lines over a 24-hour span, 5% planted verbatim-duplicate
lines (same RequestID + identical text), Hive-partitioned output.
Lines are rendered JVM-side from `spark.range` (the distributed
generator prior rounds used inline) and written as many text objects
so the map stage gets real input splits, like production S3 access
logs.

Usage: python tools/bench_etl_scale.py [--rows 50000000] [--files 256]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from s3logs_parquet_spark.config import EngineConfig  # noqa: E402
from s3logs_parquet_spark.plans.batch import parse_and_dedup  # noqa: E402
from s3logs_parquet_spark.plans.queries import _synthetic_log_line_col  # noqa: E402
from s3logs_parquet_spark.session import get_spark  # noqa: E402
from s3logs_parquet_spark.writer import (  # noqa: E402
    auto_files_per_partition,
    with_partition_columns,
    write_partitioned_parquet,
)

BASE_EPOCH = 1715500800  # 2024-05-12T08:00:00Z, same base as bench.py


def synth_lines(spark, n: int):
    """n access-log lines over a 24 h span; every 20th row re-renders
    its predecessor's event (verbatim duplicate line → planted dup)."""
    df = spark.range(1, n + 1)
    src = F.when((F.col("id") % 20 == 0) & (F.col("id") > 1), F.col("id") - 1).otherwise(
        F.col("id")
    )
    ev = df.select(
        src.alias("event_id"),
        (src % 1000).alias("user_id"),
        F.timestamp_seconds(F.lit(BASE_EPOCH) + src % 86400).alias("ts"),
        F.element_at(
            F.array(F.lit("click"), F.lit("view"), F.lit("scroll"), F.lit("error"), F.lit("purchase")),
            (src % 5 + 1).cast("int"),
        ).alias("event_type"),
        (src % 100).cast("double").alias("value"),
    )
    return ev.select(_synthetic_log_line_col(ev).alias("value"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=50_000_000)
    ap.add_argument("--files", type=int, default=256)
    args = ap.parse_args()

    spark = get_spark(app_name="bench-etl-scale")
    work = tempfile.mkdtemp(prefix="bench_etl_scale_")
    try:
        lines_path = os.path.join(work, "lines")
        t0 = time.time()
        synth_lines(spark, args.rows).repartition(args.files).write.text(lines_path)
        gen_s = time.time() - t0
        n_lines = spark.read.text(lines_path).count()

        out_path = os.path.join(work, "out")
        cfg = EngineConfig()
        t0 = time.time()
        lines = spark.read.text(lines_path)
        result = parse_and_dedup(lines, cfg)
        out = with_partition_columns(result, cfg).drop(
            "n_fields", "ts", "agg_window", "bucket_key"
        )
        # mirror run_batch_transform's shipped write path: the
        # size-based salt keeps writer parallelism proportional to
        # data volume (plans/batch.py:212). The tool previously wrote
        # with files_per_partition=1, which at a 24-hour span caps the
        # write at <=24 collision-prone tasks — it benchmarked the
        # harness, not the engine (round-10 A/B: 89.1 s vs 21.0 s at
        # 10M lines for the write-side difference alone).
        salt = auto_files_per_partition(lines_path, spark=spark)
        write_partitioned_parquet(
            out, out_path, cfg, mode="overwrite", files_per_partition=salt
        )
        etl_s = time.time() - t0
        rows_out = spark.read.parquet(out_path).count()

        print(
            json.dumps(
                {
                    "metric": "fused_etl_scale",
                    "rows": args.rows,
                    "n_lines": n_lines,
                    "gen_s": round(gen_s, 1),
                    "etl_s": round(etl_s, 1),
                    "lines_per_sec": round(n_lines / etl_s, 1),
                    "rows_out": rows_out,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
