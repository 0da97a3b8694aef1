"""Incremental materialized rollup at scale: full build vs incremental
fold, with an exact rebuild-equivalence check.

50M raw events over 30 days (hourly windows × 10 event types → ~7.2k
rollup rows), then a 1M-event batch confined to one day folds in via
update_rollup — the claim under test is O(batch + affected-partition
rollup rows), independent of table history, plus correctness: the
incrementally-maintained table must equal a from-scratch rebuild over
union(base, batch) row for row (values are integral-valued doubles so
double sums are exact and order-independent).

Usage: python tools/bench_rollup_scale.py [--rows 50000000]
    [--batch-rows 1000000] [--days 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from s3logs_parquet_spark.plans.rollup import (
    materialize_rollup,
    rollup_events,
    update_rollup,
)
from s3logs_parquet_spark.session import get_spark

START = 1704067200  # 2024-01-01T00:00:00Z


def synth(spark, rows: int, days: int, id_offset: int = 0, day: int | None = None):
    r = spark.range(rows).select((F.col("id") + id_offset).alias("event_id"))
    h = F.xxhash64(F.col("event_id").cast("string"))
    if day is None:
        off = F.pmod(h, F.lit(days * 86400))
    else:
        off = F.lit(day * 86400) + F.pmod(h, F.lit(86400))
    return r.select(
        "event_id",
        F.timestamp_seconds(F.lit(START) + off).alias("ts"),
        F.concat(F.lit("t"), F.pmod(h, F.lit(10)).cast("string")).alias("event_type"),
        F.pmod(F.xxhash64("event_id", F.lit(1)), F.lit(1000)).cast("double").alias("value"),
    )


def fingerprint(df):
    cols = ["w", "event_type", "n_rows", "sum_value", "min_value", "max_value"]
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(F.xxhash64(*[F.col(c).cast("string") for c in cols]), F.lit(1_000_000_007))).alias("fp"),
    ).collect()[0]
    return int(agg["n"]), int(agg["fp"] or 0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=50_000_000)
    ap.add_argument("--batch-rows", type=int, default=1_000_000)
    ap.add_argument("--days", type=int, default=30)
    args = ap.parse_args()

    spark = get_spark(app_name="bench-rollup")
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="rollup-bench-")
    synth(spark, args.rows, args.days).write.mode("overwrite").parquet(work + "/raw")
    base = spark.read.parquet(work + "/raw")
    base.write.format("noop").mode("overwrite").save()
    batch = synth(spark, args.batch_rows, args.days, id_offset=args.rows, day=7)
    batch.write.mode("overwrite").parquet(work + "/batch")
    batch = spark.read.parquet(work + "/batch")

    out = {"rows": args.rows, "batch_rows": args.batch_rows, "days": args.days}

    t0 = time.time()
    materialize_rollup(base, work + "/rollup")
    out["full_build_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    dts = update_rollup(spark, batch, work + "/rollup")
    out["update_sec"] = round(time.time() - t0, 1)
    out["affected_dts"] = dts
    out["speedup"] = round(out["full_build_sec"] / max(out["update_sec"], 1e-9), 1)

    maintained = spark.read.parquet(work + "/rollup")
    rebuilt = rollup_events(base.unionByName(batch)).drop("dt")
    fp_m = fingerprint(maintained.drop("dt"))
    fp_r = fingerprint(rebuilt)
    out["rebuild_equivalent"] = fp_m == fp_r
    out["rollup_rows"] = fp_m[0]

    print(json.dumps({"metric": "rollup_scale", **out}), flush=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
