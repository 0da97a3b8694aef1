"""Manifest-stream scale bench: the streaming pillar's at-scale record
(VERDICT r6 #2) — >=10M lines through `run_manifest_stream` on
local[32], measuring end-to-end lines/s, per-micro-batch latency, and
T3 rotation (`maxRecordsPerFile`) behavior, next to the reference
fleet's 150k lines/s offered-load target
(/root/reference/scripts/loggen/conf.py:10,21 — 50 generators x 3k
lines/s).

Shape: N lines over a 24 h span with 5% planted verbatim duplicates
(the ETL capstone's workload, tools/bench_etl_scale.py, so batch and
streaming numbers are directly comparable), written as many text
objects; JSON-lines manifests name the objects in arrival order and
the stream drains them with Trigger.AvailableNow in
`ceil(manifests / max_files_per_trigger)` micro-batches, each running
the fused parse -> F1 -> window -> dedup -> partitioned-write batch
plan over exactly its manifest-named objects (the reference's
SQS-driven topology, streaming/job.py run_manifest_stream).

Also re-verifies the standing stream<->batch differential AT SCALE:
the drained stream's table must carry the same row count and
per-(dt) row counts and value fingerprint as the batch path over the
same objects — micro-batch boundaries must not change WHAT is
computed, only when. (Planted duplicates are same-object adjacent
rows, so batch-scoped D1 sees every planted pair in both topologies.)

Usage: python tools/bench_stream_scale.py [--rows 10000000]
    [--objects 125] [--manifests 16] [--files-per-trigger 4]
    [--threshold-lines 100000]
"""

from __future__ import annotations

import argparse
import glob
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
from s3logs_parquet_spark.session import get_spark  # noqa: E402
from s3logs_parquet_spark.sources.text_source import read_log_lines  # noqa: E402
from s3logs_parquet_spark.streaming.job import (  # noqa: E402
    StreamingJobConfig,
    run_manifest_stream,
)
from tools.bench_etl_scale import BASE_EPOCH  # noqa: E402


def synth_lines_grouped(spark, n: int, objects: int):
    """The ETL bench's workload (24 h span, every 20th line a verbatim
    duplicate of its predecessor) with object assignment made
    DUP-PAIR-SAFE: rows are grouped into `objects` contiguous id
    ranges and hash-repartitioned BY GROUP, so a duplicate pair
    (id-1, id) can only split across objects if a group boundary
    falls between them — and with the per-object row count forced to
    a multiple of 20 (the dup stride), it never does. That makes the
    stream<->batch differential exact: batch-scoped D1 sees every
    planted pair in both topologies regardless of how manifests split
    the objects across micro-batches."""
    from s3logs_parquet_spark.plans.queries import _synthetic_log_line_col

    if n % objects != 0 or (n // objects) % 20 != 0:
        raise ValueError(
            f"rows/objects must be an integer multiple of 20 for exact "
            f"dup-pair colocation, got {n}/{objects}"
        )
    per = n // objects
    df = spark.range(1, n + 1)
    src = F.when((F.col("id") % 20 == 0) & (F.col("id") > 1), F.col("id") - 1).otherwise(
        F.col("id")
    )
    ev = df.select(
        F.col("id"),
        src.alias("event_id"),
        (src % 1000).alias("user_id"),
        F.timestamp_seconds(F.lit(BASE_EPOCH) + src % 86400).alias("ts"),
        F.element_at(
            F.array(F.lit("click"), F.lit("view"), F.lit("scroll"), F.lit("error"), F.lit("purchase")),
            (src % 5 + 1).cast("int"),
        ).alias("event_type"),
        (src % 100).cast("double").alias("value"),
    )
    lines = ev.select(
        _synthetic_log_line_col(ev).alias("value"),
        F.floor((F.col("id") - 1) / per).alias("_obj"),
    )
    return lines.repartition(objects, F.col("_obj")).select("value")


def fingerprint(df):
    """Order-insensitive value fingerprint over the full 26-field row:
    sum of per-row crc32 — cheap, associative, and any field diff at
    any row moves it."""
    cols = [c for c in df.columns if c not in ("batch",)]
    return df.select(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in sorted(cols)]))).alias("fp"),
    ).collect()[0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--objects", type=int, default=125)  # 10M/125 = 80k, a multiple of the dup stride
    ap.add_argument("--manifests", type=int, default=16)
    ap.add_argument("--files-per-trigger", type=int, default=4)
    ap.add_argument("--threshold-lines", type=int, default=100_000)
    ap.add_argument(
        "--fold",
        action="store_true",
        help="after the drain + differential, run fold_stream_batches "
        "(final mode) over the stream output and verify the folded "
        "table reads identically (row count + fingerprint)",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="bench-stream-scale")
    work = tempfile.mkdtemp(prefix="bench_stream_scale_")
    try:
        # -- objects: N lines as --objects text files under one "bucket"
        objroot = os.path.join(work, "objects")
        bucket_dir = os.path.join(objroot, "bkt")
        t0 = time.time()
        synth_lines_grouped(spark, args.rows, args.objects).write.text(bucket_dir)
        gen_s = time.time() - t0
        keys = sorted(
            os.path.basename(p) for p in glob.glob(os.path.join(bucket_dir, "part-*"))
        )
        assert keys, bucket_dir

        # -- manifests: arrival order, round-robin objects per manifest
        man_dir = os.path.join(work, "man")
        os.makedirs(man_dir)
        per = -(-len(keys) // args.manifests)
        for m in range(args.manifests):
            chunk = keys[m * per : (m + 1) * per]
            if not chunk:
                break
            lines = [
                json.dumps(
                    {
                        "Records": [
                            {
                                "eventName": "ObjectCreated:Put",
                                "s3": {
                                    "bucket": {"name": "bkt"},
                                    "object": {"key": k, "size": 1},
                                },
                            }
                        ]
                    }
                )
                for k in chunk
            ]
            with open(os.path.join(man_dir, f"m{m:04d}.json"), "w") as f:
                f.write("\n".join(lines) + "\n")

        # -- drain the stream
        cfg = EngineConfig(threshold_lines=args.threshold_lines)
        scfg = StreamingJobConfig(
            available_now=True,
            max_files_per_trigger=args.files_per_trigger,
            partition_granularity="hour",
        )
        out_dir, ckpt = os.path.join(work, "out"), os.path.join(work, "ckpt")
        t0 = time.time()
        q = run_manifest_stream(
            spark, man_dir, out_dir, ckpt, cfg, scfg,
            scheme="file://", object_root=objroot,
        )
        q.awaitTermination()
        stream_s = time.time() - t0
        progress = [
            {
                "batch": p["batchId"],
                "manifest_rows": p["numInputRows"],
                "ms": p["durationMs"].get("triggerExecution"),
            }
            for p in (json.loads(pr.json) for pr in q.recentProgress)
            if p["numInputRows"] > 0
        ]

        # -- rotation (T3): no parquet file may exceed threshold_lines
        # rows (footer metadata read, no Spark jobs)
        import pyarrow.parquet as pq

        files = glob.glob(os.path.join(out_dir, "batch=*", "dt=*", "*.parquet"))
        per_file = [pq.ParquetFile(p).metadata.num_rows for p in files]
        n_over = sum(1 for c in per_file if c > args.threshold_lines)

        # -- stream<->batch differential at scale
        stream_tbl = spark.read.parquet(out_dir)
        s = fingerprint(stream_tbl)
        paths = [f"file://{bucket_dir}/{k}" for k in keys]
        batch_rows = parse_and_dedup(read_log_lines(spark, paths), cfg)
        batch_tbl = batch_rows.withColumn(
            "dt", F.date_format(F.col("ts"), "yyyyMMddHH")
        ).drop("n_fields", "ts", "agg_window", "bucket_key")
        b = fingerprint(batch_tbl)

        fold = None
        if args.fold:
            from s3logs_parquet_spark.plans.compact import fold_stream_batches

            t0 = time.time()
            fstats = fold_stream_batches(
                spark, out_dir, final=True, checkpoint_dir=ckpt,
                max_records_per_file=args.threshold_lines,
            )
            fold_s = time.time() - t0
            folded = spark.read.parquet(out_dir)
            ff = fingerprint(folded)
            n_files_after = len(glob.glob(os.path.join(out_dir, "dt=*", "*.parquet")))
            fold = {
                "fold_s": round(fold_s, 1),
                "stats": fstats,
                "files_before": len(files),
                "files_after": n_files_after,
                "identity": bool(ff["rows"] == s["rows"] and ff["fp"] == s["fp"]),
            }

        print(
            json.dumps(
                {
                    "tool": "bench_stream_scale",
                    "fold": fold,
                    "rows_in": args.rows,
                    "objects": args.objects,
                    "manifests": args.manifests,
                    "gen_s": round(gen_s, 1),
                    "stream_s": round(stream_s, 1),
                    "lines_per_s": round(args.rows / stream_s),
                    "micro_batches": len(progress),
                    "batch_ms": [p["ms"] for p in progress],
                    "rows_out": s["rows"],
                    "rotation": {
                        "threshold_lines": args.threshold_lines,
                        "n_files": len(files),
                        "max_rows_per_file": max(per_file) if per_file else 0,
                        "files_over_threshold": n_over,
                        "files_sampled": len(per_file),
                    },
                    "differential": {
                        "stream_rows": s["rows"],
                        "batch_rows": b["rows"],
                        "stream_fp": int(s["fp"]),
                        "batch_fp": int(b["fp"]),
                        "match": bool(s["rows"] == b["rows"] and s["fp"] == b["fp"]),
                    },
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
