"""Per-trigger Spark-job floor for run_stream_curation on the
UNIQUE-corpus regime (VERDICT r11 #6 follow-through).

Round 10 recorded ~6 jobs/trigger (2 materializations, CC
edges+count+collect, 3 overlapped sinks) and a 6.8x online/offline gap;
round 11's zero-edge CC short-circuit dropped the union-find collect,
the component-map frame and the singleton anti-join from every
zero-pair trigger (8 -> 5 jobs measured on the operator in isolation).
This tool measures the END-TO-END jobs/trigger the stream actually
pays now, attributing the floor precisely:

- corpus: every doc unique (the zero-pair regime — within-batch LSH
  finds nothing, the history probe finds nothing, yet both must run
  to KNOW that).
- job counts come from the driver's AppStatusStore (jobsList), sampled
  around the whole availableNow drain; per-trigger = delta / triggers.
  A first drain (1 trigger) is measured separately from a second drain
  over k more files on the SAME checkpoint+index, because trigger 1
  skips the history probe structurally (prior_batches returns None on
  an empty store — the "index empty" skip VERDICT r11 #6 asks about is
  already load-bearing).

The other skip the VERDICT asks about — skipping the probe when the
batch's candidate band set is empty — is evaluated here by reading the
measured shape: the probe's hits ride the survivors-write job (no
dedicated probe job exists to skip), so an emptiness pre-test would ADD
a job per trigger to remove none. See PERF.md round 12 for the
recorded numbers and the kept/negative verdict.

Usage: python tools/exp_trigger_job_floor.py [--rows 20000] [--batches 6]
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
from pyspark.sql import types as T  # noqa: E402

from s3logs_parquet_spark.session import get_spark  # noqa: E402
from s3logs_parquet_spark.streaming.job import (  # noqa: E402
    StreamingJobConfig,
    run_stream_curation,
)
from tools.bench_curation_scale import _salad  # noqa: E402

SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


def _total_jobs(spark) -> int:
    """Total jobs this application has run, from the driver's
    AppStatusStore (retained-job eviction would undercount — raise
    spark.ui.retainedJobs if triggers * jobs nears the default 1000)."""
    return spark.sparkContext._jsc.sc().statusStore().jobsList(None).size()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000)
    ap.add_argument("--batches", type=int, default=6)
    args = ap.parse_args()

    spark = get_spark(
        app_name="exp-trigger-job-floor",
        extra_conf={"spark.ui.retainedJobs": "100000"},
    )
    work = tempfile.mkdtemp(prefix="trigger-floor-")
    inp = os.path.join(work, "in")
    out, idx, ck = (os.path.join(work, d) for d in ("out", "idx", "ck"))

    # unique corpus: salads keyed by doc_id — no exact dups, no near
    # dups, the zero-pair regime end to end
    docs = spark.range(args.rows * (args.batches + 1)).select(
        F.col("id").alias("doc_id"), _salad(F.col("id")).alias("text")
    )
    for b in range(args.batches + 1):
        lo, hi = b * args.rows, (b + 1) * args.rows
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(inp)

    scfg = StreamingJobConfig(available_now=True, max_files_per_trigger=1)

    def drain() -> tuple[int, int, float]:
        j0, t0 = _total_jobs(spark), time.time()
        q = run_stream_curation(
            spark, inp, SCHEMA, out, idx, ck,
            min_quality=0.0, languages=("en",),
            scfg=scfg,
        )
        q.awaitTermination(1800)
        triggers = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        return _total_jobs(spark) - j0, triggers, time.time() - t0

    # leg 1: only the FIRST file visible -> 1 trigger, empty index ->
    # the structural probe skip (prior_batches is None)
    hidden = sorted(
        f for f in os.listdir(inp) if f.endswith(".parquet")
    )[1:]
    stash = os.path.join(work, "stash")
    os.makedirs(stash)
    for f in hidden:
        shutil.move(os.path.join(inp, f), os.path.join(stash, f))
    jobs1, trig1, sec1 = drain()

    # leg 2: the rest of the files on the same checkpoint -> every
    # trigger probes the (growing) index and finds nothing
    for f in hidden:
        shutil.move(os.path.join(stash, f), os.path.join(inp, f))
    jobs2, trig2, sec2 = drain()

    survivors = spark.read.parquet(out).count()
    print(
        json.dumps(
            {
                "metric": "trigger_job_floor",
                "rows_per_batch": args.rows,
                "first_trigger": {
                    "jobs": jobs1,
                    "triggers": trig1,
                    "sec": round(sec1, 1),
                },
                "steady_state": {
                    "jobs": jobs2,
                    "triggers": trig2,
                    "jobs_per_trigger": round(jobs2 / max(trig2, 1), 2),
                    "sec": round(sec2, 1),
                    "sec_per_trigger": round(sec2 / max(trig2, 1), 2),
                },
                "survivors": survivors,
                "expected_survivors": args.rows * (args.batches + 1),
            }
        ),
        flush=True,
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
