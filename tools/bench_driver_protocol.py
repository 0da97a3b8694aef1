"""Replicate the driver bench's per-query protocol for a SUBSET of
queries in a FRESH process: get_spark on local[$SPARK_GRAFT_CPUS],
one warm count() (plan + scan caches), then best-of-2 noop-sink timed
runs — exactly bench.py's methodology, so numbers are comparable to
BENCH_r*.json entries without paying the full 43-query run.

Usage: python tools/bench_driver_protocol.py <query> [query...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Prints one JSON line: {"queries": {name: sec}, "cold_first_run":
{name: sec}, "loadavg": [...], "sf_dir": ...}. cold_first_run is the
FIRST timed rep alone (what a cold driver process pays after the warm
count) — the number VERDICT r13 #5 asks about for emb_ivf_indexed_topk.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3logs_parquet_spark.plans.queries import QUERIES  # noqa: E402
from s3logs_parquet_spark.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(1)
    names = sys.argv[1:]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}; known: {sorted(QUERIES)[:10]}...")
        raise SystemExit(1)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="s3logs-bench-protocol")

    def loadavg():
        with open("/proc/loadavg") as fh:
            return [float(x) for x in fh.read().split()[:3]]

    la0 = loadavg()
    timings: dict[str, float] = {}
    first: dict[str, float] = {}
    for name in names:
        fn, _sql = QUERIES[name]
        spark.sparkContext.setJobDescription(f"protocol:{name}")
        df = fn(spark, sf_dir)
        df.count()
        best = float("inf")
        for rep in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if rep == 0:
                first[name] = round(dt, 3)
            best = min(best, dt)
        timings[name] = round(best, 3)
    print(
        json.dumps(
            {
                "queries": timings,
                "cold_first_run": first,
                "loadavg_start": la0,
                "loadavg_end": loadavg(),
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
