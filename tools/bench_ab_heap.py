"""A/B the round-5 session change (driver heap 8g → 48g) on the five
shared-headline queries VERDICT r5 flagged as >25% slower vs r03
(events_sliding_means 1.68x, tpch_q1 1.52x, tpch_q5 1.49x,
events_tumbling_window 1.41x, tpch_q3 1.30x), plus two controls that
did NOT regress. Same measurement protocol as bench.py (noop sink,
warm-up count, best of N timed runs).

Run once per heap setting:
    SPARK_DRIVER_MEMORY=8g  python tools/bench_ab_heap.py
    SPARK_DRIVER_MEMORY=48g python tools/bench_ab_heap.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3logs_parquet_spark.plans.queries import QUERIES  # noqa: E402
from s3logs_parquet_spark.session import get_spark  # noqa: E402

FLAGGED = [
    "events_sliding_means",
    "tpch_q1_pricing_summary",
    "tpch_q5_local_supplier_volume",
    "events_tumbling_window",
    "tpch_q3_shipping_priority",
]
# (events_asof_click was the r6 control; retired round 7 into the
# chunked twin — same query, same oracle)
CONTROLS = ["events_asof_click_chunked", "docs_langid"]  # quality_score retired r8


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("AB_RUNS", "4"))
    spark = get_spark(app_name="bench-ab-heap")
    heap = spark.conf.get("spark.driver.memory")
    timings = {}
    for name in FLAGGED + CONTROLS:
        fn, _ = QUERIES[name]
        fn(spark, sf_dir).count()  # warm
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    print(json.dumps({"heap": heap, "runs": n_runs, "timings": timings}))


if __name__ == "__main__":
    main()
