"""Z-order layout pruning at scale (VERDICT r5 #5): write the SAME
≥5M-row two-dimensional table three ways — z-ordered, linear-sorted on
x, unsorted — and measure, from the parquet footers, what fraction of
row groups a reader skips under (a) an x-only band, (b) a y-only
band, and (c) an (x AND y) box predicate.

The claim under test (operators/layout.py docstring): a linear sort
prunes only its own dimension; the Morton interleave prunes BOTH,
because each file/row-group covers a small rectangle of (x, y) space.

Rows are generated JVM-side (spark.range + hash arithmetic); the
predicate bands are ~1/16 of each dimension's domain.

Usage: python tools/bench_zorder_scale.py [--rows 6000000] [--files 64]
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

from s3logs_parquet_spark.session import get_spark  # noqa: E402

DOMAIN = 1 << 16  # both dimensions uniform over [0, 65536)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=6_000_000)
    ap.add_argument("--files", type=int, default=64)
    args = ap.parse_args()

    spark = get_spark(app_name="bench-zorder-scale")
    from s3logs_parquet_spark.operators.layout import (
        rowgroup_prune_fraction,
        write_zordered,
        zorder_key,
    )

    df = spark.range(args.rows).select(
        F.pmod(F.xxhash64("id"), F.lit(DOMAIN)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(DOMAIN)).alias("y"),
        F.col("id").alias("payload"),
    )

    work = tempfile.mkdtemp(prefix="zorder_bench_")
    paths = {k: os.path.join(work, k) for k in ("zorder", "linear_x", "unsorted")}
    timings = {}

    t0 = time.time()
    write_zordered(df, paths["zorder"], [F.col("x"), F.col("y")], bits=16, n_files=args.files)
    timings["write_zorder_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    df.repartitionByRange(args.files, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(paths["linear_x"])
    timings["write_linear_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    df.repartition(args.files).write.mode("overwrite").parquet(paths["unsorted"])
    timings["write_unsorted_s"] = round(time.time() - t0, 1)

    band = DOMAIN // 16
    preds = {
        "x_band": {"x": (8 * band, 9 * band - 1)},
        "y_band": {"y": (8 * band, 9 * band - 1)},
        "xy_box": {"x": (8 * band, 9 * band - 1), "y": (8 * band, 9 * band - 1)},
    }
    out = {"rows": args.rows, "files": args.files, "timings": timings, "prune": {}}
    for layout, path in paths.items():
        out["prune"][layout] = {}
        for pname, boxes in preds.items():
            skip, total = rowgroup_prune_fraction(path, boxes)
            out["prune"][layout][pname] = {
                "skipped": skip,
                "total": total,
                "fraction": round(skip / total, 3) if total else None,
            }
    print(json.dumps(out, indent=2))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
