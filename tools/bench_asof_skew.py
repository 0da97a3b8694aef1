"""Hot-key as-of join crossover bench (VERDICT r3 #4).

Measures where `asof_join_chunked` starts beating the base
single-window `asof_join` on a skewed corpus: N left rows + N right
rows, `--hot-frac` of them on ONE key, the rest uniform over `--keys`
keys, timestamps uniform over `--span` seconds. The base plan
serializes each key onto one task (a 60%-hot key ⇒ one task sorts
0.6·2N rows); the chunked plan's parallelism is keys × chunks.

Usage: python tools/bench_asof_skew.py [--rows 5000000] [--hot-frac 0.6]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from s3logs_parquet_spark.operators.temporal import asof_join, asof_join_chunked  # noqa: E402
from s3logs_parquet_spark.session import get_spark  # noqa: E402

BASE_TS = 1_715_500_800


def synth(spark, n: int, hot_frac: float, n_keys: int, span: int, salt: int):
    """Deterministic skewed (user_id, ts, payload) frame, JVM-side."""
    hot_pct = int(hot_frac * 100)
    df = spark.range(n)
    key = F.when(
        F.pmod(F.xxhash64("id", F.lit(salt)), F.lit(100)) < hot_pct, F.lit(0)
    ).otherwise(F.pmod(F.xxhash64("id", F.lit(salt + 1)), F.lit(n_keys)))
    ts = F.timestamp_seconds(
        F.lit(BASE_TS) + F.pmod(F.xxhash64("id", F.lit(salt + 2)), F.lit(span))
    )
    return df.select(
        key.alias("user_id"), ts.alias("ts"), F.col("id").alias("payload")
    )


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5_000_000, help="rows PER SIDE")
    ap.add_argument("--hot-frac", type=float, default=0.6)
    ap.add_argument("--keys", type=int, default=10_000)
    ap.add_argument("--span", type=int, default=1_000_000, help="time span seconds")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name="bench-asof-skew")
    left = synth(spark, args.rows, args.hot_frac, args.keys, args.span, 1)
    right = synth(spark, args.rows, args.hot_frac, args.keys, args.span, 7)

    # chunk widths from coarse to fine: hot-key chunk row-counts of
    # roughly 2N*hot/(span/chunk) each
    configs: list[tuple[str, int | None]] = [("base", None)] + [
        (f"chunk_{args.span // d}s", args.span // d) for d in (16, 64, 256, 1024)
    ]
    out = {}
    for name, chunk in configs:
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.time()
            if chunk is None:
                force(asof_join(left, right, "ts", ["user_id"]))
            else:
                force(asof_join_chunked(left, right, "ts", ["user_id"], chunk))
            best = min(best, time.time() - t0)
        out[name] = round(best, 2)
        print(f"# {name}: {best:.2f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "asof_skew_crossover",
                "rows_per_side": args.rows,
                "hot_frac": args.hot_frac,
                "span_s": args.span,
                "timings": out,
            }
        )
    )


if __name__ == "__main__":
    main()
