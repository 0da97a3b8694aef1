"""PPS systematic sampling at scale: wall time and the exact-k
invariant at ≥100M rows — evidence that the binned-prefix-sum
formulation (operators/sampling.py) holds where a global-window cumsum
would serialize.

The corpus is synthesized JVM-side from hash arithmetic (no driver
data): integer weights with a heavy tail (90% light 1-10, 9% medium
~100, 1% heavy ~5000) — the document-length shape a quality-weighted
corpus draw actually sees.

Usage: python tools/bench_sampling_scale.py [--rows 100000000] [--k 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from s3logs_parquet_spark.operators.sampling import (  # noqa: E402
    mixture_sample,
    weighted_systematic_sample,
)
from s3logs_parquet_spark.session import get_spark  # noqa: E402


def synth(spark, n: int):
    df = spark.range(n)
    kind = F.pmod(F.xxhash64("id"), F.lit(100))
    w = (
        F.when(kind < 90, F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10)) + 1)
        .when(kind < 99, F.pmod(F.xxhash64("id", F.lit(2)), F.lit(150)) + 50)
        .otherwise(F.pmod(F.xxhash64("id", F.lit(3)), F.lit(5000)) + 2500)
    )
    src = F.concat(F.lit("s"), F.pmod(F.xxhash64("id", F.lit(4)), F.lit(50)))
    return df.select("id", w.cast("long").alias("w"), src.alias("source"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--k", type=int, default=100_000)
    args = ap.parse_args()

    spark = get_spark(app_name="bench-sampling-scale")
    d = synth(spark, args.rows)

    t0 = time.time()
    out = weighted_systematic_sample(d, "w", k=args.k, id_col="id")
    agg = out.agg(
        F.count(F.lit(1)).alias("rows"), F.sum("n_copies").alias("copies")
    ).first()
    pps_sec = time.time() - t0
    assert agg["copies"] == args.k, f"exact-k violated: {agg['copies']} != {args.k}"

    t0 = time.time()
    mx = mixture_sample(d, "source", "id", k_total=args.k)
    mx_rows = mx.count()
    mx_sec = time.time() - t0

    print(
        json.dumps(
            {
                "rows": args.rows,
                "k": args.k,
                "pps_sec": round(pps_sec, 1),
                "pps_selected_rows": agg["rows"],
                "pps_total_copies": agg["copies"],
                "mixture_sec": round(mx_sec, 1),
                "mixture_rows": mx_rows,
            }
        )
    )


if __name__ == "__main__":
    main()
