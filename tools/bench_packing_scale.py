"""Sequence packing at scale: wall time + packing quality of
pack_documents as the corpus grows — the per-shard assignment loop is
pure Python, so this is the operator whose scale ceiling is set by
algorithmic complexity, not by Spark.

Corpus: deterministic hash-derived token lengths on a realistic
long-tail shape (80% short 30-400, 15% medium 400-1500, 5% long
1500-8000 incl. oversized-singleton cases vs max_tokens=4096).

Reports per leg: wall, packs, mean/p50 fill ratio (pack_tokens /
max_tokens over non-oversized packs), and the two invariant checks
(every doc exactly once; no multi-doc pack over budget) run
distributed.

Usage: python tools/bench_packing_scale.py [--rows 10000000]
    [--shards 64] [--max-tokens 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from s3logs_parquet_spark.operators.packing import pack_documents
from s3logs_parquet_spark.session import get_spark


def synth(spark, rows: int):
    r = spark.range(rows).withColumnRenamed("id", "doc_id")
    h = F.xxhash64(F.col("doc_id").cast("string"))
    b = F.pmod(h, F.lit(100))
    tok = (
        F.when(b < 80, F.lit(30) + F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(371)))
        .when(b < 95, F.lit(400) + F.pmod(F.xxhash64("doc_id", F.lit(2)), F.lit(1101)))
        .otherwise(F.lit(1500) + F.pmod(F.xxhash64("doc_id", F.lit(3)), F.lit(6501)))
    )
    return r.select("doc_id", tok.cast("long").alias("n_tokens"))


def run_leg(spark, base, rows: int, max_tokens: int, shards: int) -> dict:
    from s3logs_parquet_spark.session import materialize, release

    t0 = time.time()
    # materialize ONCE and time that; the stats/invariant consumers
    # below would otherwise re-run the whole Python packing pass per
    # action and double the reported wall
    packed = materialize(
        pack_documents(base, "doc_id", "n_tokens", max_tokens=max_tokens, n_shards=shards)
    )
    wall = time.time() - t0
    stats = (
        packed.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("n"))
    )
    agg = stats.agg(
        F.count(F.lit(1)).alias("packs"),
        F.avg(F.when(F.col("tot") <= max_tokens, F.col("tot"))).alias("fill"),
        F.median(F.when(F.col("tot") <= max_tokens, F.col("tot"))).alias("fill_p50"),
        F.sum(
            ((F.col("tot") > max_tokens) & (F.col("n") > 1)).cast("int")
        ).alias("bad_packs"),
    ).collect()[0]
    n_assigned = packed.select("doc_id").distinct().count()
    release(packed)
    return {
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(base_rows_cache[0] / wall, 0),
        "packs": int(agg["packs"]),
        "mean_fill": round(float(agg["fill"]) / max_tokens, 4),
        "p50_fill": round(float(agg["fill_p50"]) / max_tokens, 4),
        "invariants_ok": bool(agg["bad_packs"] == 0 and n_assigned == rows),
    }


base_rows_cache = [0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--max-tokens", type=int, default=4096)
    args = ap.parse_args()
    base_rows_cache[0] = args.rows

    spark = get_spark(app_name="bench-packing")
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="packing-bench-")
    synth(spark, args.rows).write.mode("overwrite").parquet(work + "/c")
    base = spark.read.parquet(work + "/c")
    base.write.format("noop").mode("overwrite").save()

    leg = run_leg(spark, base, args.rows, args.max_tokens, args.shards)
    print(
        json.dumps(
            {
                "metric": "packing_scale",
                "rows": args.rows,
                "shards": args.shards,
                "max_tokens": args.max_tokens,
                **leg,
            }
        ),
        flush=True,
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
