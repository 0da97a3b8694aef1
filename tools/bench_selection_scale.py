"""Selection operators at scale: cap_per_group's scan-level
WindowGroupLimit prune + id rejoin vs the naive per-group window, and
budget_select's boundary-find vs the naive global running-sum window —
same-session A/B legs with answer-fingerprint parity.

Corpus shape is the adversarial one for both operators: one HOT source
holding ``--hot-frac`` of all rows (the naive per-group window funnels
it into a single sort task) plus a long tail of small sources that sit
UNDER their cap (the count-aware split keeps them map-only); scores and
weights are deterministic hash-derived values so every leg selects the
identical rows.

Usage: python tools/bench_selection_scale.py [--rows 10000000]
    [--tail-sources 100000] [--hot-frac 0.5] [--cap 1000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from s3logs_parquet_spark.functions.hashing import hash32
from s3logs_parquet_spark.operators.selection import budget_select, cap_per_group
from s3logs_parquet_spark.session import get_spark


def synth(spark, rows: int, tail_sources: int, hot_frac: float):
    r = spark.range(rows).withColumnRenamed("id", "doc_id")
    h = hash32(F.col("doc_id").cast("string"))
    hot_cut = int(hot_frac * 1000)
    src = F.when(
        F.pmod(h, F.lit(1000)) < hot_cut, F.lit("hot")
    ).otherwise(
        F.concat(F.lit("s"), F.pmod(h, F.lit(tail_sources)).cast("string"))
    )
    score = F.round(F.pmod(h, F.lit(100_000)) / F.lit(100_000.0), 6)
    w = F.lit(1) + F.pmod(h, F.lit(400))
    return r.select(
        "doc_id", src.alias("source"), score.alias("score"), w.cast("long").alias("w")
    )


def fingerprint(df, cols) -> tuple[int, int]:
    # pmod before the sum: ANSI mode makes a raw sum of 10M xxhash64
    # longs overflow; the modded sum is still order-insensitive and
    # collision-negligible for an A/B parity check
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(F.xxhash64(*cols), F.lit(1_000_000_007))).alias("fp"),
    ).collect()[0]
    return int(agg["n"]), int(agg["fp"] or 0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--tail-sources", type=int, default=100_000)
    ap.add_argument("--hot-frac", type=float, default=0.5)
    ap.add_argument("--cap", type=int, default=1000)
    args = ap.parse_args()

    spark = get_spark(app_name="bench-selection")
    # land the corpus in parquet and read it back: every leg then pays
    # a column-pruned storage scan per pass (the real usage shape)
    # instead of replaying the md5-heavy synth expressions — which
    # dominate and penalize multi-pass plans, an A/B artifact
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="selection-bench-")
    synth(spark, args.rows, args.tail_sources, args.hot_frac).write.mode(
        "overwrite"
    ).parquet(work + "/corpus")
    base = spark.read.parquet(work + "/corpus")
    base.write.format("noop").mode("overwrite").save()  # warm scan

    out = {"rows": args.rows, "tail_sources": args.tail_sources,
           "hot_frac": args.hot_frac, "cap": args.cap}

    # --- cap_per_group: count-aware two-level (shipped) ---
    t0 = time.time()
    capped = cap_per_group(base, "source", args.cap, "doc_id")
    fp_two = fingerprint(
        capped.select("doc_id", F.col("cap_keep").cast("int").alias("k")),
        ["doc_id", "k"],
    )
    out["cap_op_sec"] = round(time.time() - t0, 1)

    # --- cap_per_group: naive single per-group rank window ---
    t0 = time.time()
    w_g = Window.partitionBy("source").orderBy(
        hash32(F.col("doc_id").cast("string")), "doc_id"
    )
    naive = base.withColumn(
        "k", (F.row_number().over(w_g) <= args.cap).cast("int")
    )
    fp_naive = fingerprint(naive.select("doc_id", "k"), ["doc_id", "k"])
    out["cap_naive_window_sec"] = round(time.time() - t0, 1)
    out["cap_parity"] = fp_two == fp_naive

    budget = int(base.agg(F.sum("w")).collect()[0][0] * 0.3)
    out["budget"] = budget

    # --- budget_select: boundary-find (shipped) ---
    t0 = time.time()
    sel = budget_select(base, "score", "doc_id", "w", budget)
    fp_bsel = fingerprint(
        sel.select("doc_id", F.col("selected").cast("int").alias("s")),
        ["doc_id", "s"],
    )
    out["budget_boundary_sec"] = round(time.time() - t0, 1)

    # --- budget_select: naive global running-sum window (single sort
    # task: the plan every SQL engine writes first) ---
    t0 = time.time()
    w_glob = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    gsel = base.withColumn(
        "s", (F.sum("w").over(w_glob) <= budget).cast("int")
    )
    fp_gnaive = fingerprint(gsel.select("doc_id", "s"), ["doc_id", "s"])
    out["budget_naive_global_window_sec"] = round(time.time() - t0, 1)
    out["budget_parity"] = fp_bsel == fp_gnaive

    n_sel = sel.filter("selected").count()
    out["n_selected"] = n_sel
    print(json.dumps({"metric": "selection_scale", **out}), flush=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
