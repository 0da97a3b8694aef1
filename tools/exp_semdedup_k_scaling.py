"""Semantic-dedup k-scaling follow-through (round 13).

The 10x scaling sweep's emb_semantic_dedup leg tripped the operator's
max_total_pairs guard at 500k docs (fixed k=8 quantizer against a
dense corpus → ~3.0B within-cell pairs), with the remedy in the error
message: "train a finer quantizer so k grows with the corpus
(k ≈ n / target_cell_size)". This tool MEASURES that remedy on the
same synthetic corpus: centroids sampled from the data with
k = n / target_cell at both scales, so cells stay ~target_cell members
and the within-cell pair mass stays ~n * target_cell / 2 — linear in
n, the SemDeDup paper's published trade (their 5B-doc run used ~110k
clusters for exactly this reason).

Usage: python tools/exp_semdedup_k_scaling.py \\
    [--small 20000] [--big 200000] [--target-cell 1000]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from s3logs_parquet_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=20_000)
    ap.add_argument("--big", type=int, default=200_000)
    ap.add_argument("--target-cell", type=int, default=1_000)
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from bench_scaling_record import synth_embeddings

    from s3logs_parquet_spark.operators.dedup import semantic_assign, semantic_dedup

    spark = get_spark(app_name="exp-semdedup-k-scaling")
    out = {}
    for tag, n in (("small", args.small), ("big", args.big)):
        k = max(n // args.target_cell, 1)
        emb = synth_embeddings(spark, n).localCheckpoint()
        # quantizer = k vectors sampled evenly across the id space (a
        # stand-in for ivf_train's k-means — cell-size behavior is what
        # the guard cares about, and evenly-spaced sample vectors
        # partition each dense cluster into ~k/n_clusters Voronoi cells)
        step = max(n // k, 1)
        cent_rows = (
            emb.filter(F.col("vec_id") % step == 0)
            .orderBy("vec_id")
            .limit(k)
            .select("embedding")
            .collect()
        )
        centroids = [[float(x) for x in r["embedding"]] for r in cent_rows]
        assigned = semantic_assign(emb, "vec_id", "embedding", centroids)
        assigned = assigned.localCheckpoint()  # production shape: stored columns

        def run():
            t0 = time.time()
            semantic_dedup(
                emb, "vec_id", "embedding", centroids, threshold=0.4, assigned=assigned
            ).write.format("noop").mode("overwrite").save()
            return time.time() - t0

        run()  # warm
        wall = round(min(run(), run()), 2)
        res = semantic_dedup(
            emb, "vec_id", "embedding", centroids, threshold=0.4, assigned=assigned
        )
        stats = res.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("is_semdup").cast("bigint")).alias("dups"),
            F.countDistinct("cell").alias("cells"),
        ).collect()[0]
        cell_stats = (
            res.groupBy("cell")
            .count()
            .agg(F.max("count").alias("max_cell"), F.avg("count").alias("avg_cell"))
            .collect()[0]
        )
        # incremental variant, gate-shaped split (batch = 20% of ids,
        # corpus = 80%) with the SAME scaled quantizer
        from s3logs_parquet_spark.operators.dedup import semantic_dedup_incremental

        corpus = emb.filter(F.col("vec_id") % 5 != 0)
        batch = emb.filter(F.col("vec_id") % 5 == 0)
        index = semantic_assign(corpus, "vec_id", "embedding", centroids).localCheckpoint()

        def run_incr():
            t0 = time.time()
            semantic_dedup_incremental(
                batch, index, "vec_id", "embedding", centroids, threshold=0.4
            ).write.format("noop").mode("overwrite").save()
            return time.time() - t0

        run_incr()  # warm
        wall_incr = round(min(run_incr(), run_incr()), 2)

        out[tag] = {
            "n": n,
            "k": len(centroids),
            "wall_s": wall,
            "wall_incr_s": wall_incr,
            "rows": stats["rows"],
            "semdups": int(stats["dups"]),
            "cells": stats["cells"],
            "max_cell": cell_stats["max_cell"],
            "avg_cell": round(float(cell_stats["avg_cell"]), 1),
        }
        print(json.dumps({tag: out[tag]}), flush=True)
    factor = args.big / args.small
    summary = {"metric": "semdedup_k_scaling", "target_cell": args.target_cell}
    for key, label in (("wall_s", "batch"), ("wall_incr_s", "incremental")):
        ratio = out["big"][key] / out["small"][key]
        summary[f"{label}_ratio"] = round(ratio, 2)
        summary[f"{label}_alpha"] = round(math.log(ratio) / math.log(factor), 3)
    print(json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
