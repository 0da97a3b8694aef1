"""SemDeDup at 1M vectors: Arrow-kernel assignment + within-cell
pairing, measured (the 100 TB shape for operators/dedup.semantic_dedup).

Corpus: 1M 32-dim vectors clustered around 100k latent anchors
(~10 near-identical members each — the semantic-dup mass), all
generated JVM-side from hash arithmetic. Quantizer: 4096 centroids
(the first 4096 anchors) — far past the expanded-kernel codegen cliff
(4096 x 32 = 131k terms), so assignment exercises _ivf_assign_arrow.

Usage: python tools/bench_semdedup_scale.py [--rows 1000000]
  [--cells 4096] [--anchors 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from s3logs_parquet_spark.session import get_spark  # noqa: E402

DIM = 32


def _anchor_component(aid, i: int):
    """Deterministic anchor component in [-1, 1]."""
    return (F.pmod(F.xxhash64(F.lit("anchor"), aid, F.lit(i)), F.lit(2001)) - 1000) / 1000.0


def synth_vectors(spark, n: int, anchors: int):
    df = spark.range(n)
    aid = F.pmod(F.col("id"), F.lit(anchors))
    comps = [
        (
            _anchor_component(aid, i)
            + (F.pmod(F.xxhash64("id", F.lit(1000 + i)), F.lit(41)) - 20) / 1000.0
        ).cast("double")
        for i in range(DIM)
    ]
    return df.select(F.col("id").alias("vec_id"), F.array(*comps).alias("embedding"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--cells", type=int, default=4096)
    ap.add_argument("--anchors", type=int, default=100_000)
    ap.add_argument("--threshold", type=float, default=0.95)
    ap.add_argument(
        "--incremental-batch",
        type=int,
        default=0,
        help="also time semantic_dedup_incremental: persist the "
        "semantic_assign index for the corpus, then probe a batch of "
        "this many NEW vectors against it (0 = skip)",
    )
    ap.add_argument(
        "--kernel",
        default="blas",
        choices=("blas", "expanded"),
        help="pair-stage kernel (see semantic_dedup's pair_kernel)",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="bench-semdedup-scale")
    from s3logs_parquet_spark.operators.ann import ivf_assign
    from s3logs_parquet_spark.operators.dedup import semantic_dedup

    vecs = synth_vectors(spark, args.rows, args.anchors)

    # centroids: the first `cells` anchors, collected from a tiny
    # frame that reuses the data side's hash arithmetic exactly
    cent_rows = (
        spark.range(args.cells)
        .select(
            F.array(
                *[_anchor_component(F.col("id"), i).cast("double") for i in range(DIM)]
            ).alias("v")
        )
        .collect()
    )
    centroids = [[float(x) for x in r["v"]] for r in cent_rows]

    stages: dict[str, float] = {}

    t0 = time.time()
    assigned = ivf_assign(vecs, "embedding", centroids, "cell")  # auto -> arrow
    # consume the cell column: count() alone lets Catalyst prune the
    # (deterministic) assignment UDF and would time an empty scan
    row = assigned.agg(F.max("cell"), F.count(F.lit(1))).collect()[0]
    n_assigned = int(row[1])
    stages["assign_arrow_s"] = round(time.time() - t0, 1)

    # pair-stage cost context: sum of m*(m-1)/2 over cells
    t0 = time.time()
    sizes = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("m"))
    stats = sizes.agg(
        F.max("m").alias("max_m"),
        F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("pairs"),
        F.count(F.lit(1)).alias("n_cells"),
    ).collect()[0]
    stages["cell_stats_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    out = semantic_dedup(
        vecs, "vec_id", "embedding", centroids, threshold=args.threshold,
        pair_kernel=args.kernel,
    )
    n_dups = out.filter("is_semdup").count()
    stages["semantic_dedup_s"] = round(time.time() - t0, 1)

    incr: dict = {}
    if args.incremental_batch:
        from s3logs_parquet_spark.operators.dedup import (
            semantic_assign,
            semantic_dedup_incremental,
        )

        # index build = the write-side precompute over the whole corpus
        t0 = time.time()
        index = semantic_assign(vecs, "vec_id", "embedding", centroids)
        index.count()
        incr["index_build_s"] = round(time.time() - t0, 1)

        # the batch: NEW ids, same anchor distribution (continuous
        # ingest of more of the same corpus — the production shape)
        batch = synth_vectors(spark, args.incremental_batch, args.anchors).select(
            (F.col("vec_id") + args.rows).alias("vec_id"), "embedding"
        )
        t0 = time.time()
        bout = semantic_dedup_incremental(
            batch, index, "vec_id", "embedding", centroids, args.threshold,
            pair_kernel=args.kernel,
        )
        incr["n_batch_dups"] = bout.filter("is_semdup").count()
        incr["probe_s"] = round(time.time() - t0, 1)
        incr["batch"] = args.incremental_batch

    print(
        json.dumps(
            {
                "metric": "semdedup_scale",
                "rows": args.rows,
                "cells": args.cells,
                "anchors": args.anchors,
                "threshold": args.threshold,
                "kernel": args.kernel,
                "stages": stages,
                "counts": {
                    "assigned": n_assigned,
                    "occupied_cells": int(stats["n_cells"]),
                    "max_cell": int(stats["max_m"]),
                    "within_cell_pairs": int(stats["pairs"]),
                    "n_dups": n_dups,
                },
                "incremental": incr or None,
            }
        )
    )


if __name__ == "__main__":
    main()
