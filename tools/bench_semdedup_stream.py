"""Streaming semantic dedup at scale: seed a large persisted index,
then stream batches of NEW vectors through run_stream_semantic_dedup
(probe history + within-batch flags + exactly-once index growth) and
record per-batch wall time and vectors/s.

Corpus/batch synthesis matches bench_semdedup_scale.py (32-dim vectors
around latent anchors, JVM-side hash arithmetic): every batch vector
re-generates an existing anchor's neighborhood, so history-dup mass is
high and the probe stage is genuinely loaded.

Round 11: ``--layout bucketed|dirs`` selects the persisted-index
layout (VERDICT r10 #1 — the dirs layout re-shuffles the whole
accumulated index on cell every trigger; the bucketed store probes
exchange-free), ``--fold-every N`` exercises the in-stream auto-fold,
and the output carries the PER-BATCH duration curve (from
recentProgress) so index-growth scaling is visible directly.

Usage: python tools/bench_semdedup_stream.py [--corpus 1000000]
  [--cells 4096] [--anchors 100000] [--batches 3] [--batch-rows 100000]
  [--layout bucketed|dirs] [--fold-every N]
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
from tools.bench_semdedup_scale import DIM, _anchor_component, synth_vectors  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", type=int, default=1_000_000)
    ap.add_argument("--cells", type=int, default=4096)
    ap.add_argument("--anchors", type=int, default=100_000)
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--batch-rows", type=int, default=100_000)
    ap.add_argument("--threshold", type=float, default=0.95)
    ap.add_argument("--layout", choices=["bucketed", "dirs"], default="bucketed")
    ap.add_argument("--fold-every", type=int, default=None)
    ap.add_argument("--fold-mode", choices=["window", "all"], default="window")
    ap.add_argument(
        "--fresh-frac",
        type=float,
        default=0.5,
        help="fraction of each batch drawn from NEVER-SEEN anchors — these "
        "survive and GROW the index, so the per-batch curve exposes the "
        "O(history) cost the layout is supposed to remove (0.0 = the "
        "round-10 all-dup shape, index never grows)",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="bench-semdedup-stream")
    from s3logs_parquet_spark.operators.dedup import semantic_assign
    from s3logs_parquet_spark.plans import band_index as bandidx
    from s3logs_parquet_spark.streaming.job import (
        StreamingJobConfig,
        run_stream_semantic_dedup,
    )

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

    work = tempfile.mkdtemp(prefix="semdedup_stream_")
    inp = os.path.join(work, "in")
    out = os.path.join(work, "out")
    idx = os.path.join(work, "idx")
    ckpt = os.path.join(work, "ck")
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    stages: dict[str, float] = {}
    try:
        t0 = time.time()
        corpus = synth_vectors(spark, args.corpus, args.anchors)
        seeded = semantic_assign(corpus, "vec_id", "embedding", centroids)
        if args.layout == "bucketed":
            bandidx.write_contribution(
                spark, idx, seeded, -1, ("cell",), dedup_cols=("vec_id",)
            )
        else:
            seeded.write.parquet(f"{idx}/batch=-1")
        stages["seed_index_s"] = round(time.time() - t0, 1)

        # one input file per intended micro-batch (maxFilesPerTrigger=1):
        # dup mass re-generates corpus anchors; the fresh slice draws
        # from anchors no prior batch has seen (one anchor per vector —
        # all survive, so the index grows by fresh_rows every batch)
        fresh_rows = int(args.batch_rows * args.fresh_frac)
        dup_rows = args.batch_rows - fresh_rows
        for b in range(args.batches):
            base = args.corpus + b * args.batch_rows
            parts = []
            if dup_rows:
                parts.append(
                    synth_vectors(spark, dup_rows, args.anchors).select(
                        (F.col("vec_id") + base).alias("vec_id"), "embedding"
                    )
                )
            if fresh_rows:
                fresh_base = args.anchors + b * fresh_rows
                fdf = spark.range(fresh_rows)
                aid = F.col("id") + F.lit(fresh_base)
                comps = [
                    _anchor_component(aid, i).cast("double") for i in range(DIM)
                ]
                parts.append(
                    fdf.select(
                        (F.col("id") + base + dup_rows).alias("vec_id"),
                        F.array(*comps).alias("embedding"),
                    )
                )
            batch_df = parts[0]
            for p in parts[1:]:
                batch_df = batch_df.unionByName(p)
            batch_df.coalesce(1).write.mode("append").parquet(inp)

        scfg = StreamingJobConfig(available_now=True, max_files_per_trigger=1)
        t0 = time.time()
        q = run_stream_semantic_dedup(
            spark, inp, schema, idx, centroids, args.threshold, out, ckpt,
            index_layout=args.layout, fold_every_n_batches=args.fold_every,
            fold_mode=args.fold_mode,
            scfg=scfg,
        )
        q.awaitTermination(3600)
        stream_s = time.time() - t0
        stages["stream_total_s"] = round(stream_s, 1)
        # per-batch curve: recentProgress keeps the last 100 triggers

        def _as_dict(p):
            if isinstance(p, dict):
                return p
            j = p.json() if callable(getattr(p, "json", None)) else p.json
            return json.loads(j)

        per_batch = [
            (int(p["batchId"]), round(p["durationMs"]["triggerExecution"] / 1000, 2))
            for p in (_as_dict(pp) for pp in q.recentProgress)
            if p.get("numInputRows", 0) > 0
        ]

        res = spark.read.parquet(out)
        n_rows = res.count()
        n_corpus_dups = res.filter("is_corpus_dup").count()
        n_batch_dups = res.filter("is_batch_dup").count()
        n_batches = res.select("batch").distinct().count()
        idx_growth = (
            spark.read.parquet(idx).filter("batch >= 0").count()
        )
        print(
            json.dumps(
                {
                    "metric": "semdedup_stream_scale",
                    "layout": args.layout,
                    "fold_every": args.fold_every,
                    "fold_mode": args.fold_mode,
                    "corpus": args.corpus,
                    "cells": args.cells,
                    "batches": n_batches,
                    "batch_rows": args.batch_rows,
                    "threshold": args.threshold,
                    "stages": stages,
                    "per_batch_s": round(stream_s / max(n_batches, 1), 1),
                    "batch_curve_s": sorted(per_batch),
                    "vectors_per_sec": round(n_rows / stream_s, 1),
                    "counts": {
                        "flagged_rows": n_rows,
                        "corpus_dups": n_corpus_dups,
                        "batch_dups": n_batch_dups,
                        "index_growth": idx_growth,
                    },
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
