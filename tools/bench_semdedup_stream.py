"""Streaming semantic dedup at scale: seed a large persisted index,
then stream batches of NEW vectors through run_stream_semantic_dedup
(probe history + within-batch flags + exactly-once index growth) and
record per-batch wall time and vectors/s.

Corpus/batch synthesis matches bench_semdedup_scale.py (32-dim vectors
around latent anchors, JVM-side hash arithmetic): every batch vector
re-generates an existing anchor's neighborhood, so history-dup mass is
high and the probe stage is genuinely loaded.

Usage: python tools/bench_semdedup_stream.py [--corpus 1000000]
  [--cells 4096] [--anchors 100000] [--batches 3] [--batch-rows 100000]
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
    args = ap.parse_args()

    spark = get_spark(app_name="bench-semdedup-stream")
    from s3logs_parquet_spark.operators.dedup import semantic_assign
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
        semantic_assign(corpus, "vec_id", "embedding", centroids).write.parquet(
            f"{idx}/batch=-1"
        )
        stages["seed_index_s"] = round(time.time() - t0, 1)

        # one input file per intended micro-batch (maxFilesPerTrigger=1)
        for b in range(args.batches):
            base = args.corpus + b * args.batch_rows
            synth_vectors(spark, args.batch_rows, args.anchors).select(
                (F.col("vec_id") + base).alias("vec_id"), "embedding"
            ).coalesce(1).write.mode("append").parquet(inp)

        scfg = StreamingJobConfig(available_now=True, max_files_per_trigger=1)
        t0 = time.time()
        q = run_stream_semantic_dedup(
            spark, inp, schema, idx, centroids, args.threshold, out, ckpt, scfg=scfg
        )
        q.awaitTermination(3600)
        stream_s = time.time() - t0
        stages["stream_total_s"] = round(stream_s, 1)

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
                    "corpus": args.corpus,
                    "cells": args.cells,
                    "batches": n_batches,
                    "batch_rows": args.batch_rows,
                    "threshold": args.threshold,
                    "stages": stages,
                    "per_batch_s": round(stream_s / max(n_batches, 1), 1),
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
