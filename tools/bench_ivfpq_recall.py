"""IVF-PQ recall@k at 1M vectors (VERDICT r6 #8 stretch): the
bytes-read ratio of the composite index is recorded
(tools/bench_ann_scale.py); this tool measures the other half of the
ANN quality story — how much of the EXACT top-k the
probe -> ADC -> rerank path recovers at scale, across an n_probe
sweep (the recall/cost knob a production deployment tunes).

Ground truth: brute-force exact cosine top-k per query over the full
corpus. recall@k = |ivfpq_topk(q) ∩ exact_topk(q)| / k, averaged over
queries. The corpus is the same deterministic pseudo-random generator
the other ANN benches use — a WORST-CASE recall shape (no cluster
structure, so coarse cells carry little signal and ADC quantization
error is maximal relative to the cosine spread); real embedding
corpora cluster and recall there is higher at the same settings.

Usage: python tools/bench_ivfpq_recall.py [--rows 1000000] [--dim 32]
    [--cells 64] [--m 8] [--k-sub 16] [--queries 32] [--k 10]
    [--probes 2,4,8,16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from s3logs_parquet_spark.operators.ann import (  # noqa: E402
    brute_force_topk,
    ivf_train,
    ivfpq_encode_corpus,
    ivfpq_topk,
    pq_codebooks,
)
from s3logs_parquet_spark.session import get_spark, materialize, release  # noqa: E402
from tools.bench_ann_scale import synth_embeddings  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--cells", type=int, default=64)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--k-sub", type=int, default=16)
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--probes", type=str, default="2,4,8,16")
    ap.add_argument(
        "--candidates",
        type=int,
        default=0,
        help="ADC rerank budget (default 10*k). On a NO-structure "
        "corpus recall is ADC-limited, not probe-limited: more probed "
        "cells add competitors for a fixed rerank budget, so recall "
        "FLATTENS (or dips) with n_probe — raise this to recover it.",
    )
    ap.add_argument(
        "--sq8",
        action="store_true",
        help="also measure SQ8 recall at the same rerank budget (full "
        "codes scan, no cell pruning — the quantization-accuracy "
        "comparison point: 8 bits/dim vs PQ's m bytes/vector)",
    )
    args = ap.parse_args()
    probes = [int(p) for p in args.probes.split(",")]
    n_candidates = args.candidates or 10 * args.k

    spark = get_spark(app_name="bench-ivfpq-recall")
    emb = materialize(synth_embeddings(spark, args.rows, args.dim))
    queries = emb.filter(F.col("vec_id") < args.queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )

    t0 = time.time()
    centroids = ivf_train(emb, "embedding", n_cells=args.cells, iters=2, id_col="vec_id")
    codebooks = pq_codebooks(emb, "embedding", m=args.m, k_sub=args.k_sub, id_col="vec_id")
    enc = materialize(ivfpq_encode_corpus(emb, "vec_id", centroids, codebooks))
    enc.count()
    build_s = time.time() - t0

    t0 = time.time()
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(
            emb, queries, "vec_id", "query_id", k=args.k
        ).collect()
    }
    brute_s = time.time() - t0

    sweep = {}
    for n_probe in probes:
        t0 = time.time()
        got = {
            (r["query_id"], r["vec_id"])
            for r in ivfpq_topk(
                emb,
                queries,
                "vec_id",
                "query_id",
                centroids,
                codebooks,
                k=args.k,
                n_probe=n_probe,
                n_candidates=n_candidates,
                encoded=enc,
            ).collect()
        }
        sweep[n_probe] = {
            "recall_at_k": round(len(got & exact) / len(exact), 4),
            "query_s": round(time.time() - t0, 2),
        }
        print(f"n_probe={n_probe}: {sweep[n_probe]}", flush=True)

    sq8 = None
    if args.sq8:
        from s3logs_parquet_spark.operators.ann import sq8_topk, sq_encode, sq_stats

        t0 = time.time()
        stats8 = sq_stats(emb, "embedding", args.dim)
        enc8 = materialize(
            sq_encode(
                emb.select(F.col("vec_id"), F.col("embedding").alias("_cv")),
                "_cv",
                stats8,
            )
        )
        enc8.count()
        sq8_build_s = round(time.time() - t0, 1)
        t0 = time.time()
        got8 = {
            (r["query_id"], r["vec_id"])
            for r in sq8_topk(
                emb,
                queries,
                "vec_id",
                "query_id",
                stats8,
                k=args.k,
                n_candidates=n_candidates,
                encoded=enc8,
            ).collect()
        }
        sq8 = {
            "recall_at_k": round(len(got8 & exact) / len(exact), 4),
            "query_s": round(time.time() - t0, 2),
            "build_s": sq8_build_s,
        }
        print(f"sq8: {sq8}", flush=True)
        release(enc8)

    print(
        json.dumps(
            {
                "tool": "bench_ivfpq_recall",
                "rows": args.rows,
                "dim": args.dim,
                "cells": args.cells,
                "m": args.m,
                "k_sub": args.k_sub,
                "k": args.k,
                "n_candidates": n_candidates,
                "n_queries": args.queries,
                "build_s": round(build_s, 1),
                "brute_exact_s": round(brute_s, 1),
                "sweep": {str(p): v for p, v in sweep.items()},
                "sq8": sq8,
            }
        )
    )
    release(enc)
    release(emb)
    spark.stop()


if __name__ == "__main__":
    main()
