"""Persisted-IVF index scale bench (VERDICT r3 #5): build the
cell-partitioned index at ≥1M vectors, then show a probed query reads
~n_probe/n_cells of the corpus bytes (static partition pruning — the
100 TB read path) and compare wall-time against brute force.

Bytes evidence is measured from the index's own directory tree: the
probed cells are recomputed driver-side from the persisted centroids
(numpy, same argmax-cosine as the plan's literal probe filter), and
probed-cell file bytes are summed vs the whole corpus. The plan-level
guarantee that ONLY those directories are scanned is separately
pinned by tests/test_ann.py (PartitionFilters assertion).

Usage: python tools/bench_ann_scale.py [--rows 1000000] [--dim 32]
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

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from s3logs_parquet_spark.operators.ann import (  # noqa: E402
    brute_force_topk,
    ivf_index_topk,
    ivf_index_write,
)
from s3logs_parquet_spark.session import get_spark  # noqa: E402


def synth_embeddings(spark, n: int, dim: int):
    """Deterministic pseudo-random unit-ish vectors, JVM-side."""
    comps = [
        (
            F.pmod(F.xxhash64("id", F.lit(i)), F.lit(2001)).cast("double") / 1000.0
            - 1.0
        ).cast("float")
        for i in range(dim)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    )


def tree_bytes(root: str) -> dict[str, int]:
    """{cell_dir_name: parquet bytes} plus '_total'."""
    out: dict[str, int] = {"_total": 0}
    for dirpath, _dirs, files in os.walk(root):
        cell = next((p for p in dirpath.split(os.sep) if p.startswith("cell=")), None)
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            sz = os.path.getsize(os.path.join(dirpath, fn))
            out["_total"] += sz
            if cell:
                out[cell] = out.get(cell, 0) + sz
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--cells", type=int, default=64)
    ap.add_argument("--probe", type=int, default=4)
    ap.add_argument("--queries", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark(app_name="bench-ann-scale")
    emb = synth_embeddings(spark, args.rows, args.dim)
    queries = emb.filter(F.col("vec_id") < args.queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )

    work = tempfile.mkdtemp(prefix="bench_ivf_")
    try:
        path = os.path.join(work, "index")
        t0 = time.time()
        ivf_index_write(emb, path, "vec_id", n_cells=args.cells, iters=2)
        build_s = time.time() - t0

        # probed cells, recomputed from the persisted centroids (tiny)
        cent_rows = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
        cents = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
        qrows = queries.collect()
        probed: set[int] = set()
        single_probed: set[int] = set()
        for qi, r in enumerate(qrows):
            v = np.array(r["embedding"], dtype=np.float64)
            sims = (cents @ v) / (np.linalg.norm(cents, axis=1) * np.linalg.norm(v))
            top = [int(c) for c in np.argsort(-sims)[: args.probe]]
            probed.update(top)
            if qi == 0:
                single_probed.update(top)

        sizes = tree_bytes(os.path.join(path, "corpus"))
        probed_bytes = sum(sizes.get(f"cell={c}", 0) for c in probed)
        single_bytes = sum(sizes.get(f"cell={c}", 0) for c in single_probed)

        ivf_s = float("inf")
        for _ in range(2):
            t0 = time.time()
            ivf_index_topk(
                spark, path, queries, "vec_id", "query_id", k=10, n_probe=args.probe
            ).collect()
            ivf_s = min(ivf_s, time.time() - t0)

        # fair-IO brute force: scan the SAME persisted corpus (all
        # cells) rather than the synthetic in-memory frame — otherwise
        # brute pays zero read cost and the wall-clock comparison is
        # meaningless as a proxy for the 100 TB read path
        persisted = spark.read.parquet(os.path.join(path, "corpus")).select(
            F.col("vec_id"), F.col("_cv").alias("embedding")
        )
        brute_s = float("inf")
        for _ in range(2):
            t0 = time.time()
            brute_force_topk(persisted, queries, "vec_id", "query_id", k=10).collect()
            brute_s = min(brute_s, time.time() - t0)

        print(
            json.dumps(
                {
                    "metric": "ivf_index_scale",
                    "rows": args.rows,
                    "dim": args.dim,
                    "n_cells": args.cells,
                    "n_probe": args.probe,
                    "n_queries": args.queries,
                    "build_s": round(build_s, 2),
                    "ivf_query_s": round(ivf_s, 2),
                    "brute_query_s": round(brute_s, 2),
                    "corpus_bytes": sizes["_total"],
                    "probed_bytes": probed_bytes,
                    "probed_cells": sorted(probed),
                    "bytes_fraction": round(probed_bytes / sizes["_total"], 4),
                    "cell_fraction_bound": round(
                        len(probed) / args.cells, 4
                    ),
                    "single_query_bytes_fraction": round(
                        single_bytes / sizes["_total"], 4
                    ),
                    "single_query_cell_bound": round(
                        len(single_probed) / args.cells, 4
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
