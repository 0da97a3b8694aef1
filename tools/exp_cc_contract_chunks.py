"""Contraction chunk-count experiment on the cached LSH edge list
(companion to tools/bench_cc_lsh_scale.py --edges-cache): the round-7
finding is that contraction on a clique-heavy TEXT graph ran 4x the
unbounded driver collect — with chunks sized at driver_edge_limit/2
(1M rows), a 5.9M-edge list contracts in only 6 tasks on 32 cores.
This experiment sweeps the `min_chunks` floor to measure whether task
parallelism (smaller chunks, less clique visibility per task) or
collapse-per-pass (bigger chunks) wins on the real shape.

Usage: python tools/exp_cc_contract_chunks.py /tmp/cc_lsh_cache [mins...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from s3logs_parquet_spark.session import get_spark, materialize, release  # noqa: E402
from tools.bench_cc_scale import cluster_fingerprint  # noqa: E402


def main() -> None:
    cache = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cc_lsh_cache"
    mins = [int(a) for a in sys.argv[2:]] or [1, 8, 32, 64]

    spark = get_spark(app_name="exp-cc-contract-chunks")
    from s3logs_parquet_spark.operators.dedup import (
        _cc_driver_union_find,
        _cc_forest_contract,
    )

    pairs = spark.read.parquet(os.path.join(cache, "pairs"))
    ids = spark.read.parquet(os.path.join(cache, "ids"))

    both = pairs.select("id_a", "id_b")
    edges = materialize(
        both.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(both.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
    )
    n_edges = edges.count()
    canon = materialize(edges.filter(F.col("src") < F.col("dst")))
    print(f"{n_edges // 2:,} canonical edges", flush=True)

    results = {}
    for mc in mins:
        t0 = time.time()
        forest, f_cnt = _cc_forest_contract(
            canon, n_edges // 2, False, 2_000_000, min_chunks=mc
        )
        contract_s = time.time() - t0
        t0 = time.time()
        labels = _cc_driver_union_find(forest, ids, "doc_id")
        fp = cluster_fingerprint(labels)
        finish_s = time.time() - t0
        if forest is not canon:
            release(forest)
        results[mc] = {
            "contract_s": round(contract_s, 1),
            "forest_edges": f_cnt,
            "driver_finish_s": round(finish_s, 1),
            "total_s": round(contract_s + finish_s, 1),
            "fingerprint": fp,
        }
        print(f"min_chunks={mc}: {results[mc]}", flush=True)

    fps = {tuple(v["fingerprint"]) for v in results.values()}
    print(
        json.dumps(
            {
                "tool": "exp_cc_contract_chunks",
                "canonical_edges": n_edges // 2,
                "sweep": {str(k): {kk: vv for kk, vv in v.items() if kk != "fingerprint"} for k, v in results.items()},
                "fingerprints_match": len(fps) == 1,
            }
        )
    )
    release(canon)
    release(edges)
    spark.stop()


if __name__ == "__main__":
    main()
