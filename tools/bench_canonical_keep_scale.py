"""canonical_keep at corpus scale: the full fuzzy-dedup KEEP decision
(LSH candidates → exact-Jaccard verify → components over verified
edges → per-cluster quality argmax) on the same boilerplate-flood
corpus shape as the curation bench, with the decision invariants
checked distributed (no collect of the output).

Invariants asserted at scale:
  - exactly one keep per cluster (sum(keep) == n_clusters);
  - the kept member's quality equals the cluster max (0 violations);
  - among max-quality members the kept id is the minimum (tie rule).

Usage: python tools/bench_canonical_keep_scale.py [--rows 1000000]
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
from tools.bench_curation_scale import synth_docs  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    # the boilerplate flood puts ~rows/500 near-identical docs in one
    # band bucket; just UNDER the default 10k cap that is a full B²/2
    # within-bucket pair join (~50M pairs at 100k rows — measured: the
    # uncapped 100k run did not finish in 10 min). The production
    # posture for a known-floody corpus is a cap that ENGAGES: star
    # links keep bucket connectivity (identical clusters), pair mass
    # drops m² → m.
    ap.add_argument("--max-bucket", type=int, default=500)
    args = ap.parse_args()

    spark = get_spark(app_name="bench-canonical-keep")
    from s3logs_parquet_spark.operators.dedup import canonical_keep

    docs = synth_docs(spark, args.rows)

    t0 = time.time()
    out = canonical_keep(docs, "doc_id", "text", max_bucket_size=args.max_bucket)
    build_s = round(time.time() - t0, 1)  # eager: checkpoints + CC

    t0 = time.time()
    stats = out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("keep").alias("n_keeps"),
        F.countDistinct("cluster_id").alias("n_clusters"),
        F.sum((F.col("max_jaccard") > 0).cast("int")).alias("n_with_edge"),
    ).collect()[0]
    exec_s = round(time.time() - t0, 1)

    # distributed invariant checks
    t0 = time.time()
    cmax = out.groupBy("cluster_id").agg(F.max("quality").alias("qmax"))
    kept = out.filter(F.col("keep") == 1)
    bad_quality = kept.join(cmax, "cluster_id").filter(F.col("quality") != F.col("qmax")).count()
    min_of_max = (
        out.join(cmax, "cluster_id")
        .filter(F.col("quality") == F.col("qmax"))
        .groupBy("cluster_id")
        .agg(F.min("doc_id").alias("expect_id"))
    )
    bad_tie = (
        kept.join(min_of_max, "cluster_id").filter(F.col("doc_id") != F.col("expect_id")).count()
    )
    check_s = round(time.time() - t0, 1)

    assert stats["n_keeps"] == stats["n_clusters"], (stats["n_keeps"], stats["n_clusters"])
    assert bad_quality == 0, bad_quality
    assert bad_tie == 0, bad_tie

    print(
        json.dumps(
            {
                "rows": args.rows,
                "build_s": build_s,
                "exec_s": exec_s,
                "check_s": check_s,
                "total_s": round(build_s + exec_s, 1),
                "docs_per_s": int(args.rows / (build_s + exec_s)),
                "n_docs": stats["n_docs"],
                "n_clusters": int(stats["n_clusters"]),
                "n_keeps": int(stats["n_keeps"]),
                "n_docs_with_verified_edge": int(stats["n_with_edge"]),
                "invariants": "one-keep-per-cluster, keep==cluster-max-quality, tie->min-id",
            }
        )
    )


if __name__ == "__main__":
    main()
