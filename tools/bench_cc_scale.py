"""Connected-components strategy bench at an ABOVE-BUDGET edge count
(VERDICT r5 #4): the shipped default dispatches edge lists over
``driver_edge_limit`` (2M) to partition-local contraction; this tool
measures that path at a ≥5M-canonical-edge dedup-realistic shape and
compares it to (a) the driver union-find given an unbounded budget
(the reference time the verdict grades against) and (b), opt-in, the
old distributed label-propagation loop.

Graph shape: clique-heavy (near-dup graphs are transitive-similarity
cliques after LSH banding) plus a few 50k-node chains (the worst
diameter case for propagation, and the shape contraction alone cannot
fully collapse in one pass), plus singletons. All edges generated
JVM-side from hash arithmetic.

Usage: python tools/bench_cc_scale.py [--groups 5000] [--edges-per-group 1200]
           [--chains 2] [--chain-len 50000] [--loop]
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

GROUP_W = 50  # nodes per clique-ish group
CHAIN_BASE = 1_000_000_000  # chain node ids start here — disjoint from groups


def synth_edges(spark, n_groups: int, edges_per_group: int, chains: int, chain_len: int):
    """~n_groups*edges_per_group random intra-group pairs (near-complete
    50-node cliques) + exact chains. Returns (pairs_df, ids_df)."""
    e = spark.range(n_groups * edges_per_group)
    grp = F.pmod(F.xxhash64("id"), F.lit(n_groups))
    a = grp * GROUP_W + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(GROUP_W))
    b = grp * GROUP_W + F.pmod(F.xxhash64("id", F.lit(2)), F.lit(GROUP_W))
    cliq = e.select(
        F.least(a, b).alias("id_a"), F.greatest(a, b).alias("id_b")
    ).filter(F.col("id_a") != F.col("id_b"))

    ch = spark.range(chains * (chain_len - 1))
    c_idx = (F.col("id") / (chain_len - 1)).cast("long")
    k = F.col("id") - c_idx * (chain_len - 1)
    base = F.lit(CHAIN_BASE) + c_idx * chain_len
    chain = ch.select((base + k).alias("id_a"), (base + k + 1).alias("id_b"))

    pairs = cliq.union(chain)
    ids = (
        spark.range(n_groups * GROUP_W)
        .select(F.col("id").alias("doc_id"))
        .union(
            spark.range(chains * chain_len).select(
                (F.lit(CHAIN_BASE) + (F.col("id") / chain_len).cast("long") * chain_len
                 + F.col("id") - (F.col("id") / chain_len).cast("long") * chain_len
                 ).alias("doc_id")
            )
        )
        .union(  # singletons, 10% extra
            spark.range(n_groups * GROUP_W // 10).select(
                (F.col("id") + F.lit(2_000_000_000)).alias("doc_id")
            )
        )
    )
    return pairs, ids


def cluster_fingerprint(labels):
    """Order-insensitive summary: (n_nodes, n_clusters, sum of
    xxhash64(id, cluster_id)) — equal fingerprints ⇒ equal label maps
    with overwhelming probability, no driver-side collect of 5M rows."""
    row = labels.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("cluster_id").alias("k"),
        # residues mod a prime, not raw xxhash64: ANSI mode makes the
        # full-range sum a long-overflow error at millions of rows
        F.sum(F.pmod(F.xxhash64("doc_id", "cluster_id"), F.lit(1_000_000_007))).alias("h"),
    ).collect()[0]
    return row["n"], row["k"], row["h"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=5000)
    ap.add_argument("--edges-per-group", type=int, default=1200)
    ap.add_argument("--chains", type=int, default=2)
    ap.add_argument("--chain-len", type=int, default=50_000)
    ap.add_argument("--loop", action="store_true", help="also time the propagation loop")
    args = ap.parse_args()

    spark = get_spark(app_name="bench-cc-scale")
    from s3logs_parquet_spark.operators.dedup import connected_components_clusters
    from s3logs_parquet_spark.session import materialize, release

    pairs, ids = synth_edges(
        spark, args.groups, args.edges_per_group, args.chains, args.chain_len
    )
    pairs = materialize(pairs.distinct())
    ids = materialize(ids)
    n_pairs, n_ids = pairs.count(), ids.count()
    out = {"canonical_edges": n_pairs, "nodes": n_ids}
    print(f"graph: {n_pairs:,} canonical edges over {n_ids:,} nodes", flush=True)

    results = {}
    runs = [
        ("contract", dict(strategy="contract", driver_edge_limit=2_000_000)),
        ("driver_unbounded", dict(strategy="driver", driver_edge_limit=1 << 40)),
    ]
    if args.loop:
        runs.append(("loop", dict(driver_edge_limit=0, max_rounds=30)))
    for name, kw in runs:
        t0 = time.time()
        labels = connected_components_clusters(pairs, ids, "doc_id", **kw)
        fp = cluster_fingerprint(labels)
        dt = round(time.time() - t0, 2)
        results[name] = {"sec": dt, "fingerprint": fp}
        print(f"{name}: {dt}s fingerprint={fp}", flush=True)

    fps = {tuple(v["fingerprint"]) for v in results.values()}
    out["strategies"] = results
    out["fingerprints_agree"] = len(fps) == 1
    out["contract_vs_driver_ratio"] = round(
        results["contract"]["sec"] / results["driver_unbounded"]["sec"], 2
    )
    print(json.dumps(out))
    if not out["fingerprints_agree"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
