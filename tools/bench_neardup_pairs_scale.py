"""embedding_neardup_pairs at scale: wall time, output parity
fingerprint, and total shuffle bytes for the banded-LSH near-dup
pair operator — the A/B harness for the score-before-dedup rework
(score candidates map-side, shuffle (id_a,id_b,cosine) survivors
instead of 2×dim unit-vector doubles per candidate copy).

Corpus: ``--rows`` 64-dim vectors around ``--anchors`` latent anchors
(~rows/anchors near-identical members each — the duplicate mass), all
synthesized JVM-side. Run it on two checkouts to A/B a rework; the
fingerprint (sum of xxhash64 over id pairs + rounded cosine) must
match across variants.

Usage: python tools/bench_neardup_pairs_scale.py [--rows 200000]
  [--anchors 20000] [--bands 8] [--bits 16] [--threshold 0.95]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

DIM = 64


def _anchor_component(aid, i: int):
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


def shuffle_bytes(ui: str) -> int:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages"))
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--anchors", type=int, default=20_000)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--bits", type=int, default=16)
    ap.add_argument("--threshold", type=float, default=0.95)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("bench-neardup-scale")
        .master("local[32]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )
    from s3logs_parquet_spark.operators.dedup import embedding_neardup_pairs

    ui = spark.sparkContext.uiWebUrl
    vecs = synth_vectors(spark, args.rows, args.anchors)

    t0 = time.time()
    out = embedding_neardup_pairs(
        vecs,
        "vec_id",
        "embedding",
        threshold=args.threshold,
        n_bands=args.bands,
        bits_per_band=args.bits,
    )
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(
            F.xxhash64("id_a", "id_b", F.round("cosine", 6).cast("string"))
        ).alias("fp"),
    ).collect()[0]
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "neardup_pairs_scale",
                "rows": args.rows,
                "anchors": args.anchors,
                "bands": args.bands,
                "bits": args.bits,
                "threshold": args.threshold,
                "wall_s": round(wall, 1),
                "pairs": int(agg["n"]),
                "fingerprint": int(agg["fp"]),
                "shuffle_write_bytes": shuffle_bytes(ui),
            }
        )
    )


if __name__ == "__main__":
    main()
