"""Headline-query scaling record (round 13, VERDICT r12 #7 stretch):
one MEASURED point under the 100x design claim.

Synthesizes documents/embeddings tables in the driver testdata shape
(same schemas; near-dup families, 5-language salads, clusterable
64-dim embeddings) at --base-rows and at --factor x that, runs the
named registry queries at both scales with bench.py semantics (noop
sink, warm + best-of-2), and reports the wall ratio and the implied
scaling exponent alpha = log(t_big/t_small) / log(factor):

- alpha ~ 1  -> linear (the design claim for scan/agg-shaped queries)
- alpha < 1  -> sub-linear (fixed overhead still amortizing)
- alpha > 1  -> super-linear = A FINDING (some pairwise/skew term grew)

Run sequentially with nothing else on the box. Synthesizes
documents+embeddings by default; --events / --tpch switch to those
table families (a query reading a table the chosen family does not
synthesize fails and is recorded as that query's error entry).

Usage: python tools/bench_scaling_record.py \\
    [--queries docs_remove_dup_spans,...] [--base-rows 50000] [--factor 10]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from s3logs_parquet_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = (
    # top-5 documents/embeddings queries by BENCH_r12 cost
    "docs_remove_dup_spans",
    "emb_pq_topk",
    "emb_neardup_pairs",
    "docs_minhash_lsh_pairs",
    "docs_incremental_neardup",
)


def synth_documents(spark, n: int):
    """Driver-testdata-shaped documents: word salads over a small
    vocabulary, ~10% verbatim dups of earlier ids, ~20% near-dup family
    variants, 5 langs, 4 sources — the same dup/near-dup structure the
    sf tables carry so LSH/banding queries do comparable work per
    row."""
    from tools.bench_curation_scale import _salad

    df = spark.range(n).withColumnRenamed("id", "doc_id")
    kind = F.pmod(F.xxhash64("doc_id"), F.lit(10))
    fam = F.concat(
        _salad(F.pmod(F.col("doc_id"), F.lit(max(n // 50, 1)))),
        F.lit(" tail "),
        F.col("doc_id").cast("string"),
    )
    dup_of = _salad(F.pmod(F.col("doc_id"), F.lit(max(n // 10, 1))))
    text = (
        F.when(kind <= 1, fam)  # 20% near-dup family members
        .when(kind == 2, dup_of)  # 10% verbatim dups
        .otherwise(_salad(F.col("doc_id")))
    )
    langs = F.array(*[F.lit(x) for x in ("en", "de", "fr", "zh", "es")])
    return df.select(
        "doc_id",
        text.alias("text"),
        F.get(langs, F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(5)).cast("int")).alias("lang"),
        F.concat(F.lit("src"), F.pmod(F.col("doc_id"), F.lit(4)).cast("string")).alias("source"),
    ).withColumn("n_chars", F.length("text"))


def synth_embeddings(spark, n: int, dim: int = 64, n_clusters: int = 10):
    """Clusterable unit-ish vectors: cluster center + deterministic
    hash noise per coordinate, same 64-dim float shape as the driver
    table. ~5% of vectors are near-copies of an earlier id (the
    near-dup mass emb_neardup_pairs exists for)."""
    df = spark.range(n).withColumnRenamed("id", "vec_id")
    src = F.when(
        F.pmod(F.xxhash64("vec_id"), F.lit(20)) == 0,
        F.pmod(F.col("vec_id"), F.lit(max(n // 20, 1))),
    ).otherwise(F.col("vec_id"))
    cluster = F.pmod(F.xxhash64(src), F.lit(n_clusters))
    coords = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.when(F.pmod(cluster, F.lit(dim)) == i, F.lit(4.0)).otherwise(F.lit(0.0))
            + (F.pmod(F.xxhash64(src, i), F.lit(1000)) / F.lit(1000.0) - F.lit(0.5))
        ).cast("float"),
    )
    return df.select(
        "vec_id", coords.alias("embedding"), cluster.cast("int").alias("label")
    )


def synth_events(spark, n: int):
    """Driver-testdata-shaped events: FIXED 30-day span (the driver's
    convention across sf0.001→0.1), users scaling with rows (~66
    events/user), 5 weighted event types, positive values, one-key
    JSON props. Scaling rows under this convention means 10x temporal
    DENSITY — range/interval-pair outputs grow quadratically BY
    SEMANTICS, so read those alphas against the output row counts."""
    df = spark.range(n).withColumnRenamed("id", "event_id")
    users = max(n // 66, 1)
    tmod = F.pmod(F.xxhash64("event_id", F.lit(1)), F.lit(30 * 24 * 3600))
    micros = F.pmod(F.xxhash64("event_id", F.lit(2)), F.lit(1_000_000))
    tsel = F.pmod(F.xxhash64("event_id", F.lit(3)), F.lit(100))
    etype = (
        F.when(tsel < 40, F.lit("view"))
        .when(tsel < 70, F.lit("click"))
        .when(tsel < 85, F.lit("error"))
        .when(tsel < 95, F.lit("purchase"))
        .otherwise(F.lit("signup"))
    )
    return df.select(
        "event_id",
        F.timestamp_seconds(
            F.lit(1704067200) + tmod + micros / F.lit(1_000_000.0)
        ).alias("ts"),
        F.pmod(F.xxhash64("event_id", F.lit(4)), F.lit(users)).alias("user_id"),
        etype.alias("event_type"),
        F.round(F.pmod(F.xxhash64("event_id", F.lit(5)), F.lit(50000)) / F.lit(100.0), 2).alias("value"),
        F.concat(
            F.lit('{"k": '),
            F.pmod(F.xxhash64("event_id", F.lit(6)), F.lit(100)).cast("string"),
            F.lit("}"),
        ).alias("props"),
    )


def synth_tpch(spark, n_li: int, outdir: str) -> None:
    """Driver-testdata-shaped TPC-H family at lineitem count ``n_li``
    (testdata ratios: 4 li/order, 10 orders/customer, 30 li/part,
    600 li/supplier; nation/region fixed). Distributions replicate the
    sf tables (dates 1995–2001, the same flag/segment/brand/type value
    sets, correlated returnflag/linestatus) so every gate predicate
    stays selective at any scale."""
    import os as _os

    def w(df, name):
        df.write.parquet(_os.path.join(outdir, f"{name}.parquet"))

    n_o, n_c = max(n_li // 4, 1), max(n_li // 40, 1)
    n_p, n_s = max(n_li // 30, 1), max(n_li // 600, 1)

    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    w(
        spark.createDataFrame(
            [(i, r) for i, r in enumerate(regions)], ["r_regionkey", "r_name"]
        ),
        "region",
    )
    w(
        spark.createDataFrame(
            [(i, f"NATION_{i}", i % 5) for i in range(25)],
            ["n_nationkey", "n_name", "n_regionkey"],
        ),
        "nation",
    )

    def h(key_col, salt):
        return F.xxhash64(key_col, F.lit(salt))

    def pick(key_col, salt, values):
        arr = F.array(*[F.lit(v) for v in values])
        return F.get(arr, F.pmod(h(key_col, salt), F.lit(len(values))).cast("int"))

    acct = (F.pmod(h(F.col("k"), 1), F.lit(1_100_000)) / F.lit(100.0) - F.lit(1000.0))
    sup = spark.range(n_s).withColumnRenamed("id", "k").select(
        F.col("k").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("k")).alias("s_name"),
        F.pmod(h(F.col("k"), 2), F.lit(25)).alias("s_nationkey"),
        F.round(acct, 2).alias("s_acctbal"),
    )
    w(sup, "supplier")

    segments = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    cust = spark.range(n_c).withColumnRenamed("id", "k").select(
        F.col("k").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("k")).alias("c_name"),
        F.pmod(h(F.col("k"), 3), F.lit(25)).alias("c_nationkey"),
        F.round(acct, 2).alias("c_acctbal"),
        pick(F.col("k"), 4, segments).alias("c_mktsegment"),
    )
    w(cust, "customer")

    adjs = ["small", "red", "blue", "hot", "cold", "large", "green", "shiny"]
    nouns = ["ring", "widget", "anvil", "bolt", "gear", "gizmo", "plate", "rod"]
    types = ["ECONOMY", "SMALL", "MEDIUM", "PROMO", "STANDARD", "LARGE"]
    part = spark.range(n_p).withColumnRenamed("id", "k").select(
        F.col("k").alias("p_partkey"),
        F.concat(
            pick(F.col("k"), 5, adjs), F.lit(" "), pick(F.col("k"), 6, nouns)
        ).alias("p_name"),
        F.concat(
            F.lit("Brand#"), (F.pmod(h(F.col("k"), 7), F.lit(25)) + 1).cast("string")
        ).alias("p_brand"),
        pick(F.col("k"), 8, types).alias("p_type"),
        (F.pmod(h(F.col("k"), 9), F.lit(50)) + 1).cast("int").alias("p_size"),
        F.round(F.lit(900.0) + F.pmod(h(F.col("k"), 10), F.lit(100000)) / F.lit(100.0), 2).alias("p_retailprice"),
    )
    w(part, "part")

    statuses = ["F", "F", "O", "O", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    base = F.lit("1995-01-01").cast("date")
    orders = spark.range(n_o).withColumnRenamed("id", "k").select(
        F.col("k").alias("o_orderkey"),
        F.pmod(h(F.col("k"), 11), F.lit(n_c)).alias("o_custkey"),
        pick(F.col("k"), 12, statuses).alias("o_orderstatus"),
        F.round(F.pmod(h(F.col("k"), 13), F.lit(50_000_000)) / F.lit(100.0), 2).alias("o_totalprice"),
        F.date_add(base, F.pmod(h(F.col("k"), 14), F.lit(2405)).cast("int")).cast("timestamp").alias("o_orderdate"),
        pick(F.col("k"), 15, prios).alias("o_orderpriority"),
    )
    w(orders, "orders")

    ship_days = F.pmod(h(F.col("k"), 16), F.lit(2500)).cast("int")
    shipdate = F.date_add(base, ship_days + 1)
    linestatus = F.when(ship_days < 1460, F.lit("F")).otherwise(F.lit("O"))
    returnflag = F.when(
        ship_days < 1460, pick(F.col("k"), 17, ["A", "R", "N"])
    ).otherwise(F.lit("N"))
    li = spark.range(n_li).withColumnRenamed("id", "k").select(
        F.pmod(h(F.col("k"), 18), F.lit(n_o)).alias("l_orderkey"),
        F.pmod(h(F.col("k"), 19), F.lit(n_p)).alias("l_partkey"),
        F.pmod(h(F.col("k"), 20), F.lit(n_s)).alias("l_suppkey"),
        (F.pmod(h(F.col("k"), 21), F.lit(7)) + 1).cast("int").alias("l_linenumber"),
        (F.pmod(h(F.col("k"), 22), F.lit(50)) + 1).cast("double").alias("l_quantity"),
        F.round(F.lit(900.0) + F.pmod(h(F.col("k"), 23), F.lit(10_410_000)) / F.lit(100.0), 2).alias("l_extendedprice"),
        (F.pmod(h(F.col("k"), 24), F.lit(11)) / F.lit(100.0)).alias("l_discount"),
        (F.pmod(h(F.col("k"), 25), F.lit(9)) / F.lit(100.0)).alias("l_tax"),
        returnflag.alias("l_returnflag"),
        linestatus.alias("l_linestatus"),
        shipdate.cast("timestamp").alias("l_shipdate"),
    )
    li.coalesce(max(n_li // 500_000, 1)).write.parquet(
        _os.path.join(outdir, "lineitem.parquet")
    )


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--base-rows", type=int, default=50_000)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--emb-fraction", type=float, default=0.4,
        help="embeddings rows as a fraction of documents rows (driver "
        "testdata carries 2000 vecs per 5000 docs)",
    )
    ap.add_argument(
        "--tpch", action="store_true",
        help="synthesize the TPC-H family (base-rows = lineitem count; "
        "testdata ratios and distributions)",
    )
    ap.add_argument(
        "--events", action="store_true",
        help="synthesize the events table instead of documents/embeddings "
        "(base-rows = event count; fixed 30-day span, density scales)",
    )
    ap.add_argument(
        "--with-counts", action="store_true",
        help="also record each query's output row count per scale "
        "(one untimed count; contextualizes alphas whose OUTPUT grows)",
    )
    args = ap.parse_args()
    names = [q.strip() for q in args.queries.split(",") if q.strip()]

    from s3logs_parquet_spark.plans.queries import QUERIES

    spark = get_spark(app_name="bench-scaling-record")
    work = tempfile.mkdtemp(prefix="scaling-record-")
    scales = {"small": args.base_rows, "big": args.base_rows * args.factor}
    try:
        for tag, n in scales.items():
            d = os.path.join(work, tag)
            os.makedirs(d, exist_ok=True)
            if args.tpch:
                synth_tpch(spark, n, d)
                continue
            if args.events:
                synth_events(spark, n).coalesce(max(n // 100_000, 1)).write.parquet(
                    os.path.join(d, "events.parquet")
                )
                continue
            synth_documents(spark, n).coalesce(max(n // 50_000, 1)).write.parquet(
                os.path.join(d, "documents.parquet")
            )
            synth_embeddings(spark, int(n * args.emb_fraction)).coalesce(
                max(n // 50_000, 1)
            ).write.parquet(os.path.join(d, "embeddings.parquet"))
        results = {}
        for name in names:
            fn = QUERIES[name][0]
            walls = {}
            try:
                for tag in scales:
                    d = os.path.join(work, tag)
                    force(fn(spark, d))  # warm: listing, footers, codegen
                    best = math.inf
                    for _ in range(2):
                        t0 = time.time()
                        force(fn(spark, d))
                        best = min(best, time.time() - t0)
                    walls[tag] = round(best, 3)
                    if args.with_counts:
                        walls[f"rows_{tag}"] = fn(spark, d).count()
            except Exception as exc:  # noqa: BLE001 — a guard refusing a
                # leg (e.g. semantic_dedup's max_total_pairs) is itself a
                # result; record it and keep sweeping
                results[name] = {**walls, "error": str(exc).split("\n")[0][:300]}
                print(json.dumps({name: results[name]}), flush=True)
                continue
            ratio = walls["big"] / walls["small"]
            results[name] = {
                **walls,
                "ratio": round(ratio, 2),
                "alpha": round(math.log(ratio) / math.log(args.factor), 3),
            }
            print(json.dumps({name: results[name]}), flush=True)
        print(
            json.dumps(
                {
                    "metric": "scaling_record",
                    "base_rows": args.base_rows,
                    "factor": args.factor,
                    "queries": results,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
