"""Heavy-hitter strategies vs the full-vocabulary groupBy at scale:
wall time AND exchange volume (the claim the operators exist for).
Three legs — naive groupBy, Misra–Gries (bounded state, Python
summary pass), Count-Min candidates (all-JVM, fixed bucket key
space) — all required to produce identical exact output.

Token stream model: 10% of draws hit a 100-item hot head (the true
heavy hitters), 90% spread near-uniformly over a --tail-sized noise
vocabulary (the billions-of-distinct-tokens tail that a full-vocab
groupBy shuffles and MG never keys an exchange by). Both legs read the
SAME materialized parquet and must produce identical (item, cnt) sets
— the exactness guarantee at scale, not just at pytest size.

Exchange volume comes from the local Spark UI REST API: per-leg sums
of shuffle write/read bytes and records over the stages that leg ran.
MG reads the source twice by design (summary pass + exact recount);
input bytes are reported so the tradeoff is visible.

Usage: python tools/bench_mg_scale.py [--rows 50000000] [--tail 20000000]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from s3logs_parquet_spark.operators.sketches import (  # noqa: E402
    cm_heavy_hitters,
    mg_heavy_hitters,
)
from s3logs_parquet_spark.session import get_spark  # noqa: E402

HOT = 100


def _ui(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.loads(r.read())


def stage_metrics(spark) -> dict[int, dict]:
    app = spark.sparkContext.applicationId
    out = {}
    for st in _ui(spark, f"applications/{app}/stages?status=complete"):
        out[st["stageId"]] = {
            "shuffle_write_bytes": st.get("shuffleWriteBytes", 0),
            "shuffle_read_bytes": st.get("shuffleReadBytes", 0),
            "shuffle_write_records": st.get("shuffleWriteRecords", 0),
            "input_bytes": st.get("inputBytes", 0),
        }
    return out


def leg_delta(before: dict, after: dict) -> dict:
    tot = {k: 0 for k in next(iter(after.values())).keys()} if after else {}
    for sid, m in after.items():
        if sid in before:
            continue
        for k, v in m.items():
            tot[k] += v
    return tot


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=50_000_000)
    ap.add_argument("--tail", type=int, default=20_000_000)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--phi", type=float, default=5e-4)
    args = ap.parse_args()

    spark = get_spark(
        app_name="bench-mg-scale", extra_conf={"spark.ui.enabled": "true"}
    )
    work = tempfile.mkdtemp(prefix="mg-scale-")
    src = os.path.join(work, "tokens")

    h = F.xxhash64("id")
    hot = F.concat(F.lit("hot"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(HOT)))
    tail = F.concat(F.lit("t"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(args.tail)))
    (
        spark.range(args.rows)
        .select(F.when(F.pmod(h, F.lit(10)) == 0, hot).otherwise(tail).alias("item"))
        .write.mode("overwrite")
        .parquet(src)
    )
    df = spark.read.parquet(src)
    n = df.count()
    thresh = math.ceil(args.phi * float(n))
    print(f"rows={n} thresh={thresh}", flush=True)

    # leg 1: naive full-vocabulary groupBy
    m0 = stage_metrics(spark)
    t0 = time.time()
    naive = (
        df.groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= F.lit(thresh))
        .collect()
    )
    t_naive = time.time() - t0
    m1 = stage_metrics(spark)
    naive_delta = leg_delta(m0, m1)

    # leg 2: MG candidate pass + exact recount
    t0 = time.time()
    mg = mg_heavy_hitters(df, "item", phi=args.phi, k=args.k).collect()
    t_mg = time.time() - t0
    m2 = stage_metrics(spark)
    mg_delta = leg_delta(m1, m2)

    # leg 3: Count-Min candidate pass + exact recount (all-JVM)
    t0 = time.time()
    cm = cm_heavy_hitters(df, "item", phi=args.phi).collect()
    t_cm = time.time() - t0
    m3 = stage_metrics(spark)
    cm_delta = leg_delta(m2, m3)

    got_naive = sorted((r["item"], r["cnt"]) for r in naive)
    got_mg = sorted((r["item"], r["cnt"]) for r in mg)
    got_cm = sorted((r["item"], r["cnt"]) for r in cm)
    assert got_naive == got_mg == got_cm, (
        f"parity FAILED: naive={len(got_naive)} mg={len(got_mg)} cm={len(got_cm)}"
    )

    vocab = df.select(F.countDistinct("item")).collect()[0][0]
    print(
        json.dumps(
            {
                "metric": "mg_heavy_hitters_scale",
                "rows": n,
                "distinct_items": vocab,
                "k": args.k,
                "phi": args.phi,
                "threshold": thresh,
                "heavy_hitters": len(got_mg),
                "parity": True,
                "naive_sec": round(t_naive, 1),
                "mg_sec": round(t_mg, 1),
                "cm_sec": round(t_cm, 1),
                "naive_stage_metrics": naive_delta,
                "mg_stage_metrics": mg_delta,
                "cm_stage_metrics": cm_delta,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
