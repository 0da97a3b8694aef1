"""Dissect run_stream_curation's gate+dedup stage (round-10 floor
hunt): the per-trigger trace shows ~9-12 s of every ~15 s mixed-corpus
trigger inside the first materialization (quality/langid -> digest ->
window dedup -> history anti-join -> localCheckpoint). Time each
suffix of that lineage on a landed 50k-doc batch file to attribute the
cost: source scan, rebalance, gate expressions, digest+window, and the
checkpoint write itself.

Usage: python tools/exp_gate_dedup_floor.py [--rows 50000] [--reps 3]
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

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from s3logs_parquet_spark.functions.text_analysis import (  # noqa: E402
    with_quality_and_lang,
)
from s3logs_parquet_spark.operators.dedup import _content_digest  # noqa: E402
from s3logs_parquet_spark.session import get_spark, materialize, release  # noqa: E402
from tools.bench_curation_scale import synth_docs  # noqa: E402


def timed(label, fn, reps):
    outs = []
    for _ in range(reps):
        t0 = time.time()
        df = fn()
        n = df.count() if hasattr(df, "count") else None
        outs.append((time.time() - t0, n))
        if hasattr(df, "_jdf"):
            release(df)
    best = min(t for t, _ in outs)
    return {"leg": label, "best_sec": round(best, 2), "rows": outs[0][1]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=50_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="exp-gate-dedup-floor")
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    work = tempfile.mkdtemp(prefix="gate-floor-")
    inp = os.path.join(work, "batch")
    # one file, like a micro-batch arrival
    synth_docs(spark, args.rows).coalesce(1).write.mode("overwrite").parquet(inp)

    def src():
        return spark.read.parquet(inp)

    def gated(df):
        return with_quality_and_lang(df.repartition(n_shuffle), "text").filter(
            (F.col("quality") >= 0.5) & F.col("lang_pred").isin("en")
        )

    def deduped(df):
        w = Window.partitionBy("_dg").orderBy("doc_id")
        return (
            df.withColumn("_dg", _content_digest("text"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    legs = [
        ("scan+count", lambda: src()),
        ("scan+rebalance", lambda: src().repartition(n_shuffle)),
        ("scan+gate", lambda: gated(src())),
        ("scan+gate+digest+window", lambda: deduped(gated(src()))),
        ("full leg, count (no ckpt)", lambda: deduped(gated(src()))),
        ("full leg, localCheckpoint", lambda: materialize(deduped(gated(src())))),
        (
            "gate only, no rebalance (1 part)",
            lambda: with_quality_and_lang(src(), "text").filter(
                (F.col("quality") >= 0.5) & F.col("lang_pred").isin("en")
            ),
        ),
    ]
    out = [timed(label, fn, args.reps) for label, fn in legs]
    print(json.dumps({"metric": "gate_dedup_floor", "rows": args.rows, "legs": out}))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
