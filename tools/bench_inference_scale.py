"""Batched inference at scale (VERDICT r8 #6): docs/s for the
mapInPandas scoring hook, the Arrow batch-size knob curve, and the
broadcast-vs-closure weight-shipping delta at a realistic payload size.

Three measured questions:

1. **Throughput**: score --rows docs (default 10M) with the linear text
   model (the docs_inference_scores gate path) into a noop sink.
2. **Batch-size knob**: sweep spark.sql.execution.arrow.maxRecordsPerBatch
   — the effective micro-batch size of the python boundary.
3. **Broadcast vs closure** at ~--payload-mb of ndarray weights: the
   shipped design puts weights on a SparkContext.broadcast (one
   transfer + one deserialize per worker, cached across tasks); the
   anti-pattern closes over the ndarray, which rides the pickled task
   command and is deserialized per task. Same model arithmetic both
   legs; answer parity pinned with a label-count + rounded-logit-sum
   fingerprint.

Corpus is landed in parquet and read back (synth-expression replay
would otherwise dominate every leg — the bench-honesty rule from the
selection bench). Timed legs force evaluation with a noop write.

Usage: python tools/bench_inference_scale.py
    [--rows 10000000] [--payload-mb 100] [--batch-sizes 1000,10000,100000]
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

from s3logs_parquet_spark.operators.inference import (  # noqa: E402
    LINEAR_TEXT_WEIGHTS,
    batched_inference,
    linear_text_model,
    score_documents,
)
from s3logs_parquet_spark.session import get_spark  # noqa: E402


def synth_corpus(spark, n: int):
    """~120-180 char docs with digits/upper-case mass so every model
    feature is live; deterministic, no RNG."""
    i = F.col("doc_id")
    return spark.range(n).withColumnRenamed("id", "doc_id").select(
        "doc_id",
        F.concat(
            F.lit("Document "),
            i.cast("string"),
            F.lit(" contains MIXED Case words AND the number "),
            (i % 977).cast("string"),
            F.lit(". "),
            F.repeat(F.lit("filler words go here "), (i % 5 + 1).cast("int")),
            F.lit("END"),
        ).alias("text"),
    )


def fingerprint(spark, out_df) -> tuple:
    r = out_df.agg(
        F.count(F.when(F.col("label"), 1)).alias("n_true"),
        F.round(F.sum("logit"), 3).alias("s"),
        F.count("*").alias("n"),
    ).collect()[0]
    return (r["n"], r["n_true"], float(r["s"]))


def timed_noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--payload-mb", type=int, default=100)
    ap.add_argument("--batch-sizes", default="1000,10000,100000")
    args = ap.parse_args()

    spark = get_spark(app_name="bench-inference")
    work = tempfile.mkdtemp(prefix="bench-inference-")
    src = os.path.join(work, "docs")
    synth_corpus(spark, args.rows).write.parquet(src)
    docs = spark.read.parquet(src)

    result: dict = {"metric": "inference_scale", "rows": args.rows}

    # --- 1+2: linear-model throughput across the Arrow batch-size knob
    knob = "spark.sql.execution.arrow.maxRecordsPerBatch"
    default_knob = spark.conf.get(knob)
    curve = {}
    for bs in [int(b) for b in args.batch_sizes.split(",")]:
        spark.conf.set(knob, str(bs))
        scored = score_documents(docs)
        timed_noop(scored)  # warm the plan/codegen once per knob value
        sec = timed_noop(score_documents(docs))
        curve[str(bs)] = {
            "sec": round(sec, 1),
            "docs_per_sec": round(args.rows / sec),
        }
        print(f"batch={bs}: {curve[str(bs)]}", flush=True)
    spark.conf.set(knob, default_knob)
    result["linear_batch_curve"] = curve

    # --- MLP leg: the real-model shape (ndarray matmul per batch)
    from s3logs_parquet_spark.operators.inference import (
        MLP_TEXT_WEIGHTS,
        mlp_text_model,
    )

    mlp = score_documents(docs, weights=MLP_TEXT_WEIGHTS, model_fn=mlp_text_model)
    timed_noop(mlp)
    sec = timed_noop(
        score_documents(docs, weights=MLP_TEXT_WEIGHTS, model_fn=mlp_text_model)
    )
    result["mlp"] = {"sec": round(sec, 1), "docs_per_sec": round(args.rows / sec)}
    print(f"mlp: {result['mlp']}", flush=True)

    # --- 3: broadcast vs closure at a realistic payload size
    import numpy as np

    ballast = np.arange(args.payload_mb * 131_072, dtype=np.float64)  # 8B each
    payload = {"linear": LINEAR_TEXT_WEIGHTS, "ballast": ballast}

    def model_via_broadcast(batch, weights):
        return linear_text_model(batch, weights["linear"])

    def make_closure_model():
        captured = {"linear": LINEAR_TEXT_WEIGHTS, "ballast": ballast.copy()}

        def model_closure(batch, _weights):
            return linear_text_model(batch, captured["linear"])

        return model_closure

    legs = {}
    fps = {}
    for name, fn, w in [
        ("broadcast", model_via_broadcast, payload),
        ("closure", make_closure_model(), None),
    ]:
        scored = batched_inference(
            docs,
            fn,
            input_cols=["text"],
            output_schema="doc_id long, logit double, label boolean",
            weights=w,
            passthrough_cols=["doc_id"],
        )
        sec = timed_noop(scored)
        fps[name] = fingerprint(spark, scored)
        legs[name] = {"sec": round(sec, 1), "docs_per_sec": round(args.rows / sec)}
        print(f"{name}: {legs[name]}", flush=True)
    assert fps["broadcast"] == fps["closure"], fps
    result["payload_mb"] = args.payload_mb
    result["weight_shipping"] = legs
    result["parity_fingerprint"] = list(fps["broadcast"])

    print(json.dumps(result), flush=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
