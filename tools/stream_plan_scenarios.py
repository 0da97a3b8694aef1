"""Deterministic micro-scenarios that drive every instrumented stream
job once with the plan probe armed (round 13, VERDICT r12 #4).

Shared by tools/audit_plan_duplication.py (--streams regenerates the
``stream:`` budget entries) and tests/test_plan_budgets.py (the gate)
so both count exchanges on IDENTICAL plans: same rows, same batching
(maxFilesPerTrigger=1 over two input files, so the second trigger
probes the first trigger's persisted index — the representative
steady-state trigger, not the structurally-skipped empty-index first
one).

Every scenario is availableNow (drain-and-stop); the probe records the
FIRST micro-batch that reaches each key, which for the history-probe
keys is trigger 2 by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)
EN = "the quick brown fox and the lazy dog is that for with was happy"


def _two_files(df, path: str, split_col: str, pivot: int) -> None:
    df.filter(F.col(split_col) < pivot).coalesce(1).write.mode("append").parquet(path)
    df.filter(F.col(split_col) >= pivot).coalesce(1).write.mode("append").parquet(path)


def capture_all_stream_plans(spark, work: str) -> dict[str, str]:
    """Run each stream job over its micro-scenario with the probe armed
    and return {key: initial-plan string} for every instrumented
    stage."""
    from s3logs_parquet_spark.streaming import job as sj

    scfg = sj.StreamingJobConfig(available_now=True, max_files_per_trigger=1)
    sink: dict[str, str] = {}
    sj.capture_stream_plans(sink)
    try:
        # --- curation: 2 triggers; trigger 2 probes trigger 1's store
        fam = f"{EN} alpha beta gamma delta epsilon zeta eta theta"
        docs = spark.createDataFrame(
            [(i, f"{fam} tail{i % 3}") for i in range(8)]
            + [(100 + i, f"the w{i}a of w{i}b to w{i}c in w{i}d is w{i}e "
                f"that w{i}f for w{i}g with w{i}h was w{i}j") for i in range(8)],
            DOC_SCHEMA,
        )
        inp = os.path.join(work, "cur-in")
        _two_files(docs, inp, "doc_id", 100)
        q = sj.run_stream_curation(
            spark, inp, DOC_SCHEMA,
            os.path.join(work, "cur-out"), os.path.join(work, "cur-idx"),
            os.path.join(work, "cur-ck"),
            min_quality=0.3, jaccard_threshold=0.3, scfg=scfg,
        )
        q.awaitTermination(300)

        # --- semantic dedup: same 2-trigger shape over vectors
        vschema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        )
        cents = [[1.0, 0.0], [0.0, 1.0]]
        vecs = spark.createDataFrame(
            [(i, [1.0 - i * 0.01, i * 0.01]) for i in range(8)]
            + [(100 + i, [i * 0.01, 1.0 - i * 0.01]) for i in range(8)],
            vschema,
        )
        vin = os.path.join(work, "sd-in")
        _two_files(vecs, vin, "vec_id", 100)
        q = sj.run_stream_semantic_dedup(
            spark, vin, vschema, os.path.join(work, "sd-idx"), cents, 0.99,
            os.path.join(work, "sd-out"), os.path.join(work, "sd-ck"), scfg=scfg,
        )
        q.awaitTermination(300)

        # --- inference
        from s3logs_parquet_spark.operators.inference import (
            LINEAR_TEXT_WEIGHTS,
            linear_text_model,
        )

        iin = os.path.join(work, "inf-in")
        _two_files(docs, iin, "doc_id", 100)
        q = sj.run_stream_inference(
            spark, iin, DOC_SCHEMA,
            os.path.join(work, "inf-out"), os.path.join(work, "inf-ck"),
            model_fn=linear_text_model, input_cols=("text",),
            output_schema="doc_id bigint, logit double, label boolean",
            weights=LINEAR_TEXT_WEIGHTS, passthrough_cols=("doc_id",),
            scfg=scfg,
        )
        q.awaitTermination(300)

        # --- sketches + rollup over one shared tiny event stream
        gschema = T.StructType(
            [T.StructField("g", T.StringType()), T.StructField("v", T.StringType())]
        )
        gv = spark.createDataFrame(
            [(f"g{i % 3}", f"v{i % 10}") for i in range(40)], gschema
        )
        kin = os.path.join(work, "kmv-in")
        gv.coalesce(1).write.parquet(kin)
        q = sj.run_stream_kmv(
            spark, kin, gschema, os.path.join(work, "kmv-sk"),
            os.path.join(work, "kmv-ck"), "g", "v", k=16, scfg=scfg,
        )
        q.awaitTermination(300)
        min_ = os.path.join(work, "mg-in")
        gv.coalesce(1).write.parquet(min_)
        q = sj.run_stream_mg(
            spark, min_, gschema, os.path.join(work, "mg-sk"),
            os.path.join(work, "mg-ck"), "v", k=8, scfg=scfg,
        )
        q.awaitTermination(300)

        eschema = T.StructType(
            [
                T.StructField("event_type", T.StringType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("value", T.DoubleType()),
            ]
        )
        ev = spark.createDataFrame(
            [(f"t{i % 2}", None, float(i)) for i in range(40)], eschema
        ).withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("value")))
        rin = os.path.join(work, "roll-in")
        ev.coalesce(1).write.parquet(rin)
        q = sj.run_stream_rollup(
            spark, rin, eschema, os.path.join(work, "roll-rl"),
            os.path.join(work, "roll-ck"), window_seconds=10, scfg=scfg,
        )
        q.awaitTermination(300)
    finally:
        sj.capture_stream_plans(None)
    return sink
