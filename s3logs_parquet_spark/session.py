"""SparkSession builder with scale-ready defaults.

Single place where engine sessions are configured so tests, bench and
the driver entry all agree on: UTC session time (DuckDB-oracle parity),
AQE on (runtime re-plan / skew-join at 100 TB), Arrow for the few
Pandas-UDF operators, and sane shuffle-partition defaults for local
runs (a real cluster would size shuffle partitions to ~128 MB each;
AQE coalescing makes the static number non-critical).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def materialize(df, durable: bool = False):
    """Materialize an intermediate DataFrame that later stages re-scan
    (LSH signature tables, CC edge lists — anything feeding a self-join
    or an iterative loop).

    durable=False → ``localCheckpoint(eager=True)``: blocks are
    executor-resident, fastest, but an executor loss loses the blocks
    and fails the job. Right default for local mode and short jobs.

    durable=True → reliable ``checkpoint(eager=True)`` into the
    session's checkpoint dir: survives executor loss — the 100 TB
    posture. The dir comes from ``SPARK_GRAFT_CHECKPOINT_DIR`` (default
    ``/tmp/s3logs-parquet-spark-ckpt``); on a cluster point it at a
    shared filesystem (HDFS/S3A) so any executor can re-read blocks.
    """
    if not durable:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(
            os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR", "/tmp/s3logs-parquet-spark-ckpt")
        )
    return df.checkpoint(eager=True)


def release(df) -> None:
    """Free the storage blocks of a frame returned by :func:`materialize`.

    Iterative operators (connected components) materialize a new
    generation every round; without an explicit release the dead
    generations accumulate until the heap dies — the exact OOM the 10M
    curation bench hit (PERF.md "Curation at 10M docs", round 6).
    ``Dataset.unpersist()``
    cannot do it: checkpoint blocks aren't registered with the cache
    manager (verified — storage info unchanged after unpersist). A
    checkpointed frame's analyzed plan IS a ``LogicalRDD`` though, so
    we drop its cached RDD directly via the context.

    The frame is DEAD afterwards — localCheckpoint severed its lineage,
    so the blocks cannot be recomputed. Only release a generation after
    the next one has been eagerly materialized. Quietly does nothing
    for frames that aren't checkpoint-backed (durable checkpoints keep
    their files; only residual memory blocks are dropped).
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        rdd_id = plan.rdd().id()
    except Exception:
        return
    sc = df.sparkSession.sparkContext
    # private[spark] in Scala = public in bytecode; removes blocks on
    # every executor, blocking so the memory is back before we return
    sc._jsc.sc().unpersistRDD(rdd_id, True)


# Checkpoint handles registered by operators whose RETURNED frame is
# not the materialized one (tfidf_similar_pairs' postings table,
# ADVICE r11 #3): an attribute stashed on a DataFrame does not survive
# .filter()/.select()/.join() — each transformation returns a NEW
# frame — so callers that transform before releasing silently keep the
# blocks alive. This registry is the transformation-proof path: the
# operator records its handle under a tag at call time; long-lived
# drivers call release_tracked(tag) once the consumer action has run.
_TRACKED: dict[str, list] = {}


def track(df, tag: str):
    """Register a materialized frame for later :func:`release_tracked`.
    Returns ``df`` so call sites can wrap in-line."""
    _TRACKED.setdefault(tag, []).append(df)
    return df


def release_tracked(tag: str) -> int:
    """Release every frame registered under ``tag`` (all calls since
    the last release — the release-all hook for operators invoked in a
    loop) and return how many were released. Safe to call repeatedly;
    unknown tags release nothing."""
    handles = _TRACKED.pop(tag, [])
    for df in handles:
        release(df)
    return len(handles)


def get_spark(
    app_name: str = "s3logs-parquet-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode: the driver JVM hosts all executor threads, so it
        # IS the executor heap. 8g starved 32 threads at the 10M-doc
        # scale bench (GCLocker churn, then OOM); 48g of the box's 128
        # leaves room for Python workers and page cache.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The engine's expanded arithmetic kernels (pair cosine, minhash
        # match count, banding) generate single methods past HotSpot's
        # HugeMethodLimit (8,000 bytecode bytes): by default the JIT
        # REFUSES them and the hottest per-pair loops run bytecode-
        # interpreted (measured 7.2 s -> 1.1 s on the emb_neardup pair
        # scorer at sf0.1 with the refusal lifted; PERF.md round 7
        # "huge-method JIT"). Whole-stage codegen can't split a single
        # expression across methods, so lifting the limit is the right
        # engine-level default. Executor option included for the real
        # multi-JVM cluster; in local mode the driver hosts everything.
        .config("spark.driver.extraJavaOptions", "-XX:-DontCompileHugeMethods")
        .config("spark.executor.extraJavaOptions", "-XX:-DontCompileHugeMethods")
    )
    # tool-level overrides (e.g. spark.ui.enabled=true for REST stage
    # metrics in the scale benches); no-op on an already-running session
    for key, val in (extra_conf or {}).items():
        builder = builder.config(key, val)
    return builder.getOrCreate()
