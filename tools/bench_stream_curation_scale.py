"""Streaming curation at scale: per-batch latency as the persisted
indexes grow — the O(batch) claim, measured, in BOTH band-index modes.

Corpus: bench_curation_scale.synth_docs (the boilerplate-flood shape —
40% template variants, 10% verbatim dups of early ids, 50% unique
salads), split into --batches equal id ranges written as one file per
batch; maxFilesPerTrigger=1 makes each file a micro-batch, so every
batch carries cross-batch exact dups (ids ≥ 1000 duplicate batch-0
salads) and cross-batch near-dup flood mass (template variants land in
the same band buckets in every batch).

Per-batch wall times come from the StreamingQuery progress log
(triggerExecution durationMs). The flood corpus is exactly the case
the run_stream_curation docstring warns about: with
index_dropped=True the dropped variants accumulate in hot band
buckets and the batch×corpus probe grows with history; with
index_dropped=False (survivors-only bands) buckets hold one canonical
per family and the curve should stay flat.

Usage: python tools/bench_stream_curation_scale.py
    [--rows-per-batch 100000] [--batches 10]
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
from pyspark.sql import types as T  # noqa: E402

from s3logs_parquet_spark.session import get_spark  # noqa: E402
from s3logs_parquet_spark.streaming.job import (  # noqa: E402
    StreamingJobConfig,
    run_stream_curation,
)
from tools.bench_curation_scale import synth_docs  # noqa: E402

SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


def synth_neardup_flood(spark, n: int, n_families: int = 200):
    """The corpus the index_dropped knob exists for: 40% NEAR-dup flood
    (the family salad plus a unique trailing token — exact-UNIQUE, so
    the digest index never catches them; every member lands in its
    family's band buckets) + 60% unique salads. synth_docs' mixed
    corpus is mostly EXACT dups after the quality gate, which the
    digest path absorbs — its near-dup mass is ~1% and both index
    modes stay O(batch). Here the full-recall mode indexes every
    arrived flood member, so the batch x history probe join grows
    linearly with history; survivors-only keeps one representative
    per family and stays flat."""
    from tools.bench_curation_scale import _salad  # reuse the salad kernel

    df = spark.range(n).withColumnRenamed("id", "doc_id")
    kind = F.pmod(F.xxhash64("doc_id"), F.lit(10))  # 0-3 flood, 4-9 unique
    flood = F.concat(
        _salad(F.pmod(F.col("doc_id"), F.lit(n_families))),
        F.lit(" tail "),
        F.col("doc_id").cast("string"),
    )
    text = F.when(kind <= 3, flood).otherwise(_salad(F.col("doc_id")))
    return df.select("doc_id", text.alias("text"))


def synth_hotprobe(spark, n: int, rows_per_batch: int, member_fraction: float = 0.4):
    """The corpus the run_stream_curation docstring WARNS about and the
    flood corpus cannot provoke (VERDICT r8 #3): every near-dup family
    contributes exactly ONE member per micro-batch, so within-batch
    dedup collapses nothing — every batch's family members survive to
    the history probe as representatives, and (in index_dropped=True
    mode) every prior member of their family sits in the SAME band
    buckets. The batch x history probe join therefore grows with
    HISTORY: candidates ≈ n_families x batch_index x matching-bands.
    Members are exact-unique (family salad + unique tail), so the
    digest index never absorbs them.

    Layout: ids are assigned to batches in contiguous ranges; slot
    ``id % rows_per_batch < n_families`` makes doc a member of family
    ``slot`` (one per family per batch), the rest are unique salads
    (offset keys so they never collide with family salads)."""
    from tools.bench_curation_scale import _salad

    n_families = int(rows_per_batch * member_fraction)
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    slot = F.col("doc_id") % rows_per_batch
    member = F.concat(
        _salad(slot), F.lit(" tail "), F.col("doc_id").cast("string")
    )
    filler = _salad(F.col("doc_id") + F.lit(1_000_000_000))
    text = F.when(slot < n_families, member).otherwise(filler)
    return df.select("doc_id", text.alias("text"))


def run_mode(
    spark, inp: str, work: str, index_dropped: bool, band_cap=None,
    band_layout: str = "bucketed", fold_every: int | None = None,
    fold_mode: str = "window", final_full_fold: bool = False,
) -> dict:
    tag = f"{index_dropped}-{band_cap}-{band_layout}-{fold_every}-{fold_mode}"
    out = os.path.join(work, f"out-{tag}")
    idx = os.path.join(work, f"idx-{tag}")
    ck = os.path.join(work, f"ck-{tag}")
    t0 = time.time()
    q = run_stream_curation(
        spark,
        inp,
        SCHEMA,
        out,
        idx,
        ck,
        min_quality=0.5,
        languages=("en",),
        lsh_max_bucket_size=500,
        index_dropped=index_dropped,
        band_index_max_bucket=band_cap,
        band_index_layout=band_layout,
        fold_every_n_batches=fold_every,
        fold_mode=fold_mode,
        scfg=StreamingJobConfig(available_now=True, max_files_per_trigger=1),
    )
    q.awaitTermination(3600)
    wall = time.time() - t0
    per_batch = [
        {
            "batch": p["batchId"],
            "rows": p["numInputRows"],
            "sec": round(p["durationMs"]["triggerExecution"] / 1000.0, 1),
        }
        for p in q.recentProgress
        if p["numInputRows"] > 0
    ]
    surv_df = spark.read.parquet(out)
    survivors = surv_df.count()
    # answer-parity fingerprint for cross-layout A/Bs (measurement
    # honesty rule: legs must prove they computed the same thing)
    surv_fp = surv_df.agg(
        F.sum(F.pmod(F.xxhash64("doc_id"), F.lit(1_000_000_007)))
    ).collect()[0][0]  # pmod keeps the ANSI-mode sum far from long overflow
    bands_rows = spark.read.parquet(os.path.join(idx, "bands")).count()
    bands_files = sum(
        len([f for f in files if f.endswith(".parquet")])
        for _, _, files in os.walk(os.path.join(idx, "bands"))
    )
    full_fold = None
    if final_full_fold:
        # the drain-window escalation the window-fold docstrings
        # recommend: one everything-fold per store after the stream
        # stops — measures what the occasional full compact costs at
        # this history depth and what it buys in files/partitions
        from s3logs_parquet_spark.plans.compact import compact_index_store

        full_fold = {}
        for store in ("digests", "bands"):
            t1 = time.time()
            st = compact_index_store(
                spark, os.path.join(idx, store), checkpoint_dir=ck
            )
            st["sec"] = round(time.time() - t1, 1)
            full_fold[store] = st
        # answer parity must hold across the fold: rows read back from
        # the folded band store equal the unfolded count minus nothing
        # (window-fold crash duplicates would be healed here)
        full_fold["bands_rows_after"] = spark.read.parquet(
            os.path.join(idx, "bands")
        ).count()
    return {
        **({"final_full_fold": full_fold} if full_fold else {}),
        "index_dropped": index_dropped,
        "band_cap": band_cap,
        "band_layout": band_layout,
        "fold_every": fold_every,
        "fold_mode": fold_mode,
        "band_index_files": bands_files,
        "wall_sec": round(wall, 1),
        "survivors": survivors,
        "survivors_fp": surv_fp,
        "band_index_rows": bands_rows,
        "per_batch_sec": per_batch,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-batch", type=int, default=100_000)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--corpus", choices=["mixed", "flood", "hotprobe"], default="mixed")
    ap.add_argument(
        "--modes",
        default="dropped,survivors",
        help="comma list of band-index modes to run: dropped (full recall), survivors",
    )
    ap.add_argument(
        "--band-cap",
        default=None,
        help="band_index_max_bucket for run_stream_curation (None = "
        "uncapped). Accepts a comma list for a same-session sweep, "
        "with 'none' for the uncapped control leg: --band-cap none,8,64",
    )
    ap.add_argument(
        "--band-layout",
        default="bucketed",
        choices=["bucketed", "dirs", "both"],
        help="index store layout (round 10); 'both' A/Bs the two layouts "
        "back-to-back in the same session",
    )
    ap.add_argument(
        "--fold-every",
        type=int,
        default=None,
        help="fold_every_n_batches for run_stream_curation (round 11 "
        "in-stream auto-fold; bucketed layout only)",
    )
    ap.add_argument(
        "--fold-mode",
        default="window",
        choices=["window", "all"],
        help="window = fold only the last N partitions (O(batch*N) per "
        "fold); all = whole-store fold (O(history) per fold)",
    )
    ap.add_argument(
        "--final-full-fold",
        action="store_true",
        help="after the drain, run + time one everything-fold per index "
        "store (the drain-window escalation the window-fold docs "
        "recommend) and record files/partitions before/after",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="bench-stream-curation")
    work = tempfile.mkdtemp(prefix="stream-curation-")
    inp = os.path.join(work, "in")
    n_total = args.rows_per_batch * args.batches
    if args.corpus == "mixed":
        docs = synth_docs(spark, n_total)
    elif args.corpus == "flood":
        docs = synth_neardup_flood(spark, n_total)
    else:
        docs = synth_hotprobe(spark, n_total, args.rows_per_batch)
    for b in range(args.batches):
        lo, hi = b * args.rows_per_batch, (b + 1) * args.rows_per_batch
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(inp)

    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    layouts = ["bucketed", "dirs"] if args.band_layout == "both" else [args.band_layout]
    caps = [
        None if c.strip().lower() in ("", "none") else int(c)
        for c in str(args.band_cap).split(",")
    ] if args.band_cap is not None else [None]
    results = [
        run_mode(
            spark, inp, work, m == "dropped", cap, layout,
            fold_every=args.fold_every, fold_mode=args.fold_mode,
            final_full_fold=args.final_full_fold,
        )
        for layout in layouts
        for m in modes
        for cap in caps
    ]
    n = args.rows_per_batch * args.batches
    print(
        json.dumps(
            {
                "metric": "stream_curation_scale",
                "rows": n,
                "corpus": args.corpus,
                "batches": args.batches,
                "modes": results,
                "docs_per_sec": {
                    ("dropped" if r["index_dropped"] else "survivors")
                    + "/" + r["band_layout"]
                    + (f"/cap{r['band_cap']}" if r["band_cap"] else ""):
                    round(n / r["wall_sec"], 1)
                    for r in results
                },
            }
        ),
        flush=True,
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
