"""Decompose the incremental-probe's per-trigger cost by IO term
(round 13 follow-through on the cap-horizon finding).

The cap experiment proved the full-recall steady-trigger growth is NOT
bucket fattening (a 27% smaller index probed SLOWER once the cap's
machinery rode the trigger). The remaining suspect is the probe's scan
itself: the bucketed-index path (``carry_signatures=True``) reads the
SIGNATURE array column for EVERY index row every trigger — at stream
defaults (bands=8, num_hashes=32) that is an 8x-redundant multi-GB
column scan growing linearly with history, while the candidate join's
narrow keys (band, band_hash, doc_id) cost a fraction of it.

This tool builds one bucketed band-index store in equal contributions
(synthetic banded rows, family-structured buckets, stream-default
shape), then at several history depths (partition-pruned prefixes of
the SAME store) times:

- narrow scan  : count over (band, band_hash, doc_id) — the band join's
                 index-side IO floor
- sig scan     : sum(size(signature)) over every row — what
                 carry_signatures=True pays
- band0 sig    : the same restricted to band=0 — what a band-0
                 signature fetch pays (row-group pruning: band is the
                 store's leading sort key)
- probe carry  : incremental_neardup_pairs(carry_signatures=True)
                 — the shipped bucketed-stream path
- probe band0  : incremental_neardup_pairs(carry_signatures=False,
                 broadcast_batch=True) — candidate ids through the
                 narrow band join, signatures fetched from the band-0
                 slice via a broadcast semi-filter
- pair parity  : both probes' (batch_id, corpus_id, est_jaccard)
                 fingerprints must match exactly

Usage: python tools/exp_probe_sig_carry.py \\
    [--docs-per-contrib 625000] [--contribs 8] [--depths 1,4,8] \\
    [--batch-docs 50000] [--buckets 32]
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

from s3logs_parquet_spark.session import get_spark  # noqa: E402
from s3logs_parquet_spark.plans import band_index as bandidx  # noqa: E402

BANDS = 8
NUM_HASHES = 32


def synth_banded(spark, n_docs: int, id_offset: int, family_mod: int):
    """Stream-default-shaped minhash_banded rows: 8 band rows per doc,
    32-int signatures. ~20% of docs belong to a family (id mod
    family_mod): family members share band hashes AND signatures, so
    probes get realistic bucket hits that pass est_jaccard — the rest
    hash to singleton buckets."""
    df = spark.range(id_offset, id_offset + n_docs).withColumnRenamed("id", "doc_id")
    in_family = F.pmod(F.xxhash64("doc_id"), F.lit(10)) < 2
    src = F.when(
        in_family, F.pmod(F.col("doc_id"), F.lit(family_mod))
    ).otherwise(F.col("doc_id"))
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(NUM_HASHES - 1)),
        lambda i: F.pmod(F.xxhash64(src, i), F.lit(2**31)).cast("int"),
    )
    out = df.select(
        "doc_id",
        sig.alias("signature"),
        F.explode(F.sequence(F.lit(0), F.lit(BANDS - 1))).alias("band"),
    ).withColumn("band_hash", F.xxhash64(src, "band"))
    return out


def run(thunk) -> float:
    """Time CONSTRUCTION + execution: the non-carry probe eagerly
    localCheckpoints its candidate ids while the DataFrame is being
    BUILT, so the thunk must construct the frame inside the clock."""
    t0 = time.time()
    thunk().write.format("noop").mode("overwrite").save()
    return time.time() - t0


def best2(thunk) -> float:
    run(thunk)  # warm listing/codegen
    return round(min(run(thunk), run(thunk)), 2)


def fingerprint(pairs) -> tuple[int, int]:
    row = (
        pairs.select(
            F.pmod(
                F.xxhash64("batch_id", "corpus_id", F.round("est_jaccard", 6)),
                F.lit(10**12),
            ).alias("h")
        )
        .agg(F.count("*").alias("n"), F.sum("h").alias("fp"))
        .collect()[0]
    )
    return int(row["n"]), int(row["fp"] or 0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs-per-contrib", type=int, default=625_000)
    ap.add_argument("--contribs", type=int, default=8)
    ap.add_argument("--depths", default="1,4,8")
    ap.add_argument("--batch-docs", type=int, default=50_000)
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()
    depths = [int(d) for d in args.depths.split(",")]

    from s3logs_parquet_spark.operators.dedup import incremental_neardup_pairs

    spark = get_spark(app_name="exp-probe-sig-carry")
    work = tempfile.mkdtemp(prefix="probe-sig-carry-")
    store = os.path.join(work, "bands")
    total_docs = args.docs_per_contrib * args.contribs
    family_mod = max(total_docs // 50, 1)
    try:
        for b in range(args.contribs):
            bandidx.write_contribution(
                spark,
                store,
                synth_banded(
                    spark, args.docs_per_contrib, b * args.docs_per_contrib, family_mod
                ),
                b,
                ("band", "band_hash"),
                n_buckets=args.buckets,
                dedup_cols=("doc_id", "band"),
            )
            print(json.dumps({"built_contrib": b}), flush=True)

        # batch: new ids, ~20% landing in existing families (probe hits)
        bb = synth_banded(spark, args.batch_docs, total_docs, family_mod)
        bb = bb.localCheckpoint()  # fixed input; exclude synth cost from probes

        results = []
        for depth in depths:
            idx = bandidx.prior_batches(spark, store, depth)
            rows = idx.count()
            r = {"depth": depth, "index_rows": rows}
            r["narrow_scan_s"] = best2(
                lambda: idx.select("band", "band_hash", "doc_id")
            )
            r["sig_scan_s"] = best2(
                lambda: idx.select(F.size("signature").alias("n"))
            )
            r["band0_sig_scan_s"] = best2(
                lambda: idx.filter(F.col("band") == 0).select(
                    F.size("signature").alias("n")
                )
            )

            def probe(carry: bool):
                out = incremental_neardup_pairs(
                    spark.createDataFrame([], "doc_id long, text string"),
                    idx,
                    num_hashes=NUM_HASHES,
                    bands=BANDS,
                    jaccard_threshold=0.3,
                    batch_banded=bb,
                    carry_signatures=carry,
                    broadcast_batch=not carry,
                    check_index=False,
                )
                return out

            r["probe_carry_s"] = best2(lambda: probe(True))
            r["probe_band0_s"] = best2(lambda: probe(False))
            n_a, fp_a = fingerprint(probe(True))
            n_b, fp_b = fingerprint(probe(False))
            r["pairs"] = n_a
            r["parity"] = bool(n_a == n_b and fp_a == fp_b)
            r["fp"] = fp_a
            results.append(r)
            print(json.dumps(r), flush=True)
        print(
            json.dumps(
                {
                    "metric": "probe_sig_carry",
                    "bands": BANDS,
                    "num_hashes": NUM_HASHES,
                    "batch_docs": args.batch_docs,
                    "depths": results,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
