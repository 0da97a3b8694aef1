"""Curation pipeline scale bench (VERDICT r3 #6): run
`curate_documents` end-to-end at ≥10M docs with per-stage timings and
a row-accounting invariant.

The corpus is the boilerplate-flood shape that killed the uncapped
round-3 run (web corpora are template-heavy): ~40% of docs are light
variations of a handful of boilerplate templates (the LSH hot-bucket
case), ~10% verbatim duplicates, the rest unique-ish text — all
generated JVM-side from hash arithmetic (no driver data, no Python
row funcs).

At 10M the interesting stress points beyond the 1M run are the
connected-components pointer-doubling rounds and the exact-dedup
semi-join at a survivor count too big for automatic broadcast.

Usage: python tools/bench_curation_scale.py [--rows 10000000]
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

WORDS = [
    "data", "spark", "model", "train", "scale", "vector", "query", "join",
    "shuffle", "window", "stream", "batch", "token", "corpus", "filter",
    "engine", "plan", "cache", "merge", "index",
]

TEMPLATES = [
    "subscribe to our newsletter for the latest updates and offers from our site",
    "this page uses cookies to improve your experience please accept our policy",
    "all rights reserved terms of service privacy policy contact us about us",
    "click here to read more breaking news stories from around the world today",
]


def _salad(src):
    """Deterministic 14-word salad for a source id expression; en-only
    stopwords interleave so the docs PASS the curation quality/langid
    gates (see the note inside synth_docs). Module-level so the
    streaming bench's flood corpus can reuse the identical kernel."""
    stoplit = F.array(*[F.lit(w) for w in ["the", "and", "to", "with", "for", "was", "that"]])
    wordlit = F.array(*[F.lit(w) for w in WORDS])
    parts = []
    for i in range(14):
        parts.append(
            wordlit[F.pmod(F.xxhash64(src, F.lit(10 + i)), F.lit(len(WORDS))).cast("int")]
        )
        if i % 2 == 1:
            parts.append(
                stoplit[F.pmod(F.xxhash64(src, F.lit(100 + i)), F.lit(7)).cast("int")]
            )
    return F.concat_ws(" ", *parts, src.cast("string"))


def synth_docs(spark, n: int):
    """Deterministic mixed corpus: 40% boilerplate variants, 10% exact
    dups of earlier docs, 50% unique-ish word salads.

    Salads interleave en-only stopwords so they PASS the curation
    quality/langid gates — otherwise everything but the ~200 distinct
    boilerplate strings dies at the filter and the downstream
    dedup/CC stages run on a broadcast-trivial survivor set (the
    original 10M run's failure to exercise them; PERF.md "Curation
    at 10M docs", round 6)."""
    df = spark.range(n)
    kind = F.pmod(F.xxhash64("id"), F.lit(10))  # 0-3 boiler, 4 dup, 5-9 unique

    tpl = F.array(*[F.lit(t) for t in TEMPLATES])[
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(len(TEMPLATES))).cast("int")
    ]
    # light variation: one trailing token out of 50 → same LSH buckets
    boiler = F.concat(
        tpl, F.lit(" edition "), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(50)).cast("string")
    )

    salad = _salad(F.col("id"))
    # exact dup: regenerate the salad of doc (id % 1000) — verbatim copy
    dup = _salad(F.pmod(F.col("id"), F.lit(1000)))

    text = (
        F.when(kind <= 3, boiler).when(kind == 4, dup).otherwise(salad)
    )
    return df.select(F.col("id").alias("doc_id"), text.alias("text"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    args = ap.parse_args()

    spark = get_spark(app_name="bench-curation-scale")
    from s3logs_parquet_spark.functions.text_analysis import langid, quality_score
    from s3logs_parquet_spark.operators.dedup import (
        connected_components_clusters,
        exact_dedup,
        minhash_lsh_pairs,
    )
    from s3logs_parquet_spark.plans.curation import curate_documents

    # land the corpus and read it back (bench-honesty rule, round 9):
    # consumed directly, the md5-heavy synth expressions replay on
    # every one of the five stage passes below and dominate the
    # timings — a 1M run measured 244.8 s un-landed vs 77.5 s landed
    # for the same full pipeline (PERF.md round 9)
    import tempfile

    src = tempfile.mkdtemp(prefix="bench-curation-src-")
    synth_docs(spark, args.rows).write.mode("overwrite").parquet(src)
    docs = spark.read.parquet(src)
    stages: dict[str, float] = {}
    counts: dict[str, int] = {"input": args.rows}

    # stage timings mirror curate_documents' internal phases
    t0 = time.time()
    scored = docs.withColumn("quality", F.round(quality_score(F.col("text")), 6)).withColumn(
        "lang_pred", langid(F.col("text"))
    )
    kept = scored.filter((F.col("quality") >= 0.5) & F.col("lang_pred").isin("en"))
    counts["kept_quality_lang"] = kept.count()
    stages["score_filter_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    exact = exact_dedup(kept, "text", keep_order_col="doc_id", id_col="doc_id")
    counts["exact_survivors"] = exact.count()
    stages["exact_dedup_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    pairs = minhash_lsh_pairs(
        exact, "doc_id", "text", num_hashes=32, bands=8, jaccard_threshold=0.3
    )
    counts["neardup_pairs"] = pairs.count()
    stages["lsh_pairs_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    clusters = connected_components_clusters(pairs, exact.select("doc_id"), "doc_id")
    counts["clustered_docs"] = clusters.count()
    stages["connected_components_s"] = round(time.time() - t0, 1)

    # full pipeline end-to-end (its own fresh plan; includes all above)
    t0 = time.time()
    out = curate_documents(docs)
    counts["survivors"] = out.count()
    stages["full_pipeline_s"] = round(time.time() - t0, 1)

    # row accounting invariants
    assert counts["survivors"] <= counts["exact_survivors"] <= counts["kept_quality_lang"] <= args.rows
    assert counts["clustered_docs"] == counts["exact_survivors"]

    print(
        json.dumps(
            {
                "metric": "curation_scale",
                "rows": args.rows,
                "stages": stages,
                "counts": counts,
            }
        )
    )
    import shutil

    shutil.rmtree(src, ignore_errors=True)


if __name__ == "__main__":
    main()
