"""duplicated_spans at corpus scale: the ExactSubstr-style span
operator's at-scale record, plus the string-key vs hash-key exchange
A/B (``hash_ngrams``) and an exact planted-boilerplate invariant.

Corpus: ``--docs`` documents of ~2·PAD+BLOCK tokens each. A
``--contaminated`` fraction carries one of ``--templates`` shared
boilerplate blocks (BLOCK tokens, identical across the template's
docs) sandwiched between two per-doc unique salads (PAD tokens each) —
so the only cross-document 13-grams are the ones fully inside a block,
and every contaminated doc must report EXACTLY one merged span of
BLOCK tokens. Background docs are pure per-doc salads (zero spans).
That expectation is checked, not eyeballed:

    contaminated: n_spans == 1 and dup_tokens == BLOCK   (all of them)
    background:   n_spans == 0                           (all of them)

Usage: python tools/bench_dup_spans_scale.py [--docs 1000000]
    [--contaminated 0.2] [--templates 2000] [--block 40] [--pad 80]
    [--modes string,hash]
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
from tools.bench_curation_scale import WORDS  # noqa: E402


def synth_boilerplate_docs(
    spark, docs: int, contaminated: float, templates: int, block: int, pad: int
):
    """doc_id < n_cont -> salad | template block | salad; else pure
    salad. Salads are doc-seeded, blocks template-seeded (identical
    text for every doc sharing a template)."""
    wordlit = F.array(*[F.lit(w) for w in WORDS])

    def salad(seed_col, n_words, salt):
        parts = [
            wordlit[
                F.pmod(
                    F.xxhash64(seed_col, F.lit(salt + i)), F.lit(len(WORDS))
                ).cast("int")
            ]
            for i in range(n_words)
        ]
        return F.concat_ws(" ", *parts)

    n_cont = int(docs * contaminated)
    d = spark.range(docs)
    tpl = F.pmod(F.col("id"), F.lit(templates))
    # per-doc unique separator tokens fence the block: a straddling
    # n-gram always contains one, so it can never be cross-document —
    # without them, same-template docs match boundary grams with
    # probability ~1/|WORDS| per salad token (measured: mean span
    # 41.9 of 40 and only 2% of docs exact at 20k docs)
    body = F.when(
        F.col("id") < n_cont,
        F.concat_ws(
            " ",
            salad(F.col("id"), pad, 100),
            F.concat(F.lit("sepl"), F.col("id").cast("string")),
            salad(tpl + F.lit(5_000_000_000), block, 900),
            F.concat(F.lit("sepr"), F.col("id").cast("string")),
            salad(F.col("id"), pad, 300),
        ),
    ).otherwise(salad(F.col("id"), 2 * pad + block, 500))
    return d.select(F.col("id").alias("doc_id"), body.alias("text")), n_cont


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--contaminated", type=float, default=0.2)
    ap.add_argument("--templates", type=int, default=2_000)
    ap.add_argument("--block", type=int, default=40)
    ap.add_argument("--pad", type=int, default=80)
    ap.add_argument("--n", type=int, default=13)
    ap.add_argument("--modes", type=str, default="string,hash")
    ap.add_argument(
        "--remove",
        action="store_true",
        help="also time remove_duplicated_spans (hash keys): spans + "
        "position anti-join + ordered token-stream rebuild, checked "
        "against the same planted expectation",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="bench-dup-spans-scale")
    from s3logs_parquet_spark.operators.dedup import duplicated_spans
    from s3logs_parquet_spark.session import materialize, release

    docs_df, n_cont = synth_boilerplate_docs(
        spark, args.docs, args.contaminated, args.templates, args.block, args.pad
    )
    docs_df = materialize(docs_df, durable=True)
    n_docs = docs_df.count()
    tokens = docs_df.select(
        F.sum(F.size(F.split(F.col("text"), r"\s+")))
    ).first()[0]
    print(f"corpus: {n_docs:,} docs / {tokens:,} tokens, {n_cont:,} contaminated", flush=True)

    results = {}
    for mode in args.modes.split(","):
        t0 = time.time()
        out = duplicated_spans(
            docs_df, "doc_id", "text", n=args.n, hash_ngrams=(mode == "hash")
        )
        # one aggregate consumes every output row: the planted-corpus
        # expectation collapses to four exact counters
        chk = out.agg(
            F.sum(
                F.when(
                    (F.col("doc_id") < n_cont)
                    & (F.col("n_spans") == 1)
                    & (F.col("dup_tokens") == args.block),
                    1,
                ).otherwise(0)
            ).alias("cont_exact"),
            F.sum(
                F.when(
                    (F.col("doc_id") >= n_cont) & (F.col("n_spans") == 0), 1
                ).otherwise(0)
            ).alias("bg_clean"),
            F.count(F.lit(1)).alias("rows"),
            F.sum("dup_tokens").alias("dup_tokens_total"),
        ).first()
        el = time.time() - t0
        ok = chk["cont_exact"] == n_cont and chk["bg_clean"] == n_docs - n_cont
        results[mode] = dict(
            sec=round(el, 1),
            docs_per_sec=int(n_docs / el),
            tokens_per_sec=int(tokens / el),
            invariant_ok=bool(ok),
            dup_tokens_total=chk["dup_tokens_total"],
        )
        print(f"{mode}: {json.dumps(results[mode])}", flush=True)
        if not ok:
            print(
                f"  INVARIANT FAILED: cont_exact={chk['cont_exact']:,}/{n_cont:,} "
                f"bg_clean={chk['bg_clean']:,}/{n_docs - n_cont:,}",
                flush=True,
            )

    if args.remove:
        from s3logs_parquet_spark.operators.dedup import remove_duplicated_spans

        t0 = time.time()
        cleaned = remove_duplicated_spans(
            docs_df, "doc_id", "text", n=args.n, hash_ngrams=True
        )
        chk = cleaned.agg(
            F.sum("removed_tokens").alias("removed_total"),
            F.sum(F.when(F.col("removed_tokens") > 0, 1).otherwise(0)).alias(
                "docs_cut"
            ),
            # consume every clean_text byte so the rebuild isn't pruned
            F.sum(F.length("clean_text")).alias("clean_bytes"),
        ).first()
        el = time.time() - t0
        ok = (
            chk["removed_total"] == n_cont * args.block
            and chk["docs_cut"] == n_cont
        )
        results["remove_hash"] = dict(
            sec=round(el, 1),
            docs_per_sec=int(n_docs / el),
            tokens_per_sec=int(tokens / el),
            invariant_ok=bool(ok),
            clean_bytes=chk["clean_bytes"],
        )
        print(f"remove_hash: {json.dumps(results['remove_hash'])}", flush=True)

    release(docs_df)
    print(json.dumps({"docs": n_docs, "tokens": tokens, "results": results}))


if __name__ == "__main__":
    main()
