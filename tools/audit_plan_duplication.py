"""Registry-wide plan-duplication audit (round 10): count expensive
function occurrences in every registry query's OPTIMIZED plan and flag
suspicious repetition.

Why this exists: Catalyst re-expands staged expression subtrees in two
ways that runtime subexpression elimination does NOT recover —
PushDownPredicates substitutes projection aliases into pushed filters
unconditionally, and copies sitting inside when/CASE branches are
skipped by CSE (conditional evaluation). Round 10 found the curation
gate running its tokenizer 37x per row and four registry queries at
11-26x through exactly these mechanisms (PERF.md "Registry-wide
plan-duplication audit"); the fixes are the pinned-staging pattern in
functions/text_analysis.py. This tool re-runs the hunt so a future
operator (or a Spark upgrade changing optimizer behavior) gets caught
in review, not in production.

A hit is NOT automatically a bug — LSH banding legitimately evaluates
one xxhash64 per band per side (32-40 occurrences), and unconditional
chain prefixes (docs_pii_redact) are CSE-recovered at runtime. The
output is a review queue, ranked; the hard pins live in
tests/test_text_functions.py::test_staged_callers_tokenize_once and
::test_gate_filter_does_not_reexpand_tokenize.

Usage: python tools/audit_plan_duplication.py [sf_dir] [--min 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARKERS = [
    "split(",
    "regexp_extract_all(",
    "regexp_replace(",
    "regexp_extract(",
    "regexp_count(",
    "to_timestamp(",
    "try_to_timestamp(",
    "date_format(",
    "sentences(",
    "aggregate(",
    "transform(",
    "array_distinct(",
    "zip_with(",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--min", type=int, default=8, help="flag threshold per marker")
    args = ap.parse_args()

    from s3logs_parquet_spark.plans.queries import QUERIES
    from s3logs_parquet_spark.session import get_spark

    spark = get_spark(app_name="audit-plan-duplication")
    flagged = []
    errors = []
    for name, (fn, _sql) in QUERIES.items():
        try:
            plan = (
                fn(spark, args.sf_dir)
                ._jdf.queryExecution()
                .optimizedPlan()
                .toString()
            )
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            errors.append({"query": name, "error": str(e)[:120]})
            continue
        hits = {m: plan.count(m) for m in MARKERS if plan.count(m) >= args.min}
        if hits:
            flagged.append({"query": name, "plan_len": len(plan), "hits": hits})
    flagged.sort(key=lambda r: -max(r["hits"].values()))
    print(
        json.dumps(
            {
                "metric": "plan_duplication_audit",
                "queries_audited": len(QUERIES),
                "threshold": args.min,
                "flagged": flagged,
                "errors": errors,
            }
        )
    )


if __name__ == "__main__":
    main()
