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

Round 11 (VERDICT r10 #5): the audit is ALSO a standing regression
gate — ``--write-budgets tests/plan_budgets.json`` records each
registry query's per-marker counts, and
tests/test_plan_budgets.py fails any plan whose marker count EXCEEDS
its recorded budget (a Spark upgrade or operator edit reintroducing
the 37x class fails CI instead of waiting for a trace).

Usage: python tools/audit_plan_duplication.py [sf_dir] [--min 8]
       python tools/audit_plan_duplication.py [sf_dir] --write-budgets tests/plan_budgets.json
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


def optimized_plan(spark, fn, sf_dir: str) -> str:
    """One query's optimized logical plan string (shared with
    tests/test_plan_budgets.py so the gate and the audit count the
    same text)."""
    return fn(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()


def physical_plan(spark, fn, sf_dir: str) -> str:
    """One query's planned PHYSICAL plan string — the AdaptiveSparkPlan
    INITIAL plan, the deterministic pre-runtime shape the shuffle
    budget pins (runtime re-planning can only improve on it).

    The initial-plan slice matters beyond intent: several registry
    queries cache their DataFrame per process (prepared-statement
    semantics), so by the time the full suite's gate plans them,
    test_oracles_full has EXECUTED the cached frame — and an executed
    AdaptiveSparkPlan's toString prints BOTH '== Final Plan ==' (with
    ShuffleQueryStage/ReusedExchange wrappers) and '== Initial Plan =='
    sections, exactly doubling every exchange count (observed: 4->8 /
    3->6 on the four cached-plan queries under full-suite ordering,
    green standalone). Counting only the Initial section makes the
    budget identical before and after execution."""
    s = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    marker = "== Initial Plan =="
    return s.split(marker, 1)[1] if marker in s else s


def marker_hits(plan: str) -> dict[str, int]:
    """Non-zero marker counts of a plan string."""
    return {m: plan.count(m) for m in MARKERS if m in plan}


# Physical shuffle markers (round 12, VERDICT r11 #3): every `weak` in
# rounds 9-11 was an Exchange reappearing on a path that was designed
# exchange-free — a class the expression markers above cannot see. The
# word-boundary regexes keep the three node families apart:
# "BroadcastExchange" and "ReusedExchange" both CONTAIN "Exchange" but
# have no word boundary before it, so `\bExchange ` counts only true
# shuffle exchanges. ReusedExchange is counted separately (it is a
# pointer at another exchange's output, not a new shuffle — but one
# APPEARING means plan structure changed and deserves a look).
import re as _re

EXCHANGE_MARKERS = {
    "Exchange": _re.compile(r"\bExchange "),
    "BroadcastExchange": _re.compile(r"\bBroadcastExchange"),
    "ReusedExchange": _re.compile(r"\bReusedExchange"),
}


def exchange_hits(plan: str) -> dict[str, int]:
    """Non-zero physical shuffle-node counts of an executedPlan string."""
    out = {}
    for name, rx in EXCHANGE_MARKERS.items():
        n = len(rx.findall(plan))
        if n:
            out[name] = n
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--min", type=int, default=8, help="flag threshold per marker")
    ap.add_argument(
        "--write-budgets",
        help="record per-query marker counts to this JSON file (the "
        "tests/test_plan_budgets.py regression baseline)",
    )
    ap.add_argument(
        "--streams",
        action="store_true",
        help="also capture the streaming per-trigger plans (round 13, "
        "VERDICT r12 #4: tools/stream_plan_scenarios.py drives every "
        "instrumented stream job once) and record their exchange "
        "budgets under stream: keys. Without this flag an existing "
        "budgets file's stream: entries are preserved verbatim.",
    )
    args = ap.parse_args()

    from s3logs_parquet_spark.plans.queries import QUERIES
    from s3logs_parquet_spark.session import get_spark

    spark = get_spark(app_name="audit-plan-duplication")
    flagged = []
    errors = []
    budgets: dict[str, dict[str, int]] = {}
    spark.catalog.clearCache()  # InMemoryRelation toString pollution
    for name, (fn, _sql) in QUERIES.items():
        try:
            plan = optimized_plan(spark, fn, args.sf_dir)
            phys = physical_plan(spark, fn, args.sf_dir)
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            errors.append({"query": name, "error": str(e)[:120]})
            continue
        budgets[name] = marker_hits(plan) | exchange_hits(phys)
        hits = {m: c for m, c in budgets[name].items() if c >= args.min}
        if hits:
            flagged.append({"query": name, "plan_len": len(plan), "hits": hits})
    if args.streams:
        import shutil
        import tempfile

        from tools.stream_plan_scenarios import capture_all_stream_plans

        work = tempfile.mkdtemp(prefix="stream-plan-budgets-")
        try:
            for key, plan in capture_all_stream_plans(spark, work).items():
                budgets[key] = marker_hits(plan) | exchange_hits(plan)
                hits = {m: c for m, c in budgets[key].items() if c >= args.min}
                if hits:
                    flagged.append(
                        {"query": key, "plan_len": len(plan), "hits": hits}
                    )
        finally:
            shutil.rmtree(work, ignore_errors=True)
    if args.write_budgets:
        if not args.streams:
            # keep the committed stream budgets when this run didn't
            # regenerate them — a batch-only regen must not drop the
            # stream gate's baselines
            try:
                with open(args.write_budgets) as fh:
                    budgets |= {
                        k: v
                        for k, v in json.load(fh).items()
                        if k.startswith("stream:")
                    }
            except FileNotFoundError:
                pass
        with open(args.write_budgets, "w") as fh:
            json.dump(budgets, fh, indent=1, sort_keys=True)
            fh.write("\n")
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
