"""Snapshot the FULL `explain("formatted")` output of headline queries
into plans/<round>/<query>_<tag>.txt — the optimization round's
before/after plan evidence (judge-reviewable without running Spark).

Usage: python tools/opt_plan_snapshot.py <tag> [query ...]
  tag    — suffix for the files, e.g. "before" or "after"
  query  — optional subset; default is every bench.py HEADLINE query
Env: SPARK_GRAFT_PLANS_ROUND — output subdir (default "r14")
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from s3logs_parquet_spark.plans.queries import QUERIES  # noqa: E402
from s3logs_parquet_spark.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(1)
    tag = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}")
        raise SystemExit(1)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    round_dir = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", round_dir
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="opt-plan-snapshot")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        fn, _sql = QUERIES[name]
        plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') @ {sf_dir} [{tag}]\n\n")
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {path} ({n_ex} Exchange mentions)")


if __name__ == "__main__":
    main()
