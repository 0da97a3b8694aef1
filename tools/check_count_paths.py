"""Count-path sweep: run `.count()` AND `.collect()` on every registry
query and assert they agree — the execution-path differential that
caught the cogroup attribute-binding bug (semantic_dedup_incremental:
count() triggers column pruning, which crashed the Python worker,
while collect() — the only path check_oracles and the driver exercise
— worked; see operators/dedup.py `_semantic_probe_flags_blas`).

check_oracles.py validates VALUES on the collect path; this tool
validates that the PRUNED plan (what bench.py and any production
aggregation-over-the-result runs) executes and yields the same
cardinality. Cheap at sf0.001; the bug class it targets is
plan-shape-dependent, not data-dependent.

Usage: python tools/check_count_paths.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from s3logs_parquet_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check-count-paths")
    qs = entrymod.queries()
    failures: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            n_count = df.count()
            n_collect = len(df.collect())
        except Exception as ex:  # noqa: BLE001 — report and continue
            failures.append(name)
            print(f"ERR  {name}: {type(ex).__name__}: {str(ex)[:160]}", flush=True)
            continue
        status = "OK " if n_count == n_collect else "MISMATCH"
        if n_count != n_collect:
            failures.append(name)
        print(
            f"{status}  {name}: count={n_count} collect={n_collect} "
            f"({time.time() - t0:.1f}s)",
            flush=True,
        )
    if failures:
        print(f"FAILURES ({len(failures)}): {sorted(failures)}")
        sys.exit(1)
    print("ALL COUNT PATHS OK")


if __name__ == "__main__":
    main()
