"""Small-file compaction: the maintenance job that keeps the table's
file sizes near the rotation target (the batch/streaming sinks bound
file MAXIMUM size via maxRecordsPerFile; many small appends — late
data, frequent micro-batches — still accumulate small files, the same
problem the reference's rotation thresholds manage for its writers,
T3/SURVEY §7.4.7).

Strategy: per Hive partition, if it holds more than one file or files
below the threshold, rewrite it with files sized to
``target_file_bytes``. Rewrites happen into a temp subtree and are
swapped in per-partition (directory rename) so readers never see a
partial partition — the same atomic-rename commit idea as the
reference's `.incomplete` protocol (W4), applied at partition
granularity.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def _partition_dirs(root: str) -> list[str]:
    """Leaf partition directories (those containing data files)."""
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if any(f.endswith(".parquet") for f in filenames):
            out.append(dirpath)
    return sorted(out)


def compact_partitions(
    spark: SparkSession,
    table_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> dict[str, tuple[int, int]]:
    """Compact each leaf partition of a parquet table in place.

    Returns {partition_dir: (files_before, files_after)} for the
    partitions rewritten. Driver-side work is directory listing and
    renames only; each rewrite is a distributed read→coalesce→write of
    one partition (runs are independent — on a cluster, submit many at
    once; here sequential keeps it simple and test-friendly).
    """
    results: dict[str, tuple[int, int]] = {}
    for pdir in _partition_dirs(table_path):
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        if len(files) < min_files_to_compact:
            continue
        total = sum(os.path.getsize(os.path.join(pdir, f)) for f in files)
        n_target = max(1, (total + target_file_bytes - 1) // target_file_bytes)
        if n_target >= len(files):
            continue
        df = spark.read.parquet(pdir)
        tmp = os.path.join(
            os.path.dirname(pdir), f".compact-{uuid.uuid4().hex[:8]}-{os.path.basename(pdir)}"
        )
        df.coalesce(int(n_target)).write.mode("overwrite").parquet(tmp)
        # W4-style swap: move old out, rename new in, drop old
        old = pdir + ".old"
        os.rename(pdir, old)
        os.rename(tmp, pdir)
        shutil.rmtree(old)
        after = len([f for f in os.listdir(pdir) if f.endswith(".parquet")])
        results[pdir] = (len(files), after)
    return results
