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
granularity. All filesystem traffic goes through Hadoop
``FileSystem`` (fsutil), so the table may live on s3a://hdfs://
as well as locally; note the swap rename is atomic on HDFS/local but
copy+delete on object stores — on S3, schedule compaction against
quiescent partitions (the reference's quiescence predicate F3 exists
for the same reason).
"""

from __future__ import annotations

import posixpath
import uuid

from pyspark.sql import SparkSession

from s3logs_parquet_spark.fsutil import delete, list_files, rename


def _partition_dirs(spark: SparkSession, root: str) -> list[str]:
    """Leaf partition directories (those containing data files)."""
    dirs = {
        posixpath.dirname(f.path)
        for f in list_files(spark, root, recursive=True)
        if f.name.endswith(".parquet")
    }
    return sorted(dirs)


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
    for pdir in _partition_dirs(spark, table_path):
        files = [f for f in list_files(spark, pdir) if f.name.endswith(".parquet")]
        if len(files) < min_files_to_compact:
            continue
        total = sum(f.size for f in files)
        n_target = max(1, (total + target_file_bytes - 1) // target_file_bytes)
        if n_target >= len(files):
            continue
        df = spark.read.parquet(pdir)
        parent = posixpath.dirname(pdir)
        base = posixpath.basename(pdir)
        tmp = posixpath.join(parent, f".compact-{uuid.uuid4().hex[:8]}-{base}")
        df.coalesce(int(n_target)).write.mode("overwrite").parquet(tmp)
        # W4-style swap: move old out, rename new in, drop old
        old = pdir + ".old"
        rename(spark, pdir, old)
        rename(spark, tmp, pdir)
        delete(spark, old)
        after = len(
            [f for f in list_files(spark, pdir) if f.name.endswith(".parquet")]
        )
        results[pdir] = (len(files), after)
    return results
