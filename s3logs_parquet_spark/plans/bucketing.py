"""Bucketed tables: pre-shuffled storage for exchange-free joins and
aggregations — the write-once/join-many layout a 100 TB corpus lives in.

A join or groupBy on a key normally exchanges both sides every query.
Bucketing pays that shuffle ONCE at write time: `bucketBy(n, key)`
hash-distributes rows into n files per partition and records the
layout in the catalog, so Catalyst plans joins between co-bucketed
tables (same key, same n) and aggregations on the bucket key with NO
Exchange — at 100 TB this converts the dominant per-query cost of
dedup-survivor joins, LSH-index lookups, and id-keyed enrichments into
scan + sort-merge.

The reference has no counterpart (it writes Hive time-partitions only,
s3logs/src/transform.rs prefix layout); this is the Spark-native
storage lever on top. Guarded by plan tests
(tests/test_scale_ops.py::test_bucketed_*): exchange count 0 is
asserted, not assumed.

Notes for operators:
- both join sides must have the same bucket count (or a multiple, with
  `spark.sql.bucketing.coalesceBucketsInJoin.enabled`);
- `sortBy` the bucket key at write time so the sort-merge join's sort
  is satisfied by the file order (scan → SMJ directly);
- bucket pruning applies to equality filters on the bucket key —
  point lookups read 1/n of the files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    path: str | None = None,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    file_format: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed catalog table (external when ``path``
    is given). Sorting defaults to the bucket columns so downstream
    sort-merge joins skip their sort."""
    bucket_cols = list(bucket_cols)
    sort_cols = list(sort_cols) if sort_cols is not None else bucket_cols
    w = df.write.mode(mode).format(file_format).bucketBy(int(n_buckets), *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (a plain
    ``spark.read.parquet(path)`` would discard the layout and
    re-introduce exchanges — always read through the catalog)."""
    return spark.table(table)
