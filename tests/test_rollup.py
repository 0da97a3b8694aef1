"""Incremental materialized rollup: merge correctness, partition
scoping, idempotence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from s3logs_parquet_spark.plans.rollup import (
    materialize_rollup,
    rollup_events,
    update_rollup,
)


def _events(spark, rows):
    # rows: (event_id, epoch, type, value)
    return spark.createDataFrame(
        rows, "event_id long, e long, event_type string, value double"
    ).select("event_id", F.timestamp_seconds("e").alias("ts"), "event_type", "value")


DAY = 86400


def test_incremental_update_equals_full_rebuild(spark, tmp_path):
    b1 = [(i, 1000 + 400 * i, "click" if i % 2 else "view", float(i)) for i in range(50)]
    b2 = [(100 + i, DAY + 300 * i, "click", 1.5 * i) for i in range(40)]
    # batch 2 also lands rows in batch 1's day (late data)
    b2 += [(200 + i, 2000 + 70 * i, "view", 2.0) for i in range(10)]

    out = str(tmp_path / "rollup")
    materialize_rollup(_events(spark, b1), out)
    affected = update_rollup(spark, _events(spark, b2), out)
    assert affected == ["19700101", "19700102"]

    full = rollup_events(_events(spark, b1 + b2)).drop("dt")
    got = spark.read.parquet(out).drop("dt")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, full.collect()))


def test_update_touches_only_affected_partitions(spark, tmp_path):
    b1 = [(i, 1000 + i, "view", 1.0) for i in range(20)]  # day 1
    b1 += [(50 + i, DAY + 1000 + i, "view", 1.0) for i in range(20)]  # day 2
    out = str(tmp_path / "rollup")
    materialize_rollup(_events(spark, b1), out)

    day1 = os.path.join(out, "dt=19700101")
    before = {f: os.path.getmtime(os.path.join(day1, f)) for f in os.listdir(day1)}

    # batch entirely in day 2
    update_rollup(spark, _events(spark, [(99, DAY + 5000, "view", 3.0)]), out)
    after = {f: os.path.getmtime(os.path.join(day1, f)) for f in os.listdir(day1)}
    assert before == after  # day 1 files untouched (dynamic overwrite scope)


def test_first_update_without_materialize(spark, tmp_path):
    out = str(tmp_path / "rollup")
    affected = update_rollup(spark, _events(spark, [(1, 100, "view", 2.0)]), out)
    assert affected == ["19700101"]
    row = spark.read.parquet(out).collect()[0]
    assert row["n_rows"] == 1 and row["sum_value"] == 2.0
