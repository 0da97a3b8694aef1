"""End-to-end batch transform: raw lines → partitioned parquet → invariants.

Mirrors SURVEY.md §5's implication: row counts, dedup idempotence,
partition completeness, schema — the levels the reference never tested.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from s3logs_parquet_spark.config import EngineConfig
from s3logs_parquet_spark.plans.batch import run_batch_transform
from s3logs_parquet_spark.schema import LOG_FIELDS
from s3logs_parquet_spark.testing import generate_lines


def _write_lines(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_batch_transform_end_to_end(spark, tmp_path):
    lines = generate_lines(
        2000, seed=3, dup_fraction=0.10, garbage_fraction=0.02, span_seconds=7200
    )
    inp = _write_lines(tmp_path, "logs.txt", lines)
    out = str(tmp_path / "out")
    res = run_batch_transform(spark, inp, out, EngineConfig())

    assert res.rows_in == len(lines)
    n_garbage = sum(1 for l in lines if l.startswith("!!"))
    n_unique = len(set(l for l in lines if not l.startswith("!!")))
    # dedup removes verbatim-duplicate redelivered lines (same window+id)
    assert res.rows_out == n_unique
    assert res.rows_in - n_garbage >= res.rows_out

    table = spark.read.parquet(out)
    # schema: 26 string cols + 4 partition cols
    assert set(LOG_FIELDS).issubset(set(table.columns))
    assert {"year", "month", "day", "hour"}.issubset(set(table.columns))
    # partition completeness: hive dirs exist for both hours of the span
    # (Spark's partition type inference reads hour=08 back as int 8; the
    # on-disk layout below is the parity-relevant artifact)
    hours = sorted(int(r["hour"]) for r in table.select("hour").distinct().collect())
    assert hours == [8, 9]
    part_dirs = os.listdir(os.path.join(out, "year=2024", "month=05", "day=12"))
    assert sorted(part_dirs) == ["hour=08", "hour=09"]

    # idempotence: re-running transform over the SAME input into a fresh
    # dir yields identical content
    out2 = str(tmp_path / "out2")
    run_batch_transform(spark, inp, out2, EngineConfig())
    t2 = spark.read.parquet(out2)
    assert t2.count() == table.count()
    assert (
        table.exceptAll(t2.select(table.columns)).count() == 0
        and t2.select(table.columns).exceptAll(table).count() == 0
    )


def test_batch_transform_schema_widening(spark, tmp_path):
    lines = generate_lines(
        300, seed=4, dup_fraction=0.0, garbage_fraction=0.0, extra_fraction=0.1
    )
    inp = _write_lines(tmp_path, "logs.txt", lines)
    out = str(tmp_path / "out")
    res = run_batch_transform(spark, inp, out, EngineConfig())
    assert res.extra_fields >= 1
    table = spark.read.parquet(out)
    assert f"ExtraField{26 + res.extra_fields}" in table.columns
    # rows without extras have NULLs there
    assert table.filter(F.col("ExtraField27").isNull()).count() > 0


def test_batch_transform_empty_input(spark, tmp_path):
    # the reference panics on zero parseable lines (utils.rs:610);
    # we must emit an empty result without crashing
    inp = _write_lines(tmp_path, "logs.txt", ["!!corrupt!!", "also corrupt"])
    out = str(tmp_path / "out")
    res = run_batch_transform(spark, inp, out, EngineConfig())
    assert res.rows_out == 0


def test_batch_transform_per_bucket_mode(spark, tmp_path):
    cfg = EngineConfig(merge_orig_buckets=False, deduplication=True)
    lines = generate_lines(500, seed=5, dup_fraction=0.05, garbage_fraction=0.0)
    inp = _write_lines(tmp_path, "logs.txt", lines)
    out = str(tmp_path / "out")
    run_batch_transform(spark, inp, out, cfg)
    table = spark.read.parquet(out)
    assert {r["Bucket"] for r in table.select("Bucket").distinct().collect()} == {
        "bucket-a",
        "bucket-b",
        "bucket-c",
    }


def test_corrupt_side_channel_and_archive(spark, tmp_path):
    lines = generate_lines(300, seed=9, dup_fraction=0.0, garbage_fraction=0.05)
    inp = _write_lines(tmp_path, "logs.txt", lines)
    out = str(tmp_path / "out")
    corrupt = str(tmp_path / "corrupt")
    archive = str(tmp_path / "archive")
    res = run_batch_transform(
        spark, inp, out, EngineConfig(), corrupt_path=corrupt, archive_path=archive
    )
    n_garbage = sum(1 for l in lines if l.startswith("!!"))
    # F1 side channel captures exactly the dropped lines
    assert spark.read.text(corrupt).count() == n_garbage
    # W7 archive holds every input line, gzip-compressed
    assert spark.read.text(archive).count() == len(lines)
    import glob

    assert glob.glob(f"{archive}/*.gz"), "archive files should be gzip"
    assert res.rows_out == len(lines) - n_garbage


def test_overwrite_partitions_idempotent(spark, tmp_path):
    """overwrite_partitions mode: re-running the same input replaces
    the affected partitions instead of duplicating rows (append mode's
    at-least-once behavior), and leaves other partitions alone."""
    from s3logs_parquet_spark.plans.batch import parse_and_dedup
    from s3logs_parquet_spark.writer import with_partition_columns, write_partitioned_parquet

    cfg = EngineConfig()
    out = str(tmp_path / "t")

    def run(lines):
        inp = _write_lines(tmp_path, "in.log", lines)
        ldf = spark.read.text(inp)
        res = with_partition_columns(parse_and_dedup(ldf, cfg), cfg).drop(
            "n_fields", "ts", "agg_window", "bucket_key"
        )
        write_partitioned_parquet(res, out, cfg, mode="overwrite_partitions")

    hour0 = generate_lines(200, seed=41, dup_fraction=0.0, garbage_fraction=0.0, span_seconds=3000)
    run(hour0)
    assert spark.read.parquet(out).count() == 200
    run(hour0)  # identical re-run: no duplication
    assert spark.read.parquet(out).count() == 200

    # a later-hour batch must not clobber the hour=08 partition
    hour2 = generate_lines(
        100, seed=42, dup_fraction=0.0, garbage_fraction=0.0,
        base_ts=1715500800 + 2 * 3600, span_seconds=1800,
    )
    run(hour2)
    table = spark.read.parquet(out)
    assert table.count() == 300
    assert table.filter(F.col("hour") == 8).count() == 200


def test_gzip_compressed_input(spark, tmp_path):
    """S3 access logs are commonly delivered gzip-compressed; the text
    source must read .gz transparently (Hadoop codec discovery)."""
    import gzip

    lines = generate_lines(150, seed=55, dup_fraction=0.0, garbage_fraction=0.0)
    gz = tmp_path / "logs.gz"
    with gzip.open(gz, "wt") as f:
        f.write("\n".join(lines) + "\n")
    out = str(tmp_path / "out")
    res = run_batch_transform(spark, str(gz), out, EngineConfig())
    assert res.rows_out == 150


def test_metrics_count_this_batch_not_the_table(spark, tmp_path):
    # append-mode re-run: rows_out must report THIS batch's rows, not
    # the cumulative table (the old read-back double-counted), and
    # rows_parsed must use the pipeline's own ts-not-null predicate.
    lines = generate_lines(300, seed=11, dup_fraction=0.0, garbage_fraction=0.1)
    inp = _write_lines(tmp_path, "logs.txt", lines)
    out = str(tmp_path / "out")
    r1 = run_batch_transform(spark, inp, out, EngineConfig())
    r2 = run_batch_transform(spark, inp, out, EngineConfig())
    assert r2.rows_out == r1.rows_out  # not 2x
    assert r1.rows_in == 300
    assert r1.rows_parsed == r1.rows_out  # no dups in this input
    assert spark.read.parquet(out).count() == 2 * r1.rows_out


def test_dedup_early_matches_late(spark):
    # dedup_early moves the D1 exchange before the full parse; output
    # multiset must be identical to the default shape in both bucket
    # modes (verbatim-duplicate redelivery, the reference's D1 case).
    from s3logs_parquet_spark.plans.batch import parse_and_dedup

    lines = generate_lines(3000, seed=21, dup_fraction=0.15, garbage_fraction=0.03)
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    for merge in (True, False):
        cfg = EngineConfig(merge_orig_buckets=merge)
        late = parse_and_dedup(df, cfg)
        early = parse_and_dedup(df, cfg, dedup_early=True)

        def _sig(d):
            cols = sorted(d.columns)
            h = d.select(
                F.xxhash64(*[F.col(c).cast("string") for c in cols])
                .cast("decimal(38,0)")
                .alias("h")
            )
            return tuple(
                h.agg(
                    F.count("*"), F.sum("h"), F.sum(F.abs("h")), F.countDistinct("h")
                ).collect()[0]
            )

        assert _sig(late) == _sig(early)


def test_widening_append_preserves_existing_rows(spark, tmp_path):
    # Batch 1 populates the table; batch 2 carries >26-field lines.
    # The optimistic single-pass path is only legal on an empty table
    # (its widen-rerun uses dynamic partition overwrite); on a
    # populated one the probe pass must be used so batch 1's rows
    # survive even when both batches share event-hour partitions.
    lines1 = generate_lines(200, seed=5, dup_fraction=0.0, garbage_fraction=0.0)
    lines2 = generate_lines(
        200, seed=6, dup_fraction=0.0, garbage_fraction=0.0, extra_fraction=0.2
    )
    out = str(tmp_path / "out")
    r1 = run_batch_transform(spark, _write_lines(tmp_path, "b1.txt", lines1), out, EngineConfig())
    r2 = run_batch_transform(spark, _write_lines(tmp_path, "b2.txt", lines2), out, EngineConfig())
    assert r1.extra_fields == 0 and r2.extra_fields >= 1
    table = spark.read.parquet(out)
    assert table.count() == r1.rows_out + r2.rows_out


def test_widening_rerun_does_not_duplicate(spark, tmp_path):
    # Fresh-table wide batch: pass 1 writes truncated, the widen-rerun
    # replaces it under dynamic overwrite — net row count must be the
    # batch's own, not 2x.
    lines = generate_lines(
        250, seed=7, dup_fraction=0.0, garbage_fraction=0.0, extra_fraction=0.15
    )
    out = str(tmp_path / "out")
    res = run_batch_transform(spark, _write_lines(tmp_path, "b.txt", lines), out, EngineConfig())
    assert res.extra_fields >= 1
    assert spark.read.parquet(out).count() == res.rows_out == 250
