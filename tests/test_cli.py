"""CLI parity tests: aggregate → transform two-stage path and the fused
single-job path produce identical tables."""

from __future__ import annotations

import os

from s3logs_parquet_spark.cli import main as cli_main
from s3logs_parquet_spark.testing import generate_lines


def test_cli_two_stage_equals_fused(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")
    lines = generate_lines(800, seed=21, dup_fraction=0.1, garbage_fraction=0.02)
    inp = tmp_path / "in.log"
    inp.write_text("\n".join(lines) + "\n")

    staging = str(tmp_path / "staging")
    out_2stage = str(tmp_path / "out2")
    out_fused = str(tmp_path / "out1")

    assert cli_main(["aggregate", str(inp), "-o", staging]) == 0
    # staging tier layout: bucket_key=ALLBUCKETS / stag_window=... dirs
    assert any(d.startswith("bucket_key=") for d in os.listdir(staging))
    assert cli_main(["transform", "--staged", staging, "-o", out_2stage]) == 0
    assert cli_main(["transform", str(inp), "-o", out_fused]) == 0

    t1 = spark.read.parquet(out_fused)
    t2 = spark.read.parquet(out_2stage)
    assert t1.count() == t2.count()
    cols = sorted(set(t1.columns) & set(t2.columns))
    assert t1.select(cols).exceptAll(t2.select(cols)).count() == 0


def test_cli_stream(spark, tmp_path):
    ind = tmp_path / "in"
    ind.mkdir()
    (ind / "f.log").write_text("\n".join(generate_lines(50, seed=22, garbage_fraction=0.0, dup_fraction=0.0)) + "\n")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    assert cli_main(["stream", str(ind), "-o", out, "-k", ckpt]) == 0
    assert spark.read.parquet(out).count() == 50
