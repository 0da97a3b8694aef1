"""Z-order layout (operators/layout.py): bit-exact key construction,
quantization edges, and the MEASURED pruning claim — a z-ordered
layout lets parquet min/max statistics skip files on a dimension a
linear sort cannot prune at all.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3logs_parquet_spark.operators.layout import (
    quantize,
    rowgroup_prune_fraction,
    write_zordered,
    zorder_key,
)


def _interleave_py(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_python_model(spark):
    rows = [(i, (i * 7) % 64, (i * 13) % 64) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    out = df.select(
        "id", "x", "y", zorder_key([F.col("x"), F.col("y")], bits=6).alias("z")
    ).collect()
    for r in out:
        assert r["z"] == _interleave_py(r["x"], r["y"], 6), (r["x"], r["y"])


def test_zorder_key_locality(spark):
    """Adjacent (x, y) cells must map to nearby z values on average —
    the curve property the layout depends on. Weak sanity: the max z
    is (2^(2·bits))-1 and distinct inputs give distinct keys."""
    df = spark.range(0, 1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    zs = [r["z"] for r in df.select(zorder_key([F.col("x"), F.col("y")], 5).alias("z")).collect()]
    assert len(set(zs)) == 1024
    assert max(zs) == 1023 and min(zs) == 0


def test_zorder_key_validates_width():
    with pytest.raises(ValueError, match="exceeds a long"):
        zorder_key([F.lit(0), F.lit(0), F.lit(0), F.lit(0)], bits=16)


def test_quantize_clamps_edges(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (49.9,), (100.0,), (250.0,)], "v double"
    )
    got = [r["q"] for r in df.select(quantize(F.col("v"), 0.0, 100.0, 4).alias("q")).collect()]
    assert got == [0, 0, 7, 15, 15]


def test_zorder_layout_prunes_where_linear_sort_cannot(spark, tmp_path):
    """The measured claim: 200k rows over a 1024×1024 (x, y) grid in 16
    files. A y-band predicate prunes (almost) nothing under an x-sorted
    layout — every x-range file spans all of y — but skips most files
    under z-order, where each file covers a compact rectangle. Checked
    against real parquet footer min/max stats (pyarrow), the same
    decision a reader's row-group skipping makes."""
    n = 200_000
    df = spark.range(0, n).select(
        F.col("id"),
        F.pmod(F.col("id") * 7919, F.lit(1024)).alias("x"),
        F.pmod(F.col("id") * 104729, F.lit(1024)).alias("y"),
    )

    linear = str(tmp_path / "linear")
    df.repartitionByRange(16, F.col("x")).sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(linear)

    zpath = str(tmp_path / "zordered")
    write_zordered(df, zpath, [F.col("x"), F.col("y")], bits=10, n_files=16)

    pred = {"y": (0.0, 99.0)}  # ~10% band of y
    skip_lin, tot_lin = rowgroup_prune_fraction(linear, pred)
    skip_z, tot_z = rowgroup_prune_fraction(zpath, pred)
    assert tot_lin > 0 and tot_z > 0
    assert skip_lin / tot_lin <= 0.2, (skip_lin, tot_lin)
    assert skip_z / tot_z >= 0.5, (skip_z, tot_z)

    # and the layouts hold identical data
    a = spark.read.parquet(linear).groupBy().agg(F.sum("x"), F.sum("y"), F.count("*")).collect()
    b = spark.read.parquet(zpath).groupBy().agg(F.sum("x"), F.sum("y"), F.count("*")).collect()
    assert a == b


def _xy2d(n: int, x: int, y: int) -> int:
    """Pure-Python Hilbert xy2d reference (the classic per-level
    rotate-and-accumulate walk)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_python_model(spark):
    """Exhaustive 16x16 grid plus random 16-bit points agree with the
    reference walk — the JVM-side struct-fold is exact."""
    import random

    from s3logs_parquet_spark.operators.layout import hilbert_key

    rows = [(x, y) for x in range(16) for y in range(16)]
    rng = random.Random(7)
    big = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(200)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["h"]
        for r in df.select(
            "x", "y", hilbert_key(F.col("x"), F.col("y"), 4).alias("h")
        ).collect()
    }
    assert got == {(x, y): _xy2d(16, x, y) for x, y in rows}
    df2 = spark.createDataFrame(big, ["x", "y"])
    got2 = {
        (r["x"], r["y"]): r["h"]
        for r in df2.select(
            "x", "y", hilbert_key(F.col("x"), F.col("y"), 16).alias("h")
        ).collect()
    }
    assert all(got2[(x, y)] == _xy2d(1 << 16, x, y) for x, y in big)


def test_hilbert_key_unit_step_locality(spark):
    """Every consecutive pair along the curve is Manhattan-adjacent and
    the curve visits every cell exactly once — the property that makes
    Hilbert clustering strictly tighter than the Z curve's seam jumps."""
    from s3logs_parquet_spark.operators.layout import hilbert_key

    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        r["h"]: (r["x"], r["y"])
        for r in df.select(
            "x", "y", hilbert_key(F.col("x"), F.col("y"), 5).alias("h")
        ).collect()
    }
    assert sorted(got) == list(range(32 * 32))
    cells = [got[d] for d in range(32 * 32)]
    assert all(
        abs(a[0] - b[0]) + abs(a[1] - b[1]) == 1
        for a, b in zip(cells, cells[1:])
    )


def test_hilbert_key_validates_width():
    import pytest

    from s3logs_parquet_spark.operators.layout import hilbert_key

    with pytest.raises(ValueError, match="bits"):
        hilbert_key(F.lit(0), F.lit(0), bits=31)


def test_hilbert_layout_prunes_like_zorder(spark, tmp_path):
    """write_hilbert_clustered prunes a 2-D box at least as well as
    z-order on the same data (unit-step locality => every file covers
    a rectangle at least as tight), and holds identical data."""
    from s3logs_parquet_spark.operators.layout import (
        rowgroup_prune_fraction,
        write_hilbert_clustered,
        write_zordered,
    )

    n = 200_000
    df = spark.range(0, n).select(
        F.col("id"),
        F.pmod(F.col("id") * 7919, F.lit(1024)).alias("x"),
        F.pmod(F.col("id") * 104729, F.lit(1024)).alias("y"),
    )
    zpath = str(tmp_path / "z")
    hpath = str(tmp_path / "h")
    write_zordered(df, zpath, [F.col("x"), F.col("y")], bits=10, n_files=16)
    write_hilbert_clustered(df, hpath, F.col("x"), F.col("y"), bits=10, n_files=16)

    pred = {"x": (0.0, 127.0), "y": (0.0, 127.0)}  # 1/64 box
    skip_z, tot_z = rowgroup_prune_fraction(zpath, pred)
    skip_h, tot_h = rowgroup_prune_fraction(hpath, pred)
    assert tot_z > 0 and tot_h > 0
    assert skip_h / tot_h >= skip_z / tot_z - 1e-9, (skip_h, tot_h, skip_z, tot_z)
    assert skip_h / tot_h >= 0.5

    a = spark.read.parquet(zpath).groupBy().agg(F.sum("x"), F.sum("y"), F.count("*")).collect()
    b = spark.read.parquet(hpath).groupBy().agg(F.sum("x"), F.sum("y"), F.count("*")).collect()
    assert a == b
