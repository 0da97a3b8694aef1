"""cap_per_group / budget_select (operators/selection.py) — brute-force
parity, partition invariance, edge cases — plus the direct DuckDB
differential for the retired docs_global_shuffle query shape."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from s3logs_parquet_spark.operators.selection import budget_select, cap_per_group


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _docs(spark, n=200, n_groups=7, parts=8):
    rows = [(i, f"g{i % n_groups}", (i * 37) % 100) for i in range(n)]
    return spark.createDataFrame(
        rows, "id bigint, grp string, w bigint"
    ).repartition(parts)


def _cap_model(rows, cap_by_group):
    """Python model: bottom-cap by (md5 hash, id) per group."""
    by_g: dict = {}
    for i, g, _w in rows:
        by_g.setdefault(g, []).append(i)
    keep, rank = {}, {}
    for g, ids in by_g.items():
        cap = cap_by_group(g)
        order = sorted(ids, key=lambda i: (_h32(str(i)), i))
        for pos, i in enumerate(order, start=1):
            if len(ids) <= cap:
                keep[i], rank[i] = True, None
            else:
                keep[i] = pos <= cap
                rank[i] = pos if pos <= cap else None
    return keep, rank


def test_cap_per_group_matches_python_model(spark):
    df = _docs(spark)
    out = {r["id"]: r for r in cap_per_group(df, "grp", 10, "id").collect()}
    keep, rank = _cap_model(
        [(r["id"], r["grp"], r["w"]) for r in df.collect()], lambda g: 10
    )
    assert len(out) == 200  # every input row preserved
    for i in range(200):
        assert out[i]["cap_keep"] == keep[i], i
        assert out[i]["cap_rk"] == rank[i], i


def test_cap_per_group_under_cap_passthrough(spark):
    # cap above every group size: all kept, no ranks computed
    df = _docs(spark, n=40, n_groups=4)
    out = cap_per_group(df, "grp", 1000, "id").collect()
    assert all(r["cap_keep"] for r in out)
    assert all(r["cap_rk"] is None for r in out)


def test_cap_per_group_column_cap_and_partition_invariance(spark):
    from s3logs_parquet_spark.functions.hashing import hash32

    cap = F.lit(3) + F.pmod(hash32(F.col("grp")), F.lit(5))

    def run(parts):
        df = _docs(spark, n=150, n_groups=5, parts=parts)
        return sorted(
            (r["id"], r["cap_keep"], r["cap_rk"])
            for r in cap_per_group(df, "grp", cap, "id").collect()
        )

    a, b, c = run(1), run(7), run(32)
    assert a == b == c
    keep, rank = _cap_model(
        [(i, f"g{i % 5}", 0) for i in range(150)],
        lambda g: 3 + _h32(g) % 5,
    )
    assert a == sorted((i, keep[i], rank[i]) for i in range(150))


def _budget_model(rows, budget):
    """rows: (id, score, w) — greedy prefix by (score desc, id)."""
    sel, cum = {}, 0
    for i, s, w in sorted(
        (r for r in rows if r[1] is not None), key=lambda r: (-r[1], r[0])
    ):
        cum += w
        sel[i] = cum <= budget
    for r in rows:
        sel.setdefault(r[0], False)
    return sel


@pytest.mark.parametrize("budget", [0, 1, 500, 2500, 10_000_000])
def test_budget_select_matches_python_model(spark, budget):
    rows = [
        (i, round(((i * 613) % 1000) / 1000.0, 6), (i * 13) % 50) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id bigint, score double, w bigint").repartition(8)
    out = {
        r["id"]: r["sel"]
        for r in budget_select(df, "score", "id", "w", budget, selected_col="sel").collect()
    }
    assert out == _budget_model(rows, budget)


def test_budget_select_ties_zero_weights_nulls(spark):
    rows = [
        (1, 0.5, 10),
        (2, 0.5, 10),  # tie with id 1: id order breaks it
        (3, 0.5, 0),  # zero weight inside prefix: selected for free
        (4, None, 5),  # null score: never selected
        (5, 0.9, 25),
    ]
    df = spark.createDataFrame(rows, "id bigint, score double, w bigint")
    out = {
        r["id"]: r["selected"]
        for r in budget_select(df, "score", "id", "w", 35).collect()
    }
    # order: 5 (25) -> 1 (35) -> 2 (45, over) -> 3 (free but after 2: cum 45)
    assert out == {5: True, 1: True, 2: False, 3: False, 4: False}
    # zero-weight row BEFORE the crossing point selects for free
    out2 = {
        r["id"]: r["selected"]
        for r in budget_select(
            df.withColumn("score", F.when(F.col("id") == 3, 0.95).otherwise(F.col("score"))),
            "score", "id", "w", 35,
        ).collect()
    }
    assert out2[3] is True and out2[5] is True and out2[1] is True


def test_budget_select_empty_and_all_fit(spark):
    df = spark.createDataFrame([], "id bigint, score double, w bigint")
    assert budget_select(df, "score", "id", "w", 100).count() == 0
    rows = [(i, 0.1 * i, 5) for i in range(5)]
    full = spark.createDataFrame(rows, "id bigint, score double, w bigint")
    out = budget_select(full, "score", "id", "w", 1_000).collect()
    assert all(r["selected"] for r in out)


def test_budget_select_partition_invariance(spark):
    rows = [(i, round((i % 11) / 10.0, 6), i % 7) for i in range(500)]

    def run(parts):
        df = spark.createDataFrame(
            rows, "id bigint, score double, w bigint"
        ).repartition(parts)
        return sorted(
            (r["id"], r["selected"])
            for r in budget_select(df, "score", "id", "w", 600).collect()
        )

    assert run(1) == run(8) == run(32) == sorted(_budget_model(rows, 600).items())


def test_global_shuffle_duckdb_differential(spark, sf_dir):
    """The retired docs_global_shuffle query shape: first 50 positions
    of the (hash32(doc_id), doc_id) total order, Spark vs DuckDB."""
    import duckdb
    from pyspark.sql import Window as W

    from s3logs_parquet_spark.functions.hashing import hash32, hash32_sql

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    top = (
        d.select(hash32(F.col("doc_id").cast("string")).alias("_h"), "doc_id")
        .orderBy("_h", "doc_id")
        .limit(50)
    )
    got = [
        (r["pos"], r["doc_id"])
        for r in top.select(
            F.row_number().over(W.orderBy("_h", "doc_id")).alias("pos"), "doc_id"
        ).collect()
    ]
    want = duckdb.sql(
        f"""
        WITH h AS (
          SELECT doc_id, {hash32_sql("doc_id::VARCHAR")} AS hh
          FROM '{sf_dir}/documents.parquet'
        )
        SELECT row_number() OVER (ORDER BY hh, doc_id)::INT AS pos, doc_id
        FROM h ORDER BY hh, doc_id LIMIT 50
        """
    ).fetchall()
    assert got == [(int(p), int(i)) for p, i in want]


def test_cap_per_group_plan_has_window_group_limit(spark):
    """The skew posture relies on Spark 4 rewriting the rn <= cap
    filter into map-side + final WindowGroupLimit prunes, so the
    over-cap mass is never fully window-sorted — pin it in the plan."""
    import contextlib
    import io

    df = spark.range(1000).selectExpr("id", "concat('g', id % 3) as grp")
    out = cap_per_group(df, "grp", 10, "id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("WindowGroupLimit") >= 2, plan  # partial + final
