"""As-of and binned range join: ground-truth semantics + plan shape."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from s3logs_parquet_spark.operators.temporal import asof_join, range_join_binned


def _ts(s):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(100)), (2, 1, _ts(200)), (3, 1, _ts(50)), (4, 2, _ts(100))],
        "lid long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, 1, _ts(90)), (11, 1, _ts(100)), (12, 1, _ts(150)), (13, 3, _ts(10))],
        "rid long, user_id long, ts timestamp",
    )
    out = asof_join(left, right, by=["user_id"], right_cols=["rid"])
    got = {r["lid"]: r["rid_r"] for r in out.collect()}
    # lid=1 at t=100: rid=11 (equal ts IS matched, backward-inclusive)
    # lid=2 at t=200: rid=12 (most recent <= 200)
    # lid=3 at t=50: no right row yet -> dropped (inner)
    # lid=4 user 2: no right rows -> dropped
    assert got == {1: 11, 2: 12}

    outer = asof_join(left, right, by=["user_id"], right_cols=["rid"], inner=False)
    got = {r["lid"]: r["rid_r"] for r in outer.collect()}
    assert got == {1: 11, 2: 12, 3: None, 4: None}


def test_asof_join_single_shuffle(spark):
    left = spark.createDataFrame([(1, 1, _ts(100))], "lid long, user_id long, ts timestamp")
    right = spark.createDataFrame([(10, 1, _ts(90))], "rid long, user_id long, ts timestamp")
    plan = (
        asof_join(left, right, by=["user_id"], right_cols=["rid"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # union + window: exactly one exchange, no join operator at all
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_range_join_matches_naive(spark):
    rows = [(i, i % 3, _ts(1000 + 37 * i)) for i in range(120)]
    e = spark.createDataFrame(rows, "eid long, user_id long, ts timestamp")
    binned = range_join_binned(e, e, by=["user_id"], window_seconds=200)
    naive = (
        e.alias("a")
        .join(
            e.alias("b"),
            on=[
                F.col("a.user_id") == F.col("b.user_id"),
                F.col("b.ts") > F.col("a.ts"),
                F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 200 SECOND"),
            ],
        )
        .select(F.col("a.eid").alias("eid"), F.col("b.eid").alias("eid_r"))
    )
    got = sorted((r["eid"], r["eid_r"]) for r in binned.select("eid", "eid_r").collect())
    want = sorted((r["eid"], r["eid_r"]) for r in naive.collect())
    assert got == want and len(want) > 0


def test_range_join_is_equi_join(spark):
    e = spark.createDataFrame([(1, 1, _ts(0))], "eid long, user_id long, ts timestamp")
    plan = (
        range_join_binned(e, e, by=["user_id"], window_seconds=60)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # candidate generation must be a hash-partitioned equi-join on
    # (key, bin) -- never a nested-loop/cartesian over the inequality
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


from hypothesis import given, settings
from hypothesis import strategies as st

_times = st.integers(min_value=0, max_value=5000)
_users = st.integers(min_value=0, max_value=2)


@settings(max_examples=12, deadline=None)
@given(
    lefts=st.lists(st.tuples(_users, _times), min_size=1, max_size=25, unique=True),
    rights=st.lists(st.tuples(_users, _times), min_size=1, max_size=25, unique=True),
)
def test_asof_matches_python_model(spark, lefts, rights):
    left = spark.createDataFrame(
        [(i, u, _ts(t)) for i, (u, t) in enumerate(lefts)],
        "lid long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(i, u, _ts(t)) for i, (u, t) in enumerate(rights)],
        "rid long, user_id long, ts timestamp",
    )
    out = asof_join(left, right, by=["user_id"], right_cols=["rid"], inner=False)
    got = {r["lid"]: r["rid_r"] for r in out.collect()}

    # python model: most recent right at-or-before, ties on ts broken
    # toward the later-sorted right row (max rid among equal ts, since
    # the window orders right rows by ts then stable input order is not
    # guaranteed -- generate unique (user, ts) pairs so ties can't occur)
    expect = {}
    for i, (u, t) in enumerate(lefts):
        best = None
        for j, (v, s) in enumerate(rights):
            if v == u and s <= t and (best is None or s > best[0]):
                best = (s, j)
        expect[i] = best[1] if best else None
    assert got == expect


def test_asof_null_keys_never_match(spark):
    left = spark.createDataFrame(
        [(1, None, _ts(100)), (2, 1, _ts(100))], "lid long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, None, _ts(50)), (11, 1, _ts(50))], "rid long, user_id long, ts timestamp"
    )
    outer = asof_join(left, right, by=["user_id"], right_cols=["rid"], inner=False)
    got = {r["lid"]: r["rid_r"] for r in outer.collect()}
    # null-key left row survives the LEFT join but matches nothing
    # (join-equality semantics: NULL never equals NULL)
    assert got == {1: None, 2: 11}
    inner = asof_join(left, right, by=["user_id"], right_cols=["rid"])
    assert {r["lid"] for r in inner.collect()} == {2}
