"""TIMESTAMP_NTZ robustness matrix (VERDICT r4 #2).

Tz-less parquet — what the reference's writer emits and what the
driver's canonical testdata contains — reads as ``timestamp_ntz``
under PySpark 4.x, and several functions (``unix_micros``) reject NTZ
outright. Round 4 lost its bench to exactly that: ``test_temporal.py``
builds LTZ timestamps in-process, so the suite never saw the dtype the
real data produces. This module closes the gap: every time-consuming
operator family (temporal joins, windows, rollup, sketches) runs here
against a parquet-backed NTZ column, plus a differential proving NTZ
and LTZ inputs yield identical results under the pinned-UTC session.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from s3logs_parquet_spark.functions.timeops import epoch_micros
from s3logs_parquet_spark.operators.sketches import kmv_distinct_global
from s3logs_parquet_spark.operators.temporal import (
    asof_join,
    asof_join_chunked,
    range_join_binned,
)
from s3logs_parquet_spark.operators.windows import with_agg_window
from s3logs_parquet_spark.plans.rollup import rollup_events


def _ts(s: int) -> datetime:
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


@pytest.fixture(scope="module")
def ntz_events(spark, tmp_path_factory):
    """A small events table written as tz-less parquet (timestamp[us],
    no tz annotation) — byte-identical in kind to the driver testdata —
    then read back through Spark so the column is genuinely NTZ."""
    rows = [(i, i % 5, _ts(1_715_500_000 + 37 * i), float(i % 11)) for i in range(400)]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    path = str(tmp_path_factory.mktemp("ntz") / "events.parquet")
    pq.write_table(tbl, path)
    df = spark.read.parquet(path)
    assert dict(df.dtypes)["ts"] == "timestamp_ntz", dict(df.dtypes)
    return df


def test_canonical_testdata_is_ntz(spark, sf_dir):
    """Document the environment reality that broke round 4: the driver
    testdata's time column IS timestamp_ntz. If this ever flips back to
    LTZ the matrix here still covers both via the synthetic fixture."""
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    assert dict(events.dtypes)["ts"] == "timestamp_ntz", dict(events.dtypes)


def test_epoch_micros_ntz_equals_ltz(spark, ntz_events):
    """Under the pinned-UTC session, NTZ→LTZ cast is value-preserving:
    identical epoch micros from both dtypes."""
    ltz = ntz_events.withColumn("ts", F.col("ts").cast("timestamp"))
    assert dict(ltz.dtypes)["ts"] == "timestamp"
    a = [r[0] for r in ntz_events.select(epoch_micros(ntz_events, "ts")).collect()]
    b = [r[0] for r in ltz.select(epoch_micros(ltz, "ts")).collect()]
    assert a == b and len(a) == 400


def test_epoch_micros_rejects_non_timestamp(spark):
    df = spark.range(3).withColumn("t", F.col("id") * 1000)
    with pytest.raises(TypeError, match="expected a timestamp"):
        epoch_micros(df, "t")


def test_asof_chunked_on_ntz_parquet(ntz_events):
    """The exact r04 red row's shape: chunked as-of over parquet-backed
    NTZ time, differentially checked against the base (window) as-of."""
    left = ntz_events.filter(F.col("event_id") % 2 == 0)
    right = ntz_events.filter(F.col("event_id") % 2 == 1).select(
        F.col("event_id").alias("rid"), "user_id", "ts"
    )
    base = asof_join(left, right, by=["user_id"], right_cols=["rid"])
    chunked = asof_join_chunked(
        left, right, by=["user_id"], chunk_seconds=3600, right_cols=["rid"]
    )
    cols = ["event_id", "user_id", "rid_r"]
    bset = {tuple(r) for r in base.select(*cols).collect()}
    cset = {tuple(r) for r in chunked.select(*cols).collect()}
    assert cset == bset and len(bset) > 0


def test_range_join_on_ntz_parquet(ntz_events):
    """The latent second instance (events_range_pairs): binned range
    join over NTZ, differentially checked against the naive inequality
    join (which is NTZ-tolerant)."""
    e = ntz_events.select("event_id", "user_id", "ts")
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
        .select(F.col("a.event_id").alias("eid"), F.col("b.event_id").alias("eid_r"))
    )
    got = sorted(
        (r["event_id"], r["event_id_r"])
        for r in binned.select("event_id", "event_id_r").collect()
    )
    want = sorted((r["eid"], r["eid_r"]) for r in naive.collect())
    assert got == want and len(want) > 0


def test_window_alignment_on_ntz_parquet(ntz_events):
    """G1 window assignment (unix_timestamp path) on NTZ: every window
    start is aligned and covers its rows."""
    out = with_agg_window(ntz_events, align_seconds=900)
    rows = out.select("agg_window", epoch_micros(out, "ts").alias("us")).collect()
    assert rows
    for r in rows:
        assert r["agg_window"] % 900 == 0
        assert r["agg_window"] <= r["us"] // 1_000_000 < r["agg_window"] + 900


def test_rollup_on_ntz_parquet(ntz_events):
    """Rollup family on NTZ: mergeable aggregates reconcile with the
    table totals."""
    roll = rollup_events(
        ntz_events.withColumn("event_type", (F.col("user_id") % 2).cast("string")),
        window_seconds=3600,
    )
    tot = roll.agg(F.sum("n_rows").alias("n"), F.sum("sum_value").alias("s")).first()
    assert tot["n"] == 400
    direct = ntz_events.agg(F.sum("value").alias("s")).first()["s"]
    assert abs(tot["s"] - direct) < 1e-9


def test_kmv_on_ntz_parquet(ntz_events):
    """Sketch family on NTZ: KMV over the raw timestamp column (hashes
    its string form — dtype must not matter)."""
    est = kmv_distinct_global(ntz_events, "ts", k=64).first()
    n_exact = ntz_events.select("ts").distinct().count()
    assert est["n_seen"] == min(64, n_exact)
    assert est["est_distinct"] > 0
