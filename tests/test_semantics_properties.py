"""Property-based semantics tests: window assignment and dedup vs an
independent Python model on arbitrary inputs (hypothesis)."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from s3logs_parquet_spark.config import EngineConfig
from s3logs_parquet_spark.operators.dedup import dedup_log_rows
from s3logs_parquet_spark.operators.windows import group_counts, with_agg_window

epochs = st.integers(min_value=0, max_value=2_000_000_000)
aligns = st.sampled_from([60, 300, 900, 3600, 86400])


@settings(max_examples=15, deadline=None)
@given(ts=st.lists(epochs, min_size=1, max_size=60), align=aligns)
def test_window_counts_match_python_model(spark, ts, align):
    df = spark.createDataFrame([(t,) for t in ts], ["e"]).select(
        F.timestamp_seconds("e").alias("ts")
    )
    got = {
        r["agg_window"]: r["n_rows"]
        for r in group_counts(with_agg_window(df, align_seconds=align), "agg_window").collect()
    }
    expected = Counter(t - t % align for t in ts)
    assert got == dict(expected)


keys = st.tuples(
    st.sampled_from(["a", "b"]),           # bucket
    st.integers(min_value=0, max_value=3), # window index
    st.sampled_from(["R1", "R2", "R3"]),   # request id
)


@settings(max_examples=15, deadline=None)
@given(rows=st.lists(keys, min_size=1, max_size=50))
def test_dedup_count_equals_distinct_keys(spark, rows):
    df = spark.createDataFrame(
        [(b, w * 900, r, i) for i, (b, w, r) in enumerate(rows)],
        ["bucket_key", "agg_window", "RequestID", "payload"],
    )
    out = dedup_log_rows(df, EngineConfig())
    distinct_keys = {(b, w * 900, r) for b, w, r in rows}
    assert out.count() == len(distinct_keys)
    # survivors' keys are exactly the distinct key set
    got = {(r["bucket_key"], r["agg_window"], r["RequestID"]) for r in out.collect()}
    assert got == distinct_keys
