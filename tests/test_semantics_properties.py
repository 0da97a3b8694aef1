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


# --- ExactSubstr span family vs an independent Python model ----------------

# tiny vocabulary + short docs force heavy cross-document n-gram
# collisions, overlapping spans, and adjacent-island merges
_span_doc = st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12)


def _model_spans(token_lists: dict[int, list[str]], n: int, min_docs: int):
    """Independent model of duplicated_spans/remove_duplicated_spans:
    df over distinct (doc, n-gram), 1-based dup starts, islands merged
    while the start gap is <= n."""
    from collections import Counter

    df = Counter()
    grams = {}
    for d, ws in token_lists.items():
        gs = [tuple(ws[i : i + n]) for i in range(len(ws) - n + 1)]
        grams[d] = gs
        for g in set(gs):
            df[g] += 1
    out = {}
    for d, ws in token_lists.items():
        starts = [i + 1 for i, g in enumerate(grams[d]) if df[g] >= min_docs]
        islands = []
        for p in starts:
            if islands and p - islands[-1][1] <= n:
                islands[-1][1] = p
            else:
                islands.append([p, p])
        covered = set()
        for first, last in islands:
            covered.update(range(first, last + n))
        kept = [w for i, w in enumerate(ws, start=1) if i not in covered]
        out[d] = dict(
            n_tokens=len(ws),
            n_spans=len(islands),
            dup_tokens=len(covered),
            clean_text=" ".join(kept),
        )
    return out


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(_span_doc, min_size=1, max_size=5),
    n=st.integers(min_value=1, max_value=4),
)
def test_span_family_matches_python_model(spark, docs, n):
    from s3logs_parquet_spark.operators.dedup import (
        duplicated_spans,
        remove_duplicated_spans,
    )

    token_lists = {i: ws for i, ws in enumerate(docs)}
    frame = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in token_lists.items()],
        "doc_id long, text string",
    )
    want = _model_spans(token_lists, n, 2)
    got = {
        r["doc_id"]: r
        for r in duplicated_spans(frame, n=n, min_docs=2).collect()
    }
    assert set(got) == set(want)
    for d, w in want.items():
        assert got[d]["n_tokens"] == w["n_tokens"], (d, docs)
        assert got[d]["n_spans"] == w["n_spans"], (d, docs)
        assert got[d]["dup_tokens"] == w["dup_tokens"], (d, docs)
    cleaned = {
        r["doc_id"]: r
        for r in remove_duplicated_spans(frame, n=n, min_docs=2).collect()
    }
    for d, w in want.items():
        assert cleaned[d]["clean_text"] == w["clean_text"], (d, docs)
        assert cleaned[d]["removed_tokens"] == w["dup_tokens"], (d, docs)
