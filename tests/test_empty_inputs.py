"""Empty-input robustness: every operator family must return an empty
(or correctly degenerate) result on empty inputs, not crash. At 100 TB
empty slices are routine — an empty partition day, a filter that
matches nothing, a cold-start index batch — and driver-side model
derivation (sampling totals, probe-cell selection) is where hidden
assumptions about non-emptiness live."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from s3logs_parquet_spark.operators.dedup import (
    connected_components_clusters,
    exact_dedup,
    minhash_lsh_pairs,
)
from s3logs_parquet_spark.operators.sampling import (
    mixture_sample,
    weighted_systematic_sample,
)
from s3logs_parquet_spark.operators.sketches import (
    bottomk_sample,
    kmv_distinct_global,
    sampled_quantiles,
)
from s3logs_parquet_spark.operators.temporal import (
    asof_join,
    asof_join_chunked,
    interval_join,
    range_join_binned,
)


def _ts(s):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, u, _ts(t)) for i, (u, t) in enumerate(rows)],
        "eid long, user_id long, ts timestamp",
    )


def test_asof_empty_right_and_left(spark):
    left = _events(spark, [(1, 100), (1, 200)])
    empty = _events(spark, [])
    assert asof_join(left, empty, by=["user_id"], right_cols=["eid"]).count() == 0
    outer = asof_join(left, empty, by=["user_id"], right_cols=["eid"], inner=False)
    assert outer.count() == 2  # left preserved with NULL payload
    assert asof_join(empty, left, by=["user_id"], right_cols=["eid"]).count() == 0
    assert asof_join(empty, empty, by=["user_id"], right_cols=["eid"]).count() == 0


def test_asof_chunked_empty_sides(spark):
    left = _events(spark, [(1, 100)])
    empty = _events(spark, [])
    assert (
        asof_join_chunked(left, empty, by=["user_id"], right_cols=["eid"]).count() == 0
    )
    assert (
        asof_join_chunked(empty, left, by=["user_id"], right_cols=["eid"]).count() == 0
    )


def test_range_and_interval_join_empty(spark):
    e = _events(spark, [(1, 100)])
    empty = _events(spark, [])
    assert range_join_binned(e, empty, by=["user_id"], window_seconds=60).count() == 0
    assert range_join_binned(empty, e, by=["user_id"], window_seconds=60).count() == 0
    iv = spark.createDataFrame([], "iid long, user_id long, s timestamp, e timestamp")
    full = spark.createDataFrame(
        [(1, 0, _ts(0), _ts(10))], "iid long, user_id long, s timestamp, e timestamp"
    )
    for l, r in ((iv, full), (full, iv), (iv, iv)):
        out = interval_join(
            l, r, by=["user_id"], left_start="s", left_end="e",
            right_start="s", right_end="e", max_span_seconds=60,
        )
        assert out.count() == 0


def test_sampling_empty_corpus(spark):
    empty = spark.createDataFrame([], "id long, w long, source string")
    assert weighted_systematic_sample(empty, "w", k=10, id_col="id").count() == 0
    assert mixture_sample(empty, "source", "id", k_total=10).count() == 0


def test_sketches_empty(spark):
    empty = spark.createDataFrame([], "event_id long, value double")
    assert bottomk_sample(empty, "event_id", 16).count() == 0
    assert sampled_quantiles(empty, "value", "event_id", k=16).count() == 0
    # KMV on an empty domain: one row, exact count 0
    row = kmv_distinct_global(empty, "value").first()
    assert row["n_seen"] == 0 and row["est_distinct"] == 0.0


def test_dedup_empty(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(empty, "text", keep_order_col="doc_id", id_col="doc_id").count() == 0
    assert (
        minhash_lsh_pairs(
            empty, "doc_id", "text", num_hashes=8, bands=4, jaccard_threshold=0.5
        ).count()
        == 0
    )


def test_embedding_neardup_pairs_empty_and_null_probe(spark):
    """ADVICE r6: with an empty frame (or a null first vector) the
    probed dim is 0 and the expanded dot/SQRT kernels would generate
    invalid SQL — the operator must return an empty (id_a, id_b,
    cosine) frame instead, matching the repo-wide empty-input
    contract."""
    from s3logs_parquet_spark.operators.dedup import embedding_neardup_pairs

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = embedding_neardup_pairs(empty, "vec_id", "embedding")
    assert out.columns == ["id_a", "id_b", "cosine"]
    assert out.count() == 0

    null_probe = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<double>"
    )
    out2 = embedding_neardup_pairs(null_probe, "vec_id", "embedding")
    assert out2.columns == ["id_a", "id_b", "cosine"]
    assert out2.count() == 0


def test_connected_components_no_edges(spark):
    nodes = spark.range(5).select(F.col("id").alias("doc_id"))
    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    out = connected_components_clusters(empty_pairs, nodes, "doc_id")
    # no edges -> every node is its own cluster representative
    rows = out.collect()
    assert len(rows) == 5
    assert all(r["cluster_id"] == r["doc_id"] for r in rows)


def test_chunking_empty(spark):
    from s3logs_parquet_spark.operators.chunking import chunk_documents

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = chunk_documents(empty, chunk_size=8, stride=4)
    assert out.count() == 0
    assert out.columns == ["doc_id", "text", "chunk_idx", "chunk_text", "chunk_tokens"]


def test_semantic_dedup_incremental_empty_batch(spark):
    from s3logs_parquet_spark.operators.dedup import (
        semantic_assign,
        semantic_dedup_incremental,
    )

    cents = [[1.0, 0.0], [0.0, 1.0]]
    corpus = spark.createDataFrame([(0, [1.0, 0.0])], ["vec_id", "embedding"])
    index = semantic_assign(corpus, "vec_id", "embedding", cents)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = semantic_dedup_incremental(empty, index, "vec_id", "embedding", cents, 0.9)
    assert out.count() == 0
    assert out.columns == ["vec_id", "cell", "is_semdup"]


def test_kmv_set_ops_empty_and_single_group(spark):
    """Round 7: the set-ops frame must be empty (not crash) with no
    data and with fewer than two groups (no pairs to report)."""
    from s3logs_parquet_spark.operators.sketches import kmv_set_ops

    empty = spark.createDataFrame([], "g string, v string")
    assert kmv_set_ops(empty, "g", "v", k=8).count() == 0
    one = spark.createDataFrame([("a", "x"), ("a", "y")], "g string, v string")
    assert kmv_set_ops(one, "g", "v", k=8).count() == 0


def test_canonical_keep_empty_and_singleton(spark):
    """Round 7: empty corpus -> empty frame; a single document is its
    own cluster, kept, with max_jaccard 0."""
    from s3logs_parquet_spark.operators.dedup import canonical_keep

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert canonical_keep(empty, "doc_id", "text").count() == 0
    one = spark.createDataFrame([(7, "some plain text here")], "doc_id long, text string")
    rows = canonical_keep(one, "doc_id", "text").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_id"], r["cluster_id"], r["keep"], r["max_jaccard"]) == (7, 7, 1, 0.0)
