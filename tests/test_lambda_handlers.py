"""Lambda-entry-point parity: SQS-batch aggregator handler and
EventBridge transformer handler (s3log-lambda-aggregator/src/main.rs,
s3log-lambda-transformer/src/main.rs) driven as plain callables."""

from __future__ import annotations

import json

from s3logs_parquet_spark.config import EngineConfig
from s3logs_parquet_spark.lambda_handlers import (
    make_aggregator_handler,
    make_transformer_handler,
)
from s3logs_parquet_spark.testing import generate_lines


def _s3_event_body(bucket: str, key: str, event: str = "ObjectCreated:Put") -> str:
    return json.dumps(
        {
            "Records": [
                {
                    "eventName": event,
                    "s3": {"bucket": {"name": bucket}, "object": {"key": key, "size": 1}},
                }
            ]
        }
    )


def _sqs_event(*bodies_with_ids):
    return {
        "Records": [
            {"messageId": mid, "body": body} for mid, body in bodies_with_ids
        ]
    }


def test_aggregator_then_transformer_end_to_end(spark, tmp_path):
    # fake "buckets" on local FS: scheme prefix maps (bucket, key) -> path
    base = tmp_path / "objects"
    (base / "logbucket").mkdir(parents=True)
    lines = generate_lines(400, seed=31, dup_fraction=0.05, garbage_fraction=0.02)
    (base / "logbucket" / "log1.txt").write_text("\n".join(lines[:250]) + "\n")
    (base / "logbucket" / "log2.txt").write_text("\n".join(lines[250:]) + "\n")

    staging = str(tmp_path / "staging")
    out = str(tmp_path / "table")
    cfg = EngineConfig()
    scheme = f"file://{base}/"

    agg = make_aggregator_handler(spark, staging, cfg, scheme=scheme)
    resp = agg(
        _sqs_event(
            ("m1", _s3_event_body("logbucket", "log1.txt")),
            ("m2", _s3_event_body("logbucket", "log2.txt")),
        )
    )
    assert resp == {"batchItemFailures": []}

    trans = make_transformer_handler(spark, staging, out, cfg)
    n = trans({"region": "us-east-1", "bucket": "logbucket"})
    table = spark.read.parquet(out)
    n_unique = len(set(l for l in lines if not l.startswith("!!")))
    assert table.count() == n_unique
    assert n >= n_unique


def test_aggregator_partial_batch_failures(spark, tmp_path):
    base = tmp_path / "objects"
    (base / "b").mkdir(parents=True)
    (base / "b" / "ok.txt").write_text(
        "\n".join(generate_lines(50, seed=32)) + "\n"
    )
    staging = str(tmp_path / "staging")
    agg = make_aggregator_handler(
        spark, staging, EngineConfig(), scheme=f"file://{base}/"
    )
    resp = agg(
        _sqs_event(
            ("good", _s3_event_body("b", "ok.txt")),
            ("bad", _s3_event_body("b", "does-not-exist.txt")),
            # non-PUT event: skipped, NOT a failure (F2, main.rs:44-51)
            ("del", _s3_event_body("b", "ok.txt", event="ObjectRemoved:Delete")),
            # unparseable body: skipped, NOT a failure (main.rs:74)
            ("junk", "this is not json"),
        )
    )
    assert resp == {"batchItemFailures": [{"itemIdentifier": "bad"}]}
