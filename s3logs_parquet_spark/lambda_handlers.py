"""Event-driven one-shot handlers: parity for the reference's two
Lambda entry points, minus the Lambda runtime.

The reference ships two thin binaries over the same library core:

- `s3log-lambda-aggregator` (src/main.rs:36-108): an SQS-batch handler
  whose message bodies are S3 event-notification JSON. Each
  `ObjectCreated:Put` / `ObjectCreated:CompleteMultipartUpload` record
  triggers stage-1 aggregation of the named object; everything else is
  skipped. The response is the SQS partial-batch-failure document
  (`{"batchItemFailures": [{"itemIdentifier": <messageId>}, ...]}`),
  listing message ids whose records did NOT all succeed so only those
  are redelivered.
- `s3log-lambda-transformer` (src/main.rs:13-32): an EventBridge
  handler `{region, bucket}` that runs stage-2 transform over the
  staging tier.

Here each is a factory returning a plain ``handler(event, context)``
callable — the exact signature any FaaS harness (or a unit test)
invokes — bound to a SparkSession and the engine paths. There is no
Lambda runtime in a Spark deployment; the point is that an operator's
existing event wiring (SQS payloads, EventBridge rules) drives this
engine unchanged.

Scale posture: the aggregator is driver-light — event JSON is parsed
per message (tiny), and each message becomes ONE Spark job over its
named objects. The transformer is a single job over the staging tier.
No data ever flows through the handler process itself.
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql import SparkSession

from s3logs_parquet_spark.config import EngineConfig
from s3logs_parquet_spark.sources.manifest_source import ACCEPTED_EVENTS


def _record_paths(body: str, scheme: str) -> list[str] | None:
    """S3-event JSON body → object paths passing F2, or None if the
    body is not S3-event JSON (the reference silently skips those,
    s3log-lambda-aggregator/src/main.rs:74)."""
    try:
        doc = json.loads(body)
    except (TypeError, ValueError):
        return None
    records = doc.get("Records") if isinstance(doc, dict) else None
    if records is None:
        return None
    paths = []
    for rec in records:
        try:
            if rec.get("eventName") not in ACCEPTED_EVENTS:
                continue  # F2: skip non-PUT events (main.rs:44-51)
            bucket = rec["s3"]["bucket"]["name"]
            key = rec["s3"]["object"]["key"]
        except (KeyError, TypeError, AttributeError):
            return None  # malformed record → message unparseable
        paths.append(f"{scheme}{bucket}/{key}")
    return paths


def make_aggregator_handler(
    spark: SparkSession,
    staging_path: str,
    cfg: EngineConfig | None = None,
    scheme: str = "s3a://",
) -> Callable:
    """Build the SQS-batch aggregator handler.

    ``handler(event, context=None)`` takes the standard SQS event
    (``{"Records": [{"messageId", "body"}, ...]}``) and returns the
    partial-batch-failure response. Per-message semantics mirror the
    reference (main.rs:69-109): a message succeeds iff every accepted
    record's object aggregates successfully; unparseable bodies are
    skipped (success); one message = one Spark job.

    ``scheme`` maps (bucket, key) to a filesystem URI — "s3a://" on a
    cluster, "file:///base/" under test.
    """
    from s3logs_parquet_spark.cli import run_aggregate

    cfg = cfg or EngineConfig()

    def handler(event: dict, context=None) -> dict:
        failed: list[str] = []
        for msg in event.get("Records", []):
            message_id = msg.get("messageId", "")
            paths = _record_paths(msg.get("body"), scheme)
            if not paths:  # unparseable or nothing accepted: not a failure
                continue
            try:
                run_aggregate(spark, paths, staging_path, cfg)
            except Exception:
                failed.append(message_id)
        return {
            "batchItemFailures": [{"itemIdentifier": m} for m in failed]
        }

    return handler


def make_transformer_handler(
    spark: SparkSession,
    staging_path: str,
    output_path: str,
    cfg: EngineConfig | None = None,
) -> Callable:
    """Build the EventBridge transformer handler.

    ``handler(event, context=None)`` accepts the reference's
    ``{"region", "bucket"}`` payload (main.rs:8-18; the fields only
    parameterize logging/clients there — the work is always "process
    the staging dir") and runs stage-2 transform over the staging
    tier. Returns the number of lines processed, like the reference
    logs (main.rs:23-26).
    """
    from s3logs_parquet_spark.cli import run_transform_staged

    cfg = cfg or EngineConfig()

    def handler(event: dict, context=None) -> int:
        from s3logs_parquet_spark.writer import output_has_data

        run_transform_staged(spark, staging_path, output_path, cfg)
        # lines processed, like the reference's log line — a parquet
        # footer rowcount over the staging tier, no data scan. A no-op
        # invocation (empty/absent staging tier — legitimate from the
        # event wiring) reports 0 instead of AnalysisException.
        if not output_has_data(spark, staging_path):
            return 0
        return spark.read.parquet(staging_path).count()

    return handler
