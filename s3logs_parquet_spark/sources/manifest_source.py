"""S3-event manifest source: the SQS ingestion path (S5/F2) without SQS.

The reference daemons long-poll SQS for S3 event notifications, keep
only `ObjectCreated:Put` / `ObjectCreated:CompleteMultipartUpload`
records, and process the named objects (s3logd/src/main.rs:104-132,
233-259; F2 filter at :241-247). The cloud-portable Spark equivalent is
a *manifest* of those event payloads (S3 notifications → SQS/SNS →
firehose → JSON-lines files, or any equivalent dump): this module reads
event-notification JSON, applies the same F2 predicate, and yields the
object paths for `read_log_lines` — batch or streaming (the manifest
directory itself can be watched with readStream).

Event shape handled: the standard S3 notification `Records[]` document
as well as one-record-per-line JSON.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# F2 — the only event types the reference processes
# (s3logd/src/main.rs:241-247, s3logd-stream/src/main.rs:244-250).
ACCEPTED_EVENTS = (
    "ObjectCreated:Put",
    "ObjectCreated:CompleteMultipartUpload",
)

_RECORD_SCHEMA = (
    "STRUCT<eventName: STRING, s3: STRUCT<bucket: STRUCT<name: STRING>, "
    "object: STRUCT<key: STRING, size: BIGINT>>>"
)
_DOC_SCHEMA = f"STRUCT<Records: ARRAY<{_RECORD_SCHEMA}>>"


def parse_s3_events(manifest: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON event lines → (event_name, bucket, key, size) rows with the
    F2 predicate applied. Accepts both a bare record per line and the
    `{"Records": [...]}` envelope."""
    doc = F.from_json(F.col(value_col), _DOC_SCHEMA)
    bare = F.from_json(F.col(value_col), _RECORD_SCHEMA)
    records = F.when(doc["Records"].isNotNull(), doc["Records"]).otherwise(F.array(bare))
    rec = F.explode(records).alias("r")
    flat = manifest.select(rec).select(
        F.col("r.eventName").alias("event_name"),
        F.col("r.s3.bucket.name").alias("bucket"),
        F.col("r.s3.object.key").alias("key"),
        F.col("r.s3.object.size").alias("size"),
    )
    return flat.filter(F.col("event_name").isin(*ACCEPTED_EVENTS))  # F2


def object_paths_from_manifest(
    spark: SparkSession, manifest_path: str, scheme: str = "s3a://"
) -> list[str]:
    """Batch helper: manifest file(s) → concrete object paths to scan.
    Driver-side collect is of object NAMES (one row per created object
    — small by construction), not data."""
    events = parse_s3_events(spark.read.text(manifest_path))
    return [
        f"{scheme}{r['bucket']}/{r['key']}"
        for r in events.select("bucket", "key").distinct().collect()
    ]
