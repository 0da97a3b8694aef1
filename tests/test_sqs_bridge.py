"""sources/sqs_bridge.py — the SQS → manifest adapter (S5's queue leg),
tested against a stubbed client: no boto3, no network."""

from __future__ import annotations

import json
import os

import pytest

from s3logs_parquet_spark.sources.manifest_source import parse_s3_events
from s3logs_parquet_spark.sources.sqs_bridge import SqsManifestBridge


def _s3_event(bucket: str, key: str, event: str = "ObjectCreated:Put") -> str:
    return json.dumps(
        {
            "Records": [
                {
                    "eventName": event,
                    "s3": {
                        "bucket": {"name": bucket},
                        "object": {"key": key, "size": 123},
                    },
                }
            ]
        }
    )


class FakeSqs:
    """Minimal SQS shape: queued bodies drain in max_messages chunks;
    deletes are recorded (and optionally fail once)."""

    def __init__(self, bodies, fail_first_delete=False):
        self.pending = [
            {"Body": b, "ReceiptHandle": f"rh-{i}"} for i, b in enumerate(bodies)
        ]
        self.deleted: list[str] = []
        self.fail_first_delete = fail_first_delete

    def receive_message(self, QueueUrl, MaxNumberOfMessages, WaitTimeSeconds):
        out, self.pending = (
            self.pending[:MaxNumberOfMessages],
            self.pending[MaxNumberOfMessages:],
        )
        return {"Messages": out} if out else {}

    def delete_message_batch(self, QueueUrl, Entries):
        if self.fail_first_delete:
            self.fail_first_delete = False
            return {"Failed": [{"Id": e["Id"]} for e in Entries[:1]]}
        self.deleted.extend(e["ReceiptHandle"] for e in Entries)
        return {"Failed": []}


def test_bridge_polls_publishes_and_deletes(tmp_path):
    bodies = [
        _s3_event("bkt-a", "logs/obj0.log"),
        _s3_event("bkt-a", "logs/obj1.log"),
        # SNS envelope: bridge must unwrap to the S3 document
        json.dumps(
            {"Type": "Notification", "Message": _s3_event("bkt-b", "logs/obj2.log")}
        ),
        # junk the downstream F2 filter drops — still dumped verbatim
        json.dumps({"Event": "s3:TestEvent"}),
        "not json at all",
    ]
    fake = FakeSqs(bodies)
    bridge = SqsManifestBridge(
        queue_url="q", manifest_dir=str(tmp_path / "man"), client=fake,
        max_messages=3,
    )
    total = bridge.run(stop_after_empty=1)
    assert total == 5
    assert len(fake.deleted) == 5  # delete-on-commit ran for every message

    files = sorted(os.listdir(tmp_path / "man"))
    assert len(files) == 2  # two non-empty polls (3 + 2), no .tmp leftovers
    assert all(f.startswith("manifest-") and f.endswith(".json") for f in files)


def test_bridge_manifests_feed_parse_s3_events(spark, tmp_path):
    """End-to-end handoff: bridge output is exactly what the engine's
    manifest source consumes — F2 keeps the created objects, drops the
    junk."""
    fake = FakeSqs(
        [
            _s3_event("bkt-a", "logs/obj0.log"),
            _s3_event("bkt-b", "logs/obj1.log", "ObjectCreated:CompleteMultipartUpload"),
            _s3_event("bkt-c", "tmp/ignored", "ObjectRemoved:Delete"),
            "garbage line",
        ]
    )
    man = str(tmp_path / "man")
    SqsManifestBridge("q", man, client=fake).run(stop_after_empty=1)
    events = parse_s3_events(spark.read.text(man))
    got = {(r["bucket"], r["key"]) for r in events.collect()}
    assert got == {("bkt-a", "logs/obj0.log"), ("bkt-b", "logs/obj1.log")}


def test_bridge_surfaces_failed_deletes(tmp_path):
    fake = FakeSqs([_s3_event("b", "k")], fail_first_delete=True)
    bridge = SqsManifestBridge("q", str(tmp_path / "man"), client=fake)
    with pytest.warns(UserWarning, match="re-deliver"):
        bridge.poll_once()
    # the manifest was still published (the commit happened; only the
    # ack failed → at-least-once redelivery, absorbed downstream)
    assert len(os.listdir(tmp_path / "man")) == 1
