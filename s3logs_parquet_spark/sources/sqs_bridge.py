"""SQS → manifest bridge: the missing piece between a real S3 event
queue and this engine's manifest-driven ingestion (S5).

The reference daemons long-poll SQS directly and ack each message after
its object is fully processed and uploaded (s3logd/src/main.rs:104-132,
s3logd-stream/src/main.rs:112-139; receipt ack = T4's commit). Spark's
file source replaces the in-process queue with a checkpointed manifest
directory (sources/manifest_source.py, streaming/job.py
run_manifest_stream) — so the only queue-facing code a deployment needs
is this thin bridge: long-poll SQS, dump each poll's S3 event payloads
as ONE atomically-published JSON-lines manifest file, then delete the
messages.

Commit semantics, mapped onto the reference's receipt protocol:

- The manifest file is the durable handoff. It is written to a hidden
  ``.tmp`` name and RENAMED into place — readers (the stream) never see
  a partial manifest, and the file source's checkpoint log guarantees
  each manifest is processed exactly once downstream.
- Messages are deleted only AFTER the rename (delete-on-commit). A
  crash before it re-delivers the messages (SQS at-least-once) → a
  second manifest with the same events → the same objects named twice.
  That is exactly the redelivery-dupe case the pipeline's D1 dedup
  already absorbs (the reference relies on the same property,
  s3logd-stream redelivery note); commonly the visibility timeout makes
  this rare.
- F2 filtering stays downstream in parse_s3_events — the bridge dumps
  payloads verbatim, so an audit of the manifest dir shows every event
  received, including the ones F2 drops (TestEvent, folder markers).

boto3 is NOT a dependency of this package: the import is deferred to
:func:`sqs_client` and any client object with ``receive_message`` /
``delete_message_batch`` works (unit tests inject a fake). The bridge
is driver-side glue — one process, no Spark — run it under the same
supervisor as the streaming query (or as a sidecar/lambda shipping to
the manifest bucket).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field


def sqs_client(region_name: str | None = None):
    """Deferred boto3 import (optional dependency)."""
    try:
        import boto3
    except ImportError as e:  # pragma: no cover - optional dep
        raise ImportError(
            "sqs_bridge.sqs_client needs boto3 (pip install boto3), or pass "
            "your own client object to SqsManifestBridge"
        ) from e
    return boto3.client("sqs", region_name=region_name)


@dataclass
class SqsManifestBridge:
    """Long-poll ``queue_url`` and publish each non-empty poll as one
    manifest file under ``manifest_dir``.

    ``client`` is any SQS-shaped object (boto3 client or a test fake).
    ``wait_time_seconds`` is the long-poll window (the reference's
    blocking ``recv``), ``max_messages`` the SQS per-call cap (10).
    """

    queue_url: str
    manifest_dir: str
    client: object = None
    wait_time_seconds: int = 20
    max_messages: int = 10
    _seq: int = field(default=0, init=False)

    def __post_init__(self) -> None:
        if self.client is None:
            self.client = sqs_client()
        os.makedirs(self.manifest_dir, exist_ok=True)

    def poll_once(self) -> int:
        """One receive → publish → delete cycle. Returns the number of
        messages committed (0 = long poll timed out empty)."""
        resp = self.client.receive_message(
            QueueUrl=self.queue_url,
            MaxNumberOfMessages=self.max_messages,
            WaitTimeSeconds=self.wait_time_seconds,
        )
        messages = resp.get("Messages", [])
        if not messages:
            return 0
        lines = []
        for m in messages:
            body = m["Body"]
            # unwrap an SNS envelope (S3 → SNS → SQS fan-out) so the
            # manifest always holds the S3 notification document itself
            try:
                doc = json.loads(body)
                if isinstance(doc, dict) and doc.get("Type") == "Notification":
                    body = doc["Message"]
            except (ValueError, KeyError):
                pass  # non-JSON body: dump verbatim, F2 drops it later
            lines.append(body.replace("\n", " "))
        name = f"manifest-{int(time.time())}-{self._seq:06d}-{uuid.uuid4().hex[:8]}.json"
        self._seq += 1
        tmp = os.path.join(self.manifest_dir, f".{name}.tmp")
        final = os.path.join(self.manifest_dir, name)
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)  # publish: readers never see a partial file
        # delete-on-commit (T4 receipt ack): only after the manifest is
        # durably visible; batched, with per-entry failure surfaced
        entries = [
            {"Id": str(i), "ReceiptHandle": m["ReceiptHandle"]}
            for i, m in enumerate(messages)
        ]
        result = self.client.delete_message_batch(
            QueueUrl=self.queue_url, Entries=entries
        )
        failed = result.get("Failed", [])
        if failed:
            # undeleted messages re-deliver → duplicate manifest events
            # → absorbed by D1 downstream; surface it for the operator
            import warnings

            warnings.warn(
                f"sqs_bridge: {len(failed)} message deletes failed; their "
                "events will re-deliver (downstream dedup absorbs them)",
                stacklevel=2,
            )
        return len(messages)

    def run(self, max_polls: int | None = None, stop_after_empty: int = 0) -> int:
        """Poll loop. ``max_polls`` bounds iterations (None = forever);
        ``stop_after_empty`` > 0 stops after that many CONSECUTIVE empty
        polls (the drain analog of T6). Returns total messages bridged."""
        total, empty, polls = 0, 0, 0
        while max_polls is None or polls < max_polls:
            n = self.poll_once()
            polls += 1
            total += n
            empty = empty + 1 if n == 0 else 0
            if stop_after_empty and empty >= stop_after_empty:
                break
        return total
