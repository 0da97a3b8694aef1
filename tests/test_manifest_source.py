"""S5/F2: S3 event-notification manifest parsing and filtering."""

from __future__ import annotations

import json

from s3logs_parquet_spark.sources.manifest_source import (
    object_paths_from_manifest,
    parse_s3_events,
)


def _event(name, bucket, key, size=100):
    return {
        "eventName": name,
        "s3": {"bucket": {"name": bucket}, "object": {"key": key, "size": size}},
    }


def test_manifest_f2_filter(spark, tmp_path):
    lines = [
        json.dumps({"Records": [_event("ObjectCreated:Put", "b1", "logs/a.log")]}),
        json.dumps({"Records": [_event("ObjectCreated:CompleteMultipartUpload", "b1", "logs/b.log")]}),
        json.dumps({"Records": [_event("ObjectRemoved:Delete", "b1", "logs/c.log")]}),  # F2 drops
        json.dumps({"Records": [_event("ObjectCreated:Copy", "b1", "logs/d.log")]}),  # F2 drops
        json.dumps(_event("ObjectCreated:Put", "b2", "logs/e.log")),  # bare record form
        "not json at all",
    ]
    mf = tmp_path / "manifest.jsonl"
    mf.write_text("\n".join(lines) + "\n")

    events = parse_s3_events(spark.read.text(str(mf)))
    rows = {(r["bucket"], r["key"]) for r in events.collect()}
    assert rows == {("b1", "logs/a.log"), ("b1", "logs/b.log"), ("b2", "logs/e.log")}

    paths = object_paths_from_manifest(spark, str(mf), scheme="file:///data/")
    assert sorted(paths) == [
        "file:///data/b1/logs/a.log",
        "file:///data/b1/logs/b.log",
        "file:///data/b2/logs/e.log",
    ]
