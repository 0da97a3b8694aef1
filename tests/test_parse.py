"""Parser (P1-P7) unit tests against hand-computed expectations."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from s3logs_parquet_spark.functions.parse import (
    extract_bucket,
    extract_ts,
    parse_s3_access_log,
    tokenize,
)
from s3logs_parquet_spark.schema import LOG_FIELDS, NUM_LOG_FIELDS
from s3logs_parquet_spark.testing import format_time, generate_lines, make_line
import random

LINE = (
    "79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2be awsexamplebucket1 "
    "[06/Feb/2019:00:00:38 +0000] 192.0.2.3 "
    "79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2be 3E57427F3EXAMPLE "
    "REST.GET.VERSIONING - \"GET /awsexamplebucket1?versioning HTTP/1.1\" 200 - 113 - 7 - "
    "\"-\" \"S3Console/0.4\" - "
    "s3dG3kX6Qii7Mw2iYiDRVngWA5ihbNXmgkDi4P8QS5Sb+gf1ofic+mTEXAMPLE= SigV4 "
    "ECDHE-RSA-AES128-GCM-SHA256 AuthHeader awsexamplebucket1.s3.us-west-1.amazonaws.com "
    "TLSv1.2 - -"
)


def _tokens(spark, line):
    return spark.range(1).select(tokenize(F.lit(line)).alias("t")).collect()[0]["t"]


def test_tokenize_docs_example(spark):
    t = _tokens(spark, LINE)
    assert len(t) == 26
    assert t[1] == "awsexamplebucket1"
    assert t[2] == "06/Feb/2019:00:00:38 +0000"  # brackets stripped
    assert t[8] == "GET /awsexamplebucket1?versioning HTTP/1.1"  # quotes stripped
    assert t[16] == "S3Console/0.4"
    assert t[25] == "-"


def test_tokenize_bracket_non_datetime_splits(spark):
    # non-datetime bracketed text token-splits its interior, like the
    # reference alternation (bare tokens exclude brackets)
    t = _tokens(spark, "a b [x y] c")
    assert t == ["a", "b", "x", "y", "c"]


def test_extract_ts_and_bucket(spark):
    df = spark.createDataFrame([(LINE,)], ["value"])
    row = df.select(
        extract_ts(F.col("value")).alias("ts"), extract_bucket(F.col("value")).alias("b")
    ).collect()[0]
    assert row["b"] == "awsexamplebucket1"
    assert row["ts"] == dt.datetime(2019, 2, 6, 0, 0, 38)


def test_extract_ts_unparseable_is_null(spark):
    df = spark.createDataFrame([("garbage no timestamp",), ("a b [not a time] c",)], ["value"])
    rows = df.select(extract_ts(F.col("value")).alias("ts")).collect()
    assert all(r["ts"] is None for r in rows)


def test_parse_full_schema_and_padding(spark):
    rng = random.Random(7)
    full = make_line(rng, 1715500800)
    short = make_line(rng, 1715500801, n_drop_fields=4)
    df = spark.createDataFrame([(full,), (short,)], ["value"])
    parsed = parse_s3_access_log(df)
    assert [f.name for f in parsed.schema.fields[:NUM_LOG_FIELDS]] == list(LOG_FIELDS)
    rows = {r["n_fields"]: r for r in parsed.collect()}
    assert rows[26]["AclRequired"] == "-"
    # P6: short row padded with '' in the trailing fields
    assert rows[22]["AclRequired"] == ""
    assert rows[22]["TLSVersion"] == ""
    assert rows[22]["Time"] == format_time(1715500801)[1:-1]


def test_parse_extra_fields_widening(spark):
    rng = random.Random(8)
    long_line = make_line(rng, 1715500800, n_extra_fields=2)
    df = spark.createDataFrame([(long_line,)], ["value"])
    parsed = parse_s3_access_log(df, extra_fields=2)
    row = parsed.collect()[0]
    assert row["n_fields"] == 28
    assert row["ExtraField27"] == "extra27"
    assert row["ExtraField28"] == "extra28"
    # a 26-field line under the widened schema gets NULL extras
    df2 = spark.createDataFrame([(make_line(rng, 1715500800),)], ["value"])
    row2 = parse_s3_access_log(df2, extra_fields=2).collect()[0]
    assert row2["ExtraField27"] is None


def test_replace_time_flag(spark):
    # P7 dormant branch: Time field rewritten as epoch string
    rng = random.Random(9)
    df = spark.createDataFrame([(make_line(rng, 1715500800),)], ["value"])
    row = parse_s3_access_log(df, replace_time=True).collect()[0]
    assert row["Time"] == "1715500800"


def test_generated_corpus_parses(spark):
    lines = generate_lines(500, seed=1, garbage_fraction=0.02)
    df = spark.createDataFrame([(l,) for l in lines], ["value"])
    parsed = parse_s3_access_log(df)
    n_garbage = sum(1 for l in lines if l.startswith("!!"))
    assert parsed.filter(F.col("ts").isNull()).count() == n_garbage
    ok = parsed.filter(F.col("ts").isNotNull())
    assert ok.filter(F.col("n_fields") != 26).count() == 0
    assert ok.filter(F.col("RequestID").rlike("^[A-Z0-9]{16}$")).count() == ok.count()


def test_older_format_short_line_pads(spark):
    """Pre-2019 S3 log lines end at HostHeader (fewer trailing fields);
    the parser must pad the absent TLSVersion/AccessPointARN/AclRequired."""
    line = (
        "79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2be awsexamplebucket1 "
        "[06/Feb/2019:00:00:38 +0000] 192.0.2.3 "
        "79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2be 891CE47D2EXAMPLE "
        "REST.GET.LOGGING_STATUS - \"GET /awsexamplebucket1?logging HTTP/1.1\" 200 - 242 - 11 - "
        "\"-\" \"S3Console/0.4\" - "
        "9vKBE6vMhrNiWHZmb2L0mXOcqPGzQOI5XLnCtZNPxev+Hf+7tpT6sxDwDty4LHBUOZNG96N1234= SigV4 "
        "ECDHE-RSA-AES128-GCM-SHA256 AuthHeader awsexamplebucket1.s3.us-west-1.amazonaws.com"
    )
    df = spark.createDataFrame([(line,)], ["value"])
    row = parse_s3_access_log(df).collect()[0]
    assert row["n_fields"] == 23
    assert row["HostHeader"] == "awsexamplebucket1.s3.us-west-1.amazonaws.com"
    assert row["TLSVersion"] == "" and row["AclRequired"] == ""
    assert row["ts"] is not None


def test_invalid_utf8_bytes_do_not_crash(spark, tmp_path):
    """Binary garbage interleaved with valid lines: the scan replaces
    bad bytes, the parser drops unparseable rows, nothing crashes."""
    import random as _r

    p = tmp_path / "mixed.log"
    good = make_line(_r.Random(3), 1715500800)
    with open(p, "wb") as f:
        f.write(good.encode() + b"\n")
        f.write(b"\xff\xfe\x00garbage\x80bytes\n")
        f.write(good.replace("fakebucket", "other").encode() + b"\n")
    parsed = parse_s3_access_log(spark.read.text(str(p)))
    ok = parsed.filter(F.col("ts").isNotNull())
    assert ok.count() == 2
    assert parsed.count() == 3
