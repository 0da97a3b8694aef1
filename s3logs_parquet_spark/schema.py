"""Log-table schema: the 26 string columns + adaptive widening.

The reference loads a Parquet message-type schema from config
(s3logs/config/parquet.schema:1-28 — 26 REQUIRED BYTE_ARRAY UTF8
fields) and widens it at runtime with nullable ``ExtraField{N}`` Utf8
columns when input lines overflow (s3logs/src/utils.rs:1213-1235).

Here the same schema is a StructType; widening is a pure function of an
observed maximum field count.
"""

from __future__ import annotations

from pyspark.sql.types import StringType, StructField, StructType

# Field names and order exactly as s3logs/config/parquet.schema:2-27.
LOG_FIELDS: tuple[str, ...] = (
    "BucketOwner",
    "Bucket",
    "Time",
    "RemoteIP",
    "Requester",
    "RequestID",
    "Operation",
    "Key",
    "RequestURI",
    "HTTPStatus",
    "ErrorCode",
    "BytesSent",
    "ObjectSize",
    "TotalTime",
    "TurnAroundTime",
    "Referer",
    "UserAgent",
    "VersionId",
    "HostId",
    "SignatureVersion",
    "CipherSuite",
    "AuthenticationType",
    "HostHeader",
    "TLSVersion",
    "AccessPointARN",
    "AclRequired",
)

NUM_LOG_FIELDS = len(LOG_FIELDS)  # 26

# Dedup key: RequestID is field index 5 (s3logs/src/utils.rs:1076).
DEDUP_FIELD = "RequestID"
DEDUP_FIELD_INDEX = LOG_FIELDS.index(DEDUP_FIELD)

# Source bucket is the 2nd whitespace token (s3logs/src/utils.rs:44,266-271).
BUCKET_FIELD = "Bucket"
TIME_FIELD = "Time"


def log_schema(extra_fields: int = 0, extra_prefix: str = "ExtraField") -> StructType:
    """The output StructType: 26 non-null strings, plus ``extra_fields``
    nullable ``ExtraField{N}`` strings numbered from 27 (naming per
    s3logs/src/utils.rs:1217-1222).
    """
    fields = [StructField(name, StringType(), nullable=False) for name in LOG_FIELDS]
    for i in range(extra_fields):
        fields.append(
            StructField(f"{extra_prefix}{NUM_LOG_FIELDS + 1 + i}", StringType(), nullable=True)
        )
    return StructType(fields)


def extra_field_names(max_fields: int, extra_prefix: str = "ExtraField") -> list[str]:
    """Names of the widening columns needed to hold ``max_fields`` parsed
    tokens. ``max_fields <= 26`` → no widening."""
    if max_fields <= NUM_LOG_FIELDS:
        return []
    return [f"{extra_prefix}{i}" for i in range(NUM_LOG_FIELDS + 1, max_fields + 1)]
