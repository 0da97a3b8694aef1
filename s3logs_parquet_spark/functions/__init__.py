from s3logs_parquet_spark.functions.parse import (  # noqa: F401
    TOKEN_PATTERN,
    extract_bucket,
    extract_ts,
    parse_s3_access_log,
    tokenize,
)
