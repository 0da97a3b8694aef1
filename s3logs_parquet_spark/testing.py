"""Deterministic synthetic S3 access-log generator for tests/bench.

Fresh implementation of the fixture distributions documented in
FIXTURES.md §1 (derived from the reference's de-facto test harness,
scripts/loggen/s3loggen.py): 26 space-separated fields, bracketed Time,
quoted RequestURI/Referer/UserAgent. Adds the adversarial rows the
reference never tests: duplicates (in/cross window), short rows, long
rows, garbage lines, boundary-straddling timestamps.
"""

from __future__ import annotations

import random
import string
from datetime import datetime, timezone

OPERATIONS = [
    "REST.HEAD.OBJECT",
    "REST.GET.OBJECT",
    "REST.PUT.OBJECT",
    "REST.DELETE.OBJECT",
    "REST.COPY.OBJECT",
    "REST.GET.UPLOAD",
    "REST.PUT.PART",
]
STATUSES = ["200", "404", "503"]
ERROR_CODES = ["-", "NoSuchKey"]
USER_AGENT = (
    "S3Console/0.4, aws-internal/3 aws-sdk-java/1.11.991 "
    "Linux/5.4.0 OpenJDK_64-Bit_Server_VM/25.282-b08 java/1.8.0_282 vendor/Oracle_Corporation"
)
OWNER = "feedfacecafebeef" * 4


def _rid(rng: random.Random) -> str:
    return "".join(rng.choices(string.ascii_uppercase + string.digits, k=16))


def format_time(ts: int) -> str:
    dt = datetime.fromtimestamp(ts, tz=timezone.utc)
    return dt.strftime("[%d/%b/%Y:%H:%M:%S +0000]")


def make_line(
    rng: random.Random,
    ts: int,
    bucket: str = "fakebucket",
    request_id: str | None = None,
    n_extra_fields: int = 0,
    n_drop_fields: int = 0,
) -> str:
    """One well-formed log line at epoch ``ts``."""
    key = "/" + "/".join(
        "".join(rng.choices(string.ascii_lowercase, k=rng.randint(10, 25)))
        for _ in range(rng.randint(3, 8))
    ) + "/" + "".join(rng.choices(string.ascii_lowercase, k=10)) + ".txt"
    fields = [
        OWNER,
        bucket,
        format_time(ts),
        f"192.0.{rng.randint(0, 255)}.{rng.randint(0, 255)}",
        OWNER,
        request_id or _rid(rng),
        rng.choice(OPERATIONS),
        key,
        f'"{rng.choice(["GET", "PUT", "POST"])} {key} HTTP/1.1"',
        rng.choice(STATUSES),
        rng.choice(ERROR_CODES),
        str(rng.randint(0, 10**12)),
        str(rng.randint(0, 10**12)),
        str(rng.randint(10, 200)),
        str(rng.randint(10, 200)),
        '"http://www.amazon.com/webservices"',
        f'"{USER_AGENT}"',
        "-",
        "".join(rng.choices(string.ascii_letters + string.digits, k=50)),
        "SigV4",
        "ECDHE-RSA-AES128-GCM-SHA256",
        "AuthHeader",
        "s3.us-west-2.amazonaws.com",
        "TLSv1.2",
        "-",
        "-",
    ]
    if n_drop_fields:
        fields = fields[: len(fields) - n_drop_fields]
    for i in range(n_extra_fields):
        fields.append(f"extra{i + 27}")
    return " ".join(fields)


def generate_lines(
    n: int,
    seed: int = 42,
    base_ts: int = 1715500800,  # 2024-05-12 08:00:00 UTC
    span_seconds: int = 3600,
    buckets: tuple[str, ...] = ("bucket-a", "bucket-b", "bucket-c"),
    dup_fraction: float = 0.05,
    garbage_fraction: float = 0.01,
    short_fraction: float = 0.0,
    extra_fraction: float = 0.0,
) -> list[str]:
    """Deterministic line corpus with duplicates and adversarial rows.

    Duplicates repeat a previous line verbatim (same RequestID, same
    window → D1 must drop) — the crash-redelivery case. Timestamps are
    emitted unsorted (uniform over span) like the generator's trailing
    window (FIXTURES.md §1).
    """
    rng = random.Random(seed)
    out: list[str] = []
    clean: list[str] = []
    for _ in range(n):
        r = rng.random()
        if clean and r < dup_fraction:
            out.append(rng.choice(clean))
            continue
        if r < dup_fraction + garbage_fraction:
            out.append("!!corrupt line without a timestamp!!")
            continue
        ts = base_ts + rng.randint(0, span_seconds - 1)
        n_extra = 1 + rng.randint(0, 2) if rng.random() < extra_fraction else 0
        n_drop = rng.randint(1, 5) if rng.random() < short_fraction else 0
        line = make_line(rng, ts, bucket=rng.choice(buckets), n_extra_fields=n_extra, n_drop_fields=n_drop)
        out.append(line)
        if not (n_extra or n_drop):
            clean.append(line)
    return out
