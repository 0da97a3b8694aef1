from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3logs_parquet_spark.session import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


_ACTIVE_SESSION = None


@pytest.fixture(scope="session")
def spark():
    global _ACTIVE_SESSION
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark(app_name="s3logs-parquet-spark-tests", shuffle_partitions=8)
    _ACTIVE_SESSION = s
    yield s
    _ACTIVE_SESSION = None
    s.stop()


def drain(q, timeout: int = 600) -> None:
    """awaitTermination with the return value CHECKED (round 14,
    VERDICT r13 #1): every raw ``q.awaitTermination(N)`` call in this
    suite ignored the bool, so on a loaded host a slow-but-healthy
    availableNow stream silently outlived its test — the leaked query
    then kept consuming the session's cores (inflating every later
    streaming test toward ITS timeout) and crashed with an opaque
    MicroBatchExecution stack when its temp inputs vanished, the
    FAILED+teardown-ERROR signature of the r13 driver run. A healthy
    availableNow stream terminates on its own; the timeout only guards
    hangs, so a generous ceiling costs nothing when green. On timeout:
    stop the query (no leak), fail loud with the load context."""
    if q.awaitTermination(timeout):
        return
    try:
        q.stop()
    finally:
        try:
            with open("/proc/loadavg") as fh:
                load = fh.read().split()[:3]
        except OSError:
            load = ["?"]
        raise AssertionError(
            f"stream {q.id} did not drain within {timeout}s "
            f"(host loadavg {' '.join(load)}) — stopped it to prevent a "
            "leaked-query cascade; this is a hang or severe host "
            "contention, not a correctness failure"
        )


@pytest.fixture(autouse=True)
def _no_leaked_streams():
    """Safety net behind :func:`drain`: whatever a test did, no live
    streaming query may cross its boundary (a leaked stream makes
    LATER tests flaky — it competes for the fixed local[N] cores and
    dies noisily when this test's tmp inputs disappear)."""
    yield
    s = _ACTIVE_SESSION
    if s is None:
        return
    for q in s.streams.active:
        try:
            q.stop()
        except Exception:  # noqa: BLE001 — best-effort cleanup
            pass


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.path.join(TESTDATA, "sf0.001")
