"""Throughput monitor: the mon task of s3logd-stream (mon.rs:40-173)
as a StreamingQueryListener.

The reference keeps a 15-slot per-minute (sum, count) ring and reports
5-min / 15-min mean lines/s and files/s. Here the micro-batch progress
events carry numInputRows + timestamps; the listener maintains the same
ring driver-side (a few ints — no data-plane cost)."""

from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class ThroughputStats:
    rows_total: int = 0
    batches_total: int = 0
    # ring of (minute_epoch, rows) — 15 slots like mon.rs:40-47
    ring: deque = field(default_factory=lambda: deque(maxlen=15))

    def record(self, rows: int, now: float | None = None) -> None:
        now = now or time.time()
        minute = int(now // 60)
        if self.ring and self.ring[-1][0] == minute:
            self.ring[-1] = (minute, self.ring[-1][1] + rows)
        else:
            self.ring.append((minute, rows))
        self.rows_total += rows
        self.batches_total += 1

    def mean_rows_per_sec(self, minutes: int) -> float:
        """5-min / 15-min rolling mean (mon.rs:154-167)."""
        if not self.ring:
            return 0.0
        cutoff = self.ring[-1][0] - minutes + 1
        rows = sum(r for m, r in self.ring if m >= cutoff)
        return rows / (minutes * 60.0)


class ThroughputListener(StreamingQueryListener):
    """Attach with spark.streams.addListener(listener); read
    listener.stats between/after batches."""

    def __init__(self) -> None:
        self.stats = ThroughputStats()

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        self.stats.record(int(event.progress.numInputRows))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
