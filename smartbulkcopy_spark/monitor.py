"""Copy-progress monitor: a heartbeat thread logging throughput, running
tasks, and queue depth.

Re-expresses the reference's monitor task (reference:
client/SmartBulkCopy.cs:665-766): every tick it samples the destination's
cumulative write counter and prints one status line in the same shape
(rate, tasks running, queue depth). The counter source is a pluggable
``sampler`` callable returning cumulative bytes written:

- file destinations default to bytes on disk (``_tree_bytes``);
- JDBC destinations pass ``log_flush_sampler(conn)``, which reads the
  instance's 'Log Bytes Flushed/sec' performance counter — despite the
  name a CUMULATIVE count the monitor differences per tick, exactly the
  two-sample delta the reference computes with WAITFOR DELAY 5s
  (client/SmartBulkCopy.cs:707-731).
"""

from __future__ import annotations

import os
import threading
import time
from collections.abc import Callable


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def log_flush_sampler(conn) -> Callable[[], int]:
    """Build a cumulative-bytes sampler over the destination's log-flush
    performance counter, for JDBC destinations. ``conn`` is anything with
    ``scalar(sql)`` (e.g. sources.jdbc.JvmJdbcConnection). The counter
    row is keyed by the PHYSICAL database name, which changes when an
    Azure SQL SLO change moves the database — so the instance is
    re-resolved on EVERY tick, matching the reference's 'This needs to
    be in the loop' (reference: client/SmartBulkCopy.cs:700-722); a
    construction-time binding would silently read 0 for the rest of the
    copy after an SLO change."""
    from smartbulkcopy_spark.catalog import (
        SQL_LOG_FLUSH_COUNTER,
        SQL_LOG_FLUSH_INSTANCE,
    )

    def sample() -> int:
        instance = conn.scalar(SQL_LOG_FLUSH_INSTANCE)
        sql = SQL_LOG_FLUSH_COUNTER.format(instance=instance)
        return int(conn.scalar(sql) or 0)

    return sample


class CopyMonitor:
    """Heartbeat over a shared executor state.

    ``state`` must expose ``running`` (set of table names), ``queued``
    (int) and is read without locking — values are advisory, exactly like
    the reference's monitor reading its concurrent queue's Count.
    """

    def __init__(
        self,
        destination: str,
        state,
        interval: float = 5.0,
        log: Callable[[str], None] = print,
        clock: Callable[[], float] = time.monotonic,
        sampler: Callable[[], int] | None = None,
    ):
        self.destination = destination
        self.state = state
        self.interval = interval
        self.log = log
        self.clock = clock
        self.sampler = sampler or (lambda: _tree_bytes(destination))
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def tick(self, prev_bytes: int, prev_t: float) -> tuple[int, float]:
        """One sample: measure cumulative destination bytes, log the rate
        line, return the new (bytes, time) baseline. Split out for
        deterministic tests."""
        now_b = self.sampler()
        now_t = self.clock()
        dt = max(now_t - prev_t, 1e-9)
        mb_s = (now_b - prev_bytes) / dt / (1024 * 1024)
        lock = getattr(self.state, "lock", None)
        if lock is not None:
            with lock:
                running = sorted(self.state.running)
        else:
            running = sorted(self.state.running)
        self.log(
            f"Copy rate: {mb_s:.2f} MB/sec, tasks running: {len(running)},"
            f" queue: {self.state.queued}"
            + (f", copying: {', '.join(running)}" if running else "")
        )
        return now_b, now_t

    def _loop(self) -> None:
        prev_b, prev_t = self.sampler(), self.clock()
        while not self._stop.wait(self.interval):
            prev_b, prev_t = self.tick(prev_b, prev_t)

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self._loop, name="sbc-monitor", daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=self.interval + 1)
