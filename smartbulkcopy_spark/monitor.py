"""Copy-progress monitor: a heartbeat thread logging throughput, running
tasks, and queue depth.

Re-expresses the reference's monitor task (reference:
client/SmartBulkCopy.cs:665-766): every tick it samples the destination's
write rate — the reference reads the database's log-flush performance
counter; for file destinations we measure destination bytes on disk, the
closest observable — and prints one status line in the same shape
(rate, tasks running, queue depth).
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
    ):
        self.destination = destination
        self.state = state
        self.interval = interval
        self.log = log
        self.clock = clock
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def tick(self, prev_bytes: int, prev_t: float) -> tuple[int, float]:
        """One sample: measure dest bytes, log the rate line, return the
        new (bytes, time) baseline. Split out for deterministic tests."""
        now_b = _tree_bytes(self.destination)
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
        prev_b, prev_t = _tree_bytes(self.destination), self.clock()
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
