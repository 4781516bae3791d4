"""Retry with transient-error classification and linear backoff.

Re-expresses the reference's per-work-item retry loop (reference:
client/SmartBulkCopy.cs:450-607): on a transient failure, sleep
``attempt * delay_increment`` seconds and retry up to ``max_attempt``
times; non-transient errors propagate immediately.

On Spark the *partition-level* retry is the scheduler's job
(spark.task.maxFailures) and parquet job commits are already atomic; this
wrapper is the driver-level retry for whole-table jobs, catalog/DDL
round-trips, and the JDBC staging protocol, where the reference's
transactional semantics live.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass

from smartbulkcopy_spark.config import EngineConfig
from smartbulkcopy_spark.sources.jdbc import TRANSIENT_SQLSERVER_ERRORS


@dataclass
class TransientError(Exception):
    """An error carrying a SQL Server error number, as surfaced by a JDBC
    driver (reference matches SqlException.Number against its transient
    list, client/SmartBulkCopy.cs:21-33)."""

    number: int
    message: str = ""

    def __str__(self) -> str:
        return f"[{self.number}] {self.message}"


# Message fragments that indicate connection-level transience when no
# error number is available (the reference additionally retries
# InvalidOperationException, client/SmartBulkCopy.cs:569-580).
_TRANSIENT_FRAGMENTS = (
    "connection reset",
    "connection refused",
    "broken pipe",
    "timeout expired",
    "internal connection fatal error",
)


def is_transient(exc: BaseException) -> bool:
    if isinstance(exc, TransientError):
        return exc.number in TRANSIENT_SQLSERVER_ERRORS
    if isinstance(exc, (ConnectionError, TimeoutError)):
        return True
    msg = str(exc).lower()
    return any(f in msg for f in _TRANSIENT_FRAGMENTS)


def with_retry(
    fn: Callable,
    config: EngineConfig,
    classify: Callable[[BaseException], bool] = is_transient,
    sleep: Callable[[float], None] = time.sleep,
    log: Callable[[str], None] | None = None,
):
    """Run ``fn`` with the reference's retry policy. The sleep and
    classifier are injectable for deterministic tests."""
    log = log or (lambda *_: None)
    attempt = 0
    while True:
        attempt += 1
        try:
            return fn()
        except BaseException as exc:  # noqa: B036 - classified below
            if attempt >= config.retry_max_attempt or not classify(exc):
                raise
            delay = attempt * config.retry_delay_increment
            log(
                f"transient error (attempt {attempt}/"
                f"{config.retry_max_attempt}): {exc}; retrying in {delay}s"
            )
            sleep(delay)
