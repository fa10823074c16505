"""Small cross-cutting utilities mirroring DataX common/util.

- ``execute_with_retry``: RetryUtil.executeWithRetry analog
  (common/.../util/RetryUtil.java:19-30) — bounded retries with
  optional exponential backoff around flaky client calls.
- ``RateLimiter``: the Channel bps/tps throttle analog
  (core/.../transport/channel/Channel.java:176-239) — sleeps just
  enough to keep a cumulative rate under budget; used by
  apply_segments for batch-mode rate limiting (streaming uses
  maxFilesPerTrigger natively).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")


def execute_with_retry(
    fn: Callable[[], T],
    retry_times: int = 3,
    sleep_sec: float = 1.0,
    exponential: bool = True,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
) -> T:
    """Run ``fn`` with up to ``retry_times`` attempts.

    Sleeps ``sleep_sec`` (doubling each attempt when ``exponential``)
    between failures; re-raises the last error.
    """
    if retry_times < 1:
        raise ValueError("retry_times must be >= 1")
    delay = sleep_sec
    for attempt in range(retry_times):
        try:
            return fn()
        except retry_on:
            if attempt == retry_times - 1:
                raise
            time.sleep(delay)
            if exponential:
                delay *= 2
    raise AssertionError("unreachable")


class RateLimiter:
    """Cumulative-rate throttle: ``admit(n)`` sleeps so that the overall
    units/sec stays <= ``per_sec``. Call once per batch with the batch's
    record (tps) or byte (bps) count."""

    def __init__(self, per_sec: float):
        if per_sec <= 0:
            raise ValueError("per_sec must be positive")
        self.per_sec = per_sec
        self._start: float | None = None
        self._consumed = 0.0

    def admit(self, n: float) -> float:
        """Account ``n`` units; sleep if over budget. Returns the sleep."""
        now = time.monotonic()
        if self._start is None:
            self._start = now
        self._consumed += n
        target = self._consumed / self.per_sec  # seconds the budget allows
        elapsed = now - self._start
        wait = target - elapsed
        if wait > 0:
            time.sleep(wait)
            return wait
        return 0.0
