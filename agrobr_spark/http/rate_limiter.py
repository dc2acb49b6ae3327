"""Per-source rate limiter: serialize requests per source and enforce
a minimum interval between them.

Reference: agrobr/http/rate_limiter.py:40-67 — one semaphore per
source key plus a last-request timestamp; a new request inside the
min-interval window sleeps the remainder. Re-expressed sync (the
engine's fetch path is driver-side and synchronous) with injectable
clock/sleep.
"""

from __future__ import annotations

import threading
import time
from contextlib import contextmanager
from typing import Callable

DEFAULT_INTERVAL_S = 1.0


class RateLimiter:
    def __init__(
        self,
        intervals: dict[str, float] | None = None,
        default_interval: float = DEFAULT_INTERVAL_S,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self._intervals = dict(intervals or {})
        self._default = default_interval
        self._clock = clock
        self._sleep = sleep
        self._locks: dict[str, threading.Lock] = {}
        self._last: dict[str, float] = {}
        self._registry_lock = threading.Lock()

    def interval_for(self, source: str) -> float:
        return self._intervals.get(source, self._default)

    def _lock_for(self, source: str) -> threading.Lock:
        with self._registry_lock:
            if source not in self._locks:
                self._locks[source] = threading.Lock()
            return self._locks[source]

    @contextmanager
    def acquire(self, source: str):
        """Serialize per source; wait out the min interval, stamp the
        last-request time on exit (ref: rate_limiter.py:46-67)."""
        with self._lock_for(source):
            now = self._clock()
            elapsed = now - self._last.get(source, float("-inf"))
            wait = self.interval_for(source) - elapsed
            if wait > 0:
                self._sleep(wait)
            try:
                yield
            finally:
                self._last[source] = self._clock()

    def reset(self) -> None:
        with self._registry_lock:
            self._locks.clear()
            self._last.clear()
