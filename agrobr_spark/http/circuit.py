"""Circuit breaker: stop hammering a failing source, auto-reset after
a cool-down window.

Reference: agrobr/cepea/client.py:28-74 — a module-level open flag +
opened-at timestamp, 600 s reset; here generalized to per-source
breakers with a failure threshold (the reference opens on the first
hard failure of its primary fetch path, threshold=1 reproduces that).
"""

from __future__ import annotations

import threading
import time
from typing import Callable


class CircuitOpenError(RuntimeError):
    def __init__(self, source: str, remaining_s: float):
        self.source = source
        self.remaining_s = remaining_s
        super().__init__(
            f"circuit open for {source}; resets in {remaining_s:.0f}s"
        )


class CircuitBreaker:
    def __init__(
        self,
        reset_seconds: float = 600.0,
        failure_threshold: int = 1,
        clock: Callable[[], float] = time.monotonic,
    ):
        self._reset = reset_seconds
        self._threshold = failure_threshold
        self._clock = clock
        self._lock = threading.Lock()
        self._failures: dict[str, int] = {}
        self._opened_at: dict[str, float] = {}

    def is_open(self, source: str) -> bool:
        """Open → True until the reset window elapses, then half-open
        (ref: cepea/client.py:55-64)."""
        with self._lock:
            opened = self._opened_at.get(source)
            if opened is None:
                return False
            if self._clock() - opened >= self._reset:
                del self._opened_at[source]
                self._failures[source] = 0
                return False
            return True

    def check(self, source: str) -> None:
        with self._lock:
            opened = self._opened_at.get(source)
        if opened is not None and self.is_open(source):
            remaining = self._reset - (self._clock() - opened)
            raise CircuitOpenError(source, remaining)

    def record_failure(self, source: str) -> None:
        with self._lock:
            n = self._failures.get(source, 0) + 1
            self._failures[source] = n
            if n >= self._threshold and source not in self._opened_at:
                self._opened_at[source] = self._clock()

    def record_success(self, source: str) -> None:
        with self._lock:
            self._failures[source] = 0
            self._opened_at.pop(source, None)
