"""Retry with exponential backoff + Retry-After override.

Reference: agrobr/http/retry.py:33-150 and constants.py:295-298,359 —
3 attempts, base 1 s, exponential base 2, cap 30 s; a Retry-After
value (seconds) replaces the computed delay, still capped; retriable
statuses {408, 429, 500, 502, 503, 504}; retriable exceptions are
timeout/connection-shaped.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, TypeVar

T = TypeVar("T")

RETRIABLE_STATUS_CODES: frozenset[int] = frozenset(
    {408, 429, 500, 502, 503, 504}
)

RETRIABLE_EXCEPTIONS: tuple[type[Exception], ...] = (
    TimeoutError,
    ConnectionError,
    OSError,
)


def should_retry_status(status_code: int) -> bool:
    return status_code in RETRIABLE_STATUS_CODES


class RetryExhaustedError(RuntimeError):
    def __init__(self, attempts: int, last_error: Exception):
        self.attempts = attempts
        self.last_error = last_error
        super().__init__(f"retry exhausted after {attempts} attempts: {last_error}")


class RetriableStatusError(RuntimeError):
    """Raise from a fetch callable to signal an HTTP-status retry; the
    optional ``retry_after`` mirrors the Retry-After header."""

    def __init__(self, status_code: int, retry_after: float | None = None):
        self.status_code = status_code
        self.retry_after = retry_after
        super().__init__(f"retriable HTTP status {status_code}")


@dataclass(frozen=True)
class RetryPolicy:
    max_attempts: int = 3
    base_delay: float = 1.0
    max_delay: float = 30.0
    exponential_base: float = 2.0
    retriable_exceptions: tuple[type[Exception], ...] = field(
        default=RETRIABLE_EXCEPTIONS
    )

    def delay_for(self, attempt: int, retry_after: float | None = None) -> float:
        """Backoff for 0-based ``attempt``; a server-provided
        Retry-After replaces it (both capped, ref: retry.py:53-61)."""
        if retry_after is not None:
            return min(retry_after, self.max_delay)
        return min(self.base_delay * self.exponential_base**attempt, self.max_delay)


def retry_call(
    fn: Callable[[], T],
    policy: RetryPolicy | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    policy = policy or RetryPolicy()
    exc_types = tuple(policy.retriable_exceptions) + (RetriableStatusError,)
    last: Exception | None = None
    for attempt in range(policy.max_attempts):
        try:
            return fn()
        except exc_types as e:  # noqa: PERF203 — retry loop
            if isinstance(e, RetriableStatusError) and not should_retry_status(
                e.status_code
            ):
                # Non-retriable HTTP status (e.g. 404): fail fast instead
                # of burning the remaining attempts (ref: retry.py:69-74 —
                # only {408,429,5xx} are retried).
                raise
            last = e
            if attempt < policy.max_attempts - 1:
                retry_after = getattr(e, "retry_after", None)
                sleep(policy.delay_for(attempt, retry_after))
    assert last is not None
    raise RetryExhaustedError(policy.max_attempts, last)
