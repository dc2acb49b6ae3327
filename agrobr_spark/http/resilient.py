"""Compose rate limit + circuit breaker + retry around a fetch
callable — the stack every reference client wires by hand
(ref: cepea/client.py:84-110 — RateLimiter.acquire inside
retry_async, circuit consulted before the primary path).

Used by the dataset resolver (D1): wrap a DatasetSource.fetch_fn with
``resilient_fetch`` and the priority-fallback loop gets the full
resilience stack per source.
"""

from __future__ import annotations

from typing import Callable, TypeVar

from agrobr_spark.http.circuit import CircuitBreaker
from agrobr_spark.http.rate_limiter import RateLimiter
from agrobr_spark.http.retry import RetryPolicy, retry_call

T = TypeVar("T")


def resilient_fetch(
    source: str,
    fetch_fn: Callable[..., T],
    rate_limiter: RateLimiter | None = None,
    circuit: CircuitBreaker | None = None,
    policy: RetryPolicy | None = None,
    sleep: Callable[[float], None] | None = None,
) -> Callable[..., T]:
    """Wrap ``fetch_fn`` so every call goes circuit-check → rate-limit
    → retry(fetch). Failures that exhaust the retry policy trip the
    breaker; successes reset it."""

    def wrapped(**kwargs) -> T:
        if circuit is not None:
            circuit.check(source)

        def attempt() -> T:
            if rate_limiter is not None:
                with rate_limiter.acquire(source):
                    return fetch_fn(**kwargs)
            return fetch_fn(**kwargs)

        try:
            result = retry_call(
                attempt, policy, **({"sleep": sleep} if sleep else {})
            )
        except Exception:
            if circuit is not None:
                circuit.record_failure(source)
            raise
        if circuit is not None:
            circuit.record_success(source)
        return result

    wrapped.__name__ = f"resilient_{getattr(fetch_fn, '__name__', source)}"
    return wrapped
