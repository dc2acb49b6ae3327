"""Driver-side HTTP resilience: rate limiting, retry with backoff,
circuit breaking (SURVEY §4 — control plane around the engine, the
Spark plans themselves never block on these).

Reference semantics: agrobr/http/rate_limiter.py:40-67 (per-source
serialization + min interval), http/retry.py:33-150 (exponential
backoff capped, Retry-After override, retriable exception/status
sets), cepea/client.py:28-74 (open/half-open circuit with a reset
window).

Everything takes an injectable ``clock``/``sleep`` so tests run on a
fake clock; nothing here imports an HTTP client — callers wrap
whatever fetch callable they have (a requests call, a file read, a
cached-parquet load).
"""

from agrobr_spark.http.circuit import CircuitBreaker, CircuitOpenError
from agrobr_spark.http.rate_limiter import RateLimiter
from agrobr_spark.http.retry import (
    RETRIABLE_STATUS_CODES,
    RetryExhaustedError,
    RetryPolicy,
    retry_call,
    should_retry_status,
)
from agrobr_spark.http.resilient import resilient_fetch

__all__ = [
    "CircuitBreaker",
    "CircuitOpenError",
    "RateLimiter",
    "RETRIABLE_STATUS_CODES",
    "RetryExhaustedError",
    "RetryPolicy",
    "retry_call",
    "should_retry_status",
    "resilient_fetch",
]
