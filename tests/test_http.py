"""HTTP resilience stack: rate limiter, retry/backoff, circuit breaker
(SURVEY §4; ref agrobr/http/*, cepea/client.py). All on a fake clock."""

from __future__ import annotations

import pytest

from agrobr_spark.http import (
    CircuitBreaker,
    CircuitOpenError,
    RateLimiter,
    RetryExhaustedError,
    RetryPolicy,
    resilient_fetch,
    retry_call,
    should_retry_status,
)
from agrobr_spark.http.retry import RetriableStatusError


class FakeClock:
    def __init__(self):
        self.now = 0.0
        self.sleeps: list[float] = []

    def __call__(self) -> float:
        return self.now

    def sleep(self, s: float) -> None:
        self.sleeps.append(s)
        self.now += s


# --- rate limiter -----------------------------------------------------------


def test_rate_limiter_enforces_min_interval():
    clk = FakeClock()
    rl = RateLimiter({"cepea": 2.0}, clock=clk, sleep=clk.sleep)
    with rl.acquire("cepea"):
        pass
    with rl.acquire("cepea"):  # immediately again -> waits 2 s
        pass
    assert clk.sleeps == [2.0]


def test_rate_limiter_no_wait_after_interval():
    clk = FakeClock()
    rl = RateLimiter(default_interval=1.0, clock=clk, sleep=clk.sleep)
    with rl.acquire("ibge"):
        pass
    clk.now += 5.0
    with rl.acquire("ibge"):
        pass
    assert clk.sleeps == []


def test_rate_limiter_per_source_independent():
    clk = FakeClock()
    rl = RateLimiter(default_interval=10.0, clock=clk, sleep=clk.sleep)
    with rl.acquire("a"):
        pass
    with rl.acquire("b"):  # different source, no wait
        pass
    assert clk.sleeps == []


# --- retry ------------------------------------------------------------------


def test_retry_backoff_sequence_and_cap():
    p = RetryPolicy(max_attempts=5, base_delay=1.0, max_delay=30.0)
    assert [p.delay_for(a) for a in range(5)] == [1.0, 2.0, 4.0, 8.0, 16.0]
    assert RetryPolicy(max_delay=5.0).delay_for(10) == 5.0


def test_retry_after_overrides_backoff_capped():
    p = RetryPolicy(base_delay=1.0, max_delay=30.0)
    assert p.delay_for(0, retry_after=7.5) == 7.5
    assert p.delay_for(0, retry_after=120.0) == 30.0


def test_retry_succeeds_midway():
    clk = FakeClock()
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise ConnectionError("boom")
        return "ok"

    assert retry_call(flaky, RetryPolicy(max_attempts=3), sleep=clk.sleep) == "ok"
    assert clk.sleeps == [1.0, 2.0]


def test_retry_exhausted_raises_with_last_error():
    clk = FakeClock()

    def always():
        raise TimeoutError("slow")

    with pytest.raises(RetryExhaustedError) as ei:
        retry_call(always, RetryPolicy(max_attempts=3), sleep=clk.sleep)
    assert ei.value.attempts == 3
    assert isinstance(ei.value.last_error, TimeoutError)
    assert len(clk.sleeps) == 2  # no sleep after the final attempt


def test_retry_status_honors_retry_after_header():
    clk = FakeClock()
    calls = []

    def throttled():
        calls.append(1)
        if len(calls) == 1:
            raise RetriableStatusError(429, retry_after=9.0)
        return "ok"

    assert retry_call(throttled, sleep=clk.sleep) == "ok"
    assert clk.sleeps == [9.0]


def test_non_retriable_status_fails_fast():
    """A 404 RetriableStatusError must NOT burn all attempts: only
    {408, 429, 5xx} are retriable (ref: retry.py:69-74)."""
    clk = FakeClock()
    calls = []

    def not_found():
        calls.append(1)
        raise RetriableStatusError(404)

    with pytest.raises(RetriableStatusError) as ei:
        retry_call(not_found, RetryPolicy(max_attempts=3), sleep=clk.sleep)
    assert ei.value.status_code == 404
    assert len(calls) == 1  # failed fast, no retries
    assert clk.sleeps == []  # and no backoff sleeps


def test_non_retriable_exception_propagates():
    def bad():
        raise ValueError("parse error")

    with pytest.raises(ValueError):
        retry_call(bad, sleep=lambda s: None)


def test_should_retry_status_set():
    for code in (408, 429, 500, 502, 503, 504):
        assert should_retry_status(code)
    for code in (200, 301, 400, 401, 404):
        assert not should_retry_status(code)


# --- circuit breaker --------------------------------------------------------


def test_circuit_opens_and_resets_after_window():
    clk = FakeClock()
    cb = CircuitBreaker(reset_seconds=600.0, clock=clk)
    assert not cb.is_open("cepea")
    cb.record_failure("cepea")
    assert cb.is_open("cepea")
    with pytest.raises(CircuitOpenError):
        cb.check("cepea")
    clk.now += 601.0  # window elapsed -> half-open
    assert not cb.is_open("cepea")
    cb.check("cepea")


def test_circuit_threshold_and_success_reset():
    clk = FakeClock()
    cb = CircuitBreaker(failure_threshold=3, clock=clk)
    cb.record_failure("x")
    cb.record_failure("x")
    assert not cb.is_open("x")
    cb.record_success("x")  # resets the count
    cb.record_failure("x")
    cb.record_failure("x")
    assert not cb.is_open("x")
    cb.record_failure("x")
    assert cb.is_open("x")


# --- composed stack ---------------------------------------------------------


def test_resilient_fetch_full_stack():
    clk = FakeClock()
    rl = RateLimiter({"src": 1.0}, clock=clk, sleep=clk.sleep)
    cb = CircuitBreaker(reset_seconds=600.0, clock=clk)
    calls = []

    def fetch(**kw):
        calls.append(kw)
        if len(calls) < 2:
            raise ConnectionError("transient")
        return {"rows": 3, **kw}

    wrapped = resilient_fetch(
        "src", fetch, rate_limiter=rl, circuit=cb,
        policy=RetryPolicy(max_attempts=3), sleep=clk.sleep,
    )
    assert wrapped(produto="soja") == {"rows": 3, "produto": "soja"}
    assert len(calls) == 2  # one retry
    assert not cb.is_open("src")  # success reset


def test_resilient_fetch_trips_breaker_then_blocks():
    clk = FakeClock()
    cb = CircuitBreaker(reset_seconds=600.0, clock=clk)

    def dead(**kw):
        raise TimeoutError("down")

    wrapped = resilient_fetch(
        "src", dead, circuit=cb,
        policy=RetryPolicy(max_attempts=2), sleep=clk.sleep,
    )
    with pytest.raises(RetryExhaustedError):
        wrapped()
    # breaker now open: the next call fails fast, without fetching
    with pytest.raises(CircuitOpenError):
        wrapped()


def test_resilient_fetch_as_dataset_source(spark):
    """The stack plugs into the D1 resolver: a flaky primary behind
    resilient_fetch retries transparently, provenance intact."""
    import datetime as dt

    from agrobr_spark.datasets import DatasetSource, get_dataset

    clk = FakeClock()
    calls = []

    def flaky_cepea(**kw):
        calls.append(1)
        if len(calls) < 2:
            raise ConnectionError("blip")
        rows = [(dt.date(2024, 1, 1), "soja", "Paranagua", 120.0, "BRL/sc60kg")]
        return spark.createDataFrame(
            rows,
            "data date, produto string, praca string, valor double, unidade string",
        )

    ds = get_dataset(
        "preco_diario",
        [DatasetSource("cepea", 1, resilient_fetch("cepea", flaky_cepea, sleep=clk.sleep))],
    )
    df, meta = ds.fetch()
    assert df.count() == 1
    assert meta.source == "cepea"  # retried inside ONE source attempt
    assert len(calls) == 2


def test_fetch_with_fallbacks_walks_chain():
    """Primary trips (circuit open after failures) → browser slot
    absent in this environment (simulated by a failing callable) →
    mirror answers. Mirrors the reference's httpx → browser → NA
    chain (cepea/client.py:167-205)."""
    from agrobr_spark.http.circuit import CircuitBreaker
    from agrobr_spark.http.resilient import fetch_with_fallbacks, resilient_fetch
    from agrobr_spark.http.retry import RetryPolicy

    calls = {"primary": 0, "browser": 0, "mirror": 0}

    def primary_fetch(**kw):
        calls["primary"] += 1
        raise ConnectionError("403 cloudflare")

    def browser_fetch(**kw):
        calls["browser"] += 1
        raise RuntimeError("no browser runtime in sandbox")

    def mirror_fetch(**kw):
        calls["mirror"] += 1
        return "<html>mirror payload</html>"

    breaker = CircuitBreaker(reset_seconds=600, failure_threshold=1)
    wrapped_primary = resilient_fetch(
        "cepea", primary_fetch, circuit=breaker,
        policy=RetryPolicy(max_attempts=1, base_delay=0), sleep=lambda s: None,
    )
    chain = fetch_with_fallbacks(wrapped_primary, browser_fetch, mirror_fetch)
    assert chain() == "<html>mirror payload</html>"
    assert calls == {"primary": 1, "browser": 1, "mirror": 1}
    # second call: circuit now OPEN — primary is skipped entirely,
    # chain still serves from the mirror
    assert chain() == "<html>mirror payload</html>"
    assert calls["primary"] == 1  # circuit-open short-circuits


def test_fetch_with_fallbacks_raises_with_context():
    from agrobr_spark.http.resilient import fetch_with_fallbacks

    def a(**kw):
        raise ConnectionError("down")

    def b(**kw):
        raise ConnectionError("also down")

    chain = fetch_with_fallbacks(a, b)
    try:
        chain()
        raise AssertionError("expected ConnectionError")
    except ConnectionError as e:
        assert "down" in str(e) and "also down" in str(e)
