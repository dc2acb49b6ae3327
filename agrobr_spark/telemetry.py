"""Opt-in usage telemetry (buffered, anonymized, injectable sink).

Reference: agrobr/telemetry/collector.py:19-116 — a batched event
buffer (anonymized sha256 instance id, package/python/os context),
flushed to an HTTP endpoint when the batch fills, with
``track_fetch`` / ``track_parse_error`` / ``track_cache_operation``
helpers. **Disabled unless explicitly enabled**, exactly like the
reference's settings gate.

Differences fitting the engine context: the sender is an injected
callable (the HTTP stack, a file, a Kafka producer — tests use a
list), synchronous + thread-safe (no event loop requirement inside
Spark jobs), and the buffer can be handed to Spark as a DataFrame for
operational analytics (``events_df``).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import os
import platform
import threading
import uuid
from typing import Any, Callable

DEFAULT_BATCH_SIZE = 20

_ENABLE_ENV = "AGROBR_SPARK_TELEMETRY"


class TelemetryCollector:
    """Buffered event collector; flushes via the injected sender."""

    def __init__(
        self,
        sender: Callable[[list[dict[str, Any]]], None] | None = None,
        batch_size: int = DEFAULT_BATCH_SIZE,
        enabled: bool | None = None,
    ) -> None:
        self._sender = sender
        self.batch_size = batch_size
        self.enabled = (
            enabled
            if enabled is not None
            else os.environ.get(_ENABLE_ENV, "").lower() in ("1", "true", "on")
        )
        self._buffer: list[dict[str, Any]] = []
        self._lock = threading.Lock()
        self._instance_id: str | None = None

    def instance_id(self) -> str:
        """Anonymized, stable per machine (sha256 of the MAC node —
        ref collector.py:25-29; never the raw identifier)."""
        if self._instance_id is None:
            machine_id = uuid.getnode().to_bytes(6, "big")
            self._instance_id = hashlib.sha256(machine_id).hexdigest()[:16]
        return self._instance_id

    def context(self) -> dict[str, Any]:
        return {
            "instance_id": self.instance_id(),
            "python_version": platform.python_version(),
            "os": platform.system(),
            "timestamp": dt.datetime.now(dt.timezone.utc).isoformat(),
        }

    def track(self, event: str, properties: dict[str, Any] | None = None) -> None:
        if not self.enabled:
            return
        payload = {
            "event": event,
            "context": self.context(),
            "properties": properties or {},
        }
        flush_now = False
        with self._lock:
            self._buffer.append(payload)
            flush_now = len(self._buffer) >= self.batch_size
        if flush_now:
            self.flush()

    def flush(self) -> int:
        """Send and clear the buffer; returns events sent. A failing
        sender never raises (telemetry must never break the pipeline,
        ref collector.py:84-86)."""
        with self._lock:
            events, self._buffer = self._buffer, []
        if not events or self._sender is None:
            return 0
        try:
            self._sender(events)
        except Exception:  # noqa: BLE001 — best-effort by design
            return 0
        return len(events)

    def pending(self) -> int:
        with self._lock:
            return len(self._buffer)

    def events_df(self, spark):
        """Current buffer as a DataFrame (operational analytics)."""
        with self._lock:
            rows = [
                (
                    e["event"],
                    e["context"]["instance_id"],
                    e["context"]["timestamp"],
                    str(e["properties"]),
                )
                for e in self._buffer
            ]
        return spark.createDataFrame(
            rows, "event string, instance_id string, ts string, properties string"
        )

    # ---- reference helper surface (collector.py:93-126) ----

    def track_fetch(
        self, source: str, produto: str, latency_ms: float, from_cache: bool
    ) -> None:
        self.track(
            "fetch",
            {
                "source": source,
                "produto": produto,
                "latency_ms": round(latency_ms, 1),
                "from_cache": from_cache,
            },
        )

    def track_parse_error(
        self, source: str, parser_version: int, error_type: str
    ) -> None:
        self.track(
            "parse_error",
            {
                "source": source,
                "parser_version": parser_version,
                "error_type": error_type,
            },
        )

    def track_cache_operation(self, operation: str, hit: bool) -> None:
        self.track("cache", {"operation": operation, "hit": hit})
