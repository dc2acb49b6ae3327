"""Source health checks + diagnostics report (offline-first).

Reference: agrobr/health/checker.py:18-115 (CheckStatus/CheckResult;
the CEPEA check: fetch latency, structural-fingerprint drift vs the
baseline, parser fallback, record count), :245-276 (dispatch +
format), reporter.py:16-150 (summary/failures/warnings, dict/markdown
renderings), doctor.py:22-110 (registry + cache diagnostics).

The reference's checks are live async HTTP probes. Here the fetch is
an injected callable (the engine's HTTP stack, a cassette, or a test
stub) so checks run identically offline; the drift/parse logic reuses
the production fingerprint + consensus machinery (V4/V5) rather than
reimplementing it.
"""

from __future__ import annotations

import datetime as dt
import json
import time
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable


class CheckStatus(str, Enum):
    OK = "ok"
    WARNING = "warning"
    FAILED = "failed"


@dataclass
class CheckResult:
    source: str
    status: CheckStatus
    latency_ms: float
    message: str
    details: dict[str, Any] = field(default_factory=dict)
    timestamp: dt.datetime | None = None

    def to_dict(self) -> dict[str, Any]:
        return {
            "source": self.source,
            "status": self.status.value,
            "latency_ms": round(self.latency_ms, 1),
            "message": self.message,
            "details": self.details,
            "timestamp": self.timestamp.isoformat() if self.timestamp else None,
        }


def check_cepea(
    spark,
    fetch: Callable[[], str],
    baseline_html: str | None = None,
    produto: str = "soja",
    high_latency_ms: float = 5000.0,
) -> CheckResult:
    """CEPEA end-to-end probe (ref checker.py:34-115): fetch latency →
    fingerprint drift vs baseline → versioned parse → record count."""
    from agrobr_spark.sources.connectors.cepea import detect_and_parse
    from agrobr_spark.sources.fingerprint import classify_drift, fingerprint, similarity

    details: dict[str, Any] = {}
    start = time.monotonic()
    try:
        html = fetch()
        latency = (time.monotonic() - start) * 1000
        details["fetch_ok"] = True
        details["latency_ms"] = latency
        warning = None
        if latency > high_latency_ms:
            # record it but KEEP CHECKING — a slow AND broken source
            # must still surface FAILED from the drift/parse gates
            # (the reference returns early here, checker.py:50-58)
            warning = f"High latency: {latency:.0f}ms"
        if baseline_html is not None:
            score = similarity(fingerprint(html), fingerprint(baseline_html))
            details["fingerprint_similarity"] = score
            details["fingerprint_drift"] = classify_drift(score)
            if score < 0.70:
                return CheckResult(
                    "cepea", CheckStatus.FAILED, latency,
                    f"Layout changed significantly: {score:.1%} similarity",
                    details, dt.datetime.now(dt.timezone.utc),
                )
            if score < 0.85:
                warning = "Fingerprint drift detected"
        version, confidence, df = detect_and_parse(spark, html, produto)
        details["parser_confidence"] = confidence
        n = df.count()
        details["parser_version"] = version
        details["records_parsed"] = n
        if n == 0:
            return CheckResult(
                "cepea", CheckStatus.FAILED, latency,
                "Parser returned no results", details,
                dt.datetime.now(dt.timezone.utc),
            )
        status = CheckStatus.WARNING if warning else CheckStatus.OK
        return CheckResult(
            "cepea", status, latency,
            warning or "All checks passed", details,
            dt.datetime.now(dt.timezone.utc),
        )
    except Exception as e:  # noqa: BLE001 — a probe never raises (ref :107-115)
        latency = (time.monotonic() - start) * 1000
        return CheckResult(
            "cepea", CheckStatus.FAILED, latency, str(e), details,
            dt.datetime.now(dt.timezone.utc),
        )


class HealthReport:
    """Aggregate of check results (ref reporter.py:16-150)."""

    def __init__(self, results: list[CheckResult]):
        self.results = results
        self.generated_at = dt.datetime.now(dt.timezone.utc)

    @property
    def failures(self) -> list[CheckResult]:
        return [r for r in self.results if r.status == CheckStatus.FAILED]

    @property
    def warnings(self) -> list[CheckResult]:
        return [r for r in self.results if r.status == CheckStatus.WARNING]

    @property
    def all_passed(self) -> bool:
        return not self.failures

    def summary(self) -> dict[str, Any]:
        return {
            "total": len(self.results),
            "ok": sum(1 for r in self.results if r.status == CheckStatus.OK),
            "warnings": len(self.warnings),
            "failures": len(self.failures),
            "all_passed": self.all_passed,
        }

    def to_dict(self) -> dict[str, Any]:
        return {
            "generated_at": self.generated_at.isoformat(),
            "summary": self.summary(),
            "results": [r.to_dict() for r in self.results],
        }

    def to_json(self, indent: int = 2) -> str:
        return json.dumps(self.to_dict(), indent=indent)

    def to_markdown(self) -> str:
        icon = {CheckStatus.OK: "✅", CheckStatus.WARNING: "⚠️",
                CheckStatus.FAILED: "❌"}
        lines = [
            "# Health Report",
            "",
            f"Generated: {self.generated_at.isoformat()}",
            "",
            "| Source | Status | Latency | Message |",
            "|---|---|---|---|",
        ]
        for r in self.results:
            lines.append(
                f"| {r.source} | {icon[r.status]} {r.status.value} | "
                f"{r.latency_ms:.0f}ms | {r.message} |"
            )
        return "\n".join(lines)


def doctor(spark, store_path: str | None = None) -> dict[str, Any]:
    """Offline diagnostics (ref doctor.py:22-110): registry coverage
    (contracts ↔ connectors ↔ datasets) and store stats."""
    from agrobr_spark.contracts import all_contracts
    from agrobr_spark.datasets.registry import DATASETS
    from agrobr_spark.sources.connectors import _base

    contracts = sorted(all_contracts())
    connectors = sorted(_base.list_connectors())
    conn_prefixes = {c.split(".")[0] for c in connectors}
    orphans = [
        c for c in contracts
        if c not in connectors and c.split(".")[0] not in conn_prefixes
    ]
    result: dict[str, Any] = {
        "contracts": len(contracts),
        "connectors": len(connectors),
        "datasets": len(DATASETS),
        "orphan_contracts": orphans,
    }
    if store_path is not None:
        import os

        n_files = n_bytes = 0
        for root, _, files in os.walk(store_path):
            for f in files:
                if f.endswith(".parquet"):
                    n_files += 1
                    n_bytes += os.path.getsize(os.path.join(root, f))
        result["store"] = {"parquet_files": n_files, "bytes": n_bytes}
    return result
