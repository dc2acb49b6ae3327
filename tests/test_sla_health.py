"""SLA registry + data-driven freshness and the offline health-check
surface (ref agrobr/sla.py:94-192, health/checker.py:34-115,
health/reporter.py:16-150, health/doctor.py:22-110)."""

from __future__ import annotations

import datetime as dt
from pathlib import Path

import pytest

from agrobr_spark.health import (
    CheckResult,
    CheckStatus,
    HealthReport,
    check_cepea,
    doctor,
)
from agrobr_spark.sla import SLA_REGISTRY, Tier, freshness_report, get_sla

GOLDEN_HTML = (
    Path(__file__).parent / "golden_data" / "cepea" / "soja_sample" / "response.html"
).read_text()


def test_sla_registry_mirrors_reference():
    # ref sla.py registers exactly these four sources
    assert set(SLA_REGISTRY) == {"cepea", "conab", "ibge", "noticias_agricolas"}
    cepea = get_sla("cepea")
    assert cepea.tier == Tier.CRITICAL
    assert cepea.freshness.update_time == dt.time(18, 0)
    assert cepea.fallback_sources == ("noticias_agricolas",)
    assert get_sla("noticias_agricolas").tier == Tier.BEST_EFFORT
    d = cepea.to_dict()
    assert d["latency"]["p95_ms"] == 2000 and d["tier"] == "critical"
    with pytest.raises(KeyError):
        get_sla("nope")


def test_freshness_report_fresh_stale_unknown(spark):
    hist = spark.createDataFrame(
        [
            ("cepea", "2026-08-12"), ("cepea", "2026-08-11"),
            ("conab", "2026-07-20"),
            ("ibge", "2026-06-01"),
            ("fonte_sem_sla", "2026-08-01"),
        ],
        "source string, data string",
    )
    import pyspark.sql.functions as F

    hist = hist.withColumn("data", F.col("data").cast("date"))
    rows = {
        r.source: r
        for r in freshness_report(hist, now=dt.date(2026, 8, 13)).collect()
    }
    assert rows["cepea"].status == "fresh" and rows["cepea"].atraso_dias == 1
    assert rows["conab"].status == "fresh"  # monthly cadence, 24 days
    assert rows["ibge"].status == "stale"  # 73 days > 31
    assert rows["fonte_sem_sla"].status == "unknown"
    assert rows["fonte_sem_sla"].tolerancia_dias is None


def test_freshness_weekend_slack(spark):
    # Monday 2026-08-17 check: Friday 08-14 data is still fresh for a
    # weekday-only daily source (2-day slack), Thursday data is not
    hist = spark.createDataFrame(
        [("cepea", dt.date(2026, 8, 14))], "source string, data date"
    )
    r = freshness_report(hist, now=dt.date(2026, 8, 17)).collect()[0]
    assert r.status == "fresh" and r.tolerancia_dias == 3
    hist2 = spark.createDataFrame(
        [("cepea", dt.date(2026, 8, 13))], "source string, data date"
    )
    assert freshness_report(hist2, now=dt.date(2026, 8, 17)).collect()[0].status == "stale"


def test_check_cepea_ok_and_drift(spark):
    ok = check_cepea(spark, fetch=lambda: GOLDEN_HTML, baseline_html=GOLDEN_HTML)
    assert ok.status == CheckStatus.OK
    assert ok.details["records_parsed"] == 22  # reference-pinned count
    assert ok.details["fingerprint_similarity"] == 1.0

    # structurally different page vs baseline → failed drift gate
    other = "<html><body><table><tr><td>x</td></tr></table></body></html>"
    drift = check_cepea(spark, fetch=lambda: other, baseline_html=GOLDEN_HTML)
    assert drift.status == CheckStatus.FAILED


def test_check_cepea_probe_never_raises(spark):
    def boom() -> str:
        raise ConnectionError("offline")

    r = check_cepea(spark, fetch=boom)
    assert r.status == CheckStatus.FAILED and "offline" in r.message


def test_health_report_renderings():
    results = [
        CheckResult("cepea", CheckStatus.OK, 120.0, "All checks passed"),
        CheckResult("conab", CheckStatus.WARNING, 900.0, "drift"),
        CheckResult("ibge", CheckStatus.FAILED, 5000.0, "timeout"),
    ]
    rep = HealthReport(results)
    s = rep.summary()
    assert s == {"total": 3, "ok": 1, "warnings": 1, "failures": 1,
                 "all_passed": False}
    assert [r.source for r in rep.failures] == ["ibge"]
    md = rep.to_markdown()
    assert "| cepea |" in md and "timeout" in md
    assert "results" in rep.to_dict() and rep.to_json().startswith("{")


def test_doctor_registry_coverage(tmp_path, spark):
    # every registered contract must have a feeding connector family —
    # the round-2 orphan list (desmatamento, anp, antt, ceasa) is closed
    diag = doctor(spark)
    assert diag["orphan_contracts"] == []
    assert diag["contracts"] >= 30 and diag["datasets"] == 12
    # store stats
    spark.createDataFrame([(1, "a")], "id int, v string").write.parquet(
        str(tmp_path / "t")
    )
    diag2 = doctor(spark, store_path=str(tmp_path))
    assert diag2["store"]["parquet_files"] >= 1
    assert diag2["store"]["bytes"] > 0


# ---- telemetry (ref agrobr/telemetry/collector.py) ----


def test_telemetry_disabled_by_default_and_opt_in():
    from agrobr_spark.telemetry import TelemetryCollector

    sent: list = []
    off = TelemetryCollector(sender=sent.append)
    off.track("fetch", {"source": "cepea"})
    assert off.pending() == 0 and sent == []  # opt-in gate, like the ref

    on = TelemetryCollector(sender=sent.append, enabled=True, batch_size=3)
    on.track_fetch("cepea", "soja", 123.4, from_cache=False)
    on.track_parse_error("conab", 1, "ValueError")
    assert on.pending() == 2 and sent == []
    on.track_cache_operation("get", hit=True)  # fills the batch → flush
    assert on.pending() == 0 and len(sent) == 1 and len(sent[0]) == 3
    evt = sent[0][0]
    assert evt["event"] == "fetch"
    assert evt["properties"]["latency_ms"] == 123.4
    # anonymized: 16-hex instance id, no raw identifiers
    assert len(evt["context"]["instance_id"]) == 16
    int(evt["context"]["instance_id"], 16)


def test_telemetry_sender_failure_never_raises():
    from agrobr_spark.telemetry import TelemetryCollector

    def boom(_events):
        raise ConnectionError("endpoint down")

    t = TelemetryCollector(sender=boom, enabled=True, batch_size=100)
    t.track("x")
    assert t.flush() == 0  # swallowed, buffer cleared


def test_telemetry_events_df(spark):
    from agrobr_spark.telemetry import TelemetryCollector

    t = TelemetryCollector(enabled=True, batch_size=100)
    t.track("fetch", {"source": "b3"})
    t.track("cache", {"hit": True})
    df = t.events_df(spark)
    assert df.count() == 2
    assert set(df.columns) == {"event", "instance_id", "ts", "properties"}
