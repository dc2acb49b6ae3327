"""Alert fan-out sink (ref: agrobr/alerts/notifier.py:22-131): payload
shapes, channel isolation, and the foreachBatch delivery path off the
stateful anomaly stream."""

from __future__ import annotations

from agrobr_spark.streaming import read_events_stream
from agrobr_spark.streaming.alerts import (
    AlertChannel,
    AlertLevel,
    Notifier,
    alert_sink,
    discord_payload,
    slack_payload,
    summarize_flags,
)
from agrobr_spark.streaming.stateful import day_over_day_flags
from tests.conftest import SF_SMOKE


class RecordingPoster:
    def __init__(self, fail: bool = False):
        self.sent: list[tuple[str, dict]] = []
        self.fail = fail

    def __call__(self, webhook: str, payload: dict) -> None:
        if self.fail:
            raise ConnectionError("webhook down")
        self.sent.append((webhook, payload))


def _notifier(*posters):
    shapes = [slack_payload, discord_payload]
    return Notifier(channels=[
        AlertChannel(f"ch{i}", f"https://hooks.example/{i}", shapes[i % 2], p)
        for i, p in enumerate(posters)
    ])


def test_slack_payload_shape():
    p = slack_payload(AlertLevel.CRITICAL, "t", {"n": 3}, "stream")
    att = p["attachments"][0]
    assert att["color"] == "#dc3545"
    assert att["blocks"][0]["text"]["text"].startswith(":rotating_light:")
    fields = att["blocks"][1]["fields"]
    assert any("CRITICAL" in f["text"] for f in fields)
    assert "```" in att["blocks"][2]["text"]["text"]


def test_discord_payload_shape():
    p = discord_payload(AlertLevel.WARNING, "t", {"n": 3}, "stream")
    embed = p["embeds"][0]
    assert embed["color"] == 0xFF9800
    assert any(f["value"] == "WARNING" for f in embed["fields"])


def test_notifier_fans_out_and_isolates_failures():
    ok1, dead, ok2 = RecordingPoster(), RecordingPoster(fail=True), RecordingPoster()
    n = _notifier(ok1, dead, ok2)
    delivered = n.send("warning", "title", {"x": 1}, source="s")
    assert delivered == 2
    assert len(ok1.sent) == 1 and len(ok2.sent) == 1
    assert n.failures == [("ch1", "webhook down")]


def test_alert_sink_delivers_batch_summaries(spark):
    """End-to-end: events stream → stateful flags → foreachBatch sink
    → one rolled-up alert per event_type per micro-batch."""
    poster = RecordingPoster()
    notifier = _notifier(poster)
    events = read_events_stream(spark, SF_SMOKE).select(
        "event_type", "event_id", "ts", "value"
    )
    flags = day_over_day_flags(events, threshold_pct=20.0)
    q = alert_sink(flags, notifier, threshold_critical_pct=50.0)
    q.processAllAvailable()
    q.stop()

    assert len(poster.sent) > 0
    # one alert per event_type per batch, not per row
    titles = [p["attachments"][0]["blocks"][0]["text"]["text"] for _, p in poster.sent]
    assert all("variação anômala" in t for t in titles)
    distinct_types = {t.split(": ", 1)[1] for t in titles}
    assert len(poster.sent) == len(distinct_types)  # single batch => rolled up
    assert notifier.failures == []


def test_summarize_flags_rollup(spark):
    import datetime as dt

    rows = [
        ("soja", 1, dt.datetime(2024, 1, 1), 10.0, 5.0, 100.0),
        ("soja", 2, dt.datetime(2024, 1, 2), 5.0, 10.0, -50.0),
        ("milho", 3, dt.datetime(2024, 1, 1), 2.0, 1.0, 100.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_type string, event_id long, ts timestamp, value double, "
        "valor_anterior double, variacao_pct double",
    )
    out = {s["event_type"]: s for s in summarize_flags(df)}
    assert out["soja"]["n_flags"] == 2
    assert out["soja"]["max_variacao_pct"] == 100.0
    assert out["milho"]["n_flags"] == 1
