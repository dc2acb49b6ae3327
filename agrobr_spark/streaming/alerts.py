"""Alert fan-out sink: the `foreachBatch` consumer of the stateful
anomaly stream.

Reference: agrobr/alerts/notifier.py:22-131 — one alert fans out to
every configured channel (Slack blocks / Discord embed / email), each
channel failure is isolated, levels carry emoji+color branding.

Spark-first shape: the anomaly flags come out of
``day_over_day_flags`` (streaming/stateful.py); ``alert_sink``
attaches a ``foreachBatch`` that rolls each micro-batch up to ONE
alert per event_type (never one HTTP call per row — a 100 TB-scale
stream must aggregate before it notifies) and posts through
pluggable channel callables. Network delivery is injected
(``post_fn``), so tests — and this container — run with a recording
fake; a real deployment passes a requests/urllib webhook poster.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


class AlertLevel(str, Enum):
    INFO = "info"
    WARNING = "warning"
    CRITICAL = "critical"


_SLACK_EMOJI = {"info": "info", "warning": "warning", "critical": "rotating_light"}
_SLACK_COLOR = {"info": "#36a64f", "warning": "#ff9800", "critical": "#dc3545"}
_DISCORD_COLOR = {"info": 0x36A64F, "warning": 0xFF9800, "critical": 0xDC3545}


def slack_payload(
    level: AlertLevel, title: str, details: dict[str, Any], source: str | None
) -> dict:
    """Slack blocks payload (ref: notifier.py:56-90)."""
    blocks: list[dict[str, Any]] = [
        {
            "type": "header",
            "text": {
                "type": "plain_text",
                "text": f":{_SLACK_EMOJI[level.value]}: {title}",
            },
        }
    ]
    if source:
        blocks.append({
            "type": "section",
            "fields": [
                {"type": "mrkdwn", "text": f"*Source:* {source}"},
                {"type": "mrkdwn", "text": f"*Level:* {level.value.upper()}"},
            ],
        })
    if details:
        detail_text = json.dumps(details, indent=2, default=str)[:2900]
        blocks.append({
            "type": "section",
            "text": {"type": "mrkdwn", "text": f"```{detail_text}```"},
        })
    return {"attachments": [{"color": _SLACK_COLOR[level.value], "blocks": blocks}]}


def discord_payload(
    level: AlertLevel, title: str, details: dict[str, Any], source: str | None
) -> dict:
    """Discord embed payload (ref: notifier.py:96-121)."""
    embed: dict[str, Any] = {
        "title": f":{_SLACK_EMOJI[level.value]}: {title}",
        "color": _DISCORD_COLOR[level.value],
        "fields": [],
    }
    if source:
        embed["fields"].append({"name": "Source", "value": source, "inline": True})
        embed["fields"].append(
            {"name": "Level", "value": level.value.upper(), "inline": True}
        )
    if details:
        embed["description"] = (
            f"```json\n{json.dumps(details, indent=2, default=str)[:1900]}\n```"
        )
    return {"embeds": [embed]}


@dataclass
class AlertChannel:
    """One delivery target: shapes the payload, posts via post_fn."""

    name: str
    webhook: str
    shape: Callable[[AlertLevel, str, dict, str | None], dict]
    post_fn: Callable[[str, dict], None]


@dataclass
class Notifier:
    """Fan a single alert out to every channel; one channel failing
    never blocks the others (ref: notifier.py:37-53)."""

    channels: list[AlertChannel] = field(default_factory=list)
    failures: list[tuple[str, str]] = field(default_factory=list)

    def send(
        self,
        level: AlertLevel | str,
        title: str,
        details: dict[str, Any],
        source: str | None = None,
    ) -> int:
        if isinstance(level, str):
            level = AlertLevel(level)
        delivered = 0
        for ch in self.channels:
            try:
                ch.post_fn(ch.webhook, ch.shape(level, title, details, source))
                delivered += 1
            except Exception as e:  # noqa: BLE001 — isolate channels
                self.failures.append((ch.name, str(e)))
        return delivered


def summarize_flags(batch: DataFrame) -> list[dict[str, Any]]:
    """Micro-batch → one summary dict per event_type (driver-side;
    the aggregation happens in Spark, only the tiny rollup collects)."""
    rows = (
        batch.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_flags"),
            F.round(F.max(F.abs("variacao_pct")), 2).alias("max_variacao_pct"),
            F.min("ts").alias("primeiro"),
            F.max("ts").alias("ultimo"),
        )
        .collect()
    )
    return [r.asDict() for r in rows]


def alert_sink(
    flags: DataFrame,
    notifier: Notifier,
    threshold_critical_pct: float = 50.0,
    query_name: str = "alert_sink",
    **stream_options,
):
    """Attach the notifier to a streaming flags DataFrame via
    foreachBatch. Returns the StreamingQuery."""

    def deliver(batch: DataFrame, batch_id: int) -> None:
        for summary in summarize_flags(batch):
            level = (
                AlertLevel.CRITICAL
                if summary["max_variacao_pct"] is not None
                and summary["max_variacao_pct"] >= threshold_critical_pct
                else AlertLevel.WARNING
            )
            notifier.send(
                level,
                f"variação anômala: {summary['event_type']}",
                {**summary, "batch_id": batch_id},
                source="stream_stateful_dod",
            )

    return (
        flags.writeStream.outputMode("append")
        .queryName(query_name)
        .foreachBatch(deliver)
        .options(**stream_options)
        .start()
    )
