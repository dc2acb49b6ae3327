"""Per-source SLA registry + data-driven freshness evaluation.

Reference: agrobr/sla.py:11-92 (Tier / FreshnessPolicy /
LatencyTarget / AvailabilityTarget / DataQualityTarget / SourceSLA
dataclasses), :94-192 (the four registered SLAs: CEPEA critical with
the Notícias Agrícolas fallback, CONAB + IBGE standard monthly,
Notícias Agrícolas best-effort), :200+ (registry accessors).

The reference evaluates SLAs with live HTTP probes; the Spark engine
additionally evaluates **freshness from data** — one aggregation over
the append-only history store comparing each source's last observed
date against its declared cadence (business-day aware, the same
calendar as store/history.business_day_calendar). At 100 TB the
history scan prunes on the source partition column and aggregates
map-side; nothing here is driver-bound.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field
from enum import Enum

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


class Tier(str, Enum):
    CRITICAL = "critical"
    STANDARD = "standard"
    BEST_EFFORT = "best_effort"


@dataclass(frozen=True)
class FreshnessPolicy:
    update_frequency: str  # daily | weekly | monthly | yearly
    update_time: dt.time | None = None
    timezone: str = "America/Sao_Paulo"
    weekends: bool = False
    holidays: bool = False


@dataclass(frozen=True)
class LatencyTarget:
    p50_ms: int
    p95_ms: int
    p99_ms: int
    timeout_ms: int


@dataclass(frozen=True)
class AvailabilityTarget:
    uptime_pct: float
    planned_maintenance_window: str | None = None
    degraded_mode_available: bool = True


@dataclass(frozen=True)
class DataQualityTarget:
    completeness_pct: float = 99.0
    accuracy_checks: bool = True
    schema_validation: bool = True
    anomaly_detection: bool = True


@dataclass(frozen=True)
class SourceSLA:
    source: str
    tier: Tier
    freshness: FreshnessPolicy
    latency: LatencyTarget
    availability: AvailabilityTarget
    data_quality: DataQualityTarget
    fallback_sources: tuple[str, ...] = ()
    notes: str = ""

    def to_dict(self) -> dict:
        return {
            "source": self.source,
            "tier": self.tier.value,
            "freshness": {
                "update_frequency": self.freshness.update_frequency,
                "update_time": self.freshness.update_time.isoformat()
                if self.freshness.update_time
                else None,
                "timezone": self.freshness.timezone,
                "weekends": self.freshness.weekends,
                "holidays": self.freshness.holidays,
            },
            "latency": vars(self.latency),
            "availability": vars(self.availability),
            "data_quality": vars(self.data_quality),
            "fallback_sources": list(self.fallback_sources),
            "notes": self.notes,
        }


SLA_REGISTRY: dict[str, SourceSLA] = {}


def register_sla(sla: SourceSLA) -> SourceSLA:
    SLA_REGISTRY[sla.source] = sla
    return sla


def get_sla(source: str) -> SourceSLA:
    if source not in SLA_REGISTRY:
        raise KeyError(f"no SLA registered for source {source!r}")
    return SLA_REGISTRY[source]


register_sla(SourceSLA(
    source="cepea",
    tier=Tier.CRITICAL,
    freshness=FreshnessPolicy("daily", dt.time(18, 0)),
    latency=LatencyTarget(500, 2000, 5000, 30000),
    availability=AvailabilityTarget(99.0),
    data_quality=DataQualityTarget(99.0, True, True, True),
    fallback_sources=("noticias_agricolas",),
    notes="CEPEA publica indicadores diários às 18h (ref sla.py:94-122).",
))
register_sla(SourceSLA(
    source="conab",
    tier=Tier.STANDARD,
    freshness=FreshnessPolicy("monthly"),
    latency=LatencyTarget(1000, 3000, 10000, 60000),
    availability=AvailabilityTarget(95.0),
    data_quality=DataQualityTarget(95.0, True, True, False),
    notes="Boletins mensais (ref sla.py:124-149).",
))
register_sla(SourceSLA(
    source="ibge",
    tier=Tier.STANDARD,
    freshness=FreshnessPolicy("monthly"),
    latency=LatencyTarget(800, 2500, 8000, 45000),
    availability=AvailabilityTarget(98.0),
    data_quality=DataQualityTarget(98.0, True, True, False),
    notes="SIDRA API; PAM anual, LSPA mensal (ref sla.py:151-176).",
))
register_sla(SourceSLA(
    source="noticias_agricolas",
    tier=Tier.BEST_EFFORT,
    freshness=FreshnessPolicy("daily", dt.time(19, 0)),
    latency=LatencyTarget(1500, 5000, 15000, 45000),
    availability=AvailabilityTarget(90.0, degraded_mode_available=False),
    data_quality=DataQualityTarget(90.0, False, True, True),
    notes="Espelho CEPEA, melhor esforço (ref sla.py:178-192).",
))

# staleness allowance per declared cadence, in days
_CADENCE_DAYS = {"daily": 1, "weekly": 7, "monthly": 31, "yearly": 366}


def freshness_report(
    history: DataFrame,
    now: dt.date | None = None,
    source_col: str = "source",
    date_col: str = "data",
) -> DataFrame:
    """Freshness status per source from observed history.

    One group-by over (pruned) history: last observed date, its lag in
    days vs ``now``, the SLA cadence allowance (weekend-aware for
    non-weekend sources: a Monday check tolerates Friday data), and a
    fresh/stale verdict. Sources without a registered SLA report with
    a NULL allowance and verdict 'unknown'.
    """
    now = now or dt.date.today()
    sla_rows = [
        (s.source, s.tier.value, s.freshness.update_frequency,
         _CADENCE_DAYS[s.freshness.update_frequency], s.freshness.weekends)
        for s in SLA_REGISTRY.values()
    ]
    spark = history.sparkSession
    slas = spark.createDataFrame(
        sla_rows,
        "source string, tier string, cadencia string, tolerancia_dias int,"
        " fim_de_semana boolean",
    )
    obs = history.groupBy(F.col(source_col).alias("source")).agg(
        F.max(F.col(date_col)).cast("date").alias("ultima_data"),
        F.count(F.lit(1)).alias("n_registros"),
    )
    lag = F.datediff(F.lit(now), F.col("ultima_data"))
    # daily sources that skip weekends get Monday/Sunday slack
    weekend_slack = F.when(
        (F.col("cadencia") == "daily")
        & (~F.col("fim_de_semana"))
        & (F.dayofweek(F.lit(now)).isin(1, 2)),  # Sun=1, Mon=2
        F.lit(2),
    ).otherwise(F.lit(0))
    out = (
        obs.join(F.broadcast(slas), "source", "left")
        .select(
            "source",
            "tier",
            "cadencia",
            "ultima_data",
            "n_registros",
            lag.alias("atraso_dias"),
            (F.col("tolerancia_dias") + weekend_slack).alias("tolerancia_dias"),
            F.when(F.col("tolerancia_dias").isNull(), F.lit("unknown"))
            .when(lag <= F.col("tolerancia_dias") + weekend_slack, F.lit("fresh"))
            .otherwise(F.lit("stale"))
            .alias("status"),
        )
        .orderBy("source")
    )
    return out
