"""TTL / expiry policies (M2/M3).

Reference: agrobr/cache/policies.py:32-263 — per-source TTL +
stale-max windows, and CEPEA's publication-time expiry (18:00
America/Sao_Paulo daily: data fetched before today's publication
expires at 18:00 today, after it at 18:00 tomorrow).

These are driver-side scheduling metadata; the store applies them as
plain predicates (``expires_at > now()``) over the KV/cache tables.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass
from zoneinfo import ZoneInfo

SP_TZ = ZoneInfo("America/Sao_Paulo")
PUBLICATION_HOUR = 18  # ref: agrobr/cache/policies.py:29-30


@dataclass(frozen=True)
class ExpiryPolicy:
    source: str
    ttl: dt.timedelta
    stale_max: dt.timedelta
    publication_hour: int | None = None  # local hour in America/Sao_Paulo


POLICIES: dict[str, ExpiryPolicy] = {
    "cepea": ExpiryPolicy(
        "cepea", dt.timedelta(hours=6), dt.timedelta(days=3), PUBLICATION_HOUR
    ),
    "conab": ExpiryPolicy("conab", dt.timedelta(days=1), dt.timedelta(days=14)),
    "ibge": ExpiryPolicy("ibge", dt.timedelta(days=7), dt.timedelta(days=30)),
    "bcb": ExpiryPolicy("bcb", dt.timedelta(days=1), dt.timedelta(days=7)),
    "comexstat": ExpiryPolicy("comexstat", dt.timedelta(days=1), dt.timedelta(days=14)),
    "default": ExpiryPolicy("default", dt.timedelta(hours=12), dt.timedelta(days=7)),
}


def next_expiry(source: str, now: dt.datetime | None = None) -> dt.datetime:
    """Compute expires_at for a row cached at ``now``.

    Publication-time sources expire at the next 18:00 Sao Paulo wall
    clock (ref: policies.py:162-207); others at now + ttl.
    """
    now = now or dt.datetime.now(dt.timezone.utc)
    if now.tzinfo is None:
        now = now.replace(tzinfo=dt.timezone.utc)
    policy = POLICIES.get(source, POLICIES["default"])
    if policy.publication_hour is None:
        return now + policy.ttl
    local = now.astimezone(SP_TZ)
    pub = local.replace(
        hour=policy.publication_hour, minute=0, second=0, microsecond=0
    )
    if local >= pub:
        pub = pub + dt.timedelta(days=1)
    return pub.astimezone(dt.timezone.utc)
