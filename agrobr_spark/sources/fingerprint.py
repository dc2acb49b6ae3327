"""V4: structural fingerprinting + V5: parser consensus voting —
ingest-time layout-drift guards.

Reference: agrobr/validators/structural.py:14-156 (layout fingerprint:
structure hash, table classes/ids/headers, element counts; weighted
similarity vs baseline with thresholds 0.85/0.70/0.50; Jaccard on
header sets) and agrobr/cepea/parsers/consensus.py:41-236 (run N
parser versions, diverge on count/first/last within tolerance, pick
latest-or-max-count, alert on divergence).

Driver-side by design: both operate on a single raw payload BEFORE it
becomes a DataFrame. The consensus compare for DataFrame-producing
parsers uses ``exceptAll`` counts (set-difference on rows), which
distributes.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

from agrobr_spark.sources.html import _TABLE_RE, extract_tables

_TAG_OPEN_RE = re.compile(r"<([a-zA-Z][a-zA-Z0-9]*)\b")

# similarity component weights (ref: structural.py weighted similarity)
_WEIGHTS = {
    "headers": 0.30,
    "structure": 0.25,
    "classes": 0.20,
    "ids": 0.15,
    "counts": 0.10,
}
THRESHOLD_OK = 0.85
THRESHOLD_WARN = 0.70
THRESHOLD_DRIFT = 0.50


@dataclass
class Fingerprint:
    structure_hash: str
    table_attrs: frozenset[str]
    headers: frozenset[str]
    element_counts: dict[str, int] = field(default_factory=dict)


def fingerprint(html: str) -> Fingerprint:
    """Layout fingerprint of an HTML payload."""
    tags = [t.lower() for t in _TAG_OPEN_RE.findall(html)]
    counts: dict[str, int] = {}
    for t in tags:
        counts[t] = counts.get(t, 0) + 1
    structure = hashlib.sha256(">".join(tags).encode()).hexdigest()[:16]
    tables = extract_tables(html)
    attrs = frozenset(a for t in tables for a in t["attrs"])
    headers = frozenset(h.lower() for t in tables for h in t["headers"])
    return Fingerprint(structure, attrs, headers, counts)


def _jaccard(a: frozenset, b: frozenset) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def similarity(a: Fingerprint, b: Fingerprint) -> float:
    """Weighted layout similarity in [0, 1]."""
    counts_keys = set(a.element_counts) | set(b.element_counts)
    if counts_keys:
        diffs = [
            min(a.element_counts.get(k, 0), b.element_counts.get(k, 0))
            / max(a.element_counts.get(k, 0), b.element_counts.get(k, 0), 1)
            for k in counts_keys
        ]
        counts_sim = sum(diffs) / len(diffs)
    else:
        counts_sim = 1.0
    return (
        _WEIGHTS["headers"] * _jaccard(a.headers, b.headers)
        + _WEIGHTS["structure"] * (1.0 if a.structure_hash == b.structure_hash else 0.0)
        + _WEIGHTS["classes"] * _jaccard(a.table_attrs, b.table_attrs)
        + _WEIGHTS["ids"] * _jaccard(a.table_attrs, b.table_attrs)
        + _WEIGHTS["counts"] * counts_sim
    )


def classify_drift(score: float) -> str:
    if score >= THRESHOLD_OK:
        return "ok"
    if score >= THRESHOLD_WARN:
        return "warn"
    if score >= THRESHOLD_DRIFT:
        return "drift"
    return "breaking"


# --- V5 consensus ---


@dataclass
class ParserResult:
    version: str
    df: object  # DataFrame


def consensus(
    results: list[ParserResult],
    tolerance_rows: int = 0,
) -> tuple[ParserResult, list[str]]:
    """Run-off between parser versions: pairwise row set-difference via
    ``exceptAll`` counts; pick the latest version, report divergences
    (ref: consensus.py pick-latest-or-max-count policy)."""
    if not results:
        raise ValueError("no parser results")
    divergences: list[str] = []
    winner = max(results, key=lambda r: r.version)
    for r in results:
        if r.version == winner.version:
            continue
        extra = r.df.exceptAll(winner.df).count()
        missing = winner.df.exceptAll(r.df).count()
        if extra + missing > tolerance_rows:
            divergences.append(
                f"{r.version} vs {winner.version}: +{extra}/-{missing} rows"
            )
    return winner, divergences
