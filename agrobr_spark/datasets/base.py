"""Priority-fallback resolver + provenance (D1, MetaInfo).

Reference: agrobr/datasets/base.py:30-51 (DatasetSource), :96-165
(_try_sources: iterate by ascending priority, classify failures,
record attempts, raise SourceUnavailableError when all fail);
agrobr/models.py:94-186 (MetaInfo sidecar).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame

from agrobr_spark.contracts import Contract, get_contract
from agrobr_spark.store.snapshot import current_snapshot, snapshot_filter


class SourceUnavailableError(RuntimeError):
    def __init__(self, dataset: str, attempts: list[tuple[str, str, str]]):
        self.attempts = attempts
        msg = "; ".join(f"{s}: {t}: {m}" for s, t, m in attempts)
        super().__init__(f"all sources failed for {dataset}: {msg}")


@dataclass(frozen=True)
class DatasetSource:
    name: str
    priority: int
    fetch_fn: Callable[..., DataFrame]


@dataclass
class MetaInfo:
    """Provenance sidecar (ref: agrobr/models.py:94-186)."""

    dataset: str
    source: str
    fetched_at: float
    fetch_duration_s: float
    records_count: int | None = None  # filled lazily; counting executes the plan
    attempted_sources: list[str] = field(default_factory=list)
    snapshot: str | None = None
    contract: str | None = None
    contract_version: str | None = None


class BaseDataset:
    """A named dataset: sources tried by ascending priority; the first
    DataFrame that passes contract validation wins.

    Per-source column harmonization: a subclass method named
    ``from_<source-name>`` reshapes that source's native schema into
    the dataset's contract schema (ref: the per-source fetch adapters
    in agrobr/datasets/*.py, e.g. producao_anual.py:43-51 renaming
    CONAB's produtividade → PAM's rendimento). ``filter_params`` names
    fetch kwargs applied as equality predicates AFTER normalization —
    declarative filters Catalyst pushes into the scan.
    """

    name: str
    contract_name: str | None = None
    date_col: str = "data"
    filter_params: tuple[str, ...] = ()

    def __init__(self, sources: list[DatasetSource]):
        self.sources = sorted(sources, key=lambda s: s.priority)

    def _contract(self) -> Contract | None:
        return get_contract(self.contract_name) if self.contract_name else None

    def harmonize(self, source: str, df: DataFrame) -> DataFrame:
        """Reshape a source's native schema to the contract schema via
        the subclass's ``from_<source>`` adapter, if one exists."""
        fn = getattr(self, f"from_{source}", None)
        return fn(df) if fn is not None else df

    def normalize(self, df: DataFrame, **kwargs) -> DataFrame:
        """D3 post-fetch normalization hook (inject columns, harmonize
        names, sort). Default: identity."""
        return df

    def _apply_filters(self, df: DataFrame, **kwargs) -> DataFrame:
        from pyspark.sql import functions as F

        for k in self.filter_params:
            v = kwargs.get(k)
            if v is not None and k in df.columns:
                df = df.filter(F.col(k) == v)
        return df

    def fetch(self, validate: bool = True, **kwargs) -> tuple[DataFrame, MetaInfo]:
        attempts: list[tuple[str, str, str]] = []
        contract = self._contract()
        snap = current_snapshot()
        for src in self.sources:
            t0 = time.monotonic()
            try:
                df = src.fetch_fn(**kwargs)
                df = self.harmonize(src.name, df)
                df = self.normalize(df, **kwargs)
                df = self._apply_filters(df, **kwargs)
                if contract is not None:
                    missing = contract.missing_columns(df)
                    if missing:
                        raise ValueError(f"missing contract columns: {missing}")
                    if validate and not contract.is_valid(df):
                        raise ValueError("contract validation failed")
                if self.date_col in df.columns:
                    df = snapshot_filter(df, self.date_col)
                meta = MetaInfo(
                    dataset=self.name,
                    source=src.name,
                    fetched_at=time.time(),
                    fetch_duration_s=time.monotonic() - t0,
                    attempted_sources=[a[0] for a in attempts] + [src.name],
                    snapshot=snap.isoformat() if snap else None,
                    contract=contract.name if contract else None,
                    contract_version=contract.version if contract else None,
                )
                return df, meta
            except Exception as e:  # noqa: BLE001 — classify-and-continue
                kind = type(e).__name__
                attempts.append((src.name, kind, str(e)[:200]))
        raise SourceUnavailableError(self.name, attempts)
