"""Library-level benchmark API (SURVEY §2 parity gap closed in r8).

The reference ships a public benchmark harness a user can call to
time their own contracts, rules, and API calls — ``benchmark_sync`` /
``benchmark_async`` (warmup + iterations, mean/median/min/max/stdev)
plus ``run_api_benchmarks`` / ``run_contract_benchmarks`` /
``run_semantic_benchmarks`` (ref: agrobr/benchmark/__init__.py:79-270;
its tests/benchmark_report.md numbers come from exactly this harness).

Spark-first re-expression: the result/suite dataclasses and the
sync harness keep the reference's exact surface (same field names,
same ``to_dict``/``summary`` shape, so downstream report tooling is
drop-in); the async variant becomes :func:`benchmark_query`, which
times a LAZY DataFrame factory by forcing a real materialization per
iteration (``count()`` after cache-clear — timing ``fn()`` alone
would measure plan construction, not execution). The three ``run_*``
entry points benchmark the engine's own surfaces: catalog queries,
contract validation plans, and the one-pass semantic rule runner.

Timings on a shared host include CPU steal; for regression verdicts
use ``min_time_ms`` (the reference reports it too) and compare
ratios across data sizes, not wall clocks across days.
"""

from __future__ import annotations

import statistics
import time
from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "BenchmarkResult",
    "BenchmarkSuite",
    "benchmark_sync",
    "benchmark_query",
    "run_query_benchmarks",
    "run_contract_benchmarks",
    "run_semantic_benchmarks",
]


@dataclass
class BenchmarkResult:
    """One benchmarked callable (ref: agrobr/benchmark/__init__.py:17-53 —
    same fields, same rounding in ``to_dict``, same ``summary`` line)."""

    name: str
    iterations: int
    total_time_ms: float
    mean_time_ms: float
    median_time_ms: float
    min_time_ms: float
    max_time_ms: float
    std_dev_ms: float
    times_ms: list[float] = field(default_factory=list)
    timestamp: datetime = field(
        default_factory=lambda: datetime.now(timezone.utc)
    )
    metadata: dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "iterations": self.iterations,
            "total_time_ms": round(self.total_time_ms, 2),
            "mean_time_ms": round(self.mean_time_ms, 2),
            "median_time_ms": round(self.median_time_ms, 2),
            "min_time_ms": round(self.min_time_ms, 2),
            "max_time_ms": round(self.max_time_ms, 2),
            "std_dev_ms": round(self.std_dev_ms, 2),
            "timestamp": self.timestamp.isoformat(),
            "metadata": self.metadata,
        }

    def summary(self) -> str:
        return (
            f"{self.name}: "
            f"mean={self.mean_time_ms:.2f}ms, "
            f"median={self.median_time_ms:.2f}ms, "
            f"min={self.min_time_ms:.2f}ms, "
            f"max={self.max_time_ms:.2f}ms "
            f"({self.iterations} iterations)"
        )


@dataclass
class BenchmarkSuite:
    """Named collection of results (ref: agrobr/benchmark/__init__.py:56-76)."""

    name: str
    results: list[BenchmarkResult] = field(default_factory=list)
    timestamp: datetime = field(
        default_factory=lambda: datetime.now(timezone.utc)
    )

    def add_result(self, result: BenchmarkResult) -> None:
        self.results.append(result)

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "timestamp": self.timestamp.isoformat(),
            "results": [r.to_dict() for r in self.results],
        }

    def summary(self) -> str:
        lines = [f"Benchmark Suite: {self.name}", "=" * 50]
        for result in self.results:
            lines.append(result.summary())
        return "\n".join(lines)


def _result_from_times(
    name: str, times: list[float], warmup: int, metadata: dict[str, Any]
) -> BenchmarkResult:
    return BenchmarkResult(
        name=name,
        iterations=len(times),
        total_time_ms=sum(times),
        mean_time_ms=statistics.mean(times),
        median_time_ms=statistics.median(times),
        min_time_ms=min(times),
        max_time_ms=max(times),
        std_dev_ms=statistics.stdev(times) if len(times) > 1 else 0,
        times_ms=times,
        metadata={"warmup": warmup, **metadata},
    )


def benchmark_sync(
    name: str,
    func: Callable[..., Any],
    iterations: int = 10,
    warmup: int = 1,
    **kwargs: Any,
) -> BenchmarkResult:
    """Time a synchronous callable: ``warmup`` unmeasured calls, then
    ``iterations`` measured ones (ref: agrobr/benchmark/__init__.py:110-138,
    surface-identical). If the callable returns a DataFrame, only plan
    construction is timed — use :func:`benchmark_query` for execution."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    for _ in range(warmup):
        func(**kwargs)
    times: list[float] = []
    for _ in range(iterations):
        start = time.perf_counter()
        func(**kwargs)
        times.append((time.perf_counter() - start) * 1000)
    return _result_from_times(name, times, warmup, {"kwargs": str(kwargs)})


def benchmark_query(
    name: str,
    fn: Callable[..., DataFrame],
    iterations: int = 3,
    warmup: int = 1,
    action: Callable[[DataFrame], Any] | None = None,
    **kwargs: Any,
) -> BenchmarkResult:
    """Time a DataFrame factory END TO END: each iteration rebuilds
    the plan, runs a full materializing action (default ``count()``),
    and clears the session cache afterwards so every run pays its own
    scan/shuffle cost — nothing rides a prior iteration's cache. The
    Spark twin of the reference's ``benchmark_async`` (its async API
    calls are this engine's lazy query plans)."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    act = action or (lambda df: df.count())
    spark: SparkSession | None = None
    for _ in range(warmup):
        df = fn(**kwargs)
        spark = df.sparkSession
        act(df)
        spark.catalog.clearCache()
    times: list[float] = []
    for _ in range(iterations):
        start = time.perf_counter()
        df = fn(**kwargs)
        act(df)
        times.append((time.perf_counter() - start) * 1000)
        (spark or df.sparkSession).catalog.clearCache()
    return _result_from_times(
        name, times, warmup, {"kwargs": str(kwargs), "action": "count"}
    )


def run_query_benchmarks(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
    iterations: int = 3,
    warmup: int = 1,
) -> BenchmarkSuite:
    """Benchmark catalog queries by name (the engine analog of the
    reference's ``run_api_benchmarks`` over its dataset fetchers).
    Unknown names are skipped, mirroring the reference's
    keep-going-on-failure behavior."""
    from agrobr_spark.queries import queries

    catalog = queries()
    picks = names if names is not None else sorted(catalog)
    suite = BenchmarkSuite(name="agrobr_spark_query_benchmarks")
    for name in picks:
        fn = catalog.get(name)
        if fn is None:
            continue
        suite.add_result(
            benchmark_query(
                name,
                lambda fn=fn: fn(spark, sf_dir),
                iterations=iterations,
                warmup=warmup,
            )
        )
    return suite


def _indicador_frame(spark: SparkSession, rows: int) -> DataFrame:
    """The reference's contract-benchmark fixture shape
    (ref: agrobr/benchmark/__init__.py:198-230: a cepea.indicador
    frame at 10 and 1000 rows), built as a Spark frame."""
    import pyspark.sql.functions as F

    return spark.range(rows).select(
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias(
            "data"
        ),
        F.lit("soja").alias("produto"),
        F.lit("paranagua").alias("praca"),
        F.lit(150.0).alias("valor"),
        F.lit("BRL/sc60kg").alias("unidade"),
        F.lit("cepea").alias("fonte"),
    )


def run_contract_benchmarks(
    spark: SparkSession, iterations: int = 5, warmup: int = 1
) -> BenchmarkSuite:
    """Benchmark contract validation at the reference's two fixture
    sizes (10 / 1000 rows; ref: agrobr/benchmark/__init__.py:191-240).
    Each iteration executes the contract's full two-branch validation
    plan (column checks + PK duplicate count), not just plan
    construction. Iterations default lower than the reference's 100:
    a Spark job launch is ~ms-scale fixed cost, and min-of-5 is the
    stable statistic under host noise."""
    from agrobr_spark.contracts import get_contract

    contract = get_contract("cepea.indicador")
    suite = BenchmarkSuite(name="contract_validation_benchmarks")
    for rows in (10, 1000):
        df = _indicador_frame(spark, rows).localCheckpoint(eager=True)
        suite.add_result(
            benchmark_query(
                f"contract.validate({rows} rows)",
                lambda df=df: contract.validation_query(df),
                iterations=iterations,
                warmup=warmup,
            )
        )
        df.unpersist()
    return suite


def run_semantic_benchmarks(
    spark: SparkSession, iterations: int = 5, warmup: int = 1
) -> BenchmarkSuite:
    """Benchmark the one-pass semantic rule runner on the reference's
    100-row fixture shape (ref: agrobr/benchmark/__init__.py:243-270)."""
    import pyspark.sql.functions as F

    from agrobr_spark.validators.semantic import run_rules

    df = (
        spark.range(100)
        .select(
            F.date_add(
                F.lit("2024-01-01").cast("date"), F.col("id").cast("int")
            ).alias("data"),
            (F.lit(150.0) + F.col("id") * 0.5).alias("valor"),
            F.lit("soja").alias("produto"),
            F.lit(3500.0).alias("produtividade"),
            F.lit(1000.0).alias("area_plantada"),
            F.lit(950.0).alias("area_colhida"),
            F.lit("2024/25").alias("safra"),
        )
        .localCheckpoint(eager=True)
    )
    suite = BenchmarkSuite(name="semantic_validation_benchmarks")
    suite.add_result(
        benchmark_query(
            "validate_semantic(100 rows)",
            lambda: run_rules(df),
            iterations=iterations,
            warmup=warmup,
        )
    )
    df.unpersist()
    return suite
