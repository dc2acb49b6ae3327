"""agrobr_spark.benchmark — the public benchmark harness
(ref: agrobr/benchmark/__init__.py:79-270; surface parity is the
point, so these tests pin field names, dict shapes and the summary
line format alongside behavior)."""

from __future__ import annotations

import pytest

from agrobr_spark.benchmark import (
    BenchmarkResult,
    BenchmarkSuite,
    benchmark_query,
    benchmark_sync,
    run_contract_benchmarks,
    run_query_benchmarks,
    run_semantic_benchmarks,
)
from tests.conftest import SF_ORACLE


def test_benchmark_sync_stats_and_warmup():
    calls = []

    def work(x=1):
        calls.append(x)
        return x

    r = benchmark_sync("work", work, iterations=5, warmup=2, x=7)
    assert calls == [7] * 7  # 2 warmup + 5 measured
    assert r.name == "work"
    assert r.iterations == 5
    assert len(r.times_ms) == 5
    assert r.min_time_ms <= r.median_time_ms <= r.max_time_ms
    assert r.total_time_ms == pytest.approx(sum(r.times_ms))
    assert r.metadata["warmup"] == 2

    d = r.to_dict()
    # reference-compatible dict keys (agrobr/benchmark/__init__.py:31-43)
    assert set(d) == {
        "name", "iterations", "total_time_ms", "mean_time_ms",
        "median_time_ms", "min_time_ms", "max_time_ms", "std_dev_ms",
        "timestamp", "metadata",
    }
    assert "mean=" in r.summary() and "(5 iterations)" in r.summary()


def test_benchmark_sync_single_iteration_stdev_zero():
    r = benchmark_sync("one", lambda: None, iterations=1, warmup=0)
    assert r.std_dev_ms == 0
    with pytest.raises(ValueError):
        benchmark_sync("bad", lambda: None, iterations=0)


def test_benchmark_suite_shape():
    s = BenchmarkSuite(name="suite")
    s.add_result(
        BenchmarkResult(
            name="a", iterations=1, total_time_ms=1.0, mean_time_ms=1.0,
            median_time_ms=1.0, min_time_ms=1.0, max_time_ms=1.0,
            std_dev_ms=0.0,
        )
    )
    d = s.to_dict()
    assert d["name"] == "suite" and len(d["results"]) == 1
    assert s.summary().startswith("Benchmark Suite: suite")


def test_benchmark_query_materializes(spark):
    """Each iteration must EXECUTE the plan (not just build it): a
    factory that plants a side effect inside the action proves the
    count ran warmup + iterations times."""
    import pyspark.sql.functions as F

    runs = []

    def factory():
        runs.append(1)
        return spark.range(100).select((F.col("id") * 2).alias("x"))

    r = benchmark_query("q", factory, iterations=3, warmup=1)
    assert len(runs) == 4
    assert r.iterations == 3
    assert r.metadata["action"] == "count"


def test_run_query_benchmarks_skips_unknown(spark):
    suite = run_query_benchmarks(
        spark, SF_ORACLE,
        names=["p1_project_rename", "no_such_query"],
        iterations=1, warmup=0,
    )
    assert [r.name for r in suite.results] == ["p1_project_rename"]


def test_run_contract_benchmarks(spark):
    """The reference's two fixture sizes, each executing the full
    validation plan (ref: agrobr/benchmark/__init__.py:191-240)."""
    suite = run_contract_benchmarks(spark, iterations=1, warmup=0)
    names = [r.name for r in suite.results]
    assert names == ["contract.validate(10 rows)", "contract.validate(1000 rows)"]
    assert suite.name == "contract_validation_benchmarks"
    assert all(r.min_time_ms > 0 for r in suite.results)


def test_run_semantic_benchmarks(spark):
    suite = run_semantic_benchmarks(spark, iterations=1, warmup=0)
    assert [r.name for r in suite.results] == ["validate_semantic(100 rows)"]
    assert suite.name == "semantic_validation_benchmarks"
    assert suite.results[0].min_time_ms > 0


def test_bench_covers_catalog():
    """Bench-coverage invariant (r10 VERDICT next #5): every catalog
    query is either timed in BENCH_QUERIES or carries a documented
    exclusion in BENCH_EXCLUDED; twin/stream-twin exclusions must
    name a representative that IS benched, and the two sets must be
    disjoint with no dangling names. Adding a catalog query without
    deciding its bench fate fails here, not silently."""
    import bench
    from agrobr_spark.queries import queries

    catalog = set(queries())
    benched = set(bench.BENCH_QUERIES)
    excluded = set(bench.BENCH_EXCLUDED)

    assert len(bench.BENCH_QUERIES) == len(benched), "duplicate bench entry"
    assert benched <= catalog, sorted(benched - catalog)
    assert excluded <= catalog, sorted(excluded - catalog)
    assert not (benched & excluded), sorted(benched & excluded)
    uncovered = catalog - benched - excluded
    assert not uncovered, (
        f"catalog queries with no bench decision: {sorted(uncovered)}"
    )

    valid_tags = {"cheap", "stub"}
    for name, reason in bench.BENCH_EXCLUDED.items():
        if reason in valid_tags:
            continue
        kind, _, rep = reason.partition(":")
        assert kind in ("twin", "stream-twin") and rep, (name, reason)
        assert rep in benched, (
            f"{name} excluded as {reason} but representative {rep!r} "
            "is not itself benched"
        )


def test_bench_attempt_policy():
    """The steal-aware retry/selection policy (r12 VERDICT next #2,
    refined r13): retry until a clean attempt exists (cap 4), always
    best-of-2, best-of-3 for >1 s walls; record the MIN wall over ALL
    attempts — a stolen-but-faster attempt bounds the engine's cost
    tighter than a clean-but-slower one (the a18 trace in run
    6a821b89: clean-first selection picked 6.5 s over a 3.1 s attempt
    that carried 1.7 s of steal)."""
    import bench

    need = bench.more_attempts_needed
    # always at least two attempts, even if the first is clean+fast
    assert need([])
    assert need([(0.2, 0.0)])
    # fast + clean after two: stop
    assert not need([(0.2, 0.0), (0.25, 0.0)])
    # slow queries get a third attempt, then stop
    assert need([(2.0, 0.0), (2.1, 0.0)])
    assert not need([(2.0, 0.0), (2.1, 0.0), (2.05, 0.0)])
    # storm-hit so far: keep retrying to the cap
    assert need([(0.2, 5.0), (0.3, 4.0)])
    assert need([(0.2, 5.0), (0.3, 4.0), (0.2, 2.0)])
    assert not need([(0.2, 5.0)] * 4)  # cap

    choose = bench.choose_attempt
    # the a18 trace: min-over-all wins over clean-first, flagged
    # unclean because the chosen wall itself carries >= 1 s of steal
    assert choose([(3.14, 1.74), (15.09, 0.78), (6.51, 0.32)]) == (
        3.14, 1.74, False,
    )
    # clean fastest attempt: chosen and clean
    assert choose([(1.2, 0.0), (3.4, 7.0)]) == (1.2, 0.0, True)
    # all storm-hit: still the min wall, flagged
    w, s, ok = choose([(9.0, 30.0), (7.5, 12.0)])
    assert (w, s, ok) == (7.5, 12.0, False)
