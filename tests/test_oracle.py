"""Every catalog query with an oracle must hash-match DuckDB at sf0.01,
and rows-only queries must at least execute and return a stable schema."""

from __future__ import annotations

import pytest

from agrobr_spark.queries import catalog
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare_query, duckdb_con

_CATALOG = catalog()
_WITH_ORACLE = sorted(n for n, e in _CATALOG.items() if e.oracle is not None)
_ROWS_ONLY = sorted(n for n, e in _CATALOG.items() if e.oracle is None)


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_match(spark, con, name):
    e = _CATALOG[name]
    res = compare_query(spark, con, name, e.fn, e.oracle, SF_ORACLE)
    assert res.ok, f"{name}: {res.detail} (spark={res.spark_rows}, oracle={res.oracle_rows})"
    assert res.spark_rows > 0, f"{name}: empty result weakens the check"


# When every catalog entry carries an oracle (the healthy state since
# round 3) this parameter set is empty and the single resulting skip is
# deliberate: the test exists so any future oracle-less query still
# gets a smoke run, and the skip reason below makes the suite output
# self-explaining rather than a mystery "1 skipped".
@pytest.mark.parametrize(
    "name",
    _ROWS_ONLY
    or [
        pytest.param(
            None,
            marks=pytest.mark.skip(
                reason="all catalog queries carry a DuckDB oracle; "
                "nothing is rows-only"
            ),
        )
    ],
)
def test_rows_only_runs(spark, name):
    e = _CATALOG[name]
    df = e.fn(spark, SF_ORACLE)
    assert len(df.columns) > 0
    assert df.count() >= 0
