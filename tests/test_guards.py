"""Ingest guards (V4 fingerprint, V5 consensus) + M2 KV cache."""

from __future__ import annotations

import datetime as dt

import pytest

from agrobr_spark.sources.fingerprint import (
    ParserResult,
    classify_drift,
    consensus,
    fingerprint,
    similarity,
)
from agrobr_spark.store.kv_cache import KVCache, cache_key

_PAGE = """
<html><body><div class="main">
<table id="indicador"><tr><th>Data</th><th>Valor</th></tr>
<tr><td>31/01/2024</td><td>124,58</td></tr></table>
</div></body></html>
"""

_PAGE_DRIFTED = """
<html><body><nav>menu</nav><div class="layout-v2"><section>
<table class="grid-novo"><tr><th>Período</th><th>Cotação</th><th>Var</th></tr>
<tr><td>x</td><td>y</td><td>z</td></tr></table>
<table class="ads"><tr><th>Anúncio</th></tr><tr><td>!</td></tr></table>
</section></div></body></html>
"""


def test_fingerprint_similarity_and_thresholds():
    fp = fingerprint(_PAGE)
    assert similarity(fp, fp) == pytest.approx(1.0)
    assert classify_drift(similarity(fp, fp)) == "ok"

    fp2 = fingerprint(_PAGE_DRIFTED)
    s = similarity(fp, fp2)
    assert s < 0.7  # layout rewrite must trip the guard
    assert classify_drift(s) in ("drift", "breaking")
    # small whitespace change must NOT trip it
    fp3 = fingerprint(_PAGE.replace("124,58", "125,10"))
    assert similarity(fp, fp3) == pytest.approx(1.0)


def test_consensus_voting(spark):
    v1 = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id int, v double")
    v2_same = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id int, v double")
    v2_diff = spark.createDataFrame([(1, 10.0), (2, 99.0)], "id int, v double")

    winner, div = consensus([ParserResult("v1", v1), ParserResult("v2", v2_same)])
    assert winner.version == "v2" and div == []

    winner, div = consensus([ParserResult("v1", v1), ParserResult("v2", v2_diff)])
    assert winner.version == "v2"
    assert len(div) == 1 and "+1/-1" in div[0]


def test_kv_cache_ttl_and_stale(spark, tmp_path):
    kv = KVCache(spark, str(tmp_path / "kv"))
    t0 = dt.datetime(2024, 3, 1, 12, 0, tzinfo=dt.timezone.utc)
    key = cache_key("preco_diario", {"produto": "soja"})
    assert cache_key("preco_diario", {"produto": "soja"}) == key  # deterministic
    assert kv.get(key, now=t0) is None

    kv.set(key, b"payload-1", source="ibge", now=t0)
    assert kv.get(key, now=t0) == b"payload-1"
    # expired after the 7-day ibge TTL -> miss, but stale window serves it
    t_late = t0 + dt.timedelta(days=8)
    assert kv.get(key, now=t_late) is None
    assert kv.get(key, now=t_late, allow_stale=True) == b"payload-1"
    # beyond stale_max -> gone entirely
    t_dead = t0 + dt.timedelta(days=40)
    assert kv.get(key, now=t_dead, allow_stale=True) is None

    # overwrite + invalidate
    kv.set(key, b"payload-2", source="ibge", now=t0)
    assert kv.get(key, now=t0) == b"payload-2"
    kv.invalidate(key)
    assert kv.get(key, now=t0) is None


class TestCli:
    """CLI surface (ref parity: the reference ships an `agrobr` CLI)."""

    def test_list_commands(self, capsys):
        from agrobr_spark.__main__ import main

        assert main(["datasets"]) == 0
        assert main(["contracts"]) == 0
        assert main(["queries", "--tag", "A1"]) == 0
        out = capsys.readouterr().out
        assert "preco_diario" in out
        assert "cepea.indicador" in out
        assert "a1_rollup_sum" in out

    def test_run_and_validate(self, spark, tmp_path, capsys):
        import json

        from agrobr_spark.__main__ import main

        assert main(["run", "a1_rollup_sum", "--sf", "/root/testdata/sf0.001"]) == 0
        assert main(["run", "nope"]) == 2

        import pyspark.sql.functions as F

        df = spark.createDataFrame(
            [("2024-01-01", "soja", 100.0, "sc", "cepea")],
            "data string, produto string, valor double, unidade string, fonte string",
        ).withColumn("data", F.col("data").cast("date"))
        df.write.parquet(str(tmp_path / "ok.parquet"))
        rc = main(["validate", "cepea.indicador", str(tmp_path / "ok.parquet")])
        got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 1 and got["valid"] is False  # missing nullable cols


class TestStability:
    def test_markers_and_warnings(self):
        import warnings

        from agrobr_spark.stability import (
            deprecated,
            experimental,
            stability_of,
            stable,
        )

        @stable
        def a():
            return 1

        @experimental
        def b():
            return 2

        @deprecated("use a()")
        def c():
            return 3

        assert stability_of(a) == "stable"
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            assert b() == 2 and b() == 2
            assert c() == 3
        kinds = [x.category for x in w]
        assert kinds.count(FutureWarning) == 1  # one-time
        assert DeprecationWarning in kinds
        assert stability_of(lambda: 0) == "unspecified"
