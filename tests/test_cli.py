"""CLI surface (`python -m agrobr_spark`, ref agrobr/cli.py) — the
round-3 additions: connectors listing, doctor, sla, freshness,
run --json."""

from __future__ import annotations

import json

import pytest

from agrobr_spark import __main__ as cli


@pytest.fixture(autouse=True)
def _use_test_session(spark, monkeypatch):
    monkeypatch.setattr(cli, "_spark", lambda: spark)


def test_listing_commands(capsys):
    assert cli.main(["datasets"]) == 0
    out = capsys.readouterr().out
    assert "preco_diario\tcepea.indicador" in out
    assert len(out.strip().splitlines()) == 12

    assert cli.main(["contracts"]) == 0
    assert "desmatamento.prodes" in capsys.readouterr().out

    assert cli.main(["connectors"]) == 0
    out = capsys.readouterr().out
    assert "cepea.indicador" in out and "conab.serie_historica" in out

    assert cli.main(["queries"]) == 0
    assert "a1_rollup_sum" in capsys.readouterr().out


def test_run_json_and_unknown(capsys):
    assert cli.main(["run", "o4_limit_latest", "--json"]) == 0
    rows = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert len(rows) == 1

    assert cli.main(["run", "nope"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_doctor_and_sla(capsys):
    assert cli.main(["doctor"]) == 0
    diag = json.loads(capsys.readouterr().out)
    # the round-2 orphan-contract list (desmatamento, anp, antt, ceasa)
    # is closed: every contract has a feeding connector family
    assert diag["orphan_contracts"] == []
    assert diag["contracts"] >= 30 and diag["datasets"] == 12

    assert cli.main(["sla", "cepea"]) == 0
    assert json.loads(capsys.readouterr().out)["tier"] == "critical"
    assert cli.main(["sla"]) == 0
    assert set(json.loads(capsys.readouterr().out)) == {
        "cepea", "conab", "ibge", "noticias_agricolas"
    }


def test_freshness_from_parquet(tmp_path, spark, capsys):
    import datetime as dt

    spark.createDataFrame(
        [("cepea", dt.date.today())], "source string, data date"
    ).write.parquet(str(tmp_path / "hist"))
    assert cli.main(["freshness", str(tmp_path / "hist")]) == 0
    rows = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert rows[0]["source"] == "cepea" and rows[0]["status"] == "fresh"


def test_schemas_export_cmd(tmp_path, capsys):
    from agrobr_spark.__main__ import main
    from agrobr_spark.contracts import Contract, all_contracts

    assert main(["schemas", str(tmp_path)]) == 0
    printed = capsys.readouterr().out.strip().splitlines()
    assert len(printed) == len(all_contracts())
    # each exported file reloads as a registered contract's equal
    c = Contract.from_json(open(printed[0], encoding="utf-8").read())
    assert c.name in all_contracts()


def test_benchmark_suites_cmd(capsys):
    """`benchmark` runs the library suites end-to-end and prints
    either the reference-shaped JSON dict or summary lines."""
    assert cli.main(["benchmark", "contracts", "--iterations", "1", "--json"]) == 0
    d = json.loads(capsys.readouterr().out)
    assert d["name"] == "contract_validation_benchmarks"
    assert [r["name"] for r in d["results"]] == [
        "contract.validate(10 rows)",
        "contract.validate(1000 rows)",
    ]
    assert all(r["min_time_ms"] > 0 for r in d["results"])

    assert cli.main(["benchmark", "semantic", "--iterations", "1"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("Benchmark Suite: semantic_validation_benchmarks")
    assert "validate_semantic(100 rows)" in out

    assert cli.main([
        "benchmark", "queries", "--queries", "p1_project_rename",
        "--iterations", "1", "--json",
    ]) == 0
    d = json.loads(capsys.readouterr().out)
    assert [r["name"] for r in d["results"]] == ["p1_project_rename"]


def test_index_lifecycle_cmd(tmp_path, spark, capsys):
    """index build → query → update → query from the shell: the
    updated answer must reflect the folded batch, and query without
    --terms errors instead of guessing."""
    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma gamma")],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [(3, "gamma gamma gamma")], "doc_id bigint, text string"
    )
    corpus.write.parquet(str(tmp_path / "corpus.parquet"))
    batch.write.parquet(str(tmp_path / "batch.parquet"))
    idx = str(tmp_path / "idx")

    assert cli.main(
        ["index", "build", idx, "--docs", str(tmp_path / "corpus.parquet"),
         "--buckets", "8"]
    ) == 0
    capsys.readouterr()
    assert cli.main(
        ["index", "query", idx, "--terms", "gamma", "--json"]
    ) == 0
    rows = json.loads(capsys.readouterr().out)
    assert [r["doc_id"] for r in rows] == [2]

    assert cli.main(
        ["index", "update", idx, "--docs", str(tmp_path / "batch.parquet")]
    ) == 0
    capsys.readouterr()
    assert cli.main(
        ["index", "query", idx, "--terms", "gamma", "--json"]
    ) == 0
    rows = json.loads(capsys.readouterr().out)
    assert {r["doc_id"] for r in rows} == {2, 3}

    # compact folds the staged update epoch; the answer is unchanged
    assert cli.main(["index", "compact", idx]) == 0
    assert "compacted" in capsys.readouterr().out
    assert cli.main(
        ["index", "query", idx, "--terms", "gamma", "--json"]
    ) == 0
    rows2 = json.loads(capsys.readouterr().out)
    assert rows2 == rows

    assert cli.main(["index", "query", idx]) == 2


def test_benchmark_unknown_query_errors(capsys):
    """r8 ADVICE #3: a typo'd --queries name must fail loudly (exit 2),
    not silently benchmark a partial suite; whitespace around names is
    tolerated."""
    rc = cli.main(
        ["benchmark", "queries", "--queries", "a1_rollup_sum, not_a_query"]
    )
    assert rc == 2
    assert "not_a_query" in capsys.readouterr().err
