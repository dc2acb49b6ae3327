"""Sanity / semantic / quality validators (SURVEY §2.10 V2/V3/V6)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from agrobr_spark.validators import certify, run_rules, sanity_check


def test_sanity_check_flags(spark):
    rows = [
        ("soja", dt.date(2024, 1, 1), 120.0),
        ("soja", dt.date(2024, 1, 2), 125.0),   # +4.2% ok
        ("soja", dt.date(2024, 1, 3), 160.0),   # +28% excessive
        ("soja", dt.date(2024, 1, 4), 500.0),   # out of band (30-300)
        ("quinoa", dt.date(2024, 1, 1), 1.0),   # no rule -> never flagged
    ]
    df = spark.createDataFrame(rows, ["produto", "data", "valor"])
    out = {
        (r["produto"], r["data"].isoformat()): r
        for r in sanity_check(df).collect()
    }
    assert out[("soja", "2024-01-02")]["variacao_excessiva"] is False
    assert out[("soja", "2024-01-03")]["variacao_excessiva"] is True
    assert out[("soja", "2024-01-04")]["fora_banda"] is True
    assert out[("quinoa", "2024-01-01")]["fora_banda"] is False


def test_run_rules_single_pass(spark):
    rows = [
        ("2024/25", 10.0, 100.0, 90.0, 3000.0),
        ("2024-25", -1.0, 100.0, 110.0, 50.0),  # violates all four
    ]
    df = spark.createDataFrame(
        rows, ["safra", "valor", "area_plantada", "area_colhida", "produtividade"]
    )
    res = {r["regra"]: r for r in run_rules(df).collect()}
    assert res["safra_format"]["violacoes"] == 1
    assert res["price_positive"]["violacoes"] == 1
    assert res["area_consistency"]["violacoes"] == 1
    assert res["productivity_range"]["violacoes"] == 1
    assert all(r["linhas"] == 2 for r in res.values())
    # rules whose columns are absent are skipped, not failed
    res2 = {r["regra"] for r in run_rules(df.select("safra")).collect()}
    assert res2 == {"safra_format"}


def test_certify_labels(spark):
    clean = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("dobro")
    )
    gold = certify(clean)
    assert gold["label"] == "GOLD" and gold["score"] == 1.0

    dup = clean.union(clean.limit(10))
    silver_or_less = certify(dup)
    assert silver_or_less["linhas_duplicadas"] == 10
    assert silver_or_less["label"] in ("BRONZE", "UNCERTIFIED", "SILVER")
