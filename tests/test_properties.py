"""Property-based tests (hypothesis) for the scalar expression layer —
beyond the reference's strategy (SURVEY §5.6: no property tests there).

Each property batches all generated values into ONE DataFrame per
example so a property run costs a handful of Spark jobs, not hundreds.
"""

from __future__ import annotations

import datetime as dt
import decimal

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_decimais = st.decimals(
    min_value=0, max_value=decimal.Decimal("99999999999"), places=4
)


def _fmt_ptbr(d: decimal.Decimal) -> str:
    """Canonical pt-BR rendering: thousand dots + decimal comma."""
    inteiro, _, frac = f"{d:.4f}".partition(".")
    grupos = []
    while inteiro:
        grupos.append(inteiro[-3:])
        inteiro = inteiro[:-3]
    return ".".join(reversed(grupos)) + "," + frac


class TestParsePtbrNumber:
    @SETTINGS
    @given(st.lists(_decimais, min_size=1, max_size=50))
    def test_roundtrip(self, spark, valores):
        from agrobr_spark.functions import parse_ptbr_number

        df = spark.createDataFrame(
            [(str(i), _fmt_ptbr(v)) for i, v in enumerate(valores)],
            "i string, raw string",
        )
        got = {
            r["i"]: r["v"]
            for r in df.select(
                "i", parse_ptbr_number(F.col("raw")).alias("v")
            ).collect()
        }
        for i, v in enumerate(valores):
            assert got[str(i)] == v.quantize(decimal.Decimal("0.0001"))

    @SETTINGS
    @given(st.lists(st.text(max_size=12), min_size=1, max_size=50))
    def test_garbage_coerces_to_null_never_raises(self, spark, textos):
        """errors="coerce" semantics: arbitrary text → value or NULL,
        never an exception (the reference's regime, ibge/api.py:148)."""
        from agrobr_spark.functions import parse_ptbr_number

        df = spark.createDataFrame([(t,) for t in textos], "raw string")
        df.select(parse_ptbr_number(F.col("raw")).alias("v")).collect()


class TestNormKey:
    @SETTINGS
    @given(
        st.lists(
            st.text(
                alphabet="áàâãéêíóôõúçÁÀÂÃÉÊÍÓÔÕÚÇ abcXYZ\t-",
                min_size=1,
                max_size=30,
            ),
            min_size=1,
            max_size=50,
        )
    )
    def test_idempotent_and_ascii(self, spark, textos):
        from agrobr_spark.functions import norm_key

        df = spark.createDataFrame([(t,) for t in textos], "raw string")
        rows = df.select(
            norm_key(F.col("raw")).alias("k1"),
            norm_key(norm_key(F.col("raw"))).alias("k2"),
        ).collect()
        for r in rows:
            assert r["k1"] == r["k2"]  # idempotent
            assert r["k1"] == r["k1"].lower()
            # accent inventory fully folded
            assert not set(r["k1"]) & set("áàâãéêíóôõúç")


class TestSafraLabel:
    @SETTINGS
    @given(
        st.lists(
            st.dates(dt.date(1980, 1, 1), dt.date(2060, 12, 31)),
            min_size=1,
            max_size=50,
        )
    )
    def test_season_boundary_and_format(self, spark, datas):
        from agrobr_spark.functions import safra_label

        df = spark.createDataFrame([(d,) for d in datas], "d date")
        rows = df.select("d", safra_label(F.col("d")).alias("s")).collect()
        for r in rows:
            ano = r["d"].year if r["d"].month >= 7 else r["d"].year - 1
            assert r["s"] == f"{ano}/{(ano + 1) % 100:02d}"
