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


class TestBiffRkRoundTrip:
    """RK encoding (MS-XLS 2.5.276) decode is exact for every
    representable value class."""

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=-(2**29), max_value=2**29 - 1))
    def test_int_rk(self, n):
        from agrobr_spark.sources.xls_biff import _rk_value

        assert _rk_value(((n << 2) & 0xFFFFFFFF) | 2) == float(n)

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=-(2**29), max_value=2**29 - 1))
    def test_int_rk_div100(self, n):
        from agrobr_spark.sources.xls_biff import _rk_value

        assert _rk_value(((n << 2) & 0xFFFFFFFF) | 3) == n / 100.0

    @settings(max_examples=200, deadline=None)
    @given(st.floats(allow_nan=False, allow_infinity=False,
                     min_value=-1e12, max_value=1e12))
    def test_float_rk_truncated_mantissa(self, x):
        import struct

        from agrobr_spark.sources.xls_biff import _rk_value

        bits = struct.unpack("<Q", struct.pack("<d", x))[0]
        rk = (bits >> 32) & 0xFFFFFFFC
        expected = struct.unpack("<Q", struct.pack("<d", x))[0] & ~0x3FFFFFFFF
        assert _rk_value(rk) == struct.unpack("<d", struct.pack("<Q", expected))[0]


class TestSafraNormalization:
    @settings(max_examples=100, deadline=None)
    @given(st.integers(min_value=1970, max_value=2049))
    def test_all_formats_converge(self, y):
        from agrobr_spark.sources.connectors.conab_serie import _normalize_safra

        nxt = (y + 1) % 100
        canonical = f"{y}/{nxt:02d}"
        assert _normalize_safra(canonical) == canonical
        assert _normalize_safra(f"{y}/{y + 1}") == canonical
        assert _normalize_safra(str(y)) == canonical
        if 2000 <= y < 2050:
            assert _normalize_safra(f"{y % 100:02d}/{nxt:02d}") == canonical

    def test_rejects_non_safra(self):
        from agrobr_spark.sources.connectors.conab_serie import _normalize_safra

        for junk in ("", "total", "12/345", "1899", "Região/UF"):
            assert _normalize_safra(junk) is None


class TestPiiScrubExpressions:
    """The PII regexes (shared by Spark and DuckDB) mask every match
    and are idempotent."""

    @settings(max_examples=50, deadline=None)
    @given(
        st.from_regex(r"[a-z]{1,8}\.[a-z]{1,5}@[a-z]{2,10}\.[a-z]{2,3}",
                      fullmatch=True)
    )
    def test_email_masked(self, email):
        import re

        from agrobr_spark.queries.pipeline_text import _PII_EMAIL

        masked = re.sub(_PII_EMAIL, "<EMAIL>", f"fale com {email} hoje")
        assert email not in masked and "<EMAIL>" in masked
        assert re.sub(_PII_EMAIL, "<EMAIL>", masked) == masked  # idempotent

    def test_cpf_and_phone_masked(self):
        import re

        from agrobr_spark.queries.pipeline_text import _PII_CPF, _PII_FONE

        s = "CPF 123.456.789-09 tel (11) 91234-5678 e (21) 3456-7890"
        s = re.sub(_PII_CPF, "<CPF>", s)
        s = re.sub(_PII_FONE, "<FONE>", s)
        assert "123.456" not in s and "91234" not in s and "3456-7890" not in s
        assert s.count("<FONE>") == 2 and s.count("<CPF>") == 1


class TestBpeVocabEncoder:
    """The expression-only BPE chain must equal a literal GPT-2-style
    min-rank-loop reference — the exactness argument (one replace pass
    per rank == full greedy merge when rule inputs are outputs of
    earlier ranks) made executable."""

    @staticmethod
    def _reference_count(pretoks: list[str]) -> int:
        from agrobr_spark.queries.pipeline_text import BPE_MERGES

        rank = {p: i for i, p in enumerate(BPE_MERGES)}
        total = 0
        for tok in pretoks:
            word = list(tok)
            while len(word) > 1:
                pares = {
                    (word[i], word[i + 1]) for i in range(len(word) - 1)
                }
                ranked = [p for p in pares if p in rank]
                if not ranked:
                    break
                a, b = min(ranked, key=rank.get)
                out, i = [], 0
                while i < len(word):
                    if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(word[i])
                        i += 1
                word = out
            total += len(word)
        return total

    def test_merge_table_is_training_ordered(self):
        """Precondition of the single-pass-per-rank exactness proof:
        every rule's symbols are single characters or outputs of
        EARLIER rules. A violating edit to BPE_MERGES would silently
        change semantics — fail it here instead."""
        from agrobr_spark.queries.pipeline_text import BPE_MERGES

        known: set[str] = set()
        for a, b in BPE_MERGES:
            for side in (a, b):
                assert len(side) == 1 or side in known, (a, b, side)
            known.add(a + b)

    def test_matches_min_rank_loop_reference(self, spark):
        """Fixed tricky samples + seeded random strings, one DF batch:
        Spark chain == python min-rank loop (pre-tokens taken from the
        same Spark regex so only the merge stage is under test)."""
        import random

        from agrobr_spark.queries.pipeline_text import (
            _BPE_PAT,
            bpe_vocab_token_count,
        )

        rng = random.Random(20240814)
        alphabet = "theinorsacdm 019'.,!\n\t"
        samples = [
            "the cat and the dog are running to the station",
            "Internationalization of the computers: 1999 and 2000!",
            "it's a test, don't you think? qu'est-ce que c'est",
            "",
            "   ",
            "aaa bbb the the the",
            "tthhee",
            "soja e milho no interior de 2019 a 2020, com 100 toneladas",
            "multi\nline\ttext  with   runs",
            "\x01control\x02bytes\x03inside",
        ] + [
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 80)))
            for _ in range(20)
        ]
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(samples)], "i long, text string"
        )
        got = {
            r["i"]: (r["n"], r["pre"])
            for r in df.select(
                "i",
                bpe_vocab_token_count("text").alias("n"),
                F.expr(
                    "regexp_extract_all(translate(text,"
                    " '\x01\x02\x03', ''), '"
                    + _BPE_PAT.replace("\\", "\\\\").replace("'", "\\'")
                    + "', 0)"
                ).alias("pre"),
            ).collect()
        }
        for i, s in enumerate(samples):
            n, pretoks = got[i]
            want = self._reference_count(list(pretoks))
            assert n == want, (i, s, n, want)
            # bounds: one token per pre-token at best, chars at worst
            assert len(pretoks) <= n <= sum(len(t) for t in pretoks) or (
                not pretoks and n == 0
            )


class TestBpeMergesFile:
    def test_load_and_count_with_custom_vocab(self, spark, tmp_path):
        """A merges.txt in the GPT-2 file format loads, validates
        training order, and drives the same expression chain."""
        from agrobr_spark.queries.pipeline_text import (
            bpe_vocab_token_count,
            load_bpe_merges,
        )

        p = tmp_path / "merges.txt"
        p.write_text("#version: demo\ns o\nj a\nso ja\n")
        merges = load_bpe_merges(str(p))
        assert merges == [("s", "o"), ("j", "a"), ("so", "ja")]
        df = spark.createDataFrame(
            [(1, "soja sola jaca"), (2, "")], "i long, text string"
        )
        got = {
            r["i"]: r["n"]
            for r in df.select(
                "i", bpe_vocab_token_count("text", merges).alias("n")
            ).collect()
        }
        # soja->[soja]=1; ' sola'->[' ','so','l','a']=4; ' jaca'->
        # [' ','ja','c','a']=4
        assert got == {1: 9, 2: 0}

    def test_load_rejects_out_of_order_and_bad_lines(self, tmp_path):
        import pytest

        from agrobr_spark.queries.pipeline_text import load_bpe_merges

        p = tmp_path / "bad.txt"
        p.write_text("so ja\n")  # 'so' never produced by an earlier rule
        with pytest.raises(ValueError, match="training order"):
            load_bpe_merges(str(p))
        p.write_text("a b c\n")
        with pytest.raises(ValueError, match="expected"):
            load_bpe_merges(str(p))
        p.write_text("#only comments\n")
        with pytest.raises(ValueError, match="no merge rules"):
            load_bpe_merges(str(p))


class TestShardManifestMerge:
    """append_training_shards' accounting claim, property-tested: for
    ANY doc set and ANY partition of it into ordered batches, the
    incrementally-merged manifest equals the one-shot manifest — xor
    digest merge is associative+commutative, sums add."""

    @SETTINGS
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10_000),
                st.text(
                    alphabet=st.characters(
                        min_codepoint=32, max_codepoint=126
                    ),
                    max_size=20,
                ),
            ),
            min_size=1,
            max_size=40,
            unique_by=lambda t: t[0],
        ),
        st.integers(min_value=1, max_value=4),
        st.randoms(use_true_random=False),
    )
    def test_any_split_equals_one_shot(self, spark, tmp_path_factory, rows, k, rng):
        from agrobr_spark.sources.sinks import (
            append_training_shards,
            write_training_shards,
        )

        base = tmp_path_factory.mktemp("shards")
        data = [(i, t, len(t.split()) if t.strip() else 0) for i, t in rows]
        df = spark.createDataFrame(
            data, "doc_id long, text string, n_tokens long"
        )

        one = str(base / "one")
        m_one = write_training_shards(
            df, one, key_col="doc_id", n_shards=3, token_col="n_tokens"
        )

        ids = [i for i, _ in rows]
        rng.shuffle(ids)
        cuts = sorted(rng.sample(range(1, len(ids)), min(k - 1, len(ids) - 1))) if len(ids) > 1 else []
        batches = []
        prev = 0
        for c in cuts + [len(ids)]:
            batches.append(set(ids[prev:c]))
            prev = c

        inc = str(base / "inc")
        first = df.filter(F.col("doc_id").isin(list(batches[0])))
        m_inc = write_training_shards(
            first, inc, key_col="doc_id", n_shards=3, token_col="n_tokens"
        )
        for b in batches[1:]:
            m_inc = append_training_shards(
                df.filter(F.col("doc_id").isin(list(b))), inc
            )

        assert m_inc["row_count"] == m_one["row_count"]
        assert set(m_inc["shards"]) == set(m_one["shards"])
        for sk, s_one in m_one["shards"].items():
            s_inc = m_inc["shards"][sk]
            assert s_inc["rows"] == s_one["rows"]
            assert s_inc["tokens"] == s_one["tokens"]
            assert s_inc["content_sha256_xor"] == s_one["content_sha256_xor"]
