"""Ingestion connectors (SURVEY §2.1 S1-S9)."""

from __future__ import annotations

import datetime as dt

import pytest

from agrobr_spark.sources import (
    build_getfeature_url,
    extract_tables,
    find_header_row,
    param_date_value_rows,
    read_csv_ptbr,
    read_verified,
    write_with_provenance,
)
from agrobr_spark.sources.excel import rows_to_records
from agrobr_spark.sources.html import find_data_table


def test_csv_ptbr_roundtrip(spark, tmp_path):
    p = tmp_path / "dados.csv"
    p.write_bytes(
        "data;produto;valor\n"
        "31/01/2024;soja;1.234,56\n"
        "01/02/2024;café;2,50\n"
        "bad;linha\n"  # malformed: fewer columns — dropped with schema
        "02/02/2024;milho;abc\n".encode("iso-8859-1")
    )
    df = read_csv_ptbr(
        spark,
        str(p),
        schema="data string, produto string, valor string",
        decimal_cols=["valor"],
        date_cols={"data": "dd/MM/yyyy"},
    )
    rows = {r["produto"]: r for r in df.collect() if r["produto"] is not None}
    assert float(rows["soja"]["valor"]) == 1234.56
    assert rows["soja"]["data"] == dt.date(2024, 1, 31)
    assert rows["café"] is not None  # ISO-8859-1 é decoded
    assert rows["milho"]["valor"] is None  # coerce-to-null


def test_json_nested_pivot(spark):
    payload = (
        '{"properties": {"parameter": {'
        '"T2M": {"20240101": 25.5, "20240102": -9999},'
        '"PRECTOT": {"20240101": 12.0}}}}'
    )
    rows = {
        (r["parametro"], r["data"].isoformat()): r["valor"]
        for r in param_date_value_rows(spark, [payload]).collect()
    }
    assert rows[("T2M", "2024-01-01")] == 25.5
    assert rows[("T2M", "2024-01-02")] is None  # sentinel -> NULL
    assert rows[("PRECTOT", "2024-01-01")] == 12.0


def test_excel_header_discovery():
    sheet = [
        ["CONAB - Série Histórica", None],
        [None, None],
        ["safra", "produto", "producao"],
        ["2023/24", "soja", 154_000],
        ["2023/24", "milho", 115_000],
        [None, None, None],
    ]
    idx = find_header_row(sheet, ["safra", "produto"])
    assert idx == 2
    header, data = rows_to_records(sheet, idx)
    assert header == ["safra", "produto", "producao"]
    assert len(data) == 2
    assert find_header_row(sheet, ["inexistente"]) is None


def test_html_table_selection():
    html = """
    <html><body>
    <table class="menu"><tr><th>Nav</th></tr><tr><td>Home</td></tr></table>
    <table id="imagenet-indicador">
      <tr><th>Data</th><th>Valor</th><th>Variação</th></tr>
      <tr><td>31/01/2024</td><td>124,58</td><td>0,5%</td></tr>
      <tr><td>01/02/2024</td><td>125,10</td><td>0,4%</td></tr>
    </table>
    </body></html>
    """
    tables = extract_tables(html)
    assert len(tables) == 2
    t = find_data_table(html, attr_pattern="indicador")
    assert t["headers"] == ["Data", "Valor", "Variação"]
    assert t["rows"][0] == ["31/01/2024", "124,58", "0,5%"]
    # keyword fallback and largest-table fallback
    assert find_data_table(html, header_keywords=["data", "valor"])["attrs"] == [
        "imagenet-indicador"
    ]
    assert len(find_data_table(html)["rows"]) == 2


def test_wfs_pushdown_url():
    url = build_getfeature_url(
        "https://terrabrasilis.dpi.inpe.br/geoserver/wfs",
        "prodes:yearly_deforestation",
        columns=["year", "state", "area_km"],
        equals={"state": "PA"},
        date_between=("date", dt.date(2023, 1, 1), dt.date(2023, 12, 31)),
        max_features=1000,
    )
    assert "propertyName=year%2Cstate%2Carea_km" in url
    assert "CQL_FILTER=state+%3D+%27PA%27+AND+date+BETWEEN" in url
    assert "count=1000" in url


def test_sink_provenance_verify(spark, tmp_path):
    df = spark.range(100).selectExpr("id", "id * 2 AS dobro")
    meta = write_with_provenance(df, str(tmp_path / "t"), source="teste")
    assert meta["row_count"] == 100
    back, meta2 = read_verified(spark, str(tmp_path / "t"))
    assert back.count() == 100 and meta2["source"] == "teste"

    # tamper -> verify-on-read must fail
    import json, os

    mp = tmp_path / "t" / ".meta.json"
    m = json.loads(mp.read_text())
    m["content_sha256_xor"] = "0" * 64
    mp.write_text(json.dumps(m))
    with pytest.raises(ValueError, match="hash mismatch"):
        read_verified(spark, str(tmp_path / "t"))


class TestPdfSource:
    """S4 PDF table extraction (ref: agrobr/anda/parser.py:382-420) —
    pdfplumber decode is gated; the shaping logic runs on fixtures."""

    TABLES = [
        [["relatório ANDA", None]],  # decorative table, no header
        [
            ["Entregas de fertilizantes", ""],
            ["Produto", "Total"],
            ["NPK", "1.234,5"],
            ["Ureia", "987,6"],
            ["", ""],
        ],
    ]

    def test_tables_to_df(self, spark):
        from agrobr_spark.sources.pdf import pdf_tables_to_df

        df = pdf_tables_to_df(spark, self.TABLES, ["produto", "total"])
        rows = {r["Produto"]: r["Total"] for r in df.collect()}
        assert rows == {"NPK": "1.234,5", "Ureia": "987,6"}

    def test_no_header_raises(self, spark):
        from agrobr_spark.sources.pdf import pdf_tables_to_df

        with pytest.raises(ValueError):
            pdf_tables_to_df(spark, [self.TABLES[0]], ["produto", "total"])

    def test_decode_routes_to_stdlib_extractor(self):
        # pdfplumber absent → extract_tables routes to the stdlib text
        # extractor; undecodable input fails with its honest ValueError
        from agrobr_spark.sources.pdf import extract_tables

        with pytest.raises(ValueError, match="no text runs"):
            extract_tables(b"%PDF-1.4\nnothing decodable\n%%EOF")


def test_bigquery_gated(spark):
    """S7: the BigQuery connector jar is absent here — the reader must
    fail with a clear NotImplementedError, not a raw classpath error."""
    from agrobr_spark.sources import read_bigquery

    with pytest.raises(NotImplementedError):
        read_bigquery(spark, "basedosdados.br_bcb_sicor.microdados")


class TestPdfStdlibExtraction:
    """S4: stdlib text-PDF extraction (sources/pdf_text.py) behind the
    pdfplumber gate — digitally-produced bulletins decode end-to-end."""

    def _bulletin(self):
        from tests.pdf_fixture import write_pdf_table

        return write_pdf_table(
            [
                ["ENTREGAS DE FERTILIZANTES - 2024"],
                ["UF", "Janeiro", "Fevereiro", "Março"],
                ["MT", "1.234,5", "1.100,2", "998,7"],
                ["PR", "845,3", "-", "902,1"],
            ]
        )

    def test_extract_tables_falls_back_to_stdlib(self, spark):
        # pdfplumber is absent here, so extract_tables must route to
        # the stdlib extractor rather than raising
        from agrobr_spark.sources.pdf import extract_tables, pdf_tables_to_df

        tables = extract_tables(self._bulletin())
        assert tables and tables[0][1] == ["UF", "Janeiro", "Fevereiro", "Março"]
        df = pdf_tables_to_df(spark, tables, header_keywords=["UF", "Janeiro"])
        rows = {r["UF"]: r for r in df.collect()}
        assert rows["MT"]["Janeiro"] == "1.234,5"
        assert rows["PR"]["Fevereiro"] == "-"

    def test_text_operators_td_tj_arrays_escapes_hex(self):
        import zlib

        from agrobr_spark.sources.pdf_text import extract_text_runs, runs_to_table

        content = zlib.compress(
            b"BT /F1 10 Tf 14 TL "
            b"1 0 0 1 50 700 Tm [(Val) -120 (or)] TJ "   # TJ array w/ kerning
            b"1 0 0 1 200 700 Tm (par\\(en\\)s) Tj "       # escaped parens
            b"1 0 0 1 50 684 Tm <48692e> Tj "              # hex string 'Hi.'
            b"150 0 Td (desloc) Tj "                       # relative Td
            b"ET"
        )
        pdf = (
            b"%PDF-1.4\n1 0 obj\n<< /Length "
            + str(len(content)).encode()
            + b" /Filter /FlateDecode >>\nstream\n"
            + content
            + b"\nendstream\nendobj\n%%EOF\n"
        )
        runs = extract_text_runs(pdf)
        texts = [t for _, _, t in runs]
        assert "Valor" in texts            # TJ parts concatenated
        assert "par(en)s" in texts
        assert "Hi." in texts
        table = runs_to_table(runs)
        assert table[0] == ["Valor", "par(en)s"]
        assert table[1] == ["Hi.", "desloc"]  # Td moved x by +150

    def test_scanned_pdf_raises(self):
        from agrobr_spark.sources.pdf_text import extract_tables_stdlib

        with pytest.raises(ValueError, match="no text runs"):
            extract_tables_stdlib(b"%PDF-1.4\nno streams here\n%%EOF")


# --- connector base helpers (_base.py) --------------------------------------


class TestConnectorBase:
    def test_csv_text_rows_widens_overwide_rows(self):
        """Gov CSVs with stray extra cells must not lose data: rows wider
        than the header widen it with generated colN names (r2 ADVICE)."""
        from agrobr_spark.sources.connectors._base import csv_text_rows

        text = "a;b;c\n1;2;3;4;5\n6;7;8\n"
        header, rows = csv_text_rows(text)
        assert header == ["a", "b", "c", "col3", "col4"]
        assert rows == [
            ["1", "2", "3", "4", "5"],
            ["6", "7", "8", None, None],
        ]

    def test_csv_text_rows_trailing_separator(self):
        """Trailing separators on data rows (one extra empty cell) widen
        the header instead of truncating; empty cells stay None."""
        from agrobr_spark.sources.connectors._base import csv_text_rows

        text = "uf;valor\nSP;10;\nMG;20;\n"
        header, rows = csv_text_rows(text)
        assert header == ["uf", "valor", "col2"]
        assert rows == [["SP", "10", None], ["MG", "20", None]]

    def test_rename_coalescing_dual_vocabulary(self, spark):
        """A payload carrying both vocabularies (UF and nomeUF) must
        yield ONE `uf` column (coalesced in mapping order), never a
        duplicate name (r2 ADVICE: bcb COLUNAS_MAP rename hazard)."""
        from agrobr_spark.sources.connectors.bcb import read_credito_rural

        payload = [
            {"Safra": "2023/2024", "UF": "SP", "nomeUF": "São Paulo",
             "Valor": "100.0", "VlCusteio": "999"},
            {"Safra": "2023/2024", "UF": None, "nomeUF": "MG",
             "Valor": None, "VlCusteio": "200.0"},
        ]
        df = read_credito_rural(spark, payload)
        assert df.columns.count("uf") == 1
        assert df.columns.count("valor") == 1
        # mapping order: UF before nomeUF, Valor before VlCusteio
        assert {r["uf"] for r in df.collect()} == {"SP", "MG"}
        vals = sorted(r["valor"] for r in df.collect())
        assert vals == [100.0, 200.0]


def test_training_shards_roundtrip(spark, tmp_path):
    """Sharded export: stable content-addressed assignment, per-shard
    manifest stats, verified (and subset-prunable) read-back."""
    from agrobr_spark.sources.sinks import (
        read_training_shards,
        write_training_shards,
    )

    df = spark.range(200).selectExpr(
        "id AS doc_id", "concat('doc ', id) AS text", "id % 7 + 3 AS n_tokens"
    )
    path = str(tmp_path / "shards")
    m = write_training_shards(
        df, path, key_col="doc_id", n_shards=4, token_col="n_tokens"
    )
    assert m["row_count"] == 200
    assert set(m["shards"]) == {"0", "1", "2", "3"}
    assert sum(s["rows"] for s in m["shards"].values()) == 200
    assert all(s["tokens"] > 0 for s in m["shards"].values())

    back, m2 = read_training_shards(spark, path)
    assert back.count() == 200
    sub, _ = read_training_shards(spark, path, shards=[1])
    assert sub.count() == m["shards"]["1"]["rows"]

    # determinism: re-export from a differently-partitioned frame
    # lands every doc in the same shard
    m3 = write_training_shards(
        df.repartition(13), str(tmp_path / "s2"), key_col="doc_id",
        n_shards=4, token_col="n_tokens",
    )
    assert {k: v["content_sha256_xor"] for k, v in m["shards"].items()} == {
        k: v["content_sha256_xor"] for k, v in m3["shards"].items()
    }


def test_training_shards_detects_tamper(spark, tmp_path):
    import pytest as _pytest

    from agrobr_spark.sources.sinks import (
        read_training_shards,
        write_training_shards,
    )

    df = spark.range(50).selectExpr("id AS doc_id", "concat('d', id) AS text")
    path = str(tmp_path / "shards")
    write_training_shards(df, path, key_col="doc_id", n_shards=2)
    # drop one shard directory -> shard-set mismatch must be loud
    import shutil as _sh

    _sh.rmtree(f"{path}/shard=1")
    with _pytest.raises(ValueError, match="shard set mismatch"):
        read_training_shards(spark, path)


def test_training_shards_jsonl_gz_roundtrip(spark, tmp_path):
    """JSONL.gz export (fmt=json + gzip): the interchange layout
    tokenizer toolchains read line-by-line. Files must actually be
    gzipped .json.gz, the verified read-back must pass, and the shard
    assignment must be identical to the parquet export of the same
    frame (content-addressed, format-independent)."""
    import glob as _glob

    from agrobr_spark.sources.sinks import (
        read_training_shards,
        write_training_shards,
    )

    df = spark.range(120).selectExpr(
        "id AS doc_id", "concat('doc ', id) AS text", "id % 5 + 1 AS n_tokens"
    )
    jpath = str(tmp_path / "jsonl")
    mj = write_training_shards(
        df, jpath, key_col="doc_id", n_shards=3, fmt="json",
        token_col="n_tokens", compression="gzip",
    )
    files = _glob.glob(f"{jpath}/shard=*/*.json.gz")
    assert files, "json shards must be gzip-compressed"
    import gzip as _gz
    import json as _json

    with _gz.open(files[0], "rt") as fh:
        first = _json.loads(fh.readline())
    assert {"doc_id", "text", "n_tokens"} <= set(first)

    back, _ = read_training_shards(spark, jpath)
    assert back.count() == 120

    mp = write_training_shards(
        df, str(tmp_path / "pq"), key_col="doc_id", n_shards=3,
        token_col="n_tokens",
    )
    assert {k: v["rows"] for k, v in mj["shards"].items()} == {
        k: v["rows"] for k, v in mp["shards"].items()
    }


def test_bigquery_option_plumbing():
    """S7 reader construction (r6 VERDICT next #7): the option map the
    connector would receive — fully-qualified default table, billing
    project, server-side filter and pruned field list — pinned
    without the jar, mirroring the reference client's query builder
    (ref: agrobr/bcb/bigquery_client.py:39-90)."""
    from agrobr_spark.sources.bigquery import (
        bigquery_read_options,
        credito_rural_filter,
    )

    opts = bigquery_read_options()
    assert opts == {"table": "basedosdados.br_bcb_sicor.microdados_operacao"}

    opts = bigquery_read_options(
        billing_project="my-billing",
        filter_expr="ano = 2023",
        columns=("ano", "sigla_uf"),
    )
    assert opts["parentProject"] == "my-billing"
    assert opts["filter"] == "ano = 2023"
    assert opts["selectedFields"] == "ano,sigla_uf"

    # predicate construction mirrors the reference's WHERE builder
    assert credito_rural_filter() == "nome_finalidade = 'CUSTEIO'"
    f = credito_rural_filter(
        finalidade="comercializacao", produto="soja", safra_ano=2023, uf="mt"
    )
    assert f == (
        "nome_finalidade = 'COMERCIALIZAÇÃO'"
        " AND UPPER(nome_produto) LIKE '%SOJA%'"
        " AND ano = 2023 AND sigla_uf = 'MT'"
    )
    # unknown purpose passes through upper-cased, like the reference
    assert credito_rural_filter("giro") == "nome_finalidade = 'GIRO'"

    # GoogleSQL string literals use backslash escapes (quote-doubling
    # is NOT an escape there): backslashes are escaped first, then
    # quotes, so a quoted/backslashed argument cannot break the
    # predicate or inject extra conditions
    f = credito_rural_filter(produto="d'agua")
    assert "LIKE '%D\\'AGUA%'" in f
    f = credito_rural_filter(produto="x\\' OR 1=1 --")
    assert "\\\\\\' OR" in f  # the backslash is itself escaped
    # UF is allowlisted to exactly two letters — injection attempts
    # are rejected outright rather than escaped
    import pytest as _pytest

    with _pytest.raises(ValueError):
        credito_rural_filter(uf="m'")
    with _pytest.raises(ValueError):
        credito_rural_filter(uf="MTT")
    assert credito_rural_filter("x' OR '1'='1") == (
        "nome_finalidade = 'X\\' OR \\'1\\'=\\'1'"
    )


def test_bigquery_credit_aggregate_mocked_source(spark):
    """The credit-operations aggregation over a local frame standing
    in for the connector scan: grouped sums, contract count as int,
    and the reference's public column names."""
    from agrobr_spark.sources.bigquery import credito_rural_aggregate

    df = spark.createDataFrame(
        [
            (2023, 5, "MT", "5103403", "SOJA", "CUSTEIO", 100.0, 10.0),
            (2023, 5, "MT", "5103403", "SOJA", "CUSTEIO", 50.0, 5.0),
            (2023, 6, "PR", "4106902", "MILHO", "CUSTEIO", 70.0, 7.0),
        ],
        "ano int, mes int, sigla_uf string, id_municipio string,"
        " nome_produto string, nome_finalidade string,"
        " valor_parcela double, area_financiada double",
    )
    out = {
        (r["ano_emissao"], r["mes_emissao"], r["uf"]): r
        for r in credito_rural_aggregate(df).collect()
    }
    assert set(out) == {(2023, 5, "MT"), (2023, 6, "PR")}
    mt = out[(2023, 5, "MT")]
    assert mt["valor"] == 150.0
    assert mt["area_financiada"] == 15.0
    assert mt["qtd_contratos"] == 2 and isinstance(mt["qtd_contratos"], int)
    assert mt["produto"] == "SOJA" and mt["finalidade"] == "CUSTEIO"
    assert mt["cd_municipio"] == "5103403"


def test_append_shards_equals_one_shot(spark, tmp_path):
    """Any sequence of disjoint appends must land on the SAME manifest
    as the one-shot export of the union — row counts and token sums
    add, the xor-folded digests merge associatively — and the
    appended export passes verify-on-read."""
    import pyspark.sql.functions as F

    from agrobr_spark.sources.sinks import (
        append_training_shards,
        read_training_shards,
        write_training_shards,
    )

    rows = [(i, f"doc {i} text body", i % 3 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_tokens long")

    one = str(tmp_path / "oneshot")
    m_one = write_training_shards(
        df, one, key_col="doc_id", n_shards=4, token_col="n_tokens"
    )

    inc = str(tmp_path / "incremental")
    write_training_shards(
        df.filter(F.col("doc_id") < 100), inc,
        key_col="doc_id", n_shards=4, token_col="n_tokens",
    )
    append_training_shards(
        df.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 180)), inc
    )
    m_inc = append_training_shards(df.filter(F.col("doc_id") >= 180), inc)

    assert m_inc["row_count"] == m_one["row_count"] == 300
    for k, s_one in m_one["shards"].items():
        s_inc = m_inc["shards"][k]
        assert s_inc["rows"] == s_one["rows"], k
        assert s_inc["tokens"] == s_one["tokens"], k
        assert s_inc["content_sha256_xor"] == s_one["content_sha256_xor"], k

    back, _ = read_training_shards(spark, inc)  # verify-on-read passes
    assert back.count() == 300


def test_append_shards_guards(spark, tmp_path):
    """Append refuses a missing manifest and a column mismatch."""
    import pytest

    from agrobr_spark.sources.sinks import (
        append_training_shards,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(1, "a", 1)], "doc_id long, text string, n_tokens long"
    )
    with pytest.raises(FileNotFoundError):
        append_training_shards(df, str(tmp_path / "nowhere"))

    p = str(tmp_path / "x")
    write_training_shards(df, p, key_col="doc_id", n_shards=2, token_col="n_tokens")
    with pytest.raises(ValueError, match="columns"):
        append_training_shards(df.select("doc_id", "text"), p)


def test_append_shards_custom_token_col(spark, tmp_path):
    """The manifest records WHICH column carries the token counts, so
    appends to an export created with a non-default token column sum
    the right column — even when a decoy ``n_tokens`` column exists
    with different values."""
    import pyspark.sql.functions as F

    from agrobr_spark.sources.sinks import (
        append_training_shards,
        write_training_shards,
    )

    rows = [(i, f"doc {i}", i % 5 + 1, 999) for i in range(100)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, tok_ct long, n_tokens long"
    )
    p = str(tmp_path / "custom")
    m0 = write_training_shards(
        df.filter(F.col("doc_id") < 60), p,
        key_col="doc_id", n_shards=2, token_col="tok_ct",
    )
    assert m0["token_col"] == "tok_ct"
    m1 = append_training_shards(df.filter(F.col("doc_id") >= 60), p)
    want = sum(i % 5 + 1 for i in range(100))
    assert sum(s["tokens"] for s in m1["shards"].values()) == want


def test_append_shards_empty_first_batch(spark, tmp_path):
    """An export whose FIRST batch is empty (sparse/clustered ids in a
    streaming chunking) still tracks tokens for every later append:
    token_col lives at the manifest top level, not in the (empty)
    shard entries."""
    import pyspark.sql.functions as F

    from agrobr_spark.sources.sinks import (
        append_training_shards,
        read_training_shards,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}", i + 1) for i in range(50)],
        "doc_id long, text string, n_tokens long",
    )
    p = str(tmp_path / "emptyfirst")
    m0 = write_training_shards(
        df.filter(F.lit(False)), p,
        key_col="doc_id", n_shards=2, token_col="n_tokens",
    )
    assert m0["row_count"] == 0 and m0["shards"] == {}
    m1 = append_training_shards(df, p)
    assert m1["row_count"] == 50
    assert sum(s["tokens"] for s in m1["shards"].values()) == sum(
        i + 1 for i in range(50)
    )
    back, _ = read_training_shards(spark, p)
    assert back.count() == 50


def test_append_shards_batch_id_replay_is_noop(spark, tmp_path):
    """A replayed foreachBatch epoch (same batch_id) must not rewrite
    data or double-count accounting: the second append with an
    already-applied batch_id is a no-op and verify-on-read still
    passes."""
    import pyspark.sql.functions as F

    from agrobr_spark.sources.sinks import (
        append_training_shards,
        read_training_shards,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}", 1) for i in range(80)],
        "doc_id long, text string, n_tokens long",
    )
    p = str(tmp_path / "replay")
    write_training_shards(
        df.filter(F.col("doc_id") < 40), p,
        key_col="doc_id", n_shards=2, token_col="n_tokens", batch_id=0,
    )
    batch = df.filter(F.col("doc_id") >= 40)
    m1 = append_training_shards(batch, p, batch_id=1)
    m2 = append_training_shards(batch, p, batch_id=1)  # replay
    assert m1["row_count"] == m2["row_count"] == 80
    assert m2["applied_batch_ids"] == [0, 1]
    back, _ = read_training_shards(spark, p)
    assert back.count() == 80
