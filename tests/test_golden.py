"""Golden-data tests (the reference's test strategy, SURVEY §5.2):
each case dir holds a captured raw payload + pinned expectations
(count, first/last row, non-null columns, value checksum). Cases are
auto-discovered; regenerate expectations with
``python tests/test_golden.py --regen`` after an intentional parser
change (the diff then shows exactly what moved).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pyspark.sql.functions as F
import pytest

GOLDEN = Path(__file__).parent / "golden_data"

CASES = sorted(p.parent for p in GOLDEN.glob("*/*/metadata.json"))


def _parse(spark, case: Path):
    meta = json.loads((case / "metadata.json").read_text())
    reader = meta["reader"]
    if reader == "html":
        from agrobr_spark.functions import parse_ptbr_number
        from agrobr_spark.sources.html import find_data_table

        html = (case / "response.html").read_text()
        t = find_data_table(html, **meta.get("options", {}))
        assert t is not None, "data table not recognized"
        df = spark.createDataFrame(
            [tuple(r) for r in t["rows"]],
            schema=", ".join(f"`{h}` string" for h in t["headers"]),
        )
    elif reader == "csv":
        from agrobr_spark.sources.csv_ptbr import read_csv_ptbr

        return read_csv_ptbr(
            spark,
            str(case / "response.csv"),
            decimal_cols=meta.get("decimal_cols"),
            date_cols=meta.get("date_cols"),
            **meta.get("options", {}),
        )
    elif reader == "json_param":
        from agrobr_spark.sources.json_nested import param_date_value_rows

        payload = (case / "response.json").read_text()
        return param_date_value_rows(spark, [payload], **meta.get("options", {}))
    elif reader == "connector":
        # generic per-source connector case: payloads listed as
        # [filename, kind] pairs, kind ∈ bytes|text|json|path
        from agrobr_spark.sources.connectors import get_connector

        def _load(name: str, kind: str):
            p = case / name
            if kind == "bytes":
                return p.read_bytes()
            if kind == "text":
                return p.read_text()
            if kind == "json":
                return json.loads(p.read_text())
            if kind == "path":
                return str(p)
            raise ValueError(f"unknown payload kind {kind}")

        args = [_load(n, k) for n, k in meta["payloads"]]
        return get_connector(meta["connector"])(
            spark, *args, **meta.get("options", {})
        )
    else:  # pragma: no cover
        raise ValueError(f"unknown reader {reader}")

    from agrobr_spark.functions import parse_ptbr_number

    for c in meta.get("decimal_cols", []):
        df = df.withColumn(c, parse_ptbr_number(F.col(c)))
    for c, fmt in meta.get("date_cols", {}).items():
        df = df.withColumn(c, F.try_to_timestamp(F.col(c), F.lit(fmt)).cast("date"))
    return df


def _observe(df) -> dict:
    from tests.oracle_harness import value_hash

    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    srows = sorted(map(lambda r: tuple(str(v) for v in r), rows))
    return {
        "count": len(rows),
        "columns": cols,
        "first_row": list(srows[0]) if rows else [],
        "last_row": list(srows[-1]) if rows else [],
        "non_null_columns": [
            c for i, c in enumerate(cols) if all(r[i] is not None for r in rows)
        ],
        "checksum": value_hash(rows, cols),
    }


@pytest.mark.parametrize("case", CASES, ids=lambda c: f"{c.parent.name}/{c.name}")
def test_golden(spark, case):
    expected_file = case / "expected.json"
    assert expected_file.exists(), (
        f"no expected.json for {case}; run python tests/test_golden.py --regen"
    )
    got = _observe(_parse(spark, case))
    want = json.loads(expected_file.read_text())
    assert got == want


if __name__ == "__main__" and "--regen" in sys.argv:
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from agrobr_spark.session import get_spark

    spark = get_spark(shuffle_partitions=4)
    for case in CASES:
        obs = _observe(_parse(spark, case))
        (case / "expected.json").write_text(json.dumps(obs, indent=1))
        print(case, "->", obs["count"], "rows", obs["checksum"][:12])
