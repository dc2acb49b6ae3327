"""Dataset contracts: declared schemas with PK / nullability / range
metadata, and a generated validation query per contract.

Re-expression of the reference's contract system
(ref: agrobr/contracts/__init__.py:11-127 — ColumnType enum,
Contract.validate with required-column / type / null / range / PK-dup
checks; 30 registered contracts listed in SURVEY §2.10).

Spark-first design: a contract compiles to

- a ``StructType`` (schema declaration / enforcement on read), and
- ONE aggregate validation query (`validation_query`) that computes
  every violation count in a single pass — null counts, range
  violations, and PK duplicate groups — instead of the reference's
  per-column pandas loops. At 100 TB this is one scan + one partial
  aggregate; the PK check is the only shuffle (groupBy on the PK).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

_TYPE_MAP: dict[str, T.DataType] = {
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "str": T.StringType(),
    "int": T.LongType(),  # nullable Int64 regime (ref: agrobr/ibge/api.py:149)
    "float": T.DoubleType(),
    "decimal": T.DecimalType(18, 4),  # ref: duckdb_store.py:64 DECIMAL(18,4)
    "Decimal": T.DecimalType(18, 4),  # reference JSON spelling
    "bool": T.BooleanType(),
}


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    dtype: str  # key of _TYPE_MAP
    nullable: bool = True
    min_value: float | None = None
    max_value: float | None = None
    # interchange metadata (ref: agrobr/contracts/__init__.py:27-39):
    # carried so to_json() reproduces the reference's shipped
    # agrobr/schemas/*.json files losslessly
    unit: str | None = None
    stable: bool = True
    deprecated: bool = False
    description: str = ""


@dataclass(frozen=True)
class Contract:
    name: str
    version: str
    columns: tuple[ColumnSpec, ...]
    primary_key: tuple[str, ...]
    description: str = ""
    # interchange metadata (ref: agrobr/contracts/__init__.py:97-104)
    guarantees: tuple[str, ...] = ()
    breaking_policy: str = "major"
    effective_from: str = ""

    def struct_type(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.name, _TYPE_MAP[c.dtype], c.nullable) for c in self.columns]
        )

    def missing_columns(self, df: DataFrame) -> list[str]:
        """U3 schema set-difference (metadata-level;
        ref: agrobr/quality.py:138-141)."""
        have = set(df.columns)
        return [c.name for c in self.columns if c.name not in have]

    def validation_exprs(self) -> list:
        """One aggregate expression per declared check."""
        exprs = [F.count(F.lit(1)).alias("linhas")]
        for c in self.columns:
            col = F.col(c.name)
            if not c.nullable:
                exprs.append(
                    F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"nulos_{c.name}")
                )
            if c.min_value is not None or c.max_value is not None:
                lo = F.lit(c.min_value) if c.min_value is not None else None
                hi = F.lit(c.max_value) if c.max_value is not None else None
                oob = F.lit(False)
                if lo is not None:
                    oob = oob | (col < lo)
                if hi is not None:
                    oob = oob | (col > hi)
                exprs.append(F.sum(F.when(oob, 1).otherwise(0)).alias(f"fora_{c.name}"))
        return exprs

    def validation_query(self, df: DataFrame) -> DataFrame:
        """The whole contract as one two-branch aggregate plan:
        column checks (single pass, no shuffle beyond final combine) +
        PK duplicate count (one groupBy shuffle on the PK)."""
        checks = df.agg(*self.validation_exprs())
        dups = (
            df.groupBy(*[F.col(k) for k in self.primary_key])
            .count()
            .filter(F.col("count") > 1)
            .agg(
                F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).alias("pk_duplicados")
            )
        )
        return checks.crossJoin(dups)

    def is_valid(self, df: DataFrame) -> bool:
        if self.missing_columns(df):
            return False
        row = self.validation_query(df).collect()[0].asDict()
        return all(v == 0 for k, v in row.items() if k != "linhas")

    # -- JSON interchange (ref: agrobr/contracts/__init__.py:174-249,
    #    shipped exports agrobr/schemas/*.json) --

    def to_dict(self) -> dict:
        """Reference-compatible schema dict: same keys, same key
        order, same derived sections (required_columns, dtypes,
        nullable, constraints) as the reference's ``Contract.to_dict``
        so the exported files are drop-in replacements for
        agrobr/schemas/*.json."""
        constraints: dict = {}
        if self.primary_key:
            constraints["no_duplicates"] = True
        for c in self.columns:
            if c.min_value is not None:
                constraints[f"{c.name}_min"] = c.min_value
            if c.max_value is not None:
                constraints[f"{c.name}_max"] = c.max_value
        return {
            "name": self.name,
            "schema_version": self.version,
            "effective_from": self.effective_from,
            "breaking_policy": self.breaking_policy,
            "primary_key": list(self.primary_key),
            "required_columns": [
                c.name for c in self.columns if not c.nullable and c.stable
            ],
            "dtypes": {c.name: c.dtype for c in self.columns},
            "nullable": {c.name: c.nullable for c in self.columns},
            "columns": [
                {
                    "name": c.name,
                    "type": c.dtype,
                    "nullable": c.nullable,
                    "unit": c.unit,
                    "stable": c.stable,
                    "deprecated": c.deprecated,
                    "description": c.description,
                    "min_value": c.min_value,
                    "max_value": c.max_value,
                }
                for c in self.columns
            ],
            "constraints": constraints,
            "guarantees": list(self.guarantees),
        }

    def to_json(self, indent: int = 2) -> str:
        import json

        return json.dumps(self.to_dict(), indent=indent, ensure_ascii=False)

    @classmethod
    def from_dict(cls, data: dict) -> "Contract":
        nullable_map = data.get("nullable", {})
        cols = []
        for cd in data.get("columns", []):
            dtype = cd["type"]
            if dtype not in _TYPE_MAP:
                raise ValueError(f"unknown contract column type {dtype!r}")
            cols.append(
                ColumnSpec(
                    name=cd["name"],
                    dtype=dtype,
                    nullable=cd.get(
                        "nullable", nullable_map.get(cd["name"], True)
                    ),
                    min_value=cd.get("min_value"),
                    max_value=cd.get("max_value"),
                    unit=cd.get("unit"),
                    stable=cd.get("stable", True),
                    deprecated=cd.get("deprecated", False),
                    description=cd.get("description", ""),
                )
            )
        return cls(
            name=data["name"],
            version=data.get("schema_version", data.get("version", "1.0")),
            columns=tuple(cols),
            primary_key=tuple(data.get("primary_key", ())),
            guarantees=tuple(data.get("guarantees", ())),
            breaking_policy=data.get("breaking_policy", "major"),
            effective_from=data.get("effective_from", ""),
        )

    @classmethod
    def from_json(cls, text: str) -> "Contract":
        import json

        return cls.from_dict(json.loads(text))


_REGISTRY: dict[str, Contract] = {}


def register_contract(c: Contract) -> Contract:
    _REGISTRY[c.name] = c
    return c


def get_contract(name: str) -> Contract:
    from agrobr_spark.contracts import registry  # noqa: F401

    return _REGISTRY[name]


def contract_names() -> list[str]:
    from agrobr_spark.contracts import registry  # noqa: F401

    return sorted(_REGISTRY)


def all_contracts() -> dict[str, Contract]:
    from agrobr_spark.contracts import registry  # noqa: F401

    return dict(_REGISTRY)


def export_json_schemas(output_dir: str) -> list[str]:
    """Write every registered contract as ``<name>.json`` in the
    reference's interchange format (ref: agrobr/contracts/
    __init__.py:287-300 ``generate_json_schemas``). Filenames use the
    contract's dotted name (the reference keys its registry by a
    separate dataset slug; the payload format is identical). Driver-
    side dev artifact — plain local paths."""
    import pathlib

    out = pathlib.Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    written = []
    for name, c in sorted(all_contracts().items()):
        p = out / f"{name}.json"
        p.write_text(c.to_json(), encoding="utf-8")
        written.append(str(p))
    return written
