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
    "bool": T.BooleanType(),
}


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    dtype: str  # key of _TYPE_MAP
    nullable: bool = True
    min_value: float | None = None
    max_value: float | None = None


@dataclass(frozen=True)
class Contract:
    name: str
    version: str
    columns: tuple[ColumnSpec, ...]
    primary_key: tuple[str, ...]
    description: str = ""

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
