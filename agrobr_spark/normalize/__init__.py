"""Normalization library (SURVEY §2.8 F3-F7, F12): Spark expressions +
broadcast dimension tables.

The reference does all of this with Python dicts and per-value function
calls (agrobr/normalize/*.py); at 100 TB scale the idiomatic Spark shape
is a *broadcast join against a small dimension DataFrame* — the dim is
shipped once per executor and the lookup is a hash probe inside
whole-stage codegen, instead of a Python call per row.

Every dim here is also exposed as a ``VALUES``-clause SQL fragment so
the DuckDB oracle can build the identical relation.
"""

from agrobr_spark.normalize.dims import (
    CROP_VARIANTS,
    MUNICIPALITIES,
    UF_DIM,
    UNIT_FACTORS,
    crop_dim,
    municipality_dim,
    uf_dim,
    unit_dim,
    values_sql,
)
from agrobr_spark.normalize.expressions import (
    fold_accents,
    norm_key,
    parse_ptbr_number,
    safra_label,
)

__all__ = [
    "CROP_VARIANTS",
    "MUNICIPALITIES",
    "UF_DIM",
    "UNIT_FACTORS",
    "crop_dim",
    "municipality_dim",
    "uf_dim",
    "unit_dim",
    "values_sql",
    "fold_accents",
    "norm_key",
    "parse_ptbr_number",
    "safra_label",
]
