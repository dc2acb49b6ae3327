"""Scalar-function library (SURVEY §2.8): the engine's public
expression surface.

Everything is a Column expression (JVM-side, codegen-friendly); the
implementations live in ``agrobr_spark.normalize.expressions`` and are
re-exported here as the stable API.
"""

from agrobr_spark.normalize.expressions import (
    fold_accents,
    norm_key,
    parse_ptbr_number,
    safra_label,
)

__all__ = ["fold_accents", "norm_key", "parse_ptbr_number", "safra_label"]
