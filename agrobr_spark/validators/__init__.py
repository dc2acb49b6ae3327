"""Validation suite: sanity rules, semantic rule registry, quality
certification (SURVEY §2.10 V2/V3/V6).

All rules compile to Column expressions evaluated in ONE generated
aggregate query per batch — the Spark-native replacement for the
reference's per-row / per-rule Python loops
(ref: agrobr/validators/sanity.py, semantic.py, quality.py).
"""

from agrobr_spark.validators.sanity import SANITY_RULES, sanity_check
from agrobr_spark.validators.semantic import (
    SEMANTIC_RULES,
    SemanticRule,
    register_rule,
    run_rules,
)
from agrobr_spark.validators.quality import certify, quality_metrics

__all__ = [
    "SANITY_RULES",
    "sanity_check",
    "SEMANTIC_RULES",
    "SemanticRule",
    "register_rule",
    "run_rules",
    "certify",
    "quality_metrics",
]
