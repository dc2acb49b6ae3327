"""Reusable composite operators the DataFrame API lacks as primitives.

Each is a composition of built-in ops (preferred) or an Arrow-batched
Pandas UDF (only where semantics demand Python), never row-at-a-time
UDFs or driver-side loops.
"""

from agrobr_spark.operators.asof import asof_join
from agrobr_spark.operators.multimodal import (
    MULTIMODAL_SCHEMA,
    binary_metadata,
    decode_features,
    frame_sample,
)

__all__ = [
    "asof_join",
    "MULTIMODAL_SCHEMA",
    "binary_metadata",
    "decode_features",
    "frame_sample",
]
