"""agrobr_spark — a PySpark-native analytics engine.

Brand-new implementation of the query / data-processing capabilities of
the reference library (bruno-portfolio/agrobr, studied read-only at
/root/reference): schema contracts, cross-source normalization,
relational core (joins / aggregations / windows / set-ops), cached-table
MERGE upserts, validation rules, a semantic dataset layer, plus
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) — all expressed Spark-first
(DataFrame / Spark SQL / Structured Streaming) and designed for
multi-executor clusters at 100 TB scale.
"""

__version__ = "0.1.0"

from agrobr_spark.session import get_spark  # noqa: F401
