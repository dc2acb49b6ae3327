"""Semantic dataset layer: named datasets with priority-ordered source
fallback, contract validation, snapshot pinning, and provenance
(SURVEY §2.11 D1-D4).

Driver-side control flow around lazy Spark plans — the resolver picks
a source, the returned DataFrame stays unexecuted until the caller
acts on it (ref architecture: agrobr/datasets/base.py:30-165).
"""

from agrobr_spark.datasets.base import (
    BaseDataset,
    DatasetSource,
    MetaInfo,
    SourceUnavailableError,
)
from agrobr_spark.datasets.registry import DATASETS, get_dataset, list_datasets

__all__ = [
    "BaseDataset",
    "DatasetSource",
    "MetaInfo",
    "SourceUnavailableError",
    "DATASETS",
    "get_dataset",
    "list_datasets",
]
