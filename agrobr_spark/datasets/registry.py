"""The 12 semantic datasets (D2) and their contract bindings.

Reference: agrobr/datasets/registry.py:8-67 + agrobr/datasets/*.py —
each dataset is (name, contract, priority-ordered sources, normalize
stage). Physical sources are pluggable readers (a store scan, an
ingest connector, a cached parquet) attached at runtime; the
registry fixes the names, contracts, and normalize semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from agrobr_spark.datasets.base import BaseDataset, DatasetSource

# dataset name -> bound contract (SURVEY §2.11 D2 ↔ §2.10 table)
DATASETS: dict[str, str] = {
    "preco_diario": "cepea.indicador",
    "producao_anual": "ibge.pam",
    "estimativa_safra": "conab.safras",
    "balanco": "conab.balanco",
    "credito_rural": "bcb.credito_rural",
    "exportacao": "comexstat.exportacao",
    "fertilizante": "anda.fertilizante",
    "custo_producao": "conab.custo_producao",
    "abate_trimestral": "ibge.abate",
    "pecuaria_municipal": "ibge.ppm",
    "censo_agropecuario": "ibge.censo_agro",
    "cadastro_rural": "sicar.imoveis",
}


class PrecoDiarioDataset(BaseDataset):
    """preco_diario: CEPEA indicator prices with cache fallback
    (ref: agrobr/datasets/preco_diario.py:65-159)."""

    name = "preco_diario"
    contract_name = "cepea.indicador"

    def __init__(self, sources: list[DatasetSource], produto: str | None = None):
        super().__init__(sources)
        self.produto = produto

    def normalize(self, df: DataFrame, **kwargs) -> DataFrame:
        # D3: inject produto/fonte when missing, recency sort
        produto = kwargs.get("produto", self.produto)
        if "produto" not in df.columns and produto:
            df = df.withColumn("produto", F.lit(produto))
        if "fonte" not in df.columns:
            df = df.withColumn("fonte", F.lit("cepea"))
        for c in ("metodologia", "anomalies"):
            if c not in df.columns:
                df = df.withColumn(c, F.lit(None).cast("string"))
        return df.orderBy(F.desc("data"))


class GenericDataset(BaseDataset):
    def __init__(self, name: str, contract_name: str | None, sources: list[DatasetSource]):
        self.name = name
        self.contract_name = contract_name
        super().__init__(sources)


def get_dataset(
    name: str, sources: list[DatasetSource], **kwargs
) -> BaseDataset:
    from agrobr_spark.datasets.semantic import SEMANTIC_DATASETS

    if name not in DATASETS:
        raise KeyError(f"unknown dataset {name!r}; see list_datasets()")
    if name == "preco_diario":
        return PrecoDiarioDataset(sources, **kwargs)
    return SEMANTIC_DATASETS[name](sources)


def list_datasets() -> list[str]:
    return sorted(DATASETS)
