"""Per-source ingestion connectors (SURVEY §2.1 breadth).

Each module re-expresses one reference source package's parser layer
(agrobr/<source>/parser.py + models.py) Spark-first: a pure
``*_columns(df)`` Catalyst transformation for the distributed path
plus a small ``read_*`` payload decoder registered under
``<source>.<shape>`` in the connector registry (the plugin surface).

Network clients / HTTP stacks are driver-side and out of engine scope
per SURVEY §4; the parser behavior they feed is what lives here,
pinned by tests/golden_data cases captured from the reference.
"""

from agrobr_spark.sources.connectors import (  # noqa: F401 — registration
    abiove,
    anda,
    anp_diesel,
    antaq,
    antt_pedagio,
    b3,
    bcb,
    cepea,
    comexstat,
    comtrade,
    conab,
    conab_ceasa,
    conab_custo,
    conab_progresso,
    conab_serie,
    deral,
    desmatamento,
    ibge_sidra,
    imea,
    inmet,
    mapa_psr,
    mapbiomas,
    nasa_power,
    noticias_agricolas,
    queimadas,
    sicar,
    usda,
)
from agrobr_spark.sources.connectors._base import (
    get_connector,
    list_connectors,
    register_connector,
)

__all__ = ["get_connector", "list_connectors", "register_connector"]
