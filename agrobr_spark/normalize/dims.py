"""Broadcast dimension tables for normalization joins.

Re-expressions of the reference's lookup dicts as relations
(ref: agrobr/normalize/crops.py:6-174, regions.py:78-205,
municipalities.py:21-93, units.py:25-198). The data here is a
representative subset — enough to exercise every join shape the
reference uses (variant→canonical, name→code, 2-key product-dependent
factors); a production deployment loads the full dims from parquet the
same way.

At scale: each dim is tiny (≤ thousands of rows) → always broadcast;
the fact-side key is accent-folded/upper-cased *in the expression
layer* so the join stays an equi-join on a normalized key (never a
Python UDF probe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# variant (already accent-folded, lowered) → canonical crop slug
# (ref: agrobr/normalize/crops.py — 150+ variants → 41 canonical crops)
CROP_VARIANTS: list[tuple[str, str]] = [
    ("soja", "soja"),
    ("soybean", "soja"),
    ("soybeans", "soja"),
    ("soja em grao", "soja"),
    ("milho", "milho"),
    ("corn", "milho"),
    ("maize", "milho"),
    ("milho 1a safra", "milho_1"),
    ("milho 2a safra", "milho_2"),
    ("milho safrinha", "milho_2"),
    ("cafe", "cafe"),
    ("coffee", "cafe"),
    ("cafe arabica", "cafe_arabica"),
    ("cafe robusta", "cafe_robusta"),
    ("cafe conilon", "cafe_robusta"),
    ("algodao", "algodao"),
    ("cotton", "algodao"),
    ("algodao em pluma", "algodao"),
    ("arroz", "arroz"),
    ("rice", "arroz"),
    ("trigo", "trigo"),
    ("wheat", "trigo"),
    ("feijao", "feijao"),
    ("beans", "feijao"),
    ("cana de acucar", "cana"),
    ("cana-de-acucar", "cana"),
    ("sugarcane", "cana"),
    ("boi gordo", "boi"),
    ("cattle", "boi"),
    ("frango", "frango"),
    ("suino", "suino"),
    ("leite", "leite"),
    ("laranja", "laranja"),
    ("etanol", "etanol"),
    ("acucar", "acucar"),
    ("sorgo", "sorgo"),
    ("girassol", "girassol"),
    ("amendoim", "amendoim"),
    ("mandioca", "mandioca"),
    ("banana", "banana"),
    ("cacau", "cacau"),
]

# (uf, nome folded, regiao, codigo IBGE) — all 27 federative units
# (ref: agrobr/normalize/regions.py:78-205)
UF_DIM: list[tuple[str, str, str, int]] = [
    ("AC", "acre", "norte", 12),
    ("AL", "alagoas", "nordeste", 27),
    ("AP", "amapa", "norte", 16),
    ("AM", "amazonas", "norte", 13),
    ("BA", "bahia", "nordeste", 29),
    ("CE", "ceara", "nordeste", 23),
    ("DF", "distrito federal", "centro-oeste", 53),
    ("ES", "espirito santo", "sudeste", 32),
    ("GO", "goias", "centro-oeste", 52),
    ("MA", "maranhao", "nordeste", 21),
    ("MT", "mato grosso", "centro-oeste", 51),
    ("MS", "mato grosso do sul", "centro-oeste", 50),
    ("MG", "minas gerais", "sudeste", 31),
    ("PA", "para", "norte", 15),
    ("PB", "paraiba", "nordeste", 25),
    ("PR", "parana", "sul", 41),
    ("PE", "pernambuco", "nordeste", 26),
    ("PI", "piaui", "nordeste", 22),
    ("RJ", "rio de janeiro", "sudeste", 33),
    ("RN", "rio grande do norte", "nordeste", 24),
    ("RS", "rio grande do sul", "sul", 43),
    ("RO", "rondonia", "norte", 11),
    ("RR", "roraima", "norte", 14),
    ("SC", "santa catarina", "sul", 42),
    ("SP", "sao paulo", "sudeste", 35),
    ("SE", "sergipe", "nordeste", 28),
    ("TO", "tocantins", "norte", 17),
]

# (nome folded, uf, codigo_ibge 7-digit) — representative slice of the
# 5,571-row dim (ref: agrobr/normalize/municipalities.py + the 164 KB
# _municipios_ibge.json; full dim loads from parquet identically)
MUNICIPALITIES: list[tuple[str, str, int]] = [
    ("sao paulo", "SP", 3550308),
    ("campinas", "SP", 3509502),
    ("ribeirao preto", "SP", 3543402),
    ("rio de janeiro", "RJ", 3304557),
    ("belo horizonte", "MG", 3106200),
    ("uberlandia", "MG", 3170206),
    ("uberaba", "MG", 3170107),
    ("curitiba", "PR", 4106902),
    ("londrina", "PR", 4113700),
    ("cascavel", "PR", 4104808),
    ("porto alegre", "RS", 4314902),
    ("passo fundo", "RS", 4314100),
    ("cuiaba", "MT", 5103403),
    ("sorriso", "MT", 5107925),
    ("sinop", "MT", 5107909),
    ("rondonopolis", "MT", 5107602),
    ("campo grande", "MS", 5002704),
    ("dourados", "MS", 5003702),
    ("goiania", "GO", 5208707),
    ("rio verde", "GO", 5218805),
    ("salvador", "BA", 2927408),
    ("barreiras", "BA", 2903201),
    ("luis eduardo magalhaes", "BA", 2919553),
    ("fortaleza", "CE", 2304400),
    ("recife", "PE", 2611606),
    ("petrolina", "PE", 2611101),
    ("manaus", "AM", 1302603),
    ("belem", "PA", 1501402),
    ("santarem", "PA", 1506807),
    ("palmas", "TO", 1721000),
    ("balsas", "MA", 2101400),
    ("chapadinha", "MA", 2103000),
    ("brasilia", "DF", 5300108),
    ("vitoria", "ES", 3205309),
    ("florianopolis", "SC", 4205407),
    ("chapeco", "SC", 4204202),
    ("sao luis", "MA", 2111300),
    ("teresina", "PI", 2211001),
    ("uruçui", "PI", 2211209),
    ("campina grande", "PB", 2504009),
]

# (unidade, produto or '*', fator_kg) — kg-pivot conversion table
# (ref: agrobr/normalize/units.py:25-198; bushel is product-specific)
UNIT_FACTORS: list[tuple[str, str, float]] = [
    ("kg", "*", 1.0),
    ("ton", "*", 1000.0),
    ("mil_ton", "*", 1000000.0),
    ("sc60kg", "*", 60.0),
    ("sc50kg", "*", 50.0),
    ("sc40kg", "*", 40.0),
    ("arroba", "*", 15.0),
    ("bushel", "soja", 27.2155),
    ("bushel", "milho", 25.4012),
    ("bushel", "trigo", 27.2155),
]


def crop_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(CROP_VARIANTS, ["variante", "cultura"])


def uf_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(UF_DIM, ["uf", "nome", "regiao", "codigo_ibge"])


def municipality_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(MUNICIPALITIES, ["nome", "uf", "codigo_ibge"])


def unit_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(UNIT_FACTORS, ["unidade", "produto", "fator_kg"])


def _sql_lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def values_sql(rows: list[tuple], columns: list[str], alias: str = "d") -> str:
    """Render a dim as a DuckDB VALUES relation (oracle side)."""
    body = ", ".join("(" + ", ".join(_sql_lit(v) for v in r) + ")" for r in rows)
    return f"(VALUES {body}) AS {alias}({', '.join(columns)})"
