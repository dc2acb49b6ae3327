"""Query catalog: every implemented SURVEY §2 operator as a pair of

- a Spark DataFrame query ``(spark, sf_dir) -> DataFrame`` (the engine), and
- an equivalent ANSI SQL string for the DuckDB oracle (the spec).

The driver (and ``tests/test_oracle.py``) runs both sides on the same
parquet tables and compares row count + schema + order-insensitive
value hash, so every query here must be **deterministic across
engines**:

- per-row arithmetic on the same doubles is IEEE-identical → safe;
- order-dependent double aggregation (sum/avg) is NOT → aggregate in
  ``decimal(18,4)`` and cast the final value back to double;
- averages = ``cast(sum_dec as double) / cast(count as double)`` (both
  operands bit-identical → quotient bit-identical);
- window/top-k orderings always carry a unique tie-breaker key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class CatalogEntry:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver runs rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, CatalogEntry] = {}


def register(
    name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = CatalogEntry(name, fn, oracle, tags, doc or (fn.__doc__ or ""))
        return fn

    return deco


# The round driver checks the FIRST ~50 catalog entries (dict order)
# against the DuckDB oracle and records CORRECTNESS_r{N}; the rest get
# no row. Order therefore rotates per round so every operator lands in
# the driver window across rounds: never-driver-checked queries first,
# then queries whose last driver row was red (fixed since), then new
# additions, then the already-proven tail (still oracle-checked locally
# by tests/test_oracle.py every run).
_PRIORITY: tuple[str, ...] = (
    # -- never driver-checked as of CORRECTNESS_r01 --
    "s5_json_scan", "s8_store_scan", "p5_null_drop", "j5_dedup_dim_join",
    "o1_multikey_sort_limit", "o2_desc_recency", "o3_topk_search",
    "o4_limit_latest",
    "u1_union_all", "u2_anti_join", "u4_intersect_except",
    "w4_latest_per_key", "w5_calendar_antijoin",
    "f1_ptbr_number_parse", "f2_multiformat_date_parse", "f3_safra_algebra",
    "f8f9_sentinel_and_arithmetic", "f10_string_hygiene", "f11_content_hash",
    "f13_regex_classify",
    "m2_ttl_validity", "d4_snapshot_filter",
    "sim_cosine_topk", "sim_ivf_ann",
    "stream_tumbling_daily", "stream_stateful_dod",
    # -- red in CORRECTNESS_r01, fixed this round --
    "v1_contract_validate", "v2_sanity_rules", "v3_semantic_rules",
    "v6_quality_certification", "f7_unit_conversion", "w7_sessionize",
    "mm_decode_features",
    # -- scale-path rework this round (re-verify) --
    "dedup_embedding_cosine",
    # -- previously-green rotation tail (highest-value first) --
    "m1_merge_upsert", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash",
    "j7_asof_join", "j8_range_join", "w6_topk_per_group",
    "a11_grouping_sets", "a12_unpivot",
    "text_token_count", "text_quality_score", "text_lang_id",
    "text_fingerprint", "mm_binary_metadata",
)


def catalog() -> dict[str, CatalogEntry]:
    """All registered queries (imports every query module on first use),
    in driver-window priority order (see ``_PRIORITY``)."""
    from agrobr_spark.queries import (  # noqa: F401
        dedup,
        merge,
        normalize_ops,
        operator_ops,
        pipeline_text,
        relational,
        scalars,
        similarity,
        store_ops,
        streaming_ops,
        validation_ops,
    )

    rank = {n: i for i, n in enumerate(_PRIORITY)}
    ordered = sorted(
        _REGISTRY, key=lambda n: (rank.get(n, len(_PRIORITY)), n)
    )
    return {n: _REGISTRY[n] for n in ordered}


def queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in catalog().items() if e.oracle is not None}
