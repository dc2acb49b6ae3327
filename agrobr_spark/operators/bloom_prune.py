"""Bloom-filter semi-join pruning as a pure-DataFrame bitmap join.

Catalyst injects runtime Bloom filters into eligible shuffle joins on
its own (``spark.sql.optimizer.runtime.bloomFilter.enabled``), but the
injection only fires inside a single plannable join — it cannot prune
a big side BEFORE an aggregation, reuse one filter across several
stages or queries, or ship the filter to a different pipeline. This
module builds the same runtime-filter idea as first-class data:

- ``bloom_bitmap(small, key)`` folds the small side's keys into an
  m-bit Bloom bitmap REPRESENTED AS ROWS — ``(word, bits)`` with
  ``word = bucket / 64`` and ``bits`` the per-word OR of
  ``1 << (bucket % 64)`` (one ``groupBy(word).agg(bit_or(...))``).
  With k hash seeds each key sets k bits (``xxhash64(key, seed)``).
  The bitmap is ceil(m/64) rows of ~12 bytes: for m = 8 bits/key that
  is ~1.5 bytes/key broadcast — an order of magnitude smaller than
  broadcasting the distinct key set itself, which is exactly the
  regime this exists for (small side too big to broadcast as a hash
  relation, cheap to broadcast as a bitmap).
- ``bloom_prune(big, bitmap, key)`` keeps rows whose EVERY seed hits a
  set bit: one broadcast equi-join on the word index per seed plus a
  bit test — entirely map-side, no shuffle of the big side, so it
  composes in front of any aggregation or join.
- ``bloom_semi_join(big, small, key)`` = prune, then an exact
  ``left_semi`` join. Bloom false positives (rate ≈ (1-e^(-k·S/m))^k)
  only cost work, never correctness — the final result is
  byte-identical to the plain semi join, which is what the catalog
  oracle pins.

At 100 TB the shape is: bitmap built once from the dimension-side scan
(tiny shuffle, m/64 rows), broadcast everywhere, the fact table pruned
at the scan end of the plan before its first wide exchange — the same
placement the engine-injected filter gets, with the filter now
reusable and composable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_BITS_PER_KEY = 8
DEFAULT_HASHES = 2


def bloom_bitmap(
    small: DataFrame,
    key_col: str,
    m_bits: int,
    k_hashes: int = DEFAULT_HASHES,
) -> DataFrame:
    """Bloom bitmap of ``small[key_col]`` as ``(word int, bits long)``
    rows; ``m_bits`` is rounded up to a multiple of 64. Deterministic:
    xxhash64 seeded per hash index, no randomness. The key is
    canonicalized to string before hashing — xxhash64 is
    type-sensitive, so without this an int-vs-bigint schema drift
    between the build and probe sides would make every probe miss and
    silently empty the semi join."""
    m = max(64, (int(m_bits) + 63) // 64 * 64)
    seeds = F.explode(
        F.array(*[F.lit(i) for i in range(int(k_hashes))])
    ).alias("_seed")
    bucket = F.pmod(F.xxhash64(F.col("_k"), F.col("_seed")), F.lit(m))
    return (
        small.select(F.col(key_col).cast("string").alias("_k"))
        .select("_k", seeds)
        .select((bucket / 64).cast("int").alias("word"), bucket.alias("_bkt"))
        # SQL shiftleft accepts a column bit count (the Python wrapper
        # only takes a literal int)
        .select(
            "word",
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(_bkt % 64 AS INT))"
            ).alias("_bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("_bit").alias("bits"))
    )


def bloom_prune(
    big: DataFrame,
    bitmap: DataFrame,
    key_col: str,
    m_bits: int,
    k_hashes: int = DEFAULT_HASHES,
) -> DataFrame:
    """Rows of ``big`` whose key MIGHT be in the bitmap (every seed's
    bit is set). One broadcast join on the word index per seed — all
    map-side; a word absent from the bitmap means no bit set, so the
    inner join itself rejects those rows and the bit test handles the
    rest. Superset of the true matches; never drops a true match.
    The probe hashes the key cast to string, matching
    ``bloom_bitmap``'s canonicalization, so build/probe dtype drift
    cannot silently zero the filter."""
    m = max(64, (int(m_bits) + 63) // 64 * 64)
    out = big
    for i in range(int(k_hashes)):
        bucket = F.pmod(
            F.xxhash64(F.col(key_col).cast("string"), F.lit(i)), F.lit(m)
        )
        bm = F.broadcast(
            bitmap.select(
                F.col("word").alias(f"_w{i}"), F.col("bits").alias(f"_b{i}")
            )
        )
        out = (
            out.withColumn(f"_wk{i}", (bucket / 64).cast("int"))
            .withColumn(f"_bk{i}", (bucket % 64).cast("int"))
            .join(bm, F.col(f"_wk{i}") == F.col(f"_w{i}"))
            .filter(
                F.expr(f"(shiftright(_b{i}, _bk{i}) & 1) = 1")
            )
            .drop(f"_wk{i}", f"_bk{i}", f"_w{i}", f"_b{i}")
        )
    return out


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    bits_per_key: int = DEFAULT_BITS_PER_KEY,
    k_hashes: int = DEFAULT_HASHES,
    n_keys: int | None = None,
) -> DataFrame:
    """Exact ``big SEMI JOIN small ON key_col`` with a Bloom-bitmap
    prune in front: the pruned big side then meets the small side in
    the usual shuffled semi join, but the shuffle now carries only
    candidates (true matches + the Bloom false-positive residue)
    instead of the whole fact table. Result is byte-identical to the
    plain semi join — false positives are removed by the exact join.

    ``n_keys`` sizes the bitmap (``bits_per_key`` bits each); when
    omitted it is counted with one extra small-side job (at scale,
    pass the known cardinality or a parquet-footer estimate)."""
    if n_keys is None:
        n_keys = small.select(key_col).distinct().count()
    m = max(64, int(n_keys) * int(bits_per_key))
    bm = bloom_bitmap(small, key_col, m, k_hashes)
    pruned = bloom_prune(big, bm, key_col, m, k_hashes)
    return pruned.join(
        small.select(F.col(key_col)).distinct(), key_col, "left_semi"
    )
