"""Skew-aware join: salting for hot keys.

At 100 TB a handful of hot keys (one crop, one UF, one event_type) can
put an entire shuffle partition on one executor. AQE's skew-join
handles most cases (`spark.sql.adaptive.skewJoin.enabled`, on in the
session factory); explicit salting is the deterministic fallback when
the skew is known ahead of time or the join feeds a window that AQE
can't split.

Mechanics: the big side gets a salt in [0, n); the small side is
replicated n times (one copy per salt value); the join key becomes
(key, salt), spreading each hot key over n reducers. The salt is
`pmod(hash(entire row), n)` — deterministic, uniformly spread, no RNG
(rand() would break retry idempotency and plan caching).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted
    ``salt`` ways and the small side replicated per salt value.

    Result columns match ``big.join(small, on, how)``. Supported hows:
    inner and left (the replicated-side asymmetry makes right/full
    incorrect — use AQE skew join for those).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_big = big.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    replicated = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_big.join(replicated, [*on, _SALT], how).drop(_SALT)
