"""SparkSession factory tuned for the engine.

The reference is a single-process pandas library (no session concept);
this factory is the Spark-native foundation every stage builds on.
Scale posture (100 TB / 1000-executor design, tested on local[N]):

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting
  and dynamic broadcast decisions replace the reference's hand-tuned
  chunking (ref: agrobr/cache/duckdb_store.py:79 fixed 5000-row chunks).
- Arrow on: every pandas/Spark boundary (Pandas UDFs, toPandas) is
  vectorized batch transfer, not row pickling.
- shuffle.partitions defaults sized for local test runs; on a real
  cluster AQE coalesces from a high initial number, so we only pin a
  small value when running local.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(
    app_name: str = "agrobr-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback
    ``local[*]``) so tests and bench share one code path; on a cluster,
    leave ``master`` unset and let spark-submit inject it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # pt-BR parsing follows the reference's errors="coerce" semantics
        # (invalid input -> NULL, e.g. agrobr/ibge/api.py:148); sessions we
        # own therefore run non-ANSI. Catalog queries still use try_* forms
        # so they behave identically under a driver-owned ANSI session.
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if master is None and not os.environ.get("SPARK_CONNECT_MODE_ENABLED"):
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    if master and master.startswith("local"):
        # local mode: driver JVM hosts all executor threads — the 1g
        # default heap causes GC stalls on wide shuffles. Applies only
        # when this factory creates the JVM (ignored on getOrCreate
        # reuse, harmless on a cluster where spark-submit sets it).
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
    if shuffle_partitions is None:
        # local mode: match core count; cluster mode: start high, AQE coalesces
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def thread_target(spark, fn):
    """``inheritable_thread_target(spark)(fn)`` with a fallback for
    non-pinned-thread mode (r13 ADVICE): under ``PYSPARK_PIN_THREAD=
    false`` pyspark's non-pinned branch returns the session argument
    UNCHANGED, so the curried call raises ``TypeError: 'SparkSession'
    object is not callable``. On the default pinned mode this is
    exactly the warning-free tag-inheriting wrapper; on non-pinned
    mode the raw function is returned (thread-locals are shared
    there, so there is nothing to inherit). One shared helper so the
    engine's eight thread-pool sites cannot drift."""
    from pyspark import inheritable_thread_target

    wrapped = inheritable_thread_target(spark)
    if not callable(wrapped):
        return fn
    return wrapped(fn)
