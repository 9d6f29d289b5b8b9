"""SparkSession factory tuned for both local testing and cluster scale.

The reference applies session config passthrough + pre-SQL ``SET`` support
(reference: odibi/engine/spark_engine.py:221-250); here the session is
built once with scale-aware defaults:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting) —
  at 100 TB the static ``spark.sql.shuffle.partitions`` is always wrong
  for some stage, so let AQE re-plan.
- Arrow enabled for every pandas interchange (Pandas UDFs, toPandas).
- Session timezone pinned to UTC so timestamp semantics are stable and
  comparable against external oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "odibi_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    On a real cluster ``master`` comes from the environment; locally we
    default to ``local[N]`` with N from ``SPARK_GRAFT_CPUS``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # r15 (guide §5): the curation operators pin ~50 eagerly
        # localCheckpointed model tables per full run; the Context-
        # Cleaner only reaps their blocks after a DRIVER GC, and the
        # default periodic-GC interval (30min) outlives a whole
        # session — blocks accumulated until storage eviction and GC
        # pressure inflated late-session queries. r16: long-lived
        # query runners (bench.py) now release each query's blocks
        # deterministically between queries, so the forced-GC cadence
        # relaxes 1min -> 5min (ADVICE r15: a per-minute full GC adds
        # stop-the-world pauses on large production driver heaps);
        # override via env for different session lifetimes. NOTE
        # getOrCreate may return an existing session, in which case
        # this conf (like any other here) does not re-apply.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "5min"),
        )
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
