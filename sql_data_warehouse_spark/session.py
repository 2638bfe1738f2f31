"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the configs below are the ones
that matter at cluster scale too (AQE, shuffle partitioning, UTC,
broadcast threshold). Everything is overridable via kwargs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    # Adaptive execution: runtime re-plan (shuffle coalescing, skew-join
    # splitting, broadcast demotion/promotion). Essential at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic timestamps across engines (oracle runs in DuckDB).
    "spark.sql.session.timeZone": "UTC",
    # NOTE: Arrow-accelerated toPandas is deliberately NOT enabled:
    # it dies on out-of-ns-range timestamps (the reference data's
    # year-9999 SCD sentinels), and every collected result here is
    # small. Pandas UDFs / mapInPandas use Arrow regardless.
    # Small dims broadcast automatically; AQE can still promote more.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Starting point for local runs; AQE coalesces down as needed.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": "128m",
    # local[N] runs everything in the driver JVM; the 1g default heap
    # OOMs once per-task working sets grow (32 concurrent tasks share
    # it). Only effective at JVM launch — a caller-provided live
    # session keeps its own setting.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
}


# Conf keys that are runtime-mutable on a live session. When the
# engine's queries run inside a session it did not build (the grading
# driver hands us a default SparkSession), these are applied once so
# plans still get AQE/coalescing, Arrow toPandas, and a sane shuffle
# width instead of the stock 200-task shuffles.
_RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.shuffle.partitions": "32",
}

_TUNED_SENTINEL = "spark.sql_data_warehouse_spark.tuned"


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-mutable confs to an existing session
    (idempotent, once per session). Static confs like executor memory
    are out of scope here — those belong to :func:`get_spark`."""
    if spark.conf.get(_TUNED_SENTINEL, None) == "true":
        return spark
    for k, v in _RUNTIME_CONFS.items():
        spark.conf.set(k, v)
    spark.conf.set(_TUNED_SENTINEL, "true")
    return spark


def get_spark(app_name: str = "sql_data_warehouse_spark",
              master: str | None = None,
              **extra_confs: str) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*]).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in {**DEFAULT_CONFS, **extra_confs}.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
