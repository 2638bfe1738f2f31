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
    # Arrow for any toPandas / pandas-UDF exchange.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Small dims broadcast automatically; AQE can still promote more.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Starting point for local runs; AQE coalesces down as needed.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": "128m",
}


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
