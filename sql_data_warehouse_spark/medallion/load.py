"""Operational ETL entry points — the reference's stored-procedure
layer (scripts/bronze/load_bronze.sql:22-143 ``EXEC bronze.load_bronze``
and scripts/silver/proc_load_silver.sql:23-244 ``EXEC silver.load_silver``)
as plain Python functions with the same shape: full-refresh per-table
loads, per-step wall-clock timing, one try/except per batch.

Differences that are the point of the Spark rewrite:

- ``TRUNCATE + BULK INSERT / INSERT...SELECT`` becomes an atomic
  ``mode("overwrite")`` parquet write (no partially-loaded states).
- Loads are parallel across partitions instead of single-threaded
  bulk inserts; per-table duration logs replace PRINT.
- Gold stays *virtual* by default (views over silver — identical to
  the reference's CREATE VIEW) and can be materialized with
  ``materialize_gold=True`` for scale (equivalent results: loads are
  full-refresh batch).

Layout written under ``warehouse_dir``::

    bronze/<table>/   silver/<table>/   gold/<view>/   (parquet dirs)

plus session-catalog views ``wh_silver_*`` / ``wh_gold_*`` so ad-hoc
``spark.sql`` works against the warehouse like the reference's
``silver.*`` / ``gold.*`` names.
"""

from __future__ import annotations

import logging
import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .gold import gold_dim_customers, gold_dim_products, gold_fact_sales
from .schemas import BRONZE_TABLES
from .silver import _TRANSFORMS, bronze_df

log = logging.getLogger("sql_data_warehouse_spark.load")

GOLD_VIEWS = ("dim_customers", "dim_products", "fact_sales")


def _timed(step: str, fn):
    start = time.monotonic()
    out = fn()
    log.info("%s: %.2fs", step, time.monotonic() - start)
    return out


def _timed_stage(stage: str, fn):
    """Stage-level wall clock around a thread-pooled table batch:
    per-table ``_timed`` durations OVERLAP under the pool (ADVICE r9),
    so they no longer sum to stage time — this is the number that
    does."""
    start = time.monotonic()
    out = fn()
    log.info("%s stage wall: %.2fs", stage, time.monotonic() - start)
    return out


def load_bronze(spark: SparkSession, warehouse_dir: str) -> dict[str, int]:
    """Typed CSV → bronze parquet, one overwrite per table (S1-S3).
    Returns per-table row counts (the reference PRINTs durations; we
    log durations and return counts for assertions).

    Tables are independent full-refresh loads, so they are submitted
    from a thread pool and Spark schedules them concurrently — the
    next table's tasks back-fill executors freed by the previous
    table's tail instead of idling behind a serial driver loop."""

    def run(table: str) -> int:
        path = f"{warehouse_dir}/bronze/{table}"

        def write() -> int:
            bronze_df(spark, table).write.mode("overwrite").parquet(path)
            return spark.read.parquet(path).count()

        return _timed(f"bronze.{table}", write)

    def batch():
        with ThreadPoolExecutor(max_workers=len(BRONZE_TABLES)) as pool:
            return list(pool.map(run, BRONZE_TABLES))

    results = _timed_stage("bronze", batch)
    return dict(zip(BRONZE_TABLES, results))


def load_silver(spark: SparkSession, warehouse_dir: str) -> dict[str, int]:
    """bronze parquet → cleansing transform → silver parquet, with the
    reference's ``dwh_create_date`` audit column (S4, ddl_silver.sql
    DEFAULT GETDATE())."""
    def run(table: str) -> int:
        transform = _TRANSFORMS[table]
        src = f"{warehouse_dir}/bronze/{table}"
        dst = f"{warehouse_dir}/silver/{table}"

        def write() -> int:
            out = transform(spark.read.parquet(src)).withColumn(
                "dwh_create_date", F.current_timestamp()
            )
            out.write.mode("overwrite").parquet(dst)
            spark.read.parquet(dst).createOrReplaceTempView(f"wh_silver_{table}")
            return spark.read.parquet(dst).count()

        return _timed(f"silver.{table}", write)

    # Independent per-table transforms: thread-pool submission, same
    # back-fill rationale as load_bronze.
    tables = list(_TRANSFORMS)

    def batch():
        with ThreadPoolExecutor(max_workers=len(tables)) as pool:
            return list(pool.map(run, tables))

    results = _timed_stage("silver", batch)
    return dict(zip(tables, results))


def _silver_reader(warehouse_dir: str):
    def read(spark: SparkSession, table: str) -> DataFrame:
        # Drop the audit column so gold sees the reference silver shape.
        return spark.read.parquet(f"{warehouse_dir}/silver/{table}").drop(
            "dwh_create_date"
        )

    return read


def load_gold(spark: SparkSession, warehouse_dir: str,
              materialize: bool = False) -> dict[str, int]:
    """Silver → gold star views (S5). Virtual by default (catalog
    views, Catalyst inlines them into consumers exactly like SQL
    Server view expansion); ``materialize=True`` writes parquet and
    points the views at it instead."""
    silver = _silver_reader(warehouse_dir)
    builders = {
        "dim_customers": gold_dim_customers,
        "dim_products": gold_dim_products,
        "fact_sales": gold_fact_sales,
    }
    def run(view: str) -> int:
        build = builders[view]

        def work() -> int:
            df = build(spark, silver)
            if materialize:
                path = f"{warehouse_dir}/gold/{view}"
                df.write.mode("overwrite").parquet(path)
                df = spark.read.parquet(path)
            df.createOrReplaceTempView(f"wh_gold_{view}")
            return df.count()

        return _timed(f"gold.{view}", work)

    views = list(builders)

    def batch():
        with ThreadPoolExecutor(max_workers=len(views)) as pool:
            return list(pool.map(run, views))

    results = _timed_stage("gold", batch)
    return dict(zip(views, results))


def load_all(spark: SparkSession, warehouse_dir: str,
             materialize_gold: bool = False) -> dict[str, dict[str, int]]:
    """The full ``EXEC``-chain analog: bronze → silver → gold with
    batch-level timing and a single error boundary (reference
    TRY/CATCH at load_bronze.sql:133-141)."""
    start = time.monotonic()
    try:
        out = {
            "bronze": load_bronze(spark, warehouse_dir),
            "silver": load_silver(spark, warehouse_dir),
            "gold": load_gold(spark, warehouse_dir, materialize_gold),
        }
    except Exception:
        log.exception("warehouse load failed")
        raise
    log.info("load_all: %.2fs", time.monotonic() - start)
    return out
