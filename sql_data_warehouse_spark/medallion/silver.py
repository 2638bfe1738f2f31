"""Silver layer: six cleansing transforms, bronze → silver
(reference: scripts/silver/proc_load_silver.sql:41-225). Each is a
pure ``DataFrame → DataFrame`` function plus a DuckDB SQL twin that
replays the identical transform for the oracle gate.

Cleansing rule inventory (FIXTURES.md dirt classes → repair):

- crm_cust_info: drop NULL cst_id; keep latest record per cst_id
  (ROW_NUMBER dedup, W1); TRIM names; decode marital/gender codes.
- crm_prd_info: split prd_key into cat_id + product key; NULL cost→0;
  decode product line; SCD end-date via LEAD(start)-1 day (W4).
- crm_sales_details: guarded int-yyyymmdd → DATE; repair sales where
  missing/non-positive/inconsistent as |qty×price|; derive price as
  |sales/qty| (T-SQL int division) when 0/NULL, |price| when negative.
- erp_cust_az12: strip 'NAS' prefix; NULL future birthdates; decode
  gender (trailing-space and blank variants → canonical).
- erp_loc_a101: strip dashes from cid; decode country codes,
  blanks/NULL → 'N/A'.
- erp_px_cat_g1v2: passthrough.

T-SQL ANSI-PAD equality ('M ' = 'M') is emulated with TRIM before
every compare; see package docstring for the full determinism notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.tsql import yyyymmdd_to_date
from .schemas import csv_path, duckdb_read_csv, spark_schema

AS_OF = "2026-01-01"  # deterministic GETDATE() stand-in (pkg docstring)


# ------------------------------------------------------------------ bronze

def bronze_df(spark: SparkSession, table: str) -> DataFrame:
    """Typed CSV ingest (reference scripts/bronze/load_bronze.sql
    BULK INSERT blocks): declared schema, header skipped, whitespace
    preserved (it is data — silver trims), empty fields → NULL."""
    from ..session import tune_session

    tune_session(spark)
    return spark.read.csv(
        csv_path(table),
        schema=spark_schema(table),
        header=True,
        ignoreLeadingWhiteSpace=False,
        ignoreTrailingWhiteSpace=False,
    )


# ------------------------------------------------------- silver transforms

def silver_cust_info(bronze: DataFrame) -> DataFrame:
    """proc_load_silver.sql:41-71 — latest-record dedup + trim +
    domain decode. Window shuffles once on cst_id (hash-partitioned;
    at scale each customer's history co-locates — no global sort)."""
    w = Window.partitionBy("cst_id").orderBy(
        F.desc_nulls_last("cst_create_date"), F.asc("cst_key")
    )
    return (
        bronze.filter(F.col("cst_id").isNotNull())
        .withColumn("flag_last", F.row_number().over(w))
        .filter(F.col("flag_last") == 1)
        .select(
            "cst_id",
            "cst_key",
            F.trim("cst_firstname").alias("cst_firstname"),
            F.trim("cst_lastname").alias("cst_lastname"),
            F.when(F.upper(F.trim("cst_marital_status")) == "M", "Married")
            .when(F.upper(F.trim("cst_marital_status")) == "S", "Single")
            .otherwise("N/A")
            .alias("cst_marital_status"),
            F.when(F.upper(F.trim("cst_gndr")) == "F", "Female")
            .when(F.upper(F.trim("cst_gndr")) == "M", "Male")
            .otherwise("N/A")
            .alias("cst_gndr"),
            "cst_create_date",
        )
    )


SILVER_CUST_INFO_SQL = f"""
    SELECT cst_id, cst_key,
           trim(cst_firstname) AS cst_firstname,
           trim(cst_lastname) AS cst_lastname,
           CASE WHEN upper(trim(cst_marital_status)) = 'M' THEN 'Married'
                WHEN upper(trim(cst_marital_status)) = 'S' THEN 'Single'
                ELSE 'N/A' END AS cst_marital_status,
           CASE WHEN upper(trim(cst_gndr)) = 'F' THEN 'Female'
                WHEN upper(trim(cst_gndr)) = 'M' THEN 'Male'
                ELSE 'N/A' END AS cst_gndr,
           cst_create_date
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY cst_id
              ORDER BY cst_create_date DESC NULLS LAST, cst_key ASC
          ) AS flag_last
          FROM {duckdb_read_csv("crm_cust_info")}
          WHERE cst_id IS NOT NULL) t
    WHERE flag_last = 1
"""


def silver_prd_info(bronze: DataFrame) -> DataFrame:
    """proc_load_silver.sql:81-107 — key split, cost default, line
    decode, SCD end-dating. LEAD partitions on the *source* prd_key
    (T-SQL window sees pre-alias columns)."""
    w = Window.partitionBy("prd_key").orderBy("prd_start_dt", "prd_id")
    return bronze.select(
        "prd_id",
        F.expr("substring(prd_key, 7)").alias("new_prd_key"),
        F.regexp_replace(F.substring("prd_key", 1, 5), "-", "_").alias("cat_id"),
        "prd_nm",
        F.coalesce("prd_cost", F.lit(0)).alias("prd_cost"),
        F.when(F.upper(F.trim("prd_line")) == "M", "Mountain")
        .when(F.upper(F.trim("prd_line")) == "R", "Road")
        .when(F.upper(F.trim("prd_line")) == "S", "Other Sales")
        .when(F.upper(F.trim("prd_line")) == "T", "Touring")
        .otherwise("N/A")
        .alias("prd_line"),
        F.col("prd_start_dt"),
        F.date_sub(F.lead("prd_start_dt").over(w), 1).alias("prd_end_dt"),
    ).withColumnRenamed("new_prd_key", "prd_key")


SILVER_PRD_INFO_SQL = f"""
    SELECT prd_id,
           substring(prd_key, 7) AS prd_key,
           replace(left(prd_key, 5), '-', '_') AS cat_id,
           prd_nm,
           COALESCE(prd_cost, 0) AS prd_cost,
           CASE upper(trim(prd_line))
                WHEN 'M' THEN 'Mountain'
                WHEN 'R' THEN 'Road'
                WHEN 'S' THEN 'Other Sales'
                WHEN 'T' THEN 'Touring'
                ELSE 'N/A' END AS prd_line,
           prd_start_dt,
           CAST(LEAD(prd_start_dt) OVER (
               PARTITION BY prd_key ORDER BY prd_start_dt, prd_id
           ) - INTERVAL 1 DAY AS DATE) AS prd_end_dt
    FROM {duckdb_read_csv("crm_prd_info")}
"""


def silver_sales_details(bronze: DataFrame) -> DataFrame:
    """proc_load_silver.sql:117-154 — date guards + sales/price
    repair. Pure projection: no shuffle, full codegen."""
    sales_bad = (
        F.col("sls_sales").isNull()
        | (F.col("sls_sales") <= 0)
        | (F.col("sls_sales") != F.col("sls_quantity") * F.abs("sls_price"))
    )
    return bronze.select(
        "sls_ord_num",
        "sls_prd_key",
        "sls_cust_id",
        yyyymmdd_to_date(F.col("sls_order_dt")).alias("sls_order_dt"),
        yyyymmdd_to_date(F.col("sls_ship_dt")).alias("sls_ship_dt"),
        yyyymmdd_to_date(F.col("sls_due_dt")).alias("sls_due_dt"),
        F.when(sales_bad, F.abs(F.col("sls_quantity") * F.col("sls_price")))
        .otherwise(F.col("sls_sales"))
        .alias("sls_sales"),
        "sls_quantity",
        F.when(
            F.col("sls_price").isNull() | (F.col("sls_price") == 0),
            F.abs(F.expr("sls_sales div sls_quantity")).cast("int"),
        )
        .when(F.col("sls_price") < 0, F.abs("sls_price"))
        .otherwise(F.col("sls_price"))
        .alias("sls_price"),
    )


_YMD = (
    "CASE WHEN {c} IS NULL OR {c} <= 0 OR length(CAST({c} AS VARCHAR)) != 8 "
    "THEN NULL ELSE CAST(try_strptime(CAST({c} AS VARCHAR), '%Y%m%d') AS DATE) END"
)

SILVER_SALES_DETAILS_SQL = f"""
    SELECT sls_ord_num, sls_prd_key, sls_cust_id,
           {_YMD.format(c="sls_order_dt")} AS sls_order_dt,
           {_YMD.format(c="sls_ship_dt")} AS sls_ship_dt,
           {_YMD.format(c="sls_due_dt")} AS sls_due_dt,
           CASE WHEN sls_sales IS NULL OR sls_sales <= 0
                     OR sls_sales != sls_quantity * abs(sls_price)
                THEN abs(sls_quantity * sls_price)
                ELSE sls_sales END AS sls_sales,
           sls_quantity,
           CASE WHEN sls_price IS NULL OR sls_price = 0
                THEN CAST(abs(sls_sales // sls_quantity) AS INTEGER)
                WHEN sls_price < 0 THEN abs(sls_price)
                ELSE sls_price END AS sls_price
    FROM {duckdb_read_csv("crm_sales_details")}
"""


def silver_cust_az12(bronze: DataFrame) -> DataFrame:
    """proc_load_silver.sql:167-186 — NAS-prefix strip, future-bdate
    NULL (as-of {AS_OF}), gender decode."""
    return bronze.select(
        F.when(F.col("cid").startswith("NAS"), F.expr("substring(cid, 4)"))
        .otherwise(F.col("cid"))
        .alias("cid"),
        F.when(F.col("bdate") > F.lit(AS_OF).cast("date"), None)
        .otherwise(F.col("bdate"))
        .alias("bdate"),
        F.when(F.upper(F.trim("gen")) == "F", "Female")
        .when(F.upper(F.trim("gen")) == "M", "Male")
        .when(F.col("gen").isNull() | (F.trim("gen") == ""), "N/A")
        .otherwise(F.col("gen"))
        .alias("gen"),
    )


SILVER_CUST_AZ12_SQL = f"""
    SELECT CASE WHEN cid LIKE 'NAS%' THEN substring(cid, 4) ELSE cid END AS cid,
           CASE WHEN bdate > DATE '{AS_OF}' THEN NULL ELSE bdate END AS bdate,
           CASE WHEN upper(trim(gen)) = 'F' THEN 'Female'
                WHEN upper(trim(gen)) = 'M' THEN 'Male'
                WHEN gen IS NULL OR trim(gen) = '' THEN 'N/A'
                ELSE gen END AS gen
    FROM {duckdb_read_csv("erp_cust_az12")}
"""


def silver_loc_a101(bronze: DataFrame) -> DataFrame:
    """proc_load_silver.sql:195-206 — dash-strip cid, country decode."""
    return bronze.select(
        F.regexp_replace("cid", "-", "").alias("cid"),
        F.when(F.upper(F.trim("cntry")) == "DE", "Germany")
        .when(F.upper(F.trim("cntry")).isin("US", "USA"), "United States")
        .when(F.col("cntry").isNull() | (F.trim("cntry") == ""), "N/A")
        .otherwise(F.col("cntry"))
        .alias("cntry"),
    )


SILVER_LOC_A101_SQL = f"""
    SELECT replace(cid, '-', '') AS cid,
           CASE WHEN upper(trim(cntry)) = 'DE' THEN 'Germany'
                WHEN upper(trim(cntry)) IN ('US', 'USA') THEN 'United States'
                WHEN cntry IS NULL OR trim(cntry) = '' THEN 'N/A'
                ELSE cntry END AS cntry
    FROM {duckdb_read_csv("erp_loc_a101")}
"""


def silver_px_cat_g1v2(bronze: DataFrame) -> DataFrame:
    """proc_load_silver.sql:215-225 — passthrough."""
    return bronze.select("id", "cat", "subcat", "maintenance")


SILVER_PX_CAT_G1V2_SQL = (
    f"SELECT id, cat, subcat, maintenance FROM {duckdb_read_csv('erp_px_cat_g1v2')}"
)


SILVER_SQL: dict[str, str] = {
    "crm_cust_info": SILVER_CUST_INFO_SQL,
    "crm_prd_info": SILVER_PRD_INFO_SQL,
    "crm_sales_details": SILVER_SALES_DETAILS_SQL,
    "erp_cust_az12": SILVER_CUST_AZ12_SQL,
    "erp_loc_a101": SILVER_LOC_A101_SQL,
    "erp_px_cat_g1v2": SILVER_PX_CAT_G1V2_SQL,
}

_TRANSFORMS = {
    "crm_cust_info": silver_cust_info,
    "crm_prd_info": silver_prd_info,
    "crm_sales_details": silver_sales_details,
    "erp_cust_az12": silver_cust_az12,
    "erp_loc_a101": silver_loc_a101,
    "erp_px_cat_g1v2": silver_px_cat_g1v2,
}


def silver_df(spark: SparkSession, table: str) -> DataFrame:
    """bronze ingest + silver transform for one table, cached per
    session: dozens of registered queries derive from these six small
    tables, so the first touch materializes each into the block cache
    (Spark ``.cache()``) instead of re-parsing CSV per query. Results
    are identical — InMemoryRelation is a physical-plan substitution."""
    cache = getattr(spark, "_wh_silver_cache", None)
    if cache is None:
        cache = {}
        spark._wh_silver_cache = cache
    if table not in cache:
        cache[table] = _TRANSFORMS[table](bronze_df(spark, table)).cache()
    return cache[table]
