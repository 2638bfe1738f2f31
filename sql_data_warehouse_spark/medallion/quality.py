"""Silver quality-check suite (reference tests/quality_check_silver.sql,
256 LoC) as labelled report queries — each reference zero-row assertion
becomes one ``(check_name, n_bad)`` row; categorical inspections become
``(field, value)`` domain rows.

Spark-first shape: one single-pass conditional aggregation per silver
table (``SUM(CASE WHEN bad THEN 1 END)`` per check), then an unpivot to
the labelled report — at 100 TB each table is scanned exactly once for
all of its checks, instead of the reference's one-scan-per-check
script. The DuckDB oracle replays the same counts from the raw CSVs.

pytest additionally asserts the *invariant* subset is zero (the
reference's "expect: no rows" contract); the registry entry is the
report itself so the driver hash-gates every count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analytics.registry import query
from .silver import AS_OF, SILVER_SQL, silver_df

_SILVER_CTES = ",\n".join(f"s_{t} AS ({sql})" for t, sql in SILVER_SQL.items())


def _checks_report(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Single-pass conditional counts → (check_name, n_bad) rows."""
    agg = df.agg(
        *[
            F.coalesce(F.sum(F.when(cond, F.lit(1))), F.lit(0))
            .cast("long")
            .alias(name)
            for name, cond in checks.items()
        ]
    )
    stack_expr = ", ".join(f"'{n}', {n}" for n in checks)
    return agg.select(
        F.expr(f"stack({len(checks)}, {stack_expr}) AS (check_name, n_bad)")
    )


def _dup_count(df: DataFrame, key: str) -> DataFrame:
    """Rows-in-violating-groups count for PK dup/null checks (the
    reference's GROUP BY/HAVING COUNT(*) > 1 OR key IS NULL)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") > 1) | F.col(key).isNull())
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_bad"))
    )


def _dup_sql(table: str, key: str) -> str:
    return f"""
        SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM (
            SELECT COUNT(*) AS n FROM s_{table} GROUP BY {key}
            HAVING COUNT(*) > 1 OR {key} IS NULL
        )
    """


@query(
    "wh_qc_silver",
    survey="QC1 A6 P5 P6 P8",
    oracle=f"""
        WITH {_SILVER_CTES}
        SELECT 'cust_pk_dup_or_null' AS check_name,
               ({_dup_sql("crm_cust_info", "cst_id")}) AS n_bad
        UNION ALL SELECT 'cust_unwanted_spaces',
            (SELECT CAST(COALESCE(SUM(CASE WHEN cst_firstname LIKE ' %'
                                            OR cst_lastname LIKE ' %'
                                            OR cst_firstname != trim(cst_firstname)
                                            OR cst_lastname != trim(cst_lastname)
                                           THEN 1 END), 0) AS BIGINT)
             FROM s_crm_cust_info)
        UNION ALL SELECT 'prd_pk_dup_or_null', ({_dup_sql("crm_prd_info", "prd_id")})
        UNION ALL SELECT 'prd_nm_spaces',
            (SELECT CAST(COALESCE(SUM(CASE WHEN prd_nm != trim(prd_nm) THEN 1 END), 0)
                    AS BIGINT) FROM s_crm_prd_info)
        UNION ALL SELECT 'prd_cost_null_or_negative',
            (SELECT CAST(COALESCE(SUM(CASE WHEN prd_cost IS NULL OR prd_cost < 0
                                           THEN 1 END), 0) AS BIGINT)
             FROM s_crm_prd_info)
        UNION ALL SELECT 'sales_bad_date_order',
            (SELECT CAST(COALESCE(SUM(CASE WHEN sls_ship_dt NOT BETWEEN sls_order_dt
                                                AND sls_due_dt THEN 1 END), 0)
                    AS BIGINT) FROM s_crm_sales_details)
        UNION ALL SELECT 'sales_inconsistent',
            (SELECT CAST(COALESCE(SUM(CASE WHEN sls_sales != sls_quantity * sls_price
                                            OR sls_sales IS NULL OR sls_price IS NULL
                                            OR sls_quantity IS NULL OR sls_sales <= 0
                                            OR sls_price <= 0 OR sls_quantity <= 0
                                           THEN 1 END), 0) AS BIGINT)
             FROM s_crm_sales_details)
        UNION ALL SELECT 'az12_cid_dup_or_null', ({_dup_sql("erp_cust_az12", "cid")})
        UNION ALL SELECT 'az12_bdate_out_of_range',
            (SELECT CAST(COALESCE(SUM(CASE WHEN bdate < DATE '1925-01-01'
                                            OR bdate > DATE '{AS_OF}' THEN 1 END), 0)
                    AS BIGINT) FROM s_erp_cust_az12)
        UNION ALL SELECT 'loc_cid_dup_or_null', ({_dup_sql("erp_loc_a101", "cid")})
        UNION ALL SELECT 'px_cat_unwanted_spaces',
            (SELECT CAST(COALESCE(SUM(CASE WHEN cat != trim(cat)
                                            OR subcat != trim(subcat)
                                            OR maintenance != trim(maintenance)
                                           THEN 1 END), 0) AS BIGINT)
             FROM s_erp_px_cat_g1v2)
    """,
)
def wh_qc_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QC1 (tests/quality_check_silver.sql): every zero-row assertion
    as a labelled count. Single scan per table; unions are of one-row
    frames, so the plan is six tiny jobs regardless of table size."""
    cust = silver_df(spark, "crm_cust_info")
    prd = silver_df(spark, "crm_prd_info")
    sales = silver_df(spark, "crm_sales_details")
    az12 = silver_df(spark, "erp_cust_az12")
    loc = silver_df(spark, "erp_loc_a101")
    px = silver_df(spark, "erp_px_cat_g1v2")

    def labelled(name: str, one_row: DataFrame) -> DataFrame:
        return one_row.select(F.lit(name).alias("check_name"), "n_bad")

    parts = [
        labelled("cust_pk_dup_or_null", _dup_count(cust, "cst_id")),
        _checks_report(
            cust,
            {
                "cust_unwanted_spaces": (
                    F.col("cst_firstname").like(" %")
                    | F.col("cst_lastname").like(" %")
                    | (F.col("cst_firstname") != F.trim("cst_firstname"))
                    | (F.col("cst_lastname") != F.trim("cst_lastname"))
                )
            },
        ),
        labelled("prd_pk_dup_or_null", _dup_count(prd, "prd_id")),
        _checks_report(
            prd,
            {
                "prd_nm_spaces": F.col("prd_nm") != F.trim("prd_nm"),
                "prd_cost_null_or_negative": F.col("prd_cost").isNull()
                | (F.col("prd_cost") < 0),
            },
        ),
        _checks_report(
            sales,
            {
                "sales_bad_date_order": ~F.col("sls_ship_dt").between(
                    F.col("sls_order_dt"), F.col("sls_due_dt")
                ),
                "sales_inconsistent": (
                    (F.col("sls_sales") != F.col("sls_quantity") * F.col("sls_price"))
                    | F.col("sls_sales").isNull()
                    | F.col("sls_price").isNull()
                    | F.col("sls_quantity").isNull()
                    | (F.col("sls_sales") <= 0)
                    | (F.col("sls_price") <= 0)
                    | (F.col("sls_quantity") <= 0)
                ),
            },
        ),
        labelled("az12_cid_dup_or_null", _dup_count(az12, "cid")),
        _checks_report(
            az12,
            {
                "az12_bdate_out_of_range": (
                    F.col("bdate") < F.lit("1925-01-01").cast("date")
                )
                | (F.col("bdate") > F.lit(AS_OF).cast("date"))
            },
        ),
        labelled("loc_cid_dup_or_null", _dup_count(loc, "cid")),
        _checks_report(
            px,
            {
                "px_cat_unwanted_spaces": (F.col("cat") != F.trim("cat"))
                | (F.col("subcat") != F.trim("subcat"))
                | (F.col("maintenance") != F.trim("maintenance"))
            },
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@query(
    "wh_qc_domains",
    survey="QC1 P9 U1",
    oracle=f"""
        WITH {_SILVER_CTES}
        SELECT DISTINCT 'cst_gndr' AS field, cst_gndr AS value FROM s_crm_cust_info
        UNION ALL
        SELECT DISTINCT 'cst_marital_status', cst_marital_status FROM s_crm_cust_info
        UNION ALL
        SELECT DISTINCT 'prd_line', prd_line FROM s_crm_prd_info
        UNION ALL
        SELECT DISTINCT 'gen', gen FROM s_erp_cust_az12
        UNION ALL
        SELECT DISTINCT 'cntry', cntry FROM s_erp_loc_a101
    """,
)
def wh_qc_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical-domain inspections (quality_check_silver.sql
    SELECT DISTINCT blocks) as one (field, value) report. pytest
    asserts the expected value sets (e.g. cst_gndr ⊆ {Female, Male,
    N/A} per proc_load_silver.sql:60-64)."""
    parts = [
        silver_df(spark, "crm_cust_info")
        .select(F.lit("cst_gndr").alias("field"), F.col("cst_gndr").alias("value"))
        .distinct(),
        silver_df(spark, "crm_cust_info")
        .select(
            F.lit("cst_marital_status").alias("field"),
            F.col("cst_marital_status").alias("value"),
        )
        .distinct(),
        silver_df(spark, "crm_prd_info")
        .select(F.lit("prd_line").alias("field"), F.col("prd_line").alias("value"))
        .distinct(),
        silver_df(spark, "erp_cust_az12")
        .select(F.lit("gen").alias("field"), F.col("gen").alias("value"))
        .distinct(),
        silver_df(spark, "erp_loc_a101")
        .select(F.lit("cntry").alias("field"), F.col("cntry").alias("value"))
        .distinct(),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
