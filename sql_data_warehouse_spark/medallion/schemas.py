"""Declared bronze schemas for the six reference CSV sources
(reference: scripts/bronze/ddl_bronze.sql:12-88), with the SURVEY
§1.5 canonical fixes applied:

- ``sls_ord_num`` is STRING (bronze DDL says INT but the data is
  alphanumeric ``'SO43697'``; silver DDL agrees with STRING).
- ``cst_marital_status`` (bronze DDL typo ``cst_material_status``).
- ``prd_start_dt``/``prd_end_dt`` (bronze DDL typo ``*_data``).

Each table carries both the Spark ``StructType`` and the DuckDB
``read_csv`` column spec so the oracle replays the identical typed
ingest. CSV quirks preserved: leading/trailing whitespace is data
(silver trims it), empty fields are NULL in both engines.
"""

from __future__ import annotations

from pyspark.sql import types as T

REFERENCE_DATASETS = "/root/reference/datasets"

# table name -> (csv file, [(column, spark type, duckdb type), ...])
_COLS: dict[str, tuple[str, list[tuple[str, T.DataType, str]]]] = {
    "crm_cust_info": (
        "cust_info.csv",
        [
            ("cst_id", T.IntegerType(), "INTEGER"),
            ("cst_key", T.StringType(), "VARCHAR"),
            ("cst_firstname", T.StringType(), "VARCHAR"),
            ("cst_lastname", T.StringType(), "VARCHAR"),
            ("cst_marital_status", T.StringType(), "VARCHAR"),
            ("cst_gndr", T.StringType(), "VARCHAR"),
            ("cst_create_date", T.DateType(), "DATE"),
        ],
    ),
    "crm_prd_info": (
        "prd_info.csv",
        [
            ("prd_id", T.IntegerType(), "INTEGER"),
            ("prd_key", T.StringType(), "VARCHAR"),
            ("prd_nm", T.StringType(), "VARCHAR"),
            ("prd_cost", T.IntegerType(), "INTEGER"),
            ("prd_line", T.StringType(), "VARCHAR"),
            ("prd_start_dt", T.DateType(), "DATE"),
            ("prd_end_dt", T.DateType(), "DATE"),
        ],
    ),
    "crm_sales_details": (
        "sales_details.csv",
        [
            ("sls_ord_num", T.StringType(), "VARCHAR"),
            ("sls_prd_key", T.StringType(), "VARCHAR"),
            ("sls_cust_id", T.IntegerType(), "INTEGER"),
            ("sls_order_dt", T.IntegerType(), "INTEGER"),
            ("sls_ship_dt", T.IntegerType(), "INTEGER"),
            ("sls_due_dt", T.IntegerType(), "INTEGER"),
            ("sls_sales", T.IntegerType(), "INTEGER"),
            ("sls_quantity", T.IntegerType(), "INTEGER"),
            ("sls_price", T.IntegerType(), "INTEGER"),
        ],
    ),
    "erp_cust_az12": (
        "CUST_AZ12.csv",
        [
            ("cid", T.StringType(), "VARCHAR"),
            ("bdate", T.DateType(), "DATE"),
            ("gen", T.StringType(), "VARCHAR"),
        ],
    ),
    "erp_loc_a101": (
        "LOC_A101.csv",
        [
            ("cid", T.StringType(), "VARCHAR"),
            ("cntry", T.StringType(), "VARCHAR"),
        ],
    ),
    "erp_px_cat_g1v2": (
        "PX_CAT_G1V2.csv",
        [
            ("id", T.StringType(), "VARCHAR"),
            ("cat", T.StringType(), "VARCHAR"),
            ("subcat", T.StringType(), "VARCHAR"),
            ("maintenance", T.StringType(), "VARCHAR"),
        ],
    ),
}

BRONZE_TABLES = tuple(_COLS)


def csv_path(table: str, datasets_dir: str = REFERENCE_DATASETS) -> str:
    return f"{datasets_dir}/{_COLS[table][0]}"


def spark_schema(table: str) -> T.StructType:
    return T.StructType(
        [T.StructField(c, t, True) for c, t, _ in _COLS[table][1]]
    )


def duckdb_read_csv(table: str, datasets_dir: str = REFERENCE_DATASETS) -> str:
    """``read_csv(...)`` expression with explicit types (no sniffing)."""
    cols = ", ".join(f"'{c}': '{d}'" for c, _, d in _COLS[table][1])
    return (
        f"read_csv('{csv_path(table, datasets_dir)}', header=true, "
        f"columns={{{cols}}})"
    )
