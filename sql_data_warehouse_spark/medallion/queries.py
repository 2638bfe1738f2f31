"""Registry entries for the medallion pipeline itself: the six silver
ETL transforms (reference proc_load_silver.sql:41-225, T1-T6) and the
three gold star views (load_gold.sql:22-88, V1-V3), each gated by a
DuckDB oracle that replays the identical transform from the raw CSVs.

These run on the reference's own datasets (``/root/reference/datasets``)
— the ``sf_dir`` argument is part of the driver contract but unused
here; the medallion sources are fixed-size dirty-data fixtures, which
is the point: every cleansing rule is exercised by real dirt.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analytics.registry import query
from ..tmputil import scratch_dir
from .gold import gold_df, gold_sql
from .schemas import BRONZE_TABLES, duckdb_read_csv
from .silver import SILVER_SQL, silver_df

# Silver DATE columns surface as TIMESTAMP in oracle-gated output
# (pandas dtype parity; see analytics.xengine docstring).
_DATE_COLS: dict[str, tuple[str, ...]] = {
    "crm_cust_info": ("cst_create_date",),
    "crm_prd_info": ("prd_start_dt", "prd_end_dt"),
    "crm_sales_details": ("sls_order_dt", "sls_ship_dt", "sls_due_dt"),
    "erp_cust_az12": ("bdate",),
    "erp_loc_a101": (),
    "erp_px_cat_g1v2": (),
}


def _silver_ts(spark: SparkSession, table: str) -> DataFrame:
    df = silver_df(spark, table)
    for c in _DATE_COLS[table]:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def _silver_oracle(table: str) -> str:
    dates = _DATE_COLS[table]
    if not dates:
        return SILVER_SQL[table]
    repl = ", ".join(f"CAST({c} AS TIMESTAMP) AS {c}" for c in dates)
    return f"SELECT * REPLACE ({repl}) FROM ({SILVER_SQL[table]})"


_SILVER_SURVEY = {
    "crm_cust_info": "T1 W1 P2 P3 S7",
    "crm_prd_info": "T2 W4 S7",
    "crm_sales_details": "T3 A9 S7",
    "erp_cust_az12": "T4 P5 S7",
    "erp_loc_a101": "T5 P7 S7",
    "erp_px_cat_g1v2": "T6 S7",
}

for _t in SILVER_SQL:
    def _mk(table: str):
        def builder(spark: SparkSession, sf_dir: str) -> DataFrame:
            return _silver_ts(spark, table)

        builder.__name__ = f"etl_silver_{table}"
        builder.__doc__ = (
            f"Silver ETL for {table} (reference proc_load_silver.sql; "
            "bronze typed-CSV ingest + cleansing transform)."
        )
        return builder

    query(
        f"etl_silver_{_t}",
        oracle=_silver_oracle(_t),
        survey=_SILVER_SURVEY[_t],
        tags=("medallion", "silver"),
    )(_mk(_t))


# ------------------------------------------------------ bronze roundtrip
#
# Registry gates for the loader-side ids S1-S4/S6/S9: run the REAL
# ``load_bronze`` stored-proc analog (typed CSV ingest → atomic
# parquet overwrite, medallion/load.py) once per session into a temp
# warehouse dir, then hash each written bronze table against DuckDB's
# typed ``read_csv`` of the same file. This is a write-path roundtrip
# — a schema drift, a lossy overwrite, or a CSV-parsing divergence all
# break the hash — so the structural loader ids get hard driver rows
# instead of pytest-only coverage.

_BRONZE_DATE_COLS: dict[str, tuple[str, ...]] = {
    "crm_cust_info": ("cst_create_date",),
    "crm_prd_info": ("prd_start_dt", "prd_end_dt"),
    "crm_sales_details": (),
    "erp_cust_az12": ("bdate",),
    "erp_loc_a101": (),
    "erp_px_cat_g1v2": (),
}


def _bronze_warehouse(spark: SparkSession) -> str:
    """Run load_bronze once per session into a temp warehouse dir;
    reuse it for every etl_bronze_* gate (the loads are full-refresh
    overwrites, so one run is representative)."""
    wh = getattr(spark, "_wh_bronze_dir", None)
    if wh is None:
        from .load import load_bronze

        wh = scratch_dir("wh_bronze_")
        load_bronze(spark, wh)
        spark._wh_bronze_dir = wh
    return wh


def _silver_warehouse(spark: SparkSession) -> str:
    """Extend the session's temp warehouse with the REAL load_silver
    output (bronze parquet → cleansing → silver parquet with the
    ``dwh_create_date`` audit column) — the write-path twin of the
    transform-only ``silver_df`` the etl_silver_* gates use."""
    if getattr(spark, "_wh_silver_loaded", False) is False:
        from .load import load_silver

        load_silver(spark, _bronze_warehouse(spark))
        spark._wh_silver_loaded = True
    return spark._wh_bronze_dir


def _bronze_oracle(table: str) -> str:
    # DATE columns surface as STRING (ISO yyyy-MM-dd, identical in
    # both engines): raw bronze carries year-9999 dirt (e.g. bdate
    # 9999-09-13) that overflows pandas' ns timestamps outright, so
    # the usual DATE→TIMESTAMP parity cast can't work here.
    dates = _BRONZE_DATE_COLS[table]
    src = f"SELECT * FROM {duckdb_read_csv(table)}"
    if not dates:
        return src
    repl = ", ".join(f"CAST({c} AS VARCHAR) AS {c}" for c in dates)
    return f"SELECT * REPLACE ({repl}) FROM ({src})"


for _t in BRONZE_TABLES:
    def _mkb(table: str):
        def builder(spark: SparkSession, sf_dir: str) -> DataFrame:
            df = spark.read.parquet(f"{_bronze_warehouse(spark)}/bronze/{table}")
            for c in _BRONZE_DATE_COLS[table]:
                df = df.withColumn(c, F.col(c).cast("string"))
            return df

        builder.__name__ = f"etl_bronze_{table}"
        builder.__doc__ = (
            f"Bronze roundtrip for {table}: load_bronze's written "
            "parquet vs DuckDB typed read_csv (reference "
            "scripts/bronze/load_bronze.sql BULK INSERT + ddl_bronze.sql)."
        )
        return builder

    query(
        f"etl_bronze_{_t}",
        oracle=_bronze_oracle(_t),
        survey="S1 S2 S3 S6 S9",
        tags=("medallion", "bronze"),
    )(_mkb(_t))


# ---------------------------------------------------- catalog roundtrip
#
# Hard-signal row for the DURABLE deployment shape (reference
# scripts/database.sql:31-38 CREATE SCHEMA + load_gold.sql:18-22
# CREATE VIEW): build the Hive-metastore warehouse in one process,
# reopen it in another, and answer Q05a over the persistent
# gold.dim_customers view — hash-gated against the same DuckDB oracle
# the session-path wh_q05_customers_by_country uses. Previously this
# path was pytest-only (tests/test_catalog.py).

from .gold import GOLD_CTES  # noqa: E402


@query(
    "catalog_roundtrip",
    oracle=f"""
        WITH {GOLD_CTES}
        SELECT country, CAST(COUNT(customer_key) AS BIGINT) AS total_customers
        FROM g_dim_customers GROUP BY country ORDER BY total_customers DESC
    """,
    survey="S5 S6 S8",
    tags=("medallion", "catalog"),
)
def catalog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q05a answered by a RECONNECTING session over the persistent
    ``gold.dim_customers`` view (two subprocess SparkSessions: build,
    then reopen — see medallion/catalog.py:catalog_roundtrip_df)."""
    from .catalog import catalog_roundtrip_df

    return catalog_roundtrip_df(spark)


_GOLD_SURVEY = {
    "dim_customers": "V1 J1 W2 P1 S5",
    "dim_products": "V2 J2 W2 P4 S5",
    "fact_sales": "V3 J3 P1 S5",
}

for _v in _GOLD_SURVEY:
    def _mkg(view: str):
        def builder(spark: SparkSession, sf_dir: str) -> DataFrame:
            return gold_df(spark, view)

        builder.__name__ = f"gold_{view}"
        builder.__doc__ = (
            f"gold.{view} star view (reference load_gold.sql), canonical "
            "column names per SURVEY §1.5."
        )
        return builder

    query(
        f"gold_{_v}",
        oracle=gold_sql(_v),
        survey=_GOLD_SURVEY[_v],
        tags=("medallion", "gold"),
    )(_mkg(_v))


@query(
    "gold_dim_customers_scalable_sk",
    oracle=gold_sql("dim_customers"),
    survey="V1 J1 W2 P1 S5 ext-skew",
    tags=("medallion", "gold", "skew"),
)
def gold_dim_customers_scalable_sk_q(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """dim_customers with the W2 surrogate key assigned by the
    SCALE-SAFE two-phase generator (operators/skew.
    scalable_row_number: deterministic driver-computed range buckets
    → per-bucket rank on n reducers → exact cumulative offsets)
    instead of the reference's global unpartitioned window — the
    resolution of the W2 scale hazard (SURVEY §4.3/§7). Hash-gated
    against the SAME DuckDB oracle as ``gold_dim_customers``: the
    keys are byte-identical, only the shuffle shape changes."""
    from .gold import gold_dim_customers_scalable_sk

    return gold_dim_customers_scalable_sk(spark)


@query(
    "gold_dim_products_scalable_sk",
    oracle=gold_sql("dim_products"),
    survey="V2 J2 W2 P4 S5 ext-skew",
    tags=("medallion", "gold", "skew"),
)
def gold_dim_products_scalable_sk_q(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """dim_products with the COMPOSITE-key W2 surrogate key
    (``ROW_NUMBER() OVER (ORDER BY prd_start_dt, prd_key)``,
    reference load_gold.sql:51) assigned by the scale-safe two-phase
    generator (VERDICT r6 ask #3): range buckets on
    epoch-day(prd_start_dt) — ties on the bucket key cannot straddle
    a boundary because the bucket id is a pure function of the value
    — with ``prd_key`` tie-breaking inside buckets. Hash-gated
    against the SAME DuckDB oracle as ``gold_dim_products``: keys
    byte-identical, shuffle fanned over all reducers instead of one
    global-window task."""
    from .gold import gold_dim_products_scalable_sk

    return gold_dim_products_scalable_sk(spark)


# ------------------------------------------------------ S4 audit column
#
# Gate for the reference's DEFAULT-GETDATE() audit column
# (ddl_silver.sql ``dwh_create_date DATETIME2 DEFAULT GETDATE()``):
# run the REAL load_silver write path and assert that every written
# silver row carries a populated, load-window-bounded audit stamp.
# The oracle can't reproduce a wall-clock default, so the gate
# compares *counts*: for each table, rows written == rows with a
# non-null in-window audit stamp == rows the reference transform
# produces from the raw CSVs. A dropped column, a NULL default, or a
# stale/future stamp all diverge.

def _audit_oracle() -> str:
    parts = [
        f"SELECT '{t}' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows, "
        f"CAST(COUNT(*) AS BIGINT) AS n_audit_ok "
        f"FROM ({SILVER_SQL[t]})"
        for t in SILVER_SQL
    ]
    return " UNION ALL ".join(parts) + " ORDER BY tbl"


@query(
    "etl_silver_audit_columns",
    oracle=_audit_oracle(),
    survey="S4 S7 S9 U1",
    tags=("medallion", "silver"),
)
def etl_silver_audit_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit-column roundtrip (S4): read load_silver's written parquet
    and count rows whose ``dwh_create_date`` is non-null and within
    [2020, now+1day] — equal to the table's row count iff the default
    fired for every row of every table."""
    wh = _silver_warehouse(spark)
    lo = F.lit("2020-01-01 00:00:00").cast("timestamp")
    hi = F.date_add(F.current_timestamp(), 1).cast("timestamp")
    out = None
    for t in sorted(SILVER_SQL):
        df = spark.read.parquet(f"{wh}/silver/{t}").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(
                F.when(
                    F.col("dwh_create_date").isNotNull()
                    & F.col("dwh_create_date").between(lo, hi),
                    1,
                )
            ).alias("n_audit_ok"),
        ).select(F.lit(t).alias("tbl"), "n_rows", "n_audit_ok")
        out = df if out is None else out.unionAll(df)
    return out.orderBy("tbl")
