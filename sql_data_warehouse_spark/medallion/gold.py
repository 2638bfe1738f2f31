"""Gold layer: the reference star schema re-expressed Spark-first
(reference: scripts/gold/load_gold.sql:22-88), over the six silver
transforms in :mod:`.silver`.

Canonical column names follow ``doc/data_catalog.md`` per SURVEY §1.5
(``sales_amount`` not ``sale_amount``, ``birthdate`` not ``birthday``,
``category``/``subcategory`` not the view's typos).

Scale notes (SURVEY §4.3):

- Surrogate keys use a global ``ROW_NUMBER`` window — single-partition
  by construction. Both dimensions are bounded (customers ≤ tens of
  millions even at 100 TB of *fact* data; products far smaller), so
  the one-task window holds; the fact table NEVER takes a global
  window. For a dimension that outgrows one task,
  ``gold_dim_customers_scalable_sk`` assigns the SAME keys via the
  two-phase ``operators/skew.scalable_row_number`` (deterministic
  range buckets → local rank + exact offsets — n reducers instead of
  one), hash-gated against the same oracle.
- The fact resolves surrogate keys by joining the dims on natural
  keys; both dims are explicitly ``broadcast()`` so the fact-side scan
  never shuffles — at 100 TB this is a map-side-only plan.

Every builder has a DuckDB SQL twin (composed from the silver twins as
CTEs) so the whole pipeline sits behind the oracle gate. Date columns
surface as TIMESTAMP on both sides (pandas dtype parity — see
``analytics.xengine``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from collections.abc import Callable

from .silver import SILVER_SQL, silver_df

# Pluggable silver source: the default recomputes from the raw CSVs
# (view semantics, like the reference gold views over silver tables);
# the loader passes a reader over materialized silver parquet.
SilverSource = Callable[[SparkSession, str], DataFrame]

# WITH-clause prelude replaying the six silver transforms in DuckDB.
SILVER_CTES = ",\n".join(f"s_{t} AS ({sql})" for t, sql in SILVER_SQL.items())


# ------------------------------------------------------- dim_customers (V1)

def _dim_customers_unkeyed(spark: SparkSession,
                           silver: SilverSource) -> DataFrame:
    """The dim_customers relation BEFORE surrogate-key assignment —
    shared by the reference-faithful global-window form and the
    scale-safe two-phase form."""
    ci = silver(spark, "crm_cust_info")
    ca = silver(spark, "erp_cust_az12")
    la = silver(spark, "erp_loc_a101")
    return (
        ci.join(F.broadcast(ca), ci.cst_key == ca.cid, "left")
        .join(F.broadcast(la), ci.cst_key == la.cid, "left")
        .select(
            F.col("cst_id").alias("customer_id"),
            F.col("cst_key").alias("customer_number"),
            F.col("cst_firstname").alias("first_name"),
            F.col("cst_lastname").alias("last_name"),
            F.when(F.col("cst_gndr") != "N/A", F.col("cst_gndr"))
            .otherwise(F.coalesce(F.col("gen"), F.lit("N/A")))
            .alias("gender"),
            F.col("cst_marital_status").alias("marital_status"),
            F.col("bdate").cast("timestamp").alias("birthdate"),
            F.col("cntry").alias("country"),
            F.col("cst_create_date").cast("timestamp").alias("create_date"),
        )
    )


def gold_dim_customers(spark: SparkSession, silver: SilverSource = silver_df) -> DataFrame:
    """gold.dim_customers (load_gold.sql:22-42): 3-way left join on
    the CRM natural key, CRM-master gender fallback to ERP, global
    ROW_NUMBER surrogate key ordered by the unique ``cst_id`` —
    reference-faithful (the single-partition window is the W2 scale
    hazard, SURVEY §4.3; ``gold_dim_customers_scalable_sk`` is the
    100 TB form, same keys)."""
    w = Window.orderBy("customer_id")
    return _dim_customers_unkeyed(spark, silver).select(
        F.row_number().over(w).cast("long").alias("customer_key"), "*"
    )


def gold_dim_customers_scalable_sk(spark: SparkSession,
                                   silver: SilverSource = silver_df
                                   ) -> DataFrame:
    """dim_customers with the surrogate key assigned by the
    SCALE-SAFE two-phase rule (operators/skew.scalable_row_number:
    range-repartition on the unique natural order, local rank, exact
    partition-count offsets) instead of the reference's global
    unpartitioned window — byte-identical keys (hash-gated against
    the SAME oracle as ``gold_dim_customers``), but the heavy shuffle
    fans out over all reducers instead of funnelling the dimension
    through one task (W2 scale hazard, SURVEY §4.3/§7)."""
    from ..operators.skew import scalable_row_number

    keyed = scalable_row_number(
        _dim_customers_unkeyed(spark, silver),
        order_col="customer_id", key_col="customer_key",
    )
    return keyed.select(
        "customer_key", "customer_id", "customer_number", "first_name",
        "last_name", "gender", "marital_status", "birthdate", "country",
        "create_date",
    )


DIM_CUSTOMERS_BODY = """
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY ci.cst_id) AS BIGINT) AS customer_key,
           ci.cst_id AS customer_id,
           ci.cst_key AS customer_number,
           ci.cst_firstname AS first_name,
           ci.cst_lastname AS last_name,
           CASE WHEN ci.cst_gndr != 'N/A' THEN ci.cst_gndr
                ELSE COALESCE(ca.gen, 'N/A') END AS gender,
           ci.cst_marital_status AS marital_status,
           CAST(ca.bdate AS TIMESTAMP) AS birthdate,
           la.cntry AS country,
           CAST(ci.cst_create_date AS TIMESTAMP) AS create_date
    FROM s_crm_cust_info ci
    LEFT JOIN s_erp_cust_az12 ca ON ca.cid = ci.cst_key
    LEFT JOIN s_erp_loc_a101 la ON la.cid = ci.cst_key
"""


# -------------------------------------------------------- dim_products (V2)

def _dim_products_unkeyed(spark: SparkSession,
                          silver: SilverSource) -> DataFrame:
    """The dim_products relation BEFORE surrogate-key assignment
    (current rows only, category lookup joined) — shared by the
    reference-faithful global-window form and the scale-safe
    two-phase form. Carries the raw ``prd_start_dt``/``prd_key``
    order columns alongside the renamed output columns."""
    pr = silver(spark, "crm_prd_info").filter(F.col("prd_end_dt").isNull())
    pcg = silver(spark, "erp_px_cat_g1v2")
    return pr.join(F.broadcast(pcg), pr.cat_id == pcg.id, "left").select(
        F.col("prd_start_dt"),
        F.col("prd_key"),
        F.col("prd_id").alias("product_id"),
        F.col("prd_key").alias("product_number"),
        F.col("prd_nm").alias("product_name"),
        F.col("cat_id").alias("category_id"),
        F.col("cat").alias("category"),
        F.col("subcat").alias("subcategory"),
        F.col("prd_cost").alias("cost"),
        F.col("prd_line").alias("product_line"),
        F.col("prd_start_dt").cast("timestamp").alias("start_date"),
        F.col("maintenance"),
    )


_DIM_PRODUCTS_COLS = [
    "product_key", "product_id", "product_number", "product_name",
    "category_id", "category", "subcategory", "cost", "product_line",
    "start_date", "maintenance",
]


def gold_dim_products(spark: SparkSession, silver: SilverSource = silver_df) -> DataFrame:
    """gold.dim_products (load_gold.sql:49-66): keep current rows
    (``prd_end_dt IS NULL``), broadcast-join the 36-row category
    lookup, surrogate key ordered by (start_date, product_number) —
    unique because SCD end-dating leaves one current row per key.
    The global composite-key window is reference-faithful (the W2
    scale hazard, SURVEY §4.3); ``gold_dim_products_scalable_sk`` is
    the 100 TB form, same keys."""
    w = Window.orderBy("prd_start_dt", "prd_key")
    return _dim_products_unkeyed(spark, silver).select(
        F.row_number().over(w).cast("long").alias("product_key"), "*"
    ).select(*_DIM_PRODUCTS_COLS)


def gold_dim_products_scalable_sk(spark: SparkSession,
                                  silver: SilverSource = silver_df
                                  ) -> DataFrame:
    """dim_products with the surrogate key assigned by the SCALE-SAFE
    two-phase rule over the COMPOSITE order key (VERDICT r6 ask #3 —
    the reference's second W2 site, ``ROW_NUMBER() OVER (ORDER BY
    prd_start_dt, prd_key)``, load_gold.sql:51, previously only had
    the single-partition-window form).

    Range buckets come from the leading key alone, mapped to a
    number: epoch-day(prd_start_dt) — ``datediff`` is a strictly
    monotone bijection on dates, so (epoch_day, prd_key) orders
    identically to (prd_start_dt, prd_key). ``prd_key`` tie-breaks
    INSIDE buckets only, which is sound because the bucket id is a
    pure function of the epoch-day VALUE: rows sharing a start date
    can never straddle a boundary wherever the quantile cuts fall
    (proof in ``operators/skew.scalable_row_number``). Byte-identical
    keys — hash-gated against the SAME oracle as
    ``gold_dim_products`` — with the dimension fanned over all
    reducers instead of one task."""
    from ..operators.skew import scalable_row_number

    unkeyed = _dim_products_unkeyed(spark, silver).withColumn(
        "_ord_day",
        F.datediff(F.col("prd_start_dt"), F.lit("1970-01-01")),
    )
    keyed = scalable_row_number(
        unkeyed, order_col="_ord_day", key_col="product_key",
        tiebreakers=("prd_key",),
    )
    return keyed.select(*_DIM_PRODUCTS_COLS)


DIM_PRODUCTS_BODY = """
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY pr.prd_start_dt, pr.prd_key) AS BIGINT)
               AS product_key,
           pr.prd_id AS product_id,
           pr.prd_key AS product_number,
           pr.prd_nm AS product_name,
           pr.cat_id AS category_id,
           pcg.cat AS category,
           pcg.subcat AS subcategory,
           pr.prd_cost AS cost,
           pr.prd_line AS product_line,
           CAST(pr.prd_start_dt AS TIMESTAMP) AS start_date,
           pcg.maintenance
    FROM (SELECT * FROM s_crm_prd_info WHERE prd_end_dt IS NULL) pr
    LEFT JOIN s_erp_px_cat_g1v2 pcg ON pcg.id = pr.cat_id
"""


# ---------------------------------------------------------- fact_sales (V3)

def gold_fact_sales(spark: SparkSession, silver: SilverSource = silver_df) -> DataFrame:
    """gold.fact_sales (load_gold.sql:73-88): surrogate-key lookup by
    left-joining both dims on natural keys. Dims broadcast — the fact
    scan stays shuffle-free (map-side joins only)."""
    sd = silver(spark, "crm_sales_details")
    dc = gold_dim_customers(spark, silver).select("customer_key", "customer_id")
    dp = gold_dim_products(spark, silver).select("product_key", "product_number")
    return (
        sd.join(F.broadcast(dc), sd.sls_cust_id == dc.customer_id, "left")
        .join(F.broadcast(dp), sd.sls_prd_key == dp.product_number, "left")
        .select(
            F.col("sls_ord_num").alias("order_number"),
            F.col("product_key"),
            F.col("customer_key"),
            F.col("sls_order_dt").cast("timestamp").alias("order_date"),
            F.col("sls_ship_dt").cast("timestamp").alias("shipping_date"),
            F.col("sls_due_dt").cast("timestamp").alias("due_date"),
            F.col("sls_sales").alias("sales_amount"),
            F.col("sls_quantity").alias("quantity"),
            F.col("sls_price").alias("price"),
        )
    )


FACT_SALES_BODY = """
    SELECT sd.sls_ord_num AS order_number,
           dp.product_key,
           dc.customer_key,
           CAST(sd.sls_order_dt AS TIMESTAMP) AS order_date,
           CAST(sd.sls_ship_dt AS TIMESTAMP) AS shipping_date,
           CAST(sd.sls_due_dt AS TIMESTAMP) AS due_date,
           sd.sls_sales AS sales_amount,
           sd.sls_quantity AS quantity,
           sd.sls_price AS price
    FROM s_crm_sales_details sd
    LEFT JOIN (SELECT customer_key, customer_id FROM g_dim_customers) dc
        ON dc.customer_id = sd.sls_cust_id
    LEFT JOIN (SELECT product_key, product_number FROM g_dim_products) dp
        ON dp.product_number = sd.sls_prd_key
"""

# Full prelude: silver CTEs + the three gold views. Analysis oracles do
# ``WITH {GOLD_CTES} SELECT ... FROM g_fact_sales ...``.
GOLD_CTES = f"""{SILVER_CTES},
g_dim_customers AS ({DIM_CUSTOMERS_BODY}),
g_dim_products AS ({DIM_PRODUCTS_BODY}),
g_fact_sales AS ({FACT_SALES_BODY})"""


_GOLD = {
    "dim_customers": gold_dim_customers,
    "dim_products": gold_dim_products,
    "fact_sales": gold_fact_sales,
}


def gold_df(spark: SparkSession, view: str) -> DataFrame:
    """Cached gold view (default silver source only): the 13 analysis
    queries all start from these three relations — cache the small
    star once per session rather than re-running joins+windows per
    query."""
    cache = getattr(spark, "_wh_gold_cache", None)
    if cache is None:
        cache = {}
        spark._wh_gold_cache = cache
    if view not in cache:
        cache[view] = _GOLD[view](spark).cache()
    return cache[view]


def gold_sql(view: str) -> str:
    """Standalone oracle SQL for one gold view."""
    return f"WITH {GOLD_CTES} SELECT * FROM g_{view}"
