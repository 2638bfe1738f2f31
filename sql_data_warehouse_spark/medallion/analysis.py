"""The reference's 13-script analysis layer (scripts/analysis/01..13)
re-expressed Spark-first over the medallion gold views, each gated by
a DuckDB oracle that replays the identical query on the raw CSVs
(via the GOLD_CTES prelude).

Documented cross-engine determinism decisions (SURVEY §4.4):

- ``GETDATE()`` → fixed ``AS_OF`` date (deterministic runs).
- ``DATEDIFF(MONTH|YEAR, a, b)`` → boundary-count expressions.
- T-SQL ``AVG(INT)`` truncates to INT — both sides compute
  ``SUM div COUNT`` (values are non-negative, so floor == truncate).
- T-SQL ``INT / INT`` → truncating division (``div`` / ``//``).
- ``ROUND(x, n)`` → ``floor(x*10^n + 0.5)/10^n`` on both sides
  (engine-native ROUND on doubles differs on half-even boundaries).
- ``TOP n`` queries get a deterministic tiebreaker column appended to
  the ORDER BY on both sides (the reference under-specifies ties).
- Float averages (Q13 avg_selling_price) go through exact integer
  micros before summation — double summation order otherwise differs
  between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..analytics.registry import query
from ..functions.tsql import datediff_month, datediff_year, int_div
from .gold import GOLD_CTES, gold_df
from .silver import AS_OF


def _fact(spark: SparkSession) -> DataFrame:
    return gold_df(spark, "fact_sales")


def _dimc(spark: SparkSession) -> DataFrame:
    return gold_df(spark, "dim_customers")


def _dimp(spark: SparkSession) -> DataFrame:
    return gold_df(spark, "dim_products")

_W = f"WITH {GOLD_CTES}"

# T-SQL DATEDIFF boundary-count macros (DuckDB side).
_DD_MONTH = "CAST((year({b}) - year({a})) * 12 + (month({b}) - month({a})) AS INTEGER)"
_DD_YEAR = "CAST(year({b}) - year({a}) AS INTEGER)"
_AS_OF = f"TIMESTAMP '{AS_OF} 00:00:00'"


def _round_col(col, n: int):
    """Deterministic ROUND(x, n): floor(x*10^n + 0.5)/10^n (positive)."""
    s = float(10 ** n)
    return F.floor(col * F.lit(s) + F.lit(0.5)) / F.lit(s)


def _round_sql(expr: str, n: int) -> str:
    s = float(10 ** n)
    return f"(floor(({expr}) * {s} + 0.5) / {s})"


# ------------------------------------------------------------- Q01 catalog

_WAREHOUSE_VIEWS = (
    "wh_gold_dim_customers",
    "wh_gold_dim_products",
    "wh_gold_fact_sales",
)


def register_warehouse_views(spark: SparkSession) -> None:
    """Catalog registration (reference scripts/gold/load_gold.sql view
    DDL): gold views land in the session catalog so ad-hoc SQL can hit
    them by name, exactly like the reference's `gold.*` views."""
    _dimc(spark).createOrReplaceTempView("wh_gold_dim_customers")
    _dimp(spark).createOrReplaceTempView("wh_gold_dim_products")
    _fact(spark).createOrReplaceTempView("wh_gold_fact_sales")


@query(
    "wh_q01_catalog",
    survey="Q01 S8 S5",
    oracle="""
        SELECT * FROM (VALUES
            ('wh_gold_dim_customers', 'VIEW'),
            ('wh_gold_dim_products', 'VIEW'),
            ('wh_gold_fact_sales', 'VIEW')
        ) AS t(table_name, table_type)
    """,
)
def wh_q01_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog introspection (reference 01_database_exploration.sql:
    INFORMATION_SCHEMA.TABLES): register the gold views, then list
    them from the session catalog."""
    register_warehouse_views(spark)
    rows = sorted(
        (t.name, "VIEW")
        for t in spark.catalog.listTables()
        if t.name in _WAREHOUSE_VIEWS
    )
    return spark.createDataFrame(rows, "table_name string, table_type string")


@query(
    "wh_q01_columns",
    survey="Q01 S8",
    oracle=f"""
        {_W} SELECT column_name, column_type AS data_type
        FROM (DESCRIBE SELECT * FROM g_dim_customers)
    """,
)
def wh_q01_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INFORMATION_SCHEMA.COLUMNS analog for dim_customers — schema
    straight from the analyzed plan, mapped to the oracle's type names
    (both engines agree on this subset)."""
    type_names = {
        "bigint": "BIGINT", "int": "INTEGER", "string": "VARCHAR",
        "timestamp": "TIMESTAMP", "date": "DATE", "double": "DOUBLE",
    }
    df = _dimc(spark)
    rows = [
        (f.name, type_names.get(s := f.dataType.simpleString(), s.upper()))
        for f in df.schema.fields
    ]
    return spark.createDataFrame(rows, "column_name string, data_type string")


# ---------------------------------------------------------- Q02 dimensions

@query(
    "wh_q02_countries",
    survey="Q02 P9 O1",
    oracle=f"{_W} SELECT DISTINCT country FROM g_dim_customers ORDER BY country",
)
def wh_q02_countries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """02_dimensions_exploration.sql:16-19."""
    return _dimc(spark).select("country").distinct().orderBy("country")


@query(
    "wh_q02_product_dims",
    survey="Q02 P9 O1",
    oracle=f"""
        {_W} SELECT DISTINCT category, subcategory, product_name
        FROM g_dim_products ORDER BY category, subcategory, product_name
    """,
)
def wh_q02_product_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """02_dimensions_exploration.sql:22-27."""
    return (
        _dimp(spark)
        .select("category", "subcategory", "product_name")
        .distinct()
        .orderBy("category", "subcategory", "product_name")
    )


# --------------------------------------------------------- Q03 date ranges

@query(
    "wh_q03_order_range",
    survey="Q03 A1",
    oracle=f"""
        {_W} SELECT MIN(order_date) AS first_order_date,
                    MAX(order_date) AS last_order_date,
                    {_DD_MONTH.format(a="MIN(order_date)", b="MAX(order_date)")}
                        AS order_range_months
        FROM g_fact_sales
    """,
)
def wh_q03_order_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """03_date_range_exploration.sql:15-19."""
    return _fact(spark).agg(
        F.min("order_date").alias("first_order_date"),
        F.max("order_date").alias("last_order_date"),
        datediff_month(F.min("order_date"), F.max("order_date"))
        .alias("order_range_months"),
    )


@query(
    "wh_q03_birthdate_range",
    survey="Q03 A1",
    oracle=f"""
        {_W} SELECT MIN(birthdate) AS oldest_birthdate,
                    {_DD_YEAR.format(a="MIN(birthdate)", b=_AS_OF)} AS oldest_age,
                    MAX(birthdate) AS youngest_birthdate,
                    {_DD_YEAR.format(a="MAX(birthdate)", b=_AS_OF)} AS youngest_age
        FROM g_dim_customers
    """,
)
def wh_q03_birthdate_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """03_date_range_exploration.sql:22-27 (GETDATE → AS_OF)."""
    as_of = F.lit(AS_OF).cast("timestamp")
    return _dimc(spark).agg(
        F.min("birthdate").alias("oldest_birthdate"),
        datediff_year(F.min("birthdate"), as_of).alias("oldest_age"),
        F.max("birthdate").alias("youngest_birthdate"),
        datediff_year(F.max("birthdate"), as_of).alias("youngest_age"),
    )


# ------------------------------------------------------------- Q04 measures

@query(
    "wh_q04_measures",
    survey="Q04 A1",
    oracle=f"""
        {_W} SELECT
          (SELECT CAST(SUM(sales_amount) AS BIGINT) FROM g_fact_sales) AS total_sales,
          (SELECT CAST(SUM(quantity) AS BIGINT) FROM g_fact_sales) AS total_quantity,
          (SELECT CAST(SUM(price) // COUNT(price) AS BIGINT) FROM g_fact_sales) AS avg_price,
          (SELECT CAST(COUNT(order_number) AS BIGINT) FROM g_fact_sales) AS total_order_rows,
          (SELECT CAST(COUNT(DISTINCT order_number) AS BIGINT) FROM g_fact_sales) AS total_orders,
          (SELECT CAST(COUNT(product_name) AS BIGINT) FROM g_dim_products) AS total_products,
          (SELECT CAST(COUNT(customer_key) AS BIGINT) FROM g_dim_customers) AS total_customers,
          (SELECT CAST(COUNT(DISTINCT customer_key) AS BIGINT) FROM g_fact_sales)
              AS customers_with_orders
    """,
)
def wh_q04_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """04_measures_exploration.sql:15-34 — the seven scalar measures
    as one row (T-SQL AVG(INT) truncates → SUM div COUNT)."""
    f = _fact(spark)
    fact = f.agg(
        F.sum("sales_amount").alias("total_sales"),
        F.sum("quantity").alias("total_quantity"),
        int_div(F.sum("price"), F.count("price")).alias("avg_price"),
        F.count("order_number").alias("total_order_rows"),
        F.countDistinct("order_number").alias("total_orders"),
        F.countDistinct("customer_key").alias("customers_with_orders"),
    )
    prods = _dimp(spark).agg(F.count("product_name").alias("total_products"))
    custs = _dimc(spark).agg(F.count("customer_key").alias("total_customers"))
    return fact.crossJoin(prods).crossJoin(custs).select(
        "total_sales", "total_quantity", "avg_price", "total_order_rows",
        "total_orders", "total_products", "total_customers", "customers_with_orders",
    )


@query(
    "wh_q04_metrics_report",
    survey="Q04 U1 A1",
    oracle=f"""
        {_W}
        SELECT 'Total Sales' AS measure_name,
               CAST(SUM(sales_amount) AS BIGINT) AS measure_value FROM g_fact_sales
        UNION ALL
        SELECT 'Total Quantity', CAST(SUM(quantity) AS BIGINT) FROM g_fact_sales
        UNION ALL
        SELECT 'Average Price', CAST(SUM(price) // COUNT(price) AS BIGINT) FROM g_fact_sales
        UNION ALL
        SELECT 'Total Orders', CAST(COUNT(DISTINCT order_number) AS BIGINT) FROM g_fact_sales
        UNION ALL
        SELECT 'Total Products', CAST(COUNT(DISTINCT product_name) AS BIGINT) FROM g_dim_products
        UNION ALL
        SELECT 'Total Customers', CAST(COUNT(customer_key) AS BIGINT) FROM g_dim_customers
    """,
)
def wh_q04_metrics_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """04_measures_exploration.sql:37-47 — UNION ALL metrics report."""
    f = _fact(spark)

    def metric(name: str, df: DataFrame, expr) -> DataFrame:
        return df.agg(expr.cast("long").alias("measure_value")).select(
            F.lit(name).alias("measure_name"), "measure_value"
        )

    parts = [
        metric("Total Sales", f, F.sum("sales_amount")),
        metric("Total Quantity", f, F.sum("quantity")),
        metric("Average Price", f, int_div(F.sum("price"), F.count("price"))),
        metric("Total Orders", f, F.countDistinct("order_number")),
        metric("Total Products", _dimp(spark), F.countDistinct("product_name")),
        metric("Total Customers", _dimc(spark), F.count("customer_key")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ------------------------------------------------------------ Q05 magnitude

@query(
    "wh_q05_customers_by_country",
    survey="Q05 A2 O1",
    oracle=f"""
        {_W} SELECT country, CAST(COUNT(customer_key) AS BIGINT) AS total_customers
        FROM g_dim_customers GROUP BY country ORDER BY total_customers DESC
    """,
)
def wh_q05_customers_by_country(spark: SparkSession, sf_dir: str) -> DataFrame:
    """05_magnitude_analysis.sql:16-21."""
    return (
        _dimc(spark)
        .groupBy("country")
        .agg(F.count("customer_key").alias("total_customers"))
        .orderBy(F.desc("total_customers"))
    )


@query(
    "wh_q05_customers_by_gender",
    survey="Q05 A2 O1",
    oracle=f"""
        {_W} SELECT gender, CAST(COUNT(customer_key) AS BIGINT) AS total_customers
        FROM g_dim_customers GROUP BY gender ORDER BY total_customers DESC
    """,
)
def wh_q05_customers_by_gender(spark: SparkSession, sf_dir: str) -> DataFrame:
    """05_magnitude_analysis.sql:24-29."""
    return (
        _dimc(spark)
        .groupBy("gender")
        .agg(F.count("customer_key").alias("total_customers"))
        .orderBy(F.desc("total_customers"))
    )


@query(
    "wh_q05_products_by_category",
    survey="Q05 A2 O1",
    oracle=f"""
        {_W} SELECT category, CAST(COUNT(product_key) AS BIGINT) AS total_products
        FROM g_dim_products GROUP BY category ORDER BY total_products DESC
    """,
)
def wh_q05_products_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """05_magnitude_analysis.sql:32-37."""
    return (
        _dimp(spark)
        .groupBy("category")
        .agg(F.count("product_key").alias("total_products"))
        .orderBy(F.desc("total_products"))
    )


@query(
    "wh_q05_avg_cost_by_category",
    survey="Q05 A2 A8",
    oracle=f"""
        {_W} SELECT category, CAST(SUM(cost) // COUNT(cost) AS BIGINT) AS avg_cost
        FROM g_dim_products GROUP BY category ORDER BY avg_cost DESC
    """,
)
def wh_q05_avg_cost_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """05_magnitude_analysis.sql:40-45 (T-SQL AVG(INT) truncation)."""
    return (
        _dimp(spark)
        .groupBy("category")
        .agg(int_div(F.sum("cost"), F.count("cost")).alias("avg_cost"))
        .orderBy(F.desc("avg_cost"))
    )


@query(
    "wh_q05_revenue_by_category",
    survey="Q05 A2 J4",
    oracle=f"""
        {_W} SELECT p.category, CAST(SUM(f.sales_amount) AS BIGINT) AS total_revenue
        FROM g_fact_sales f
        LEFT JOIN g_dim_products p ON p.product_key = f.product_key
        GROUP BY p.category ORDER BY total_revenue DESC
    """,
)
def wh_q05_revenue_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """05_magnitude_analysis.sql:48-55 — fact × broadcast dim."""
    f = _fact(spark)
    p = _dimp(spark)
    return (
        f.join(F.broadcast(p), f.product_key == p.product_key, "left")
        .groupBy("category")
        .agg(F.sum("sales_amount").alias("total_revenue"))
        .orderBy(F.desc("total_revenue"))
    )


@query(
    "wh_q05_revenue_by_customer",
    survey="Q05 A3 J5",
    oracle=f"""
        {_W} SELECT c.customer_key, c.first_name, c.last_name,
                    CAST(SUM(f.sales_amount) AS BIGINT) AS total_revenue
        FROM g_fact_sales f
        LEFT JOIN g_dim_customers c ON c.customer_key = f.customer_key
        GROUP BY c.customer_key, c.first_name, c.last_name
        ORDER BY total_revenue DESC
    """,
)
def wh_q05_revenue_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """05_magnitude_analysis.sql:59-71 — multi-key groupBy."""
    f = _fact(spark)
    c = _dimc(spark)
    return (
        f.join(F.broadcast(c), f.customer_key == c.customer_key, "left")
        .groupBy(c.customer_key, "first_name", "last_name")
        .agg(F.sum("sales_amount").alias("total_revenue"))
        .orderBy(F.desc("total_revenue"))
    )


@query(
    "wh_q05_items_by_country",
    survey="Q05 A2 J5",
    oracle=f"""
        {_W} SELECT c.country, CAST(SUM(f.quantity) AS BIGINT) AS total_sold_items
        FROM g_fact_sales f
        LEFT JOIN g_dim_customers c ON c.customer_key = f.customer_key
        GROUP BY c.country ORDER BY total_sold_items DESC
    """,
)
def wh_q05_items_by_country(spark: SparkSession, sf_dir: str) -> DataFrame:
    """05_magnitude_analysis.sql:74-81."""
    f = _fact(spark)
    c = _dimc(spark)
    return (
        f.join(F.broadcast(c), f.customer_key == c.customer_key, "left")
        .groupBy("country")
        .agg(F.sum("quantity").alias("total_sold_items"))
        .orderBy(F.desc("total_sold_items"))
    )


# -------------------------------------------------------------- Q06 ranking

def _product_revenue(spark: SparkSession) -> DataFrame:
    f = _fact(spark)
    p = _dimp(spark)
    return (
        f.join(F.broadcast(p), f.product_key == p.product_key, "left")
        .groupBy("product_name")
        .agg(F.sum("sales_amount").alias("total_revenue"))
    )


_PRODUCT_REVENUE_SQL = """
    SELECT p.product_name, CAST(SUM(f.sales_amount) AS BIGINT) AS total_revenue
    FROM g_fact_sales f
    LEFT JOIN g_dim_products p ON p.product_key = f.product_key
    GROUP BY p.product_name
"""


@query(
    "wh_q06_top5_products",
    survey="Q06 O2 A2",
    oracle=f"""
        {_W} SELECT * FROM ({_PRODUCT_REVENUE_SQL})
        ORDER BY total_revenue DESC, product_name LIMIT 5
    """,
)
def wh_q06_top5_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """06_ranking_analysis.sql:17-24 (TOP 5; deterministic
    tiebreaker on product_name added both sides). Catalyst plans
    TakeOrderedAndProject — true distributed top-k, no global sort."""
    return _product_revenue(spark).orderBy(
        F.desc("total_revenue"), "product_name"
    ).limit(5)


@query(
    "wh_q06_top5_products_rank",
    survey="Q06 W3 O3",
    oracle=f"""
        {_W} SELECT * FROM (
            SELECT product_name, total_revenue,
                   CAST(RANK() OVER (ORDER BY total_revenue DESC) AS BIGINT)
                       AS rank_products
            FROM ({_PRODUCT_REVENUE_SQL})
        ) WHERE rank_products <= 5
    """,
)
def wh_q06_top5_products_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """06_ranking_analysis.sql:27-38 — window-rank top-k (ties kept;
    differs from LIMIT under ties, preserved deliberately)."""
    w = Window.orderBy(F.desc("total_revenue"))
    return (
        _product_revenue(spark)
        .withColumn("rank_products", F.rank().over(w).cast("long"))
        .filter(F.col("rank_products") <= 5)
    )


@query(
    "wh_q06_top5_products_dense_rank",
    survey="Q06 W3 O3",
    oracle=f"""
        {_W} SELECT * FROM (
            SELECT product_name, total_revenue,
                   CAST(DENSE_RANK() OVER (ORDER BY total_revenue DESC)
                        AS BIGINT) AS dense_rank_products
            FROM ({_PRODUCT_REVENUE_SQL})
        ) WHERE dense_rank_products <= 5
    """,
)
def wh_q06_top5_products_dense_rank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """06_ranking_analysis.sql:10 names DENSE_RANK in the script's
    technique header but the body never calls it — this twin closes
    that gap with the gapless-rank semantics the header advertises:
    under ties DENSE_RANK keeps admitting distinct revenue levels
    until 5 LEVELS (not 5 rows) are in, so it can return more rows
    than the RANK form. Same single-pass plan shape as
    wh_q06_top5_products_rank: one agg, one window, filter."""
    w = Window.orderBy(F.desc("total_revenue"))
    return (
        _product_revenue(spark)
        .withColumn("dense_rank_products", F.dense_rank().over(w).cast("long"))
        .filter(F.col("dense_rank_products") <= 5)
    )


@query(
    "wh_q06_worst5_products",
    survey="Q06 O2",
    oracle=f"""
        {_W} SELECT * FROM ({_PRODUCT_REVENUE_SQL})
        ORDER BY total_revenue ASC, product_name LIMIT 5
    """,
)
def wh_q06_worst5_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """06_ranking_analysis.sql:41-48."""
    return _product_revenue(spark).orderBy("total_revenue", "product_name").limit(5)


@query(
    "wh_q06_top10_customers",
    survey="Q06 O2 A3",
    oracle=f"""
        {_W} SELECT c.customer_key, c.first_name, c.last_name,
                    CAST(SUM(f.sales_amount) AS BIGINT) AS total_revenue
        FROM g_fact_sales f
        LEFT JOIN g_dim_customers c ON c.customer_key = f.customer_key
        GROUP BY c.customer_key, c.first_name, c.last_name
        ORDER BY total_revenue DESC, c.customer_key LIMIT 10
    """,
)
def wh_q06_top10_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """06_ranking_analysis.sql:51-63."""
    f = _fact(spark)
    c = _dimc(spark)
    return (
        f.join(F.broadcast(c), f.customer_key == c.customer_key, "left")
        .groupBy(c.customer_key, "first_name", "last_name")
        .agg(F.sum("sales_amount").alias("total_revenue"))
        .orderBy(F.desc("total_revenue"), "customer_key")
        .limit(10)
    )


@query(
    "wh_q06_bottom3_customers",
    survey="Q06 O2 A5",
    oracle=f"""
        {_W} SELECT c.customer_key, c.first_name, c.last_name,
                    CAST(COUNT(DISTINCT f.order_number) AS BIGINT) AS total_orders
        FROM g_fact_sales f
        LEFT JOIN g_dim_customers c ON c.customer_key = f.customer_key
        GROUP BY c.customer_key, c.first_name, c.last_name
        ORDER BY total_orders ASC, c.customer_key LIMIT 3
    """,
)
def wh_q06_bottom3_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """06_ranking_analysis.sql:66-78 (ties on total_orders are dense —
    customer_key tiebreaker is load-bearing here)."""
    f = _fact(spark)
    c = _dimc(spark)
    return (
        f.join(F.broadcast(c), f.customer_key == c.customer_key, "left")
        .groupBy(c.customer_key, "first_name", "last_name")
        .agg(F.countDistinct("order_number").alias("total_orders"))
        .orderBy("total_orders", "customer_key")
        .limit(3)
    )


# ------------------------------------------------------ Q07 change over time

@query(
    "wh_q07_monthly_ym",
    survey="Q07 A4 A5",
    oracle=f"""
        {_W} SELECT CAST(year(order_date) AS INTEGER) AS order_year,
                    CAST(month(order_date) AS INTEGER) AS order_month,
                    CAST(SUM(sales_amount) AS BIGINT) AS total_sales,
                    CAST(COUNT(DISTINCT customer_key) AS BIGINT) AS total_customers,
                    CAST(SUM(quantity) AS BIGINT) AS total_quantity
        FROM g_fact_sales WHERE order_date IS NOT NULL
        GROUP BY order_year, order_month ORDER BY order_year, order_month
    """,
)
def wh_q07_monthly_ym(spark: SparkSession, sf_dir: str) -> DataFrame:
    """07_change_over_time_analysis.sql:18-27 (YEAR/MONTH keys)."""
    return (
        _fact(spark)
        .filter(F.col("order_date").isNotNull())
        .groupBy(
            F.year("order_date").alias("order_year"),
            F.month("order_date").alias("order_month"),
        )
        .agg(
            F.sum("sales_amount").alias("total_sales"),
            F.countDistinct("customer_key").alias("total_customers"),
            F.sum("quantity").alias("total_quantity"),
        )
        .orderBy("order_year", "order_month")
    )


@query(
    "wh_q07_monthly_trunc",
    survey="Q07 A4",
    oracle=f"""
        {_W} SELECT date_trunc('month', order_date) AS order_month_start,
                    CAST(SUM(sales_amount) AS BIGINT) AS total_sales,
                    CAST(COUNT(DISTINCT customer_key) AS BIGINT) AS total_customers,
                    CAST(SUM(quantity) AS BIGINT) AS total_quantity
        FROM g_fact_sales WHERE order_date IS NOT NULL
        GROUP BY order_month_start ORDER BY order_month_start
    """,
)
def wh_q07_monthly_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """07_change_over_time_analysis.sql:30-38 (DATETRUNC keys)."""
    return (
        _fact(spark)
        .filter(F.col("order_date").isNotNull())
        .groupBy(F.date_trunc("month", "order_date").alias("order_month_start"))
        .agg(
            F.sum("sales_amount").alias("total_sales"),
            F.countDistinct("customer_key").alias("total_customers"),
            F.sum("quantity").alias("total_quantity"),
        )
        .orderBy("order_month_start")
    )


@query(
    "wh_q07_monthly_label",
    survey="Q07 A4",
    oracle=f"""
        {_W} SELECT strftime(order_date, '%Y-%b') AS order_month_label,
                    CAST(SUM(sales_amount) AS BIGINT) AS total_sales,
                    CAST(COUNT(DISTINCT customer_key) AS BIGINT) AS total_customers,
                    CAST(SUM(quantity) AS BIGINT) AS total_quantity
        FROM g_fact_sales WHERE order_date IS NOT NULL
        GROUP BY order_month_label ORDER BY order_month_label
    """,
)
def wh_q07_monthly_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """07_change_over_time_analysis.sql:41-49 (FORMAT 'yyyy-MMM' keys —
    English month abbreviations agree across both engines)."""
    return (
        _fact(spark)
        .filter(F.col("order_date").isNotNull())
        .groupBy(F.date_format("order_date", "yyyy-MMM").alias("order_month_label"))
        .agg(
            F.sum("sales_amount").alias("total_sales"),
            F.countDistinct("customer_key").alias("total_customers"),
            F.sum("quantity").alias("total_quantity"),
        )
        .orderBy("order_month_label")
    )


# --------------------------------------------------------- Q08 cumulative

@query(
    "wh_q08_cumulative_yearly",
    survey="Q08 A7 W6 W7",
    oracle=f"""
        {_W}, yearly AS (
            SELECT date_trunc('year', order_date) AS order_year_start,
                   CAST(SUM(sales_amount) AS BIGINT) AS total_sales,
                   CAST(SUM(price) // COUNT(price) AS BIGINT) AS avg_price
            FROM g_fact_sales WHERE order_date IS NOT NULL
            GROUP BY order_year_start
        )
        SELECT order_year_start, total_sales,
               CAST(SUM(total_sales) OVER (ORDER BY order_year_start) AS BIGINT)
                   AS running_total_sales,
               CAST(SUM(avg_price) OVER (ORDER BY order_year_start)
                    // COUNT(avg_price) OVER (ORDER BY order_year_start) AS BIGINT)
                   AS moving_average_price
        FROM yearly ORDER BY order_year_start
    """,
)
def wh_q08_cumulative_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """08_cumulative_analysis.sql:18-32 — agg CTE then running
    SUM/AVG windows (default RANGE UNBOUNDED..CURRENT frame matches
    in both engines; T-SQL AVG(INT) → running SUM div COUNT)."""
    yearly = (
        _fact(spark)
        .filter(F.col("order_date").isNotNull())
        .groupBy(F.date_trunc("year", "order_date").alias("order_year_start"))
        .agg(
            F.sum("sales_amount").alias("total_sales"),
            int_div(F.sum("price"), F.count("price")).alias("avg_price"),
        )
    )
    w = Window.orderBy("order_year_start")
    return yearly.select(
        "order_year_start",
        "total_sales",
        F.sum("total_sales").over(w).alias("running_total_sales"),
        int_div(F.sum("avg_price").over(w), F.count("avg_price").over(w))
        .alias("moving_average_price"),
    ).orderBy("order_year_start")


# -------------------------------------------------------- Q09 performance

@query(
    "wh_q09_yoy_products",
    survey="Q09 A7 W5 W8",
    oracle=f"""
        {_W}, yearly AS (
            SELECT CAST(year(f.order_date) AS INTEGER) AS order_year,
                   p.product_name,
                   CAST(SUM(f.sales_amount) AS BIGINT) AS current_sales
            FROM g_fact_sales f
            LEFT JOIN g_dim_products p ON f.product_key = p.product_key
            WHERE f.order_date IS NOT NULL
            GROUP BY order_year, p.product_name
        )
        SELECT order_year, product_name, current_sales,
               CAST(SUM(current_sales) OVER (PARTITION BY product_name)
                    // COUNT(current_sales) OVER (PARTITION BY product_name)
                    AS BIGINT) AS avg_sales,
               CAST(current_sales
                    - SUM(current_sales) OVER (PARTITION BY product_name)
                      // COUNT(current_sales) OVER (PARTITION BY product_name)
                    AS BIGINT) AS diff_avg,
               CASE WHEN current_sales
                         - SUM(current_sales) OVER (PARTITION BY product_name)
                           // COUNT(current_sales) OVER (PARTITION BY product_name) > 0
                    THEN 'Above Avg'
                    WHEN current_sales
                         - SUM(current_sales) OVER (PARTITION BY product_name)
                           // COUNT(current_sales) OVER (PARTITION BY product_name) < 0
                    THEN 'Below Avg' ELSE 'Avg' END AS avg_change,
               CAST(LAG(current_sales) OVER (PARTITION BY product_name ORDER BY order_year)
                    AS BIGINT) AS py_sales,
               CAST(current_sales - LAG(current_sales)
                        OVER (PARTITION BY product_name ORDER BY order_year)
                    AS BIGINT) AS diff_py,
               CASE WHEN current_sales - LAG(current_sales)
                        OVER (PARTITION BY product_name ORDER BY order_year) > 0
                    THEN 'Increase'
                    WHEN current_sales - LAG(current_sales)
                        OVER (PARTITION BY product_name ORDER BY order_year) < 0
                    THEN 'Decrease' ELSE 'No Change' END AS py_change
        FROM yearly ORDER BY product_name, order_year
    """,
)
def wh_q09_yoy_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """09_performance_analysis.sql:19-52 — YoY via LAG (W5) + vs own
    average via whole-partition window (W8). T-SQL AVG(INT) truncates
    → SUM div COUNT on both sides."""
    f = _fact(spark)
    p = _dimp(spark)
    yearly = (
        f.join(F.broadcast(p), f.product_key == p.product_key, "left")
        .filter(F.col("order_date").isNotNull())
        .groupBy(
            F.year("order_date").alias("order_year"),
            "product_name",
        )
        .agg(F.sum("sales_amount").alias("current_sales"))
    )
    wp = Window.partitionBy("product_name")
    wo = Window.partitionBy("product_name").orderBy("order_year")
    avg_sales = int_div(
        F.sum("current_sales").over(wp), F.count("current_sales").over(wp)
    )
    py_sales = F.lag("current_sales").over(wo)
    return yearly.select(
        "order_year",
        "product_name",
        "current_sales",
        avg_sales.alias("avg_sales"),
        (F.col("current_sales") - avg_sales).alias("diff_avg"),
        F.when(F.col("current_sales") - avg_sales > 0, "Above Avg")
        .when(F.col("current_sales") - avg_sales < 0, "Below Avg")
        .otherwise("Avg")
        .alias("avg_change"),
        py_sales.alias("py_sales"),
        (F.col("current_sales") - py_sales).alias("diff_py"),
        F.when(F.col("current_sales") - py_sales > 0, "Increase")
        .when(F.col("current_sales") - py_sales < 0, "Decrease")
        .otherwise("No Change")
        .alias("py_change"),
    ).orderBy("product_name", "order_year")


# ------------------------------------------------------- Q10 segmentation

@query(
    "wh_q10_cost_ranges",
    survey="Q10 A4 A2",
    oracle=f"""
        {_W}, segs AS (
            SELECT product_key,
                   CASE WHEN cost < 100 THEN 'Below 100'
                        WHEN cost BETWEEN 100 AND 500 THEN '100-500'
                        WHEN cost BETWEEN 500 AND 1000 THEN '500-1000'
                        ELSE 'Above 1000' END AS cost_range
            FROM g_dim_products
        )
        SELECT cost_range, CAST(COUNT(product_key) AS BIGINT) AS total_products
        FROM segs GROUP BY cost_range ORDER BY total_products DESC
    """,
)
def wh_q10_cost_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10_data_segmentation.sql:17-35 — CASE bucket + re-aggregate."""
    return (
        _dimp(spark)
        .select(
            "product_key",
            F.when(F.col("cost") < 100, "Below 100")
            .when(F.col("cost").between(100, 500), "100-500")
            .when(F.col("cost").between(500, 1000), "500-1000")
            .otherwise("Above 1000")
            .alias("cost_range"),
        )
        .groupBy("cost_range")
        .agg(F.count("product_key").alias("total_products"))
        .orderBy(F.desc("total_products"))
    )


@query(
    "wh_q10_customer_segments",
    survey="Q10 A7",
    oracle=f"""
        {_W}, spending AS (
            SELECT c.customer_key,
                   CAST(SUM(f.sales_amount) AS BIGINT) AS total_spending,
                   {_DD_MONTH.format(a="MIN(order_date)", b="MAX(order_date)")}
                       AS lifespan
            FROM g_fact_sales f
            LEFT JOIN g_dim_customers c ON f.customer_key = c.customer_key
            GROUP BY c.customer_key
        )
        SELECT customer_segment, CAST(COUNT(customer_key) AS BIGINT) AS total_customers
        FROM (
            SELECT customer_key,
                   CASE WHEN lifespan >= 12 AND total_spending > 5000 THEN 'VIP'
                        WHEN lifespan >= 12 AND total_spending <= 5000 THEN 'Regular'
                        ELSE 'New' END AS customer_segment
            FROM spending
        ) GROUP BY customer_segment ORDER BY total_customers DESC
    """,
)
def wh_q10_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10_data_segmentation.sql:43-69 — agg CTE → CASE → re-agg."""
    f = _fact(spark)
    c = _dimc(spark)
    spending = (
        f.join(F.broadcast(c), f.customer_key == c.customer_key, "left")
        .groupBy(c.customer_key)
        .agg(
            F.sum("sales_amount").alias("total_spending"),
            datediff_month(F.min("order_date"), F.max("order_date")).alias("lifespan"),
        )
    )
    return (
        spending.select(
            "customer_key",
            F.when((F.col("lifespan") >= 12) & (F.col("total_spending") > 5000), "VIP")
            .when((F.col("lifespan") >= 12) & (F.col("total_spending") <= 5000), "Regular")
            .otherwise("New")
            .alias("customer_segment"),
        )
        .groupBy("customer_segment")
        .agg(F.count("customer_key").alias("total_customers"))
        .orderBy(F.desc("total_customers"))
    )


# ------------------------------------------------------ Q11 part-to-whole

@query(
    "wh_q11_category_share",
    survey="Q11 A7 W9",
    oracle=f"""
        {_W}, category_sales AS (
            SELECT p.category, CAST(SUM(f.sales_amount) AS BIGINT) AS total_sales
            FROM g_fact_sales f
            LEFT JOIN g_dim_products p ON p.product_key = f.product_key
            GROUP BY p.category
        )
        SELECT category, total_sales,
               CAST(SUM(total_sales) OVER () AS BIGINT) AS overall_sales,
               {_round_sql("CAST(total_sales AS DOUBLE) / CAST(SUM(total_sales) OVER () AS DOUBLE) * 100.0", 2)}
                   AS percentage_of_total
        FROM category_sales ORDER BY total_sales DESC
    """,
)
def wh_q11_category_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """11_part_to_whole_analysis.sql:16-31 — empty-OVER grand total
    (W9). The window input is the tiny post-agg frame (one row per
    category), so the single-partition window is safe at any fact
    scale; the division is pure IEEE double on exact int sums —
    bit-identical across engines."""
    f = _fact(spark)
    p = _dimp(spark)
    cat = (
        f.join(F.broadcast(p), f.product_key == p.product_key, "left")
        .groupBy("category")
        .agg(F.sum("sales_amount").alias("total_sales"))
    )
    w = Window.partitionBy()
    overall = F.sum("total_sales").over(w)
    return cat.select(
        "category",
        "total_sales",
        overall.alias("overall_sales"),
        _round_col(
            F.col("total_sales").cast("double") / overall.cast("double") * F.lit(100.0),
            2,
        ).alias("percentage_of_total"),
    ).orderBy(F.desc("total_sales"))


# -------------------------------------------------- Q12 customer report

@query(
    "wh_q12_report_customers",
    survey="Q12 A7 A5 A3",
    oracle=f"""
        {_W}, base AS (
            SELECT f.order_number, f.product_key, f.order_date, f.sales_amount,
                   f.quantity, c.customer_key, c.customer_number,
                   concat(COALESCE(c.first_name, ''), ' ', COALESCE(c.last_name, ''))
                       AS customer_name,
                   {_DD_YEAR.format(a="c.birthdate", b=_AS_OF)} AS age
            FROM g_fact_sales f
            LEFT JOIN g_dim_customers c ON c.customer_key = f.customer_key
            WHERE f.order_date IS NOT NULL
        ), agg AS (
            SELECT customer_key, customer_number, customer_name, age,
                   CAST(COUNT(DISTINCT order_number) AS BIGINT) AS total_orders,
                   CAST(SUM(sales_amount) AS BIGINT) AS total_sales,
                   CAST(SUM(quantity) AS BIGINT) AS total_quantity,
                   CAST(COUNT(DISTINCT product_key) AS BIGINT) AS total_products,
                   MAX(order_date) AS last_order_date,
                   {_DD_MONTH.format(a="MIN(order_date)", b="MAX(order_date)")}
                       AS lifespan
            FROM base
            GROUP BY customer_key, customer_number, customer_name, age
        )
        SELECT customer_key, customer_number, customer_name, age,
               CASE WHEN age < 20 THEN 'Under 20'
                    WHEN age BETWEEN 20 AND 29 THEN '20-29'
                    WHEN age BETWEEN 30 AND 39 THEN '30-39'
                    WHEN age BETWEEN 40 AND 49 THEN '40-49'
                    ELSE '50 and above' END AS age_group,
               CASE WHEN lifespan >= 12 AND total_sales > 5000 THEN 'VIP'
                    WHEN lifespan >= 12 AND total_sales <= 5000 THEN 'Regular'
                    ELSE 'New' END AS customer_segment,
               last_order_date,
               {_DD_MONTH.format(a="last_order_date", b=_AS_OF)} AS recency,
               total_orders, total_sales, total_quantity, total_products, lifespan,
               CAST(CASE WHEN total_sales = 0 THEN 0
                         ELSE total_sales // total_orders END AS BIGINT)
                   AS avg_order_value,
               CAST(CASE WHEN lifespan = 0 THEN total_sales
                         ELSE total_sales // lifespan END AS BIGINT)
                   AS avg_monthly_spend
        FROM agg
    """,
)
def wh_q12_report_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gold.report_customers (12_report_customers.sql:31-106): age and
    spending segmentation + recency/AOV/monthly-spend KPIs. The
    reference's missing-comma bug at :96-97 is fixed per its header
    intent — total_products and lifespan are separate columns
    (SURVEY §1.5). T-SQL INT/INT division preserved via ``div``."""
    as_of = F.lit(AS_OF).cast("timestamp")
    f = _fact(spark)
    c = _dimc(spark)
    base = (
        f.join(F.broadcast(c), f.customer_key == c.customer_key, "left")
        .filter(F.col("order_date").isNotNull())
        .select(
            "order_number", "product_key", "order_date", "sales_amount",
            "quantity", c.customer_key, "customer_number",
            F.concat(
                F.coalesce("first_name", F.lit("")),
                F.lit(" "),
                F.coalesce("last_name", F.lit("")),
            ).alias("customer_name"),
            datediff_year(F.col("birthdate"), as_of).alias("age"),
        )
    )
    agg = base.groupBy(
        "customer_key", "customer_number", "customer_name", "age"
    ).agg(
        F.countDistinct("order_number").alias("total_orders"),
        F.sum("sales_amount").alias("total_sales"),
        F.sum("quantity").alias("total_quantity"),
        F.countDistinct("product_key").alias("total_products"),
        F.max("order_date").alias("last_order_date"),
        datediff_month(F.min("order_date"), F.max("order_date")).alias("lifespan"),
    )
    return agg.select(
        "customer_key", "customer_number", "customer_name", "age",
        F.when(F.col("age") < 20, "Under 20")
        .when(F.col("age").between(20, 29), "20-29")
        .when(F.col("age").between(30, 39), "30-39")
        .when(F.col("age").between(40, 49), "40-49")
        .otherwise("50 and above")
        .alias("age_group"),
        F.when((F.col("lifespan") >= 12) & (F.col("total_sales") > 5000), "VIP")
        .when((F.col("lifespan") >= 12) & (F.col("total_sales") <= 5000), "Regular")
        .otherwise("New")
        .alias("customer_segment"),
        "last_order_date",
        datediff_month(F.col("last_order_date"), as_of).alias("recency"),
        "total_orders", "total_sales", "total_quantity", "total_products",
        "lifespan",
        F.when(F.col("total_sales") == 0, F.lit(0).cast("long"))
        .otherwise(int_div(F.col("total_sales"), F.col("total_orders")))
        .alias("avg_order_value"),
        F.when(F.col("lifespan") == 0, F.col("total_sales"))
        .otherwise(int_div(F.col("total_sales"), F.col("lifespan")))
        .alias("avg_monthly_spend"),
    )


# --------------------------------------------------- Q13 product report

@query(
    "wh_q13_report_products",
    survey="Q13 A7 A8 A5",
    oracle=f"""
        {_W}, base AS (
            SELECT f.order_number, f.order_date, f.customer_key, f.sales_amount,
                   f.quantity, p.product_key, p.product_name, p.category,
                   p.subcategory, p.cost
            FROM g_fact_sales f
            LEFT JOIN g_dim_products p ON f.product_key = p.product_key
            WHERE f.order_date IS NOT NULL
        ), agg AS (
            SELECT product_key, product_name, category, subcategory, cost,
                   {_DD_MONTH.format(a="MIN(order_date)", b="MAX(order_date)")}
                       AS lifespan,
                   MAX(order_date) AS last_sale_date,
                   CAST(COUNT(DISTINCT order_number) AS BIGINT) AS total_orders,
                   CAST(COUNT(DISTINCT customer_key) AS BIGINT) AS total_customers,
                   CAST(SUM(sales_amount) AS BIGINT) AS total_sales,
                   CAST(SUM(quantity) AS BIGINT) AS total_quantity,
                   {_round_sql(
                       "CAST(SUM(CAST(floor(CAST(sales_amount AS DOUBLE)"
                       " / NULLIF(quantity, 0) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)"
                       " / 1000000.0 / COUNT(CASE WHEN quantity != 0 THEN 1 END)", 1)}
                       AS avg_selling_price
            FROM base
            GROUP BY product_key, product_name, category, subcategory, cost
        )
        SELECT product_key, product_name, category, subcategory, cost,
               last_sale_date,
               {_DD_MONTH.format(a="last_sale_date", b=_AS_OF)} AS recency_in_months,
               CASE WHEN total_sales > 50000 THEN 'High-Performer'
                    WHEN total_sales >= 10000 THEN 'Mid-Range'
                    ELSE 'Low-Performer' END AS product_segment,
               lifespan, total_orders, total_customers, total_sales, total_quantity,
               avg_selling_price,
               CAST(CASE WHEN total_orders = 0 THEN 0
                         ELSE total_sales // total_orders END AS BIGINT)
                   AS avg_order_revenue,
               CAST(CASE WHEN lifespan = 0 THEN total_sales
                         ELSE total_sales // lifespan END AS BIGINT)
                   AS avg_monthly_revenue
        FROM agg
    """,
)
def wh_q13_report_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gold.report_products (13_report_products.sql:30-114): revenue
    segmentation + recency/AOR/monthly-revenue KPIs. The float average
    avg_selling_price is quantized to exact integer micros before the
    sum so partial-aggregation order can't change the result (see
    module docstring); ROUND(x,1) → floor(x*10+0.5)/10 on both sides.
    """
    as_of = F.lit(AS_OF).cast("timestamp")
    f = _fact(spark)
    p = _dimp(spark)
    ratio = F.col("sales_amount").cast("double") / F.when(
        F.col("quantity") == 0, F.lit(None)
    ).otherwise(F.col("quantity"))
    ratio_micros = F.floor(ratio * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    base = (
        f.join(F.broadcast(p), f.product_key == p.product_key, "left")
        .filter(F.col("order_date").isNotNull())
        .select(
            "order_number", "order_date", "customer_key", "sales_amount",
            "quantity", p.product_key, "product_name", "category",
            "subcategory", "cost", ratio_micros.alias("ratio_micros"),
        )
    )
    agg = base.groupBy(
        "product_key", "product_name", "category", "subcategory", "cost"
    ).agg(
        datediff_month(F.min("order_date"), F.max("order_date")).alias("lifespan"),
        F.max("order_date").alias("last_sale_date"),
        F.countDistinct("order_number").alias("total_orders"),
        F.countDistinct("customer_key").alias("total_customers"),
        F.sum("sales_amount").alias("total_sales"),
        F.sum("quantity").alias("total_quantity"),
        _round_col(
            F.sum("ratio_micros").cast("double") / F.lit(1000000.0)
            / F.count(F.when(F.col("quantity") != 0, F.lit(1))),
            1,
        ).alias("avg_selling_price"),
    )
    return agg.select(
        "product_key", "product_name", "category", "subcategory", "cost",
        "last_sale_date",
        datediff_month(F.col("last_sale_date"), as_of).alias("recency_in_months"),
        F.when(F.col("total_sales") > 50000, "High-Performer")
        .when(F.col("total_sales") >= 10000, "Mid-Range")
        .otherwise("Low-Performer")
        .alias("product_segment"),
        "lifespan", "total_orders", "total_customers", "total_sales",
        "total_quantity", "avg_selling_price",
        F.when(F.col("total_orders") == 0, F.lit(0).cast("long"))
        .otherwise(int_div(F.col("total_sales"), F.col("total_orders")))
        .alias("avg_order_revenue"),
        F.when(F.col("lifespan") == 0, F.col("total_sales"))
        .otherwise(int_div(F.col("total_sales"), F.col("lifespan")))
        .alias("avg_monthly_revenue"),
    )
