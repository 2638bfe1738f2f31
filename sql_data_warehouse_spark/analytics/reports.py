"""Report-grade composite queries — analogs of the reference's
segmentation and report views (scripts/analysis/10_data_segmentation
.sql, 12_report_customers.sql, 13_report_products.sql) over the
testdata star schema.

These are the heaviest relational queries in the surface: multi-CTE,
fact-fact join (lineitem⋈orders — a real shuffle join, not
broadcastable at scale), multiple COUNT DISTINCTs, boundary-count
datediffs, CASE-ladder segmentation, guarded and integer division.

"Now" (reference GETDATE()) is parameterized as the global max order
date so runs are deterministic and oracle-comparable (SURVEY §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tsql import datediff_month
from ..sources import load_table
from .registry import query
from .xengine import CENTS_SQL, DATEDIFF_MONTH_SQL, MONEY_SUM_SQL, cents, money_sum

REVENUE = "l_extendedprice * (1.0 - l_discount)"


# ---------------------------------------------------------------- Q10a analog

@query(
    "part_price_buckets",
    survey="A4 A9 P1",
    oracle="""
        SELECT CASE WHEN p_retailprice < 925 THEN 'Below 925'
                    WHEN p_retailprice BETWEEN 925 AND 950 THEN '925-950'
                    WHEN p_retailprice BETWEEN 950 AND 975 THEN '950-975'
                    ELSE 'Above 975' END AS price_range,
               CAST(COUNT(*) AS BIGINT) AS n_parts
        FROM part
        GROUP BY 1
        ORDER BY n_parts DESC, price_range
    """,
)
def part_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-range segmentation: CASE bucket then group-by-bucket
    (reference: scripts/analysis/10_data_segmentation.sql:17-35)."""
    p = load_table(spark, sf_dir, "part")
    bucket = (
        F.when(F.col("p_retailprice") < 925, "Below 925")
        .when(F.col("p_retailprice").between(925, 950), "925-950")
        .when(F.col("p_retailprice").between(950, 975), "950-975")
        .otherwise("Above 975")
    )
    return (
        p.groupBy(bucket.alias("price_range"))
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy(F.desc("n_parts"), "price_range")
    )


# ---------------------------------------------------------------- Q10b analog

@query(
    "customer_segments",
    survey="A7 A9 P6",
    oracle=f"""
        WITH spend AS (
          SELECT o_custkey,
                 {MONEY_SUM_SQL.format(expr="o_totalprice")} AS total_spend,
                 {DATEDIFF_MONTH_SQL.format(a="MIN(o_orderdate)", b="MAX(o_orderdate)")}
                   AS lifespan_months
          FROM orders GROUP BY o_custkey
        )
        SELECT CASE WHEN lifespan_months >= 12 AND total_spend > 2400000
                      THEN 'VIP'
                    WHEN lifespan_months >= 12 THEN 'Regular'
                    ELSE 'New' END AS customer_segment,
               CAST(COUNT(*) AS BIGINT) AS total_customers
        FROM spend
        GROUP BY 1
        ORDER BY total_customers DESC
    """,
)
def customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIP/Regular/New segmentation: agg CTE → boundary-month
    lifespan → CASE → re-aggregate (reference: scripts/analysis/
    10_data_segmentation.sql:43-69). Two shuffles total: by customer,
    then by 3-value segment."""
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        money_sum(F.col("o_totalprice")).alias("total_spend"),
        datediff_month(F.min("o_orderdate"), F.max("o_orderdate")).alias(
            "lifespan_months"
        ),
    )
    segment = (
        F.when(
            (F.col("lifespan_months") >= 12) & (F.col("total_spend") > 2400000),
            "VIP",
        )
        .when(F.col("lifespan_months") >= 12, "Regular")
        .otherwise("New")
    )
    return (
        spend.groupBy(segment.alias("customer_segment"))
        .agg(F.count(F.lit(1)).alias("total_customers"))
        .orderBy(F.desc("total_customers"))
    )


# ----------------------------------------------------------------- Q12 analog

@query(
    "customer_report",
    survey="A3 A5 A7 A8 A9 J5 W9-rewrite P1",
    oracle=f"""
        WITH base AS (
          SELECT l.*, o.o_custkey, o.o_orderdate
          FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        agg AS (
          SELECT o_custkey,
                 CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS total_orders,
                 SUM({CENTS_SQL.format(expr=REVENUE)}) AS sales_cents,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_quantity,
                 CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS total_parts,
                 MIN(o_orderdate) AS first_order_ts,
                 MAX(o_orderdate) AS last_order_ts,
                 {DATEDIFF_MONTH_SQL.format(a="MIN(o_orderdate)", b="MAX(o_orderdate)")}
                   AS lifespan_months
          FROM base GROUP BY o_custkey
        ),
        now_ref AS (SELECT MAX(o_orderdate) AS as_of_ts FROM orders)
        SELECT a.o_custkey AS customer_key,
               c.c_name AS customer_name,
               n.n_name AS nation,
               CASE WHEN c.c_acctbal < 0 THEN 'Negative'
                    WHEN c.c_acctbal < 5000 THEN 'Mid' ELSE 'High' END
                 AS balance_tier,
               a.total_orders, a.total_quantity, a.total_parts,
               CAST(a.sales_cents AS DOUBLE) / 100.0 AS total_sales,
               a.first_order_ts, a.last_order_ts, a.lifespan_months,
               {DATEDIFF_MONTH_SQL.format(a="a.last_order_ts", b="s.as_of_ts")}
                 AS recency_months,
               CASE WHEN a.lifespan_months >= 12
                         AND CAST(a.sales_cents AS DOUBLE) / 100.0 > 2400000
                      THEN 'VIP'
                    WHEN a.lifespan_months >= 12 THEN 'Regular'
                    ELSE 'New' END AS customer_segment,
               CAST(a.sales_cents // a.total_orders AS DOUBLE) / 100.0
                 AS avg_order_value,
               CASE WHEN a.lifespan_months = 0
                      THEN CAST(a.sales_cents AS DOUBLE) / 100.0
                    ELSE (CAST(a.sales_cents AS DOUBLE) / 100.0)
                         / a.lifespan_months END AS avg_monthly_spend
        FROM agg a
        LEFT JOIN customer c ON a.o_custkey = c.c_custkey
        LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        CROSS JOIN now_ref s
    """,
)
def customer_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer KPI report (reference: scripts/analysis/
    12_report_customers.sql:31-106): fact-fact join, per-customer
    aggregate, recency vs parameterized "now", segmentation ladder,
    T-SQL integer-division AOV, guarded monthly spend.

    Plan shape at scale: lineitem⋈orders shuffles on orderkey (both
    sides huge — sort-merge, AQE-skew-safe); per-customer agg shuffles
    on custkey; customer/nation dims broadcast onto the small
    aggregate; the 1-row as-of aggregate broadcasts via cross join
    (the W9 grand-total rewrite from SURVEY §4.3)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")

    base = li.join(
        o.select("o_orderkey", "o_custkey", "o_orderdate"),
        li.l_orderkey == o.o_orderkey,
        "left",
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    agg = base.groupBy("o_custkey").agg(
        F.countDistinct("l_orderkey").alias("total_orders"),
        F.sum(cents(revenue)).alias("sales_cents"),
        F.sum(F.col("l_quantity").cast("long")).alias("total_quantity"),
        F.countDistinct("l_partkey").alias("total_parts"),
        F.min("o_orderdate").alias("first_order_ts"),
        F.max("o_orderdate").alias("last_order_ts"),
    ).withColumn(
        "lifespan_months",
        datediff_month(F.col("first_order_ts"), F.col("last_order_ts")),
    )
    asof = o.agg(F.max("o_orderdate").alias("as_of_ts"))

    total_sales = F.col("sales_cents").cast("double") / F.lit(100.0)
    return (
        agg.join(F.broadcast(c), agg.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .crossJoin(F.broadcast(asof))
        .select(
            F.col("o_custkey").alias("customer_key"),
            F.col("c_name").alias("customer_name"),
            F.col("n_name").alias("nation"),
            F.when(F.col("c_acctbal") < 0, "Negative")
            .when(F.col("c_acctbal") < 5000, "Mid")
            .otherwise("High")
            .alias("balance_tier"),
            "total_orders",
            "total_quantity",
            "total_parts",
            total_sales.alias("total_sales"),
            "first_order_ts",
            "last_order_ts",
            "lifespan_months",
            datediff_month(F.col("last_order_ts"), F.col("as_of_ts")).alias(
                "recency_months"
            ),
            F.when(
                (F.col("lifespan_months") >= 12) & (total_sales > 2400000), "VIP"
            )
            .when(F.col("lifespan_months") >= 12, "Regular")
            .otherwise("New")
            .alias("customer_segment"),
            (
                (
                    F.col("sales_cents").cast("decimal(38,0)")
                    / F.col("total_orders").cast("decimal(38,0)")
                ).cast("long").cast("double")
                / F.lit(100.0)
            ).alias("avg_order_value"),
            F.when(F.col("lifespan_months") == 0, total_sales)
            .otherwise(total_sales / F.col("lifespan_months"))
            .alias("avg_monthly_spend"),
        )
    )


# ----------------------------------------------------------------- Q13 analog

@query(
    "part_report",
    survey="A3 A5 A7 A8 A9 J4 P1",
    oracle=f"""
        WITH base AS (
          SELECT l.*, o.o_custkey
          FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        agg AS (
          SELECT l_partkey,
                 CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS total_orders,
                 CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS total_customers,
                 SUM({CENTS_SQL.format(expr=REVENUE)}) AS rev_cents,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_quantity,
                 MIN(CAST(l_shipdate AS TIMESTAMP)) AS first_ship_ts,
                 MAX(CAST(l_shipdate AS TIMESTAMP)) AS last_ship_ts,
                 {DATEDIFF_MONTH_SQL.format(a="MIN(l_shipdate)", b="MAX(l_shipdate)")}
                   AS lifespan_months
          FROM base GROUP BY l_partkey
        ),
        now_ref AS (SELECT MAX(l_shipdate) AS as_of_ts FROM lineitem)
        SELECT a.l_partkey AS part_key,
               p.p_name AS part_name, p.p_brand AS brand, p.p_type AS part_type,
               a.total_orders, a.total_customers, a.total_quantity,
               CAST(a.rev_cents AS DOUBLE) / 100.0 AS total_revenue,
               a.first_ship_ts, a.last_ship_ts, a.lifespan_months,
               {DATEDIFF_MONTH_SQL.format(a="a.last_ship_ts", b="s.as_of_ts")}
                 AS recency_months,
               CASE WHEN CAST(a.rev_cents AS DOUBLE) / 100.0 > 1800000
                      THEN 'High-Performer'
                    WHEN CAST(a.rev_cents AS DOUBLE) / 100.0 >= 1200000
                      THEN 'Mid-Range'
                    ELSE 'Low-Performer' END AS performance_segment,
               CASE WHEN a.total_quantity = 0 THEN NULL
                    ELSE (CAST(a.rev_cents AS DOUBLE) / 100.0) / a.total_quantity
                    END AS avg_selling_price,
               CASE WHEN a.lifespan_months = 0
                      THEN CAST(a.rev_cents AS DOUBLE) / 100.0
                    ELSE (CAST(a.rev_cents AS DOUBLE) / 100.0) / a.lifespan_months
                    END AS avg_monthly_revenue
        FROM agg a
        LEFT JOIN part p ON a.l_partkey = p.p_partkey
        CROSS JOIN now_ref s
    """,
)
def part_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product KPI report (reference: scripts/analysis/
    13_report_products.sql:30-114): performance segmentation, recency,
    average selling price with NULLIF-style zero guard, monthly
    revenue. Same scale shape as customer_report."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")

    base = li.join(
        o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey, "left"
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    agg = base.groupBy("l_partkey").agg(
        F.countDistinct("l_orderkey").alias("total_orders"),
        F.countDistinct("o_custkey").alias("total_customers"),
        F.sum(cents(revenue)).alias("rev_cents"),
        F.sum(F.col("l_quantity").cast("long")).alias("total_quantity"),
        F.min(F.col("l_shipdate")).alias("first_ship_ts"),
        F.max(F.col("l_shipdate")).alias("last_ship_ts"),
    ).withColumn(
        "lifespan_months",
        datediff_month(F.col("first_ship_ts"), F.col("last_ship_ts")),
    )
    asof = li.agg(F.max("l_shipdate").alias("as_of_ts"))

    total_revenue = F.col("rev_cents").cast("double") / F.lit(100.0)
    return (
        agg.join(F.broadcast(p), agg.l_partkey == p.p_partkey, "left")
        .crossJoin(F.broadcast(asof))
        .select(
            F.col("l_partkey").alias("part_key"),
            F.col("p_name").alias("part_name"),
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("part_type"),
            "total_orders",
            "total_customers",
            "total_quantity",
            total_revenue.alias("total_revenue"),
            "first_ship_ts",
            "last_ship_ts",
            "lifespan_months",
            datediff_month(F.col("last_ship_ts"), F.col("as_of_ts")).alias(
                "recency_months"
            ),
            F.when(total_revenue > 1800000, "High-Performer")
            .when(total_revenue >= 1200000, "Mid-Range")
            .otherwise("Low-Performer")
            .alias("performance_segment"),
            F.when(F.col("total_quantity") == 0, F.lit(None).cast("double"))
            .otherwise(total_revenue / F.col("total_quantity"))
            .alias("avg_selling_price"),
            F.when(F.col("lifespan_months") == 0, total_revenue)
            .otherwise(total_revenue / F.col("lifespan_months"))
            .alias("avg_monthly_revenue"),
        )
    )
