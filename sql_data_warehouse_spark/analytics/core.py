"""Core relational operator surface (SURVEY §2.2–§2.8) over the
TPC-H-ish testdata tables.

Each query exercises one operator cluster from the reference's
inventory, re-expressed on the testdata star schema so the driver's
DuckDB oracle can gate it. The medallion pipeline itself (reference
CRM/ERP shape) lives in ``warehouse/``; these are the same operators
on the scale-test tables.

Scale notes are per-query: joins against nation/region/customer/part
broadcast (dims ≪ threshold); fact-side groupBys shuffle on the group
keys once, with AQE coalescing.

Cross-engine money arithmetic: every money sum goes through integer
cents — ``floor(x*100.0 + 0.5)`` is pure IEEE double math and
bit-identical in Spark and DuckDB, the int64 sum is exact, and one
final division back to double is deterministic. A
``cast(double as decimal)`` is NOT cross-engine stable: Spark rounds
the shortest decimal repr (Java BigDecimal HALF_UP) while DuckDB
rounds the binary value, and 2-decimal prices × discounts land
exactly on half-cent boundaries and diverge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query
from .xengine import CENTS_SQL, MONEY_SUM_SQL, cents as _cents, money_sum as _money_sum


def _revenue() -> Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


REVENUE_SQL = "l_extendedprice * (1.0 - l_discount)"


# ---------------------------------------------------------------- P9 O1

@query(
    "distinct_sorted",
    survey="P9 O1",
    oracle="""
        SELECT DISTINCT n.n_name AS nation, r.r_name AS region
        FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        ORDER BY region, nation
    """,
)
def distinct_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection + multi-column sort (reference:
    scripts/analysis/02_dimensions_exploration.sql:16-27)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(region, nation.n_regionkey == region.r_regionkey, "left")
        .select(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .distinct()
        .orderBy("region", "nation")
    )


# ------------------------------------------------------------------- A1

@query(
    "scalar_measures",
    survey="A1 A5",
    oracle=f"""
        SELECT
          {MONEY_SUM_SQL.format(expr="l_extendedprice")} AS total_price,
          CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
          ({MONEY_SUM_SQL.format(expr="l_extendedprice")})
            / CAST(COUNT(*) AS DOUBLE) AS avg_price,
          CAST(COUNT(*) AS BIGINT)                   AS n_rows,
          CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
          CAST(COUNT(DISTINCT l_partkey) AS BIGINT)  AS n_parts,
          CAST(MIN(CAST(l_shipdate AS DATE)) AS TIMESTAMP) AS first_ship,
          CAST(MAX(CAST(l_shipdate AS DATE)) AS TIMESTAMP) AS last_ship
        FROM lineitem
    """,
)
def scalar_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grand scalar aggregates: SUM/AVG/COUNT/COUNT DISTINCT/MIN/MAX
    (reference: scripts/analysis/04_measures_exploration.sql:15-34,
    03_date_range_exploration.sql:15-27). Partial (map-side)
    aggregation then a single-row reduce — no fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    total_price = _money_sum(F.col("l_extendedprice"))
    return li.agg(
        total_price.alias("total_price"),
        F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        (total_price / F.count(F.lit(1)).cast("double")).alias("avg_price"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.min(F.to_date("l_shipdate")).cast("timestamp").alias("first_ship"),
        F.max(F.to_date("l_shipdate")).cast("timestamp").alias("last_ship"),
    )


# ------------------------------------------------------------------- U1

@query(
    "metrics_union_all",
    survey="U1 A1",
    oracle=f"""
        SELECT 'total_revenue' AS measure_name,
               {MONEY_SUM_SQL.format(expr="o_totalprice")} AS measure_value
        FROM orders
        UNION ALL
        SELECT 'total_orders', CAST(COUNT(*) AS DOUBLE) FROM orders
        UNION ALL
        SELECT 'total_customers', CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) FROM orders
        UNION ALL
        SELECT 'total_lineitems', CAST(COUNT(*) AS DOUBLE) FROM lineitem
    """,
)
def metrics_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of labelled scalar aggregates (reference:
    scripts/analysis/04_measures_exploration.sql:37-47)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rows = [
        orders.agg(_money_sum(F.col("o_totalprice")).alias("v"))
        .select(F.lit("total_revenue").alias("measure_name"), F.col("v").alias("measure_value")),
        orders.agg(F.count(F.lit(1)).cast("double").alias("v"))
        .select(F.lit("total_orders").alias("measure_name"), F.col("v").alias("measure_value")),
        orders.agg(F.countDistinct("o_custkey").cast("double").alias("v"))
        .select(F.lit("total_customers").alias("measure_name"), F.col("v").alias("measure_value")),
        li.agg(F.count(F.lit(1)).cast("double").alias("v"))
        .select(F.lit("total_lineitems").alias("measure_name"), F.col("v").alias("measure_value")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


# ---------------------------------------------------------------- A2 J O1

@query(
    "customers_by_nation",
    survey="A2 J4 O1 P1",
    oracle="""
        SELECT n.n_name AS nation,
               CAST(COUNT(c.c_custkey) AS BIGINT) AS total_customers
        FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY total_customers DESC, nation
    """,
)
def customers_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by single key over a left join + sort (reference:
    scripts/analysis/05_magnitude_analysis.sql:16-21). nation is a
    broadcast join; the groupBy shuffles only 25 keys."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("c_custkey").alias("total_customers"))
        .orderBy(F.desc("total_customers"), "nation")
    )


@query(
    "revenue_by_nation_segment",
    survey="A3 J4 J5 O1",
    oracle=f"""
        SELECT n.n_name AS nation, c.c_mktsegment AS segment,
               {MONEY_SUM_SQL.format(expr="o.o_totalprice")} AS total_revenue,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders o
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, c.c_mktsegment
        ORDER BY total_revenue DESC
    """,
)
def revenue_by_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key group-by over a two-hop dim join (reference:
    scripts/analysis/05_magnitude_analysis.sql:59-71). Both dims
    broadcast — the fact never shuffles for the join, only for the
    small-key aggregation."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .groupBy(F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment"))
        .agg(
            _money_sum(F.col("o_totalprice")).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("total_revenue"))
    )


# ------------------------------------------------------------------- A4

@query(
    "monthly_revenue_trend",
    survey="A4 A5 P2",
    oracle=f"""
        SELECT date_trunc('month', o_orderdate) AS order_month,
               {MONEY_SUM_SQL.format(expr="o_totalprice")} AS total_revenue,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS total_customers,
               CAST(COUNT(*) AS BIGINT) AS total_orders
        FROM orders
        WHERE o_orderdate IS NOT NULL
        GROUP BY date_trunc('month', o_orderdate)
        ORDER BY order_month
    """,
)
def monthly_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by derived month key, DATETRUNC formulation (reference:
    scripts/analysis/07_change_over_time_analysis.sql:30-38)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            _money_sum(F.col("o_totalprice")).alias("total_revenue"),
            F.countDistinct("o_custkey").alias("total_customers"),
            F.count(F.lit(1)).alias("total_orders"),
        )
        .orderBy("order_month")
    )


@query(
    "monthly_revenue_ym",
    survey="A4",
    oracle=f"""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
               CAST(month(o_orderdate) AS INTEGER) AS order_month,
               {MONEY_SUM_SQL.format(expr="o_totalprice")} AS total_revenue
        FROM orders
        WHERE o_orderdate IS NOT NULL
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
)
def monthly_revenue_ym(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by YEAR()/MONTH() derived keys (reference:
    scripts/analysis/07_change_over_time_analysis.sql:18-27)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderdate").isNotNull())
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(_money_sum(F.col("o_totalprice")).alias("total_revenue"))
        .orderBy("order_year", "order_month")
    )


@query(
    "monthly_revenue_label",
    survey="A4",
    oracle=f"""
        SELECT strftime(o_orderdate, '%Y-%b') AS month_label,
               {MONEY_SUM_SQL.format(expr="o_totalprice")} AS total_revenue
        FROM orders
        GROUP BY strftime(o_orderdate, '%Y-%b')
        ORDER BY month_label
    """,
)
def monthly_revenue_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by FORMAT(d,'yyyy-MMM') string key (reference:
    scripts/analysis/07_change_over_time_analysis.sql:42-49)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MMM").alias("month_label"))
        .agg(_money_sum(F.col("o_totalprice")).alias("total_revenue"))
        .orderBy("month_label")
    )


# ---------------------------------------------------------------- O2 W3

@query(
    "top_parts_by_revenue",
    survey="O2 A2 J4",
    oracle=f"""
        SELECT p.p_name AS product_name, p.p_brand AS brand,
               {MONEY_SUM_SQL.format(expr="l.l_extendedprice * (1.0 - l.l_discount)")}
                 AS total_revenue
        FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_partkey, p.p_name, p.p_brand
        ORDER BY total_revenue DESC, product_name
        LIMIT 10
    """,
)
def top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP-n by aggregate (reference: scripts/analysis/
    06_ranking_analysis.sql:17-24). Catalyst plans
    TakeOrderedAndProject — a true distributed top-k, no global
    sort."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left")
        .groupBy("p_partkey", "p_name", "p_brand")
        .agg(_money_sum(_revenue()).alias("total_revenue"))
        .select(
            F.col("p_name").alias("product_name"),
            F.col("p_brand").alias("brand"),
            "total_revenue",
        )
        .orderBy(F.desc("total_revenue"), "product_name")
        .limit(10)
    )


@query(
    "top_brands_rank",
    survey="W3 P3",
    oracle=f"""
        SELECT * FROM (
          SELECT p.p_brand AS brand,
                 {MONEY_SUM_SQL.format(expr="l.l_extendedprice * (1.0 - l.l_discount)")}
                   AS total_revenue,
                 CAST(RANK() OVER (ORDER BY
                      SUM({CENTS_SQL.format(expr="l.l_extendedprice * (1.0 - l.l_discount)")})
                      DESC) AS INTEGER) AS revenue_rank
          FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
          GROUP BY p.p_brand
        ) ranked
        WHERE revenue_rank <= 5
        ORDER BY revenue_rank
    """,
)
def top_brands_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-rank top-k with ties (reference: scripts/analysis/
    06_ranking_analysis.sql:27-38) — differs from LIMIT under ties.
    The rank window runs over the tiny aggregated result, not the
    fact."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left")
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.sum(_cents(_revenue())).alias("rev_cents"))
    )
    w = Window.orderBy(F.desc("rev_cents"))
    return (
        agg.select(
            "brand",
            (F.col("rev_cents").cast("double") / F.lit(100.0)).alias("total_revenue"),
            F.rank().over(w).cast("int").alias("revenue_rank"),
        )
        .filter(F.col("revenue_rank") <= 5)
        .orderBy("revenue_rank")
    )


# ---------------------------------------------------------- W1 (dedup)

@query(
    "latest_order_per_customer",
    survey="W1 P3",
    oracle="""
        SELECT o_custkey AS customer_key, o_orderkey AS order_key,
               o_orderdate AS order_ts,
               CAST(o_totalprice AS DOUBLE) AS total_price
        FROM (
          SELECT o.*,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders o
        ) t WHERE rn = 1
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record dedup via ROW_NUMBER (reference:
    scripts/silver/proc_load_silver.sql:66-71). Deterministic
    tiebreaker on the unique key (SURVEY §4.4.7). One shuffle on the
    partition key; at 100 TB this is the standard dedup shape."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("customer_key"),
            F.col("o_orderkey").alias("order_key"),
            F.col("o_orderdate").alias("order_ts"),
            F.col("o_totalprice").cast("double").alias("total_price"),
        )
    )


# ---------------------------------------------------------- W4 (LEAD)

@query(
    "part_ship_periods",
    survey="W4 P9",
    oracle="""
        SELECT l_partkey AS part_key,
               CAST(ship_day AS TIMESTAMP) AS valid_from,
               CAST(LEAD(ship_day) OVER (PARTITION BY l_partkey ORDER BY ship_day) - 1
                    AS TIMESTAMP) AS valid_to
        FROM (SELECT DISTINCT l_partkey, CAST(l_shipdate AS DATE) AS ship_day
              FROM lineitem) d
    """,
)
def part_ship_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-style end-dating: LEAD(next_start) - 1 day (reference:
    scripts/silver/proc_load_silver.sql:104-106)."""
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(
        F.col("l_partkey").alias("part_key"),
        F.to_date("l_shipdate").alias("valid_from"),
    ).distinct()
    w = Window.partitionBy("part_key").orderBy("valid_from")
    return d.select(
        "part_key",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.date_sub(F.lead("valid_from").over(w), 1).cast("timestamp").alias("valid_to"),
    )


# ---------------------------------------------------- W5 W8 (YoY/CASE)

@query(
    "brand_yoy_performance",
    survey="W5 W8 A4 P2 A9",
    oracle=f"""
        WITH yearly AS (
          SELECT p.p_brand AS brand,
                 CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
                 {MONEY_SUM_SQL.format(expr="l.l_extendedprice * (1.0 - l.l_discount)")}
                   AS current_revenue
          FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
          WHERE l.l_shipdate IS NOT NULL
          GROUP BY p.p_brand, year(l.l_shipdate)
        )
        SELECT brand, ship_year, current_revenue,
               LAG(current_revenue) OVER (PARTITION BY brand ORDER BY ship_year)
                 AS prev_revenue,
               CASE WHEN LAG(current_revenue) OVER (PARTITION BY brand ORDER BY ship_year)
                         IS NULL THEN 'n/a'
                    WHEN current_revenue > LAG(current_revenue) OVER
                         (PARTITION BY brand ORDER BY ship_year) THEN 'Increase'
                    WHEN current_revenue < LAG(current_revenue) OVER
                         (PARTITION BY brand ORDER BY ship_year) THEN 'Decrease'
                    ELSE 'No Change' END AS yoy_change
        FROM yearly
    """,
)
def brand_yoy_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year performance via LAG + CASE (reference:
    scripts/analysis/09_performance_analysis.sql:19-52). The window
    runs over the small aggregate, partitioned by brand."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    yearly = (
        li.filter(F.col("l_shipdate").isNotNull())
        .join(F.broadcast(p), li.l_partkey == p.p_partkey, "left")
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(_money_sum(_revenue()).alias("current_revenue"))
    )
    w = Window.partitionBy("brand").orderBy("ship_year")
    prev = F.lag("current_revenue").over(w)
    return yearly.select(
        "brand",
        "ship_year",
        "current_revenue",
        prev.alias("prev_revenue"),
        F.when(prev.isNull(), "n/a")
        .when(F.col("current_revenue") > prev, "Increase")
        .when(F.col("current_revenue") < prev, "Decrease")
        .otherwise("No Change")
        .alias("yoy_change"),
    )


# ----------------------------------------------------- W6 W7 (running)

@query(
    "cumulative_monthly_revenue",
    survey="W6 W7 A7",
    oracle=f"""
        WITH monthly AS (
          SELECT date_trunc('month', o_orderdate) AS order_month,
                 SUM({CENTS_SQL.format(expr="o_totalprice")}) AS rev_cents,
                 CAST(COUNT(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY 1
        )
        SELECT order_month,
               CAST(rev_cents AS DOUBLE) / 100.0 AS monthly_revenue,
               CAST(SUM(rev_cents) OVER (ORDER BY order_month) AS DOUBLE) / 100.0
                 AS running_revenue,
               (CAST(SUM(rev_cents) OVER (ORDER BY order_month) AS DOUBLE) / 100.0)
                 / CAST(SUM(n_orders) OVER (ORDER BY order_month) AS DOUBLE)
                 AS running_avg_order_value
        FROM monthly
        ORDER BY order_month
    """,
)
def cumulative_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + running average over an aggregate CTE
    (reference: scripts/analysis/08_cumulative_analysis.sql:18-32).
    The unpartitioned window runs over ≤ a few hundred month rows —
    the single-partition hazard (SURVEY §4.3) doesn't apply because
    aggregation happens first. Integer-cents partials keep the
    running sum bit-identical to the oracle."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("order_month")).agg(
        F.sum(_cents(F.col("o_totalprice"))).alias("rev_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("order_month").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    running_cents = F.sum("rev_cents").over(w).cast("double") / F.lit(100.0)
    return monthly.select(
        "order_month",
        (F.col("rev_cents").cast("double") / F.lit(100.0)).alias("monthly_revenue"),
        running_cents.alias("running_revenue"),
        (running_cents / F.sum("n_orders").over(w).cast("double")).alias(
            "running_avg_order_value"
        ),
    ).orderBy("order_month")


# -------------------------------------------------------- W9 (share)

@query(
    "revenue_share_by_flag",
    survey="W9 A2",
    oracle=f"""
        WITH by_flag AS (
          SELECT l_returnflag AS return_flag,
                 SUM({CENTS_SQL.format(expr=REVENUE_SQL)}) AS rev_cents
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT return_flag,
               CAST(rev_cents AS DOUBLE) / 100.0 AS total_revenue,
               ROUND(CAST(rev_cents AS DOUBLE) * 100.0
                     / CAST(SUM(rev_cents) OVER () AS DOUBLE), 2) AS pct_of_total
        FROM by_flag
        ORDER BY total_revenue DESC
    """,
)
def revenue_share_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-to-whole via SUM() OVER () grand total (reference:
    scripts/analysis/11_part_to_whole_analysis.sql:16-31). Runs over
    the 3-row aggregate; for a large input this would be a cross join
    against a 1-row aggregate instead (SURVEY §4.3)."""
    li = load_table(spark, sf_dir, "lineitem")
    by_flag = li.groupBy(F.col("l_returnflag").alias("return_flag")).agg(
        F.sum(_cents(_revenue())).alias("rev_cents")
    )
    w = Window.partitionBy()
    return by_flag.select(
        "return_flag",
        (F.col("rev_cents").cast("double") / F.lit(100.0)).alias("total_revenue"),
        F.round(
            F.col("rev_cents").cast("double") * 100.0
            / F.sum("rev_cents").over(w).cast("double"),
            2,
        ).alias("pct_of_total"),
    ).orderBy(F.desc("total_revenue"))


# ---------------------------------------------------- J6 (anti) A6

@query(
    "orders_without_lineitems",
    survey="J6",
    oracle="""
        SELECT o.o_orderkey AS order_key, o.o_custkey AS customer_key
        FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_orderkey IS NULL
    """,
)
def orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity anti-join (reference:
    tests/quality_check_gold.sql:39-45), expressed natively as
    LEFT ANTI — Catalyst never materializes the matched side."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("customer_key"),
    )


@query(
    "duplicate_key_check",
    survey="A6",
    oracle="""
        SELECT l_orderkey AS order_key, l_linenumber AS line_number,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem
        GROUP BY l_orderkey, l_linenumber
        HAVING COUNT(*) > 1
    """,
)
def duplicate_key_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK-duplicate quality check via GROUP BY/HAVING (reference:
    tests/quality_check_silver.sql:23-26). Expected empty — the
    zero-row assertion pattern."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").alias("line_number"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


# --------------------------------------------------- P5-P8 (predicates)

@query(
    "predicate_pushdown_scan",
    survey="P5 P6 P7 P8 P1",
    oracle="""
        SELECT p_partkey AS part_key, p_name AS part_name,
               p_brand AS brand, p_size AS size,
               CAST(p_retailprice AS DOUBLE) AS retail_price
        FROM part
        WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
          AND p_size BETWEEN 10 AND 40
          AND p_name LIKE '%a%'
          AND p_retailprice > 500
        ORDER BY part_key
    """,
)
def predicate_pushdown_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicates: IN / BETWEEN / LIKE / comparison
    (reference: scripts/silver/proc_load_silver.sql:202,
    scripts/analysis/12_report_customers.sql:81-83). All four push
    down to the parquet scan (PushedFilters in explain)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
            & F.col("p_size").between(10, 40)
            & F.col("p_name").like("%a%")
            & (F.col("p_retailprice") > 500)
        )
        .select(
            F.col("p_partkey").alias("part_key"),
            F.col("p_name").alias("part_name"),
            F.col("p_brand").alias("brand"),
            F.col("p_size").alias("size"),
            F.col("p_retailprice").cast("double").alias("retail_price"),
        )
        .orderBy("part_key")
    )


@query(
    "lineitem_pricing_summary",
    survey="A1 A2 A8 P6 O1 ext-tpch-q1",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100.0 AS sum_qty,
               CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100.0 AS sum_base_price,
               CAST(SUM(CAST(floor((l_extendedprice * (1.0 - l_discount))
                                   * 100.0 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100.0 AS sum_disc_price,
               CAST(SUM(CAST(floor(((l_extendedprice * (1.0 - l_discount))
                                    * (1.0 + l_tax)) * 100.0 + 0.5)
                             AS BIGINT))
                    AS DOUBLE) / 100.0 AS sum_charge,
               CAST(SUM(CAST(floor(l_discount * 10000.0 + 0.5) AS BIGINT))
                    AS DOUBLE) / 10000.0 / COUNT(*) AS avg_disc,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
)
def lineitem_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) — the canonical scan-heavy
    single-table aggregate: one pass over lineitem, ship-date filter
    pushed to the parquet scan, four money measures + an average +
    row counts per (returnflag, linestatus).

    Scale shape: THE map-side-combine showcase — 4-6 grouped sums
    over a ~billions-row fact collapse to a 4-6 row result with
    partial aggregation on every executor; the shuffle moves only
    n_partitions × n_groups tiny rows. All sums ride the scaled-int64
    scheme (cents for money, 1e-4 for discount), so results are
    bit-identical across engines and partitionings; the average is a
    single final division.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money_sum(F.col("l_quantity")).alias("sum_qty"),
            _money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            _money_sum(disc_price).alias("sum_disc_price"),
            _money_sum(charge).alias("sum_charge"),
            (
                F.sum(
                    F.floor(F.col("l_discount") * F.lit(10000.0) + F.lit(0.5))
                    .cast("long")
                ).cast("double")
                / F.lit(10000.0)
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "revenue_cube",
    survey="ext-cube ext-rollup A2 A7 J4",
    oracle="""
        SELECT n.n_name AS nation, c.c_mktsegment AS segment,
               CAST(GROUPING(n.n_name, c.c_mktsegment) AS BIGINT)
                   AS grouping_id,
               CAST(SUM(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total_revenue,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders o
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY CUBE(n.n_name, c.c_mktsegment)
    """,
)
def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (nation, segment): all four grouping sets — detail,
    each single-dimension rollup, and the grand total — in ONE pass
    with ``grouping_id`` disambiguating the NULL-as-ALL rows.
    Spark expands the cube with a single Expand node feeding one
    partial-aggregated shuffle (4× the group rows, not 4 scans of the
    fact); Spark's ``grouping_id()`` and DuckDB's ``GROUPING()`` pack
    the same bit vector (first column = high bit), so the gate covers
    the whole lattice bit-for-bit."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .cube(F.col("n_name").alias("nation"),
              F.col("c_mktsegment").alias("segment"))
        .agg(
            F.grouping_id().cast("long").alias("grouping_id"),
            _money_sum(F.col("o_totalprice")).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "shipping_priority_top10",
    survey="ext-tpch-q3 A2 J5 O1 O2 P6",
    oracle="""
        SELECT l.l_orderkey,
               CAST(SUM(CAST(floor((l.l_extendedprice * (1.0 - l.l_discount))
                                   * 100.0 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100.0 AS revenue,
               CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
               o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): top-10 unshipped BUILDING-segment
    orders by outstanding revenue as of a cutoff date.

    Scale shape: both date filters push to the fact scans; the
    customer-segment filter prunes before the join; orders⋈lineitem
    is the keyed fact-fact sort-merge (bucketing both on orderkey is
    the 100× lever, sources/layout.py); the top-10 runs as
    TakeOrderedAndProject, never a global sort. Deterministic
    tiebreak (orderdate, orderkey) so LIMIT is stable cross-engine.
    """
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff)
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_money_sum(disc_price).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"),
                 F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "forecast_revenue_change",
    survey="ext-tpch-q6 A1 P6 P8",
    oracle="""
        SELECT CAST(SUM(CAST(floor((l_extendedprice * l_discount)
                                   * 100.0 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100.0 AS revenue_delta,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan-filter-agg —
    every predicate (date range, discount band, quantity cap) pushes
    to the parquet scan, the sum is one map-side-combined scalar.
    The simplest possible 100 TB query: cost = bytes scanned after
    pushdown, zero shuffle beyond the single-row final combine."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _money_sum(F.col("l_extendedprice") * F.col("l_discount"))
            .alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_SQL_INTERFACE_TEXT = """
    SELECT n.n_name AS nation,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS revenue,
           CAST(SUM(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS DOUBLE)
             / CAST(SUM(SUM(CAST(floor(o.o_totalprice * 100.0 + 0.5)
                                 AS BIGINT))) OVER () AS DOUBLE)
               AS revenue_share
    FROM {orders} o
    JOIN {customer} c ON o.o_custkey = c.c_custkey
    JOIN {nation} n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY nation
"""


@query(
    "spark_sql_interface",
    survey="ext-sql A3 A5 J4 O1 W9",
    oracle=_SQL_INTERFACE_TEXT.format(
        orders="orders", customer="customer", nation="nation"
    ),
)
def spark_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw SQL-text path: register the testdata tables as views
    and execute ONE literal SQL string via ``spark.sql`` — the
    statement a reference-warehouse user would type, unchanged (the
    oracle runs the same text in DuckDB modulo view names; shared
    dialect: CAST/floor/window SUM-over-SUM). Everything else in this
    engine is the DataFrame API; this gate proves the SQL surface
    compiles to the same Catalyst plans — same pushdown, same
    broadcast dims, same partial aggregation — because it IS the same
    optimizer."""
    for t in ("orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"td_{t}")
    return spark.sql(
        _SQL_INTERFACE_TEXT.format(
            orders="td_orders", customer="td_customer", nation="td_nation"
        )
    )


_GROUPING_SETS_TEXT = """
    SELECT n.n_name AS nation, c.c_mktsegment AS segment,
           CAST({gid} AS BIGINT) AS grouping_id,
           CAST(SUM(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS total_revenue
    FROM {orders} o
    JOIN {customer} c ON o.o_custkey = c.c_custkey
    JOIN {nation} n   ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n.n_name), (c.c_mktsegment), ())
"""


@query(
    "revenue_grouping_sets",
    survey="ext-groupingsets ext-rollup A2 A7",
    # same text modulo the bit-packing function name: Spark spells it
    # GROUPING_ID(a, b), DuckDB GROUPING(a, b) — identical bit vector
    oracle=_GROUPING_SETS_TEXT.format(
        orders="orders", customer="customer", nation="nation",
        gid="GROUPING(n.n_name, c.c_mktsegment)",
    ),
)
def revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the hand-picked lattice ((nation),
    (segment), ()) rather than the full CUBE (`revenue_cube`) or a
    hierarchy ROLLUP (`revenue_rollup`): only the three requested
    groupings are expanded. Same literal SQL text runs on both
    engines (Spark's ``grouping()``/DuckDB's ``GROUPING()`` pack the
    same bits); physically one Expand node feeds ONE partially
    aggregated shuffle — 3 grouping sets cost 3× the group rows, not
    3 scans of orders."""
    for t in ("orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"td_{t}")
    return spark.sql(
        _GROUPING_SETS_TEXT.format(
            orders="td_orders", customer="td_customer", nation="td_nation",
            gid="GROUPING_ID(n.n_name, c.c_mktsegment)",
        )
    )
