"""Star-schema assembly over testdata — analog of the reference gold
views (scripts/gold/load_gold.sql): surrogate-key dimensions via
ROW_NUMBER (W2), fact wired to dims through surrogate keys (J1-J3),
and an integrity roll-up.

Scale note (SURVEY §4.3): ROW_NUMBER() OVER (ORDER BY ...) plans a
single-partition window — acceptable for dimensions (they stay
small), never for facts. If a dimension outgrows one task, swap the
mechanism to ``xxhash64(natural_key)`` behind the same column
contract; the reference's contract is "stable unique int per row",
not "dense sequence".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query
from .xengine import MONEY_SUM_SQL, money_sum


def dim_customers_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gold.dim_customers analog (reference load_gold.sql:22-42):
    3-way left join onto the base entity + global ROW_NUMBER surrogate
    key ordered by the unique natural key."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    w = Window.orderBy("c_custkey")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select(
            F.row_number().over(w).cast("long").alias("customer_sk"),
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            F.coalesce(F.col("n_name"), F.lit("n/a")).alias("nation"),
            F.coalesce(F.col("r_name"), F.lit("n/a")).alias("region"),
            F.col("c_mktsegment").alias("market_segment"),
            F.col("c_acctbal").cast("double").alias("account_balance"),
        )
    )


DIM_CUSTOMERS_SQL = """
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY c.c_custkey) AS BIGINT) AS customer_sk,
           c.c_custkey AS customer_id,
           c.c_name AS customer_name,
           COALESCE(n.n_name, 'n/a') AS nation,
           COALESCE(r.r_name, 'n/a') AS region,
           c.c_mktsegment AS market_segment,
           CAST(c.c_acctbal AS DOUBLE) AS account_balance
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""


@query("dim_customers_star", survey="W2 J1 P1 S5", oracle=DIM_CUSTOMERS_SQL)
def dim_customers_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dim_customers_df(spark, sf_dir)


@query(
    "fact_orders_star",
    survey="J3 W2 A2",
    oracle=f"""
        WITH dim AS ({DIM_CUSTOMERS_SQL})
        SELECT d.region, d.nation,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(COUNT(DISTINCT d.customer_sk) AS BIGINT) AS n_customers,
               {MONEY_SUM_SQL.format(expr="o.o_totalprice")} AS total_revenue
        FROM orders o
        LEFT JOIN dim d ON o.o_custkey = d.customer_id
        GROUP BY d.region, d.nation
        ORDER BY total_revenue DESC
    """,
)
def fact_orders_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gold.fact_sales analog (reference load_gold.sql:73-88): the
    fact resolves surrogate keys by joining the dimension view on the
    natural key, then rolls up by dimension attributes. The dim
    broadcasts; the fact never shuffles for the join."""
    o = load_table(spark, sf_dir, "orders")
    dim = dim_customers_df(spark, sf_dir)
    return (
        o.join(F.broadcast(dim), o.o_custkey == dim.customer_id, "left")
        .groupBy("region", "nation")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("customer_sk").alias("n_customers"),
            money_sum(F.col("o_totalprice")).alias("total_revenue"),
        )
        .orderBy(F.desc("total_revenue"))
    )


@query(
    "star_integrity_check",
    survey="J6 A6 QC2",
    oracle=f"""
        WITH dim AS ({DIM_CUSTOMERS_SQL})
        SELECT 'orphan_fact_rows' AS check_name,
               CAST(COUNT(*) AS BIGINT) AS n_bad
        FROM orders o LEFT JOIN dim d ON o.o_custkey = d.customer_id
        WHERE d.customer_sk IS NULL
        UNION ALL
        SELECT 'duplicate_surrogate_keys',
               CAST(COUNT(*) AS BIGINT)
        FROM (SELECT customer_sk FROM dim GROUP BY customer_sk HAVING COUNT(*) > 1)
    """,
)
def star_integrity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold-layer quality suite analog (reference
    tests/quality_check_gold.sql:20-45): surrogate-key uniqueness +
    fact→dim referential integrity, as a labelled zero-expected
    report."""
    o = load_table(spark, sf_dir, "orders")
    dim = dim_customers_df(spark, sf_dir)
    orphans = (
        o.join(F.broadcast(dim), o.o_custkey == dim.customer_id, "left")
        .filter(F.col("customer_sk").isNull())
        .agg(F.count(F.lit(1)).alias("n_bad"))
        .select(F.lit("orphan_fact_rows").alias("check_name"), "n_bad")
    )
    dup_sk = (
        dim.groupBy("customer_sk")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count(F.lit(1)).alias("n_bad"))
        .select(F.lit("duplicate_surrogate_keys").alias("check_name"), "n_bad")
    )
    return orphans.unionAll(dup_sk)
