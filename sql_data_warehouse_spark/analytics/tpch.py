"""TPC-H classics adapted to the testdata star schema (the tables
lack ``partsupp`` and the lineitem commit/receipt dates, so Q4/Q12/Q21
substitute ship-date lateness for receipt-date lateness and Q2/Q11/Q20
run over a partsupp relation DERIVED from observed lineitems —
semantics preserved, columns available).

Together with ``core.py`` (Q1 ``lineitem_pricing_summary``, Q3
``shipping_priority_top10``, Q6 ``forecast_revenue_change``),
``reports.py``/``extended.py`` (Q5-style ``local_supplier_revenue``,
Q17 ``small_quantity_revenue``, Q18 ``large_orders``, Q22
``big_balance_lapsed``), this adapts ALL 22 TPC-H queries.

Reference parity: the reference warehouse (LeoLe128/sql-data-warehouse)
has no TPC-H suite — these are beyond-reference breadth on the scale
tables, exercising the operator clusters its analysis scripts use
(joins, grouped aggregates, windowed top-k, EXISTS/NOT-EXISTS) at
fact-fact scale.

Scale notes per query; shared rules: dims (region/nation/customer/
supplier/part at TPC-H ratios) broadcast; orders⋈lineitem is the
keyed sort-merge that bucketing on orderkey co-locates
(sources/layout.py); every money sum rides the scaled-int64 scheme
from ``xengine`` so the DuckDB gate is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query
from .xengine import MONEY_SUM_SQL, money_sum as _money_sum


def _revenue():
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


REVENUE_SQL = "(l_extendedprice * (1.0 - l_discount))"


# ------------------------------------------------------------ Q4 (EXISTS)

@query(
    "order_priority_late_ship",
    survey="ext-tpch-q4 ext-subquery A2 O1 P6",
    oracle="""
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
)
def order_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), ship-date lateness standing
    in for the missing commit/receipt dates: orders in a quarter with
    at least one lineitem shipped >60 days after the order date,
    counted per priority.

    Scale shape: the EXISTS compiles to a LEFT SEMI sort-merge join on
    orderkey — Spark deduplicates the probe side before the join, so
    the fact-fact semi never amplifies rows; the quarter filter pushes
    to the orders scan and prunes the join's left side first. The
    5-row result aggregates map-side."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > F.date_add(o.o_orderdate, 60).cast("timestamp")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ------------------------------------------------------- Q7 (nation pairs)

@query(
    "volume_shipping_pairs",
    survey="ext-tpch-q7 A3 J4 J5 O1 P8",
    oracle=f"""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
               {MONEY_SUM_SQL.format(expr=REVENUE_SQL)} AS revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
        ORDER BY supp_nation, cust_nation, l_year
    """,
)
def volume_shipping_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade volume between two
    nations per ship year.

    Scale shape: supplier and customer (with their nation names
    resolved dim-side) broadcast into the fact; the two-nation
    disjunction is applied AFTER the broadcast joins but Catalyst
    pushes the per-side nation membership (n_name IN (N1,N2)) into
    the broadcast relations, so the fact rows that survive are only
    those touching the two nations. One shuffle: the final 3-key
    groupBy."""
    cutlo = F.lit("1996-01-01").cast("timestamp")
    cuthi = F.lit("1998-01-01").cast("timestamp")
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
        .filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
        .filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= cutlo) & (F.col("l_shipdate") < cuthi)
    )
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(_money_sum(_revenue()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ------------------------------------------------------- Q8 (market share)

@query(
    "nation_market_share",
    survey="ext-tpch-q8 A4 A8 J4 J5 W-none",
    oracle=f"""
        SELECT CAST(o_year AS BIGINT) AS o_year,
               CAST(nation_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
                   AS mkt_share
        FROM (
          SELECT year(o.o_orderdate) AS o_year,
                 SUM(CASE WHEN sn.n_name = 'NATION_3'
                          THEN CAST(floor({REVENUE_SQL} * 100.0 + 0.5) AS BIGINT)
                          ELSE 0 END) AS nation_cents,
                 SUM(CAST(floor({REVENUE_SQL} * 100.0 + 0.5) AS BIGINT))
                     AS total_cents
          FROM lineitem l
          JOIN orders o   ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
          JOIN region r   ON cn.n_regionkey = r.r_regionkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
          JOIN part p     ON l.l_partkey = p.p_partkey
          WHERE r.r_name = 'REGION_0'
            AND p.p_type = 'PROMO'
            AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY year(o.o_orderdate)
        )
        ORDER BY o_year
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_3's share of PROMO-part
    revenue sold into REGION_0, per order year.

    Scale shape: the five dim joins all broadcast; part's p_type
    filter prunes the broadcast build side so the fact⋈part join
    drops ~5/6 of lineitem before the orders join. The share is a
    conditional-sum-over-sum on exact cents — one grouped shuffle,
    one final double division (identical expression both engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "REGION_0"
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    cents = F.floor(_revenue() * F.lit(100.0) + F.lit(0.5)).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey, "left_semi")
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", cents).otherwise(F.lit(0))
            ).alias("nation_cents"),
            F.sum(cents).alias("total_cents"),
        )
        .select(
            "o_year",
            (F.col("nation_cents").cast("double")
             / F.col("total_cents").cast("double")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------- Q9 (profit by nation)

@query(
    "product_type_profit",
    survey="ext-tpch-q9 A3 A8 J4 O1",
    oracle="""
        SELECT sn.n_name AS nation,
               CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CAST(floor(
                     (l.l_extendedprice * (1.0 - l.l_discount)
                      - 0.6 * p.p_retailprice * l.l_quantity)
                     * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
                   AS sum_profit
        FROM lineitem l
        JOIN part p     ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        WHERE p.p_name LIKE '%5%'
        GROUP BY sn.n_name, year(o.o_orderdate)
        ORDER BY nation, o_year DESC
    """,
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product type profit), supply cost approximated as
    60% of retail price (no partsupp table): profit per supplier
    nation per order year over parts whose name matches a pattern.

    Scale shape: part (filtered by the LIKE before broadcast) and
    supplier⋈nation broadcast; the only fact-fact edge is
    lineitem⋈orders on orderkey. Profit is computed per row and
    summed as exact cents — one grouped shuffle on (nation, year)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%5%")
    ).select("p_partkey", "p_retailprice")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(load_table(spark, sf_dir, "nation"),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = load_table(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(_money_sum(profit).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


# -------------------------------------------------- Q10 (returned items)

@query(
    "returned_item_customers",
    survey="ext-tpch-q10 A3 J5 O1 O2 P6",
    oracle=f"""
        SELECT c.c_custkey, c.c_name,
               {MONEY_SUM_SQL.format(expr=REVENUE_SQL)} AS revenue,
               c.c_acctbal, n.n_name AS nation, c.c_mktsegment
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name, c.c_mktsegment
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting): top-20 customers by revenue
    lost to returns ('R' lineitems) in a half-year window.

    Scale shape: returnflag and the date window push to the two fact
    scans; lineitem⋈orders sort-merges on orderkey, then the grouped
    result (≤ n_customers rows) joins the broadcast customer⋈nation
    dim. Top-20 is TakeOrderedAndProject with a custkey tiebreak."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(load_table(spark, sf_dir, "nation")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "c_acctbal",
                F.col("n_name").alias("nation"), "c_mktsegment")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(_money_sum(_revenue()).alias("revenue"))
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .select("c_custkey", "c_name", "revenue", "c_acctbal",
                "nation", "c_mktsegment")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ------------------------------------------------ Q12 (priority lateness)

@query(
    "late_ship_priority_counts",
    survey="ext-tpch-q12 A2 A8 J3 O1 P6 P8",
    oracle="""
        SELECT l.l_linestatus,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS low_line_count
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l.l_linestatus
        ORDER BY l.l_linestatus
    """,
)
def late_ship_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority), linestatus
    standing in for the missing shipmode and ship-vs-order lateness
    for receipt-vs-commit: among lineitems shipped >90 days after
    their order in 1996, how many belonged to high- vs low-priority
    orders, per linestatus.

    Scale shape: the ship-year filter pushes to the lineitem scan;
    the lateness predicate is a non-equi conjunct evaluated inside
    the orderkey sort-merge join (no extra pass); the 2-row result
    aggregates map-side with conditional counts."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > F.date_add(o.o_orderdate, 90).cast("timestamp")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------- Q14 (promo effect)

@query(
    "promo_revenue_share",
    survey="ext-tpch-q14 A1 A8 J4 P6",
    oracle=f"""
        SELECT CAST(promo_cents AS DOUBLE) * 100.0
                 / CAST(total_cents AS DOUBLE) AS promo_pct,
               CAST(n_lines AS BIGINT) AS n_lines
        FROM (
          SELECT SUM(CASE WHEN p.p_type = 'PROMO'
                          THEN CAST(floor({REVENUE_SQL} * 100.0 + 0.5) AS BIGINT)
                          ELSE 0 END) AS promo_cents,
                 SUM(CAST(floor({REVENUE_SQL} * 100.0 + 0.5) AS BIGINT))
                     AS total_cents,
                 COUNT(*) AS n_lines
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
            AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
        )
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percentage of one month's revenue
    from PROMO-type parts.

    Scale shape: the month filter prunes the lineitem scan to ~1/80th;
    part broadcasts; the result is a single conditional-sum row —
    map-side combine all the way, no grouped shuffle at all."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    cents = F.floor(_revenue() * F.lit(100.0) + F.lit(0.5)).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0))
            ).alias("promo_cents"),
            F.sum(cents).alias("total_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            (F.col("promo_cents").cast("double") * F.lit(100.0)
             / F.col("total_cents").cast("double")).alias("promo_pct"),
            F.col("n_lines"),
        )
    )


# ----------------------------------------------------- Q15 (top supplier)

@query(
    "top_revenue_suppliers",
    survey="ext-tpch-q15 ext-subquery A2 A8 J4 O1 W9",
    oracle=f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 {MONEY_SUM_SQL.format(expr=REVENUE_SQL)} AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s
        JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
    """,
)
def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) whose quarterly revenue
    equals the maximum — the classic view-plus-scalar-subquery shape.

    Scale shape: one grouped pass builds the per-supplier revenue
    (map-side partials, shuffle on suppkey ≪ fact); the max is a
    window over the UNPARTITIONED 100-ish-row aggregate, not a second
    fact scan (W9 rewrite); supplier broadcasts for the name lookup.
    Revenue equality is exact because both sides are cent-sums."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_money_sum(_revenue()).alias("total_revenue"))
    )
    w = Window.partitionBy()  # grand max over the small aggregate
    best = (
        revenue.withColumn("max_rev", F.max("total_revenue").over(w))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .drop("max_rev")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(F.broadcast(supp), best.supplier_no == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ------------------------------------------- Q16 (supplier counts, NOT IN)

@query(
    "part_supplier_counts",
    survey="ext-tpch-q16 ext-subquery A3 A5 J6 O1 P7 P8",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#5'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 9, 19, 29, 39, 49)
          AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
        HAVING COUNT(DISTINCT l.l_suppkey) >= 4
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), lineitem standing in
    for the missing partsupp association and a negative account
    balance for the complaints filter: distinct supplier count per
    (brand, type, size) slice, excluding flagged suppliers.

    Scale shape: the brand/type/size filters prune the broadcast part
    build side; the NOT IN compiles to a LEFT ANTI broadcast join
    against the tiny flagged-supplier list (safe here: s_suppkey is
    never NULL, so NOT IN ≡ anti-join); COUNT(DISTINCT suppkey)
    expands to a two-phase exact distinct aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 19, 29, 39, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    flagged = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(flagged), li.l_suppkey == flagged.s_suppkey,
                "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .filter(F.col("supplier_cnt") >= 4)
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------- Q19 (disjunctive predicates)

@query(
    "brand_quantity_revenue",
    survey="ext-tpch-q19 A1 J4 P6 P8",
    oracle=f"""
        SELECT {MONEY_SUM_SQL.format(expr=REVENUE_SQL)} AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def brand_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): three disjunctive branches of
    conjunctive brand/size/quantity predicates — the classic test
    that an OR-of-ANDs still evaluates inside the join instead of
    materializing the full fact⋈part product.

    Scale shape: part broadcasts; Catalyst pulls the disjunction's
    common part-side implication (brand ∈ {12,23,34}) down to the
    broadcast build, so the hash probe rejects most lineitems on the
    spot. Single-row conditional aggregate, no grouped shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            _money_sum(_revenue()).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------- Q21 (suppliers who kept waiting)

@query(
    "suppliers_kept_waiting",
    survey="ext-tpch-q21 ext-subquery A2 A7 O1 O2 W-none",
    oracle="""
        WITH order_ship AS (
          SELECT l_orderkey, l_suppkey,
                 MAX(l_shipdate) AS supp_last_ship,
                 COUNT(*) AS n_lines
          FROM lineitem
          GROUP BY l_orderkey, l_suppkey
        ),
        order_stats AS (
          SELECT l_orderkey,
                 MAX(supp_last_ship) AS order_last_ship,
                 COUNT(*) AS n_suppliers
          FROM order_ship
          GROUP BY l_orderkey
        )
        SELECT s.s_name,
               CAST(COUNT(*) AS BIGINT) AS numwait
        FROM order_ship os
        JOIN order_stats ot ON os.l_orderkey = ot.l_orderkey
        JOIN orders o       ON os.l_orderkey = o.o_orderkey
        JOIN supplier s     ON os.l_suppkey = s.s_suppkey
        WHERE o.o_orderstatus = 'F'
          AND ot.n_suppliers > 1
          AND os.supp_last_ship = ot.order_last_ship
          AND NOT EXISTS (
            SELECT 1 FROM order_ship os2
            WHERE os2.l_orderkey = os.l_orderkey
              AND os2.l_suppkey <> os.l_suppkey
              AND os2.supp_last_ship = ot.order_last_ship
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 10
    """,
)
def suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), ship dates
    standing in for receipt/commit: on finished multi-supplier
    orders, the supplier who UNIQUELY shipped last (every other
    supplier was already done) held the order up; count such orders
    per supplier, top 10.

    Scale shape: the reference formulation is EXISTS + NOT EXISTS
    (two correlated fact re-scans); this plan collapses both into
    windowed aggregates over ONE (orderkey, suppkey) reduction —
    compute each supplier's last ship per order, then per-order max
    + supplier count + how many suppliers hit the max (the NOT
    EXISTS is exactly "only one did"). Three shuffles total, all on
    orderkey-rooted keys, fact scanned once."""
    li = load_table(spark, sf_dir, "lineitem")
    order_ship = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_last_ship"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    w = Window.partitionBy("l_orderkey")
    enriched = (
        order_ship
        .withColumn("order_last_ship", F.max("supp_last_ship").over(w))
        .withColumn("n_suppliers", F.count(F.lit(1)).over(w))
        .withColumn(
            "n_last",
            F.sum(
                F.when(F.col("supp_last_ship") == F.col("order_last_ship"), 1)
                .otherwise(0)
            ).over(w),
        )
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        enriched.filter(
            (F.col("n_suppliers") > 1)
            & (F.col("n_last") == 1)
            & (F.col("supp_last_ship") == F.col("order_last_ship"))
        )
        .join(o, F.col("l_orderkey") == o.o_orderkey, "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# --------------------------------------------- derived partsupp (Q2/Q11/Q20)
#
# The testdata has no partsupp table, so the three partsupp queries
# run over the relation DERIVED from observed lineitems: for each
# (partkey, suppkey), availqty := total shipped quantity and
# supplycost := the minimum observed unit price (exact cents). Same
# operator shapes as the originals — correlated per-group minima,
# share-of-total HAVING, semi-join chains — on a first-class derived
# relation instead of a base table.

_PARTSUPP_SQL = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ps_availqty,
           MIN(CAST(floor(l_extendedprice / l_quantity * 100.0 + 0.5)
                    AS BIGINT)) AS ps_supplycost_cents
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    unit_cents = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * F.lit(100.0)
        + F.lit(0.5)
    ).cast("long")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("ps_availqty"),
        F.min(unit_cents).alias("ps_supplycost_cents"),
    )


@query(
    "min_cost_supplier",
    survey="ext-tpch-q2 ext-subquery A2 J4 O1 O2 W3",
    oracle=f"""
        WITH ps AS ({_PARTSUPP_SQL}),
        ranked AS (
          SELECT p.p_partkey, p.p_brand, ps.ps_suppkey,
                 ps.ps_supplycost_cents,
                 MIN(ps.ps_supplycost_cents) OVER (PARTITION BY p.p_partkey)
                     AS min_cost_cents
          FROM part p
          JOIN ps ON ps.ps_partkey = p.p_partkey
          WHERE p.p_size = 15 AND p.p_type = 'LARGE'
        )
        SELECT s.s_acctbal, s.s_name, n.n_name AS nation,
               r.p_partkey, r.p_brand,
               CAST(r.ps_supplycost_cents AS DOUBLE) / 100.0 AS supply_cost
        FROM ranked r
        JOIN supplier s ON r.ps_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE r.ps_supplycost_cents = r.min_cost_cents
        ORDER BY s.s_acctbal DESC, nation, s.s_name, r.p_partkey
        LIMIT 20
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum cost supplier) over the derived partsupp:
    for every LARGE size-15 part, the supplier(s) achieving the
    part's minimum unit cost, ranked by account balance.

    Scale shape: the correlated scalar subquery ("cost = MIN(cost)
    for this part") is a window MIN over the partkey-grouped derived
    relation — one shuffle, no re-scan of lineitem per part (the
    textbook decorrelation); part filters prune before the window;
    supplier⋈nation broadcast; top-20 is TakeOrderedAndProject."""
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    ).select("p_partkey", "p_brand")
    w = Window.partitionBy("p_partkey")
    ranked = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .withColumn("min_cost_cents",
                    F.min("ps_supplycost_cents").over(w))
        .filter(F.col("ps_supplycost_cents") == F.col("min_cost_cents"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(load_table(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal",
                F.col("n_name").alias("nation"))
    )
    return (
        ranked.join(F.broadcast(supp), ranked.ps_suppkey == supp.s_suppkey)
        .select(
            "s_acctbal", "s_name", "nation", "p_partkey", "p_brand",
            (F.col("ps_supplycost_cents").cast("double") / F.lit(100.0))
            .alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "nation", "s_name", "p_partkey")
        .limit(20)
    )


@query(
    "important_stock_parts",
    survey="ext-tpch-q11 ext-subquery A2 A6 W9",
    oracle=f"""
        WITH ps AS ({_PARTSUPP_SQL}),
        valued AS (
          SELECT ps.ps_partkey,
                 SUM(ps.ps_supplycost_cents * ps.ps_availqty) AS value_cents
          FROM ps
          JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
          JOIN nation n   ON s.s_nationkey = n.n_nationkey
          WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
          GROUP BY ps.ps_partkey
        )
        SELECT ps_partkey,
               CAST(value_cents AS DOUBLE) / 100.0 AS stock_value
        FROM (
          SELECT ps_partkey, value_cents,
                 SUM(value_cents) OVER () AS total_cents
          FROM valued
        )
        WHERE CAST(value_cents AS DOUBLE)
              > 0.001 * CAST(total_cents AS DOUBLE)
        ORDER BY stock_value DESC, ps_partkey
    """,
)
def important_stock_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification) over the derived
    partsupp: parts whose stock value inside a 3-nation supplier
    group exceeds 0.1 % of the group's total.

    Scale shape: the scalar subquery (`> fraction × SUM(...)` over
    the same relation) is the W9 rewrite — ONE grouped pass + a
    grand-total window over the per-part aggregate, instead of the
    literal second scan the SQL implies; the nation filter prunes the
    broadcast supplier side before the join. Exact cents arithmetic
    end-to-end; the threshold compare is one double op on both
    engines."""
    ps = _partsupp(spark, sf_dir)
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(load_table(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
        .select("s_suppkey")
    )
    valued = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey,
                "left_semi")
        .groupBy("ps_partkey")
        .agg(
            # the per-product term (~1e10) is safe in int64, but the
            # ACCUMULATIONS widen to decimal(38,0): the grand-total
            # window below crosses int64 at ~2e8 parts x 4e10 cents
            # (the 1000x scale), where non-ANSI Spark would wrap
            # silently while the oracle's HUGEINT keeps counting —
            # the same silent-divergence class as the EWMA/anomaly
            # guards (ADVICE r7/r8)
            F.sum((F.col("ps_supplycost_cents") * F.col("ps_availqty"))
                  .cast("decimal(38,0)"))
            .alias("value_cents")
        )
    )
    w = Window.partitionBy()
    return (
        valued.withColumn("total_cents", F.sum("value_cents").over(w))
        .filter(
            F.col("value_cents").cast("double")
            > F.lit(0.001) * F.col("total_cents").cast("double")
        )
        .select(
            "ps_partkey",
            (F.col("value_cents").cast("double") / F.lit(100.0))
            .alias("stock_value"),
        )
        .orderBy(F.desc("stock_value"), "ps_partkey")
    )


@query(
    "excess_stock_suppliers",
    survey="ext-tpch-q20 ext-subquery A2 A8 J6 O1 P5",
    oracle=f"""
        WITH ps AS ({_PARTSUPP_SQL}),
        part_total AS (
          SELECT ps_partkey, SUM(ps_availqty) AS total_qty
          FROM ps GROUP BY ps_partkey
        ),
        dominant AS (
          SELECT DISTINCT ps.ps_suppkey
          FROM ps
          JOIN part_total t ON ps.ps_partkey = t.ps_partkey
          JOIN part p       ON ps.ps_partkey = p.p_partkey
          WHERE p.p_name LIKE '%3%'
            AND CAST(ps.ps_availqty AS DOUBLE)
                > 0.5 * CAST(t.total_qty AS DOUBLE)
        )
        SELECT s.s_name, n.n_name AS nation
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE s.s_suppkey IN (SELECT ps_suppkey FROM dominant)
          AND n.n_name = 'NATION_4'
        ORDER BY s.s_name
    """,
)
def excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion) over the derived
    partsupp: NATION_4 suppliers who hold a DOMINANT share (>50 % of
    shipped volume) of some part matching a name pattern — the
    original's nested IN-subquery chain (supplier IN (... partsupp
    WHERE qty > 0.5 × SUM(...))).

    Scale shape: the correlated half-of-total threshold decorrelates
    into one per-part aggregate joined back to the derived relation
    (both keyed on partkey — one shuffle each); the IN-subqueries
    become LEFT SEMI joins; the name-pattern part filter and the
    single-nation supplier filter prune their broadcast sides."""
    ps = _partsupp(spark, sf_dir)
    part_total = ps.groupBy("ps_partkey").agg(
        F.sum("ps_availqty").alias("total_qty")
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%3%")
    ).select("p_partkey")
    dominant = (
        ps.join(part_total, "ps_partkey")
        .join(F.broadcast(part), ps.ps_partkey == part.p_partkey,
              "left_semi")
        .filter(
            F.col("ps_availqty").cast("double")
            > F.lit(0.5) * F.col("total_qty").cast("double")
        )
        .select("ps_suppkey")
        .distinct()
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(load_table(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_4")
        .join(dominant, F.col("s_suppkey") == dominant.ps_suppkey,
              "left_semi")
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )
