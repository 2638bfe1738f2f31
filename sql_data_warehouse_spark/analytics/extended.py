"""Beyond-reference relational operators the engine supports natively
(SURVEY §2.4 notes them absent from the reference; Spark has them
built in): ROLLUP/grouping sets, PIVOT, as-of joins, BPE-ish token
statistics — each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import BPE_TOKENS_SQL, bpe_ish_tokens
from ..operators.asof import asof_join_backward
from ..sources import load_table
from .registry import query
from .xengine import CENTS_SQL, MONEY_SUM_SQL, cents, money_sum

# ------------------------------------------------------------------ rollup

@query(
    "revenue_rollup",
    survey="ext-rollup A2 J1",
    oracle=f"""
        SELECT r.r_name AS region, n.n_name AS nation,
               CAST(GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS INTEGER)
                   AS grouping_level,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               {MONEY_SUM_SQL.format(expr="o.o_totalprice")} AS total_revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP (region → nation → grand
    total) in one pass — Catalyst expands to a single aggregation
    over grouping sets, one shuffle, instead of three separate
    aggregations unioned."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            "o_totalprice",
        )
    )
    return joined.rollup("region", "nation").agg(
        F.grouping_id().cast("int").alias("grouping_level"),
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("total_revenue"),
    )


# ------------------------------------------------------------------- pivot

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@query(
    "nation_segment_pivot",
    survey="ext-pivot A2",
    oracle=f"""
        SELECT n.n_name AS nation,
               {", ".join(
                   MONEY_SUM_SQL.format(
                       expr=f"CASE WHEN c.c_mktsegment = '{s}'"
                            f" THEN o.o_totalprice END"
                   ) + f' AS "{s}"'
                   for s in _SEGMENTS
               )}
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
)
def nation_segment_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: revenue by nation × market segment as a wide table.
    The segment list is explicit — with it, Spark skips the extra
    distinct-values job and plans a single aggregation."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"), "c_mktsegment", "o_totalprice"
        )
    )
    return (
        joined.groupBy("nation")
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(money_sum(F.col("o_totalprice")))
    )


# ------------------------------------------------------------- as-of join

@query(
    "events_asof_attribution",
    survey="ext-asof W1",
    oracle="""
        WITH clicks AS (
            SELECT user_id, ts,
                   CAST(max(event_id) AS BIGINT) AS click_id
            FROM events WHERE event_type = 'click'
            GROUP BY user_id, ts
        ),
        purchases AS (
            SELECT user_id, ts, event_id, value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT p.user_id,
               CAST(p.event_id AS BIGINT) AS purchase_id,
               p.ts AS purchase_ts,
               p.value AS purchase_value,
               c.click_id AS matched_click_id,
               c.ts AS matched_ts,
               CAST(CASE WHEN c.ts IS NULL THEN NULL
                         ELSE epoch_us(p.ts) - epoch_us(c.ts) END AS BIGINT)
                   AS gap_us
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution as-of join: each purchase matched to the user's
    latest prior click (operators/asof.py — union + one keyed window;
    DuckDB's native ASOF JOIN is the oracle twin). Clicks pre-dedupe
    to one row per (user, ts) for tie determinism."""
    e = load_table(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join_backward(purchases, clicks, key="user_id")
    return joined.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
        F.col("matched_click_id"),
        F.col("matched_ts"),
        F.when(
            F.col("matched_ts").isNull(), F.lit(None)
        )
        .otherwise(F.unix_micros("ts") - F.unix_micros("matched_ts"))
        .cast("long")
        .alias("gap_us"),
    )


# ------------------------------------------------- multi-way join (TPC-H Q5)

@query(
    "local_supplier_revenue",
    survey="ext-multijoin A2 J4 J5",
    oracle=f"""
        SELECT n.n_name AS nation,
               {MONEY_SUM_SQL.format(
                   expr="l.l_extendedprice * (1.0 - l.l_discount)"
               )} AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lineitems
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND s.s_nationkey = c.c_nationkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
)
def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join (lineitem⋈orders⋈customer⋈supplier⋈
    nation) with the local-supplier predicate s_nationkey = c_nationkey.
    The two facts join on their shared key (sort-merge / shuffle once,
    or zero-shuffle when bucketed per sources/layout.py); all dims
    broadcast. Catalyst+AQE pick the join order — nothing
    hand-scheduled. Revenue = extendedprice*(1-discount), summed via
    exact integer cents."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            money_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ------------------------------------------------------------ set operations

@query(
    "customer_set_ops",
    survey="ext-setops P9",
    oracle="""
        WITH buyers AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
        all_cust AS (SELECT c_custkey AS custkey FROM customer)
        SELECT 'never_ordered' AS cohort,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT custkey FROM all_cust EXCEPT SELECT custkey FROM buyers)
        UNION ALL
        SELECT 'ordered', CAST(COUNT(*) AS BIGINT)
        FROM (SELECT custkey FROM all_cust INTERSECT SELECT custkey FROM buyers)
    """,
)
def customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT (absent from the reference, native in
    Spark): customer cohorts vs the buyer set. Catalyst plans both as
    (broadcastable) left-anti / left-semi joins — same shapes as J6."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    buyers = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    never = (
        c.subtract(buyers)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit("never_ordered").alias("cohort"), "n")
    )
    ordered = (
        c.intersect(buyers)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit("ordered").alias("cohort"), "n")
    )
    return never.unionAll(ordered)


# ------------------------------------------------------------ skew handling

@query(
    "salted_hot_key_counts",
    survey="ext-skew A2",
    oracle="""
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    """,
)
def salted_hot_key_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation on a low-cardinality (hot) key —
    operators/skew.py. The oracle is the plain groupBy: identical
    results, skew-proof shuffle (hot keys spread over 16 reducers
    before the tiny final merge)."""
    from ..operators.skew import salted_count_by_key

    e = load_table(spark, sf_dir, "events")
    return salted_count_by_key(e, "event_type", salt_from="event_id").select(
        "event_type", "n"
    )


# ------------------------------------------------------------- percentiles

@query(
    "order_value_percentiles",
    survey="ext-percentile A2",
    oracle="""
        SELECT o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               quantile_disc(o_totalprice, 0.50) AS p50,
               quantile_disc(o_totalprice, 0.90) AS p90,
               quantile_disc(o_totalprice, 0.99) AS p99
        FROM orders GROUP BY o_orderpriority
    """,
)
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles per group (``percentile_disc``
    semantics agree across engines on exact input values — no
    interpolation, so doubles pass through untouched). The exact
    twin of the sketch below."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice)").alias("p50"),
        F.expr("percentile_disc(0.90) WITHIN GROUP (ORDER BY o_totalprice)").alias("p90"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice)").alias("p99"),
    )


@query(
    "approx_distinct_users",
    survey="ext-approx A1",
    oracle=None,  # HLL sketch values are engine-specific; error bound
    #               asserted in tests/test_operators.py instead
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct counting (HyperLogLog++) next to the
    exact count — at 100 TB the sketch replaces a full shuffle of
    every distinct key with fixed-size mergeable state. Output
    includes the relative error so the calibration is visible."""
    e = load_table(spark, sf_dir, "events")
    agg = e.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
    )
    return agg.select(
        "exact_users",
        "approx_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users")).cast("double")
            / F.col("exact_users").cast("double")
        ).alias("rel_error"),
    )


# ---------------------------------------------------------- BPE token stats

@query(
    "bpe_token_stats",
    survey="ext-text P1 A2",
    tags=("llmops",),
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang,
                   {BPE_TOKENS_SQL.format(col="text")} AS toks,
                   length(text) AS n_chars
            FROM documents
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
               CAST(SUM(len(list_distinct(toks))) AS BIGINT) AS total_distinct_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM t GROUP BY lang
    """,
)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-ish token accounting per language: BPE-style pre-tokenizer
    counts (regex, JVM-side) — the cost model a training-data pipeline
    budgets with. Pure projection + one small aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    toks = bpe_ish_tokens(F.col("text"))
    per_doc = docs.select(
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length("text").alias("n_chars"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_distinct").alias("total_distinct_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


# ------------------------------------- correlated-subquery classics
# The reference's query set (scripts/analysis/*.sql) stops at window
# functions; these add the three canonical correlated-subquery shapes
# (TPC-H Q17/Q18/Q22) that any warehouse engine must plan well —
# each decorrelated into the join+aggregate form Catalyst executes.

@query(
    "small_quantity_revenue",
    survey="ext-subquery A2 A8 J4 P8",
    oracle=f"""
        WITH t AS (
            SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_thresh
            FROM lineitem GROUP BY l_partkey
        )
        SELECT p.p_brand,
               CAST(COUNT(*) AS BIGINT) AS n_small_lines,
               {MONEY_SUM_SQL.format(expr="l.l_extendedprice")} AS total_price
        FROM lineitem l
        JOIN t ON l.l_partkey = t.l_partkey
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity < t.qty_thresh
        GROUP BY p.p_brand
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — correlated aggregate decorrelated: per-part
    average quantity, then each lineitem compared against 20% of its
    own part's average. (Exact: integral quantities sum exactly in
    doubles, so both engines derive the identical threshold.)

    Scale: the per-part average and the lineitem↔threshold join share
    ``l_partkey`` — one hash shuffle serves both (Catalyst reuses the
    exchange); the part dim joins broadcast. This is the plan shape
    that survives 100 TB: no row explosion, partial aggregation
    map-side, one wide exchange total."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    thresh = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * F.lit(0.2)).alias("qty_thresh")
    )
    return (
        li.join(thresh, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small_lines"),
            money_sum(F.col("l_extendedprice")).alias("total_price"),
        )
    )


@query(
    "large_orders",
    survey="ext-subquery A2 A6 J3 J5",
    oracle=f"""
        WITH big AS (
            SELECT l_orderkey, SUM(l_quantity) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 250
        )
        SELECT c.c_name, o.o_orderkey,
               CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
               {CENTS_SQL.format(expr="o.o_totalprice")} AS price_cents,
               big.total_qty
        FROM big
        JOIN orders o ON o.o_orderkey = big.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — HAVING over a grouped fact feeding joins:
    orders whose lineitems total >250 units, with their customer.

    Scale: the HAVING prunes before any join (a few rows per million
    survive), so the expensive side collapses first; the surviving
    keys join ``orders`` on the shuffle key and the customer dim
    joins broadcast-or-shuffled by size. Aggregate-then-join is the
    order that matters at 100 TB — join-then-aggregate would shuffle
    the full fact twice."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            cents(F.col("o_totalprice")).alias("price_cents"),
            "total_qty",
        )
    )


@query(
    "big_balance_lapsed",
    survey="ext-subquery A1 A2 J6 P8",
    oracle=f"""
        WITH cutoff AS (
            SELECT MAX(o_orderdate) - INTERVAL 365 DAY AS t FROM orders
        ),
        thresh AS (
            SELECT CAST(SUM({CENTS_SQL.format(expr="c_acctbal")}) AS DOUBLE)
                   / COUNT(*) AS avg_cents
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               {MONEY_SUM_SQL.format(expr="c.c_acctbal")} AS total_acctbal
        FROM customer c, thresh
        WHERE {CENTS_SQL.format(expr="c.c_acctbal")} > thresh.avg_cents
          AND NOT EXISTS (
              SELECT 1 FROM orders o, cutoff
              WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= cutoff.t
          )
        GROUP BY c.c_mktsegment
    """,
)
def big_balance_lapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — scalar subquery + NOT EXISTS: customers with
    above-average positive balance and no order in the final year of
    the data (lapsed big spenders — the reactivation list). The
    average is computed on integer cents so both engines derive a
    bit-identical threshold (float-sum order can never flip a
    borderline customer).

    Scale: both scalar subqueries (cutoff date, average balance) are
    one-row broadcasts; the NOT EXISTS decorrelates to a left-anti
    hash join on ``custkey`` against only the last year of orders —
    the date filter prunes the fact scan (partition pruning on a
    date-partitioned table) before the anti join shuffles anything.
    No per-row subquery execution anywhere."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cutoff = orders.agg(
        F.date_sub(F.max("o_orderdate").cast("date"), 365)
        .cast("timestamp")
        .alias("t")
    )
    recent = orders.crossJoin(F.broadcast(cutoff)).filter(
        F.col("o_orderdate") >= F.col("t")
    )
    avg_cents = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(cents(F.col("c_acctbal"))).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_cents")
        )
    )
    return (
        cust.crossJoin(F.broadcast(avg_cents))
        .filter(cents(F.col("c_acctbal")) > F.col("avg_cents"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_sum(F.col("c_acctbal")).alias("total_acctbal"),
        )
    )


@query(
    "rolling_7day_revenue",
    survey="ext-window W6 W7 A4",
    oracle=f"""
        SELECT day, day_cents,
               CAST(SUM(day_cents) OVER (
                      ORDER BY day
                      RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
                    AS DOUBLE) / 100.0 AS revenue_7d
        FROM (
          SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
                 -- explicit BIGINT: DuckDB SUM(BIGINT) is HUGEINT,
                 -- which pandas renders as float64 and the driver's
                 -- string hash sees as "...0.0" vs Spark's int64
                 CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                      AS BIGINT) AS day_cents
          FROM orders GROUP BY 1
        )
        ORDER BY day
    """,
)
def rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: trailing-7-day revenue over the daily
    aggregate — the frame is defined by VALUE distance (6 days
    preceding), not row count, so gaps in the calendar shrink the
    window exactly as T-SQL/DuckDB ``RANGE INTERVAL`` semantics say.

    Scale shape: the fact collapses to ≤ n_days rows FIRST (map-side
    partials), and only that tiny daily relation flows into the
    unpartitioned range window — never window-over-fact. Cents stay
    integer inside the running frame sum, so the cross-engine hash is
    exact even though partial sums ride a sliding frame."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
                .cast("long")
            ).alias("day_cents")
        )
    )
    w = (
        Window.orderBy(F.col("day").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    return (
        daily.select(
            "day",
            "day_cents",
            (F.sum("day_cents").over(w).cast("double") / F.lit(100.0))
            .alias("revenue_7d"),
        )
        .orderBy("day")
    )


@query(
    "customer_value_deciles",
    survey="ext-window W3 A2 O1",
    oracle="""
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(floor(total_cents) AS BIGINT)) AS DOUBLE) / 100.0
                   AS decile_revenue
        FROM (
          SELECT c.c_custkey,
                 COALESCE(SUM(CAST(floor(o.o_totalprice * 100.0 + 0.5)
                                   AS BIGINT)), 0) AS total_cents,
                 ntile(10) OVER (
                   ORDER BY COALESCE(SUM(CAST(floor(o.o_totalprice * 100.0
                                                    + 0.5) AS BIGINT)), 0)
                            DESC, c.c_custkey) AS decile
          FROM customer c
          LEFT JOIN orders o ON o.o_custkey = c.c_custkey
          GROUP BY c.c_custkey
        )
        GROUP BY decile
        ORDER BY decile
    """,
)
def customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(10) lifetime-value segmentation: every customer ranked
    into spend deciles, then per-decile population and revenue. The
    ntile ORDER BY carries a custkey tiebreak so bucket boundaries
    are total-ordered — without it, equal-spend customers straddle
    bucket edges nondeterministically and the cross-engine hash
    breaks.

    Scale shape: per-customer totals aggregate with map-side partials
    (shuffle on custkey); NTILE needs a global sort of the
    n_customers aggregate — inherently single-ordered, but over the
    REDUCED relation (customers, not orders), the same shape every
    MPP engine uses for decile reports. The final decile rollup is
    10 rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(
                F.sum(
                    F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
                    .cast("long")
                ),
                F.lit(0).cast("long"),
            ).alias("total_cents")
        )
    )
    w = Window.orderBy(F.desc("total_cents"), F.asc("c_custkey"))
    return (
        per_cust.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum("total_cents").cast("double") / F.lit(100.0))
            .alias("decile_revenue"),
        )
        .orderBy("decile")
    )


# ------------------------------------------------- bucketed co-located join

def _mart_buckets(n_rows: int) -> int:
    """Bucket count for the bucketed fact layout: ~1M rows per bucket
    of the LARGER table, floor 8, and a power of two so a future
    2× re-bucket splits buckets instead of reshuffling them. A FIXED
    count is the classic bucketing scale bug — measured here: at the
    sf10 spot-check the original 8-bucket layout serialized the 60M-row
    sorted write onto 8 of 32 cores and the sf1→sf10 solo wall went
    10.6 s → 414 s (39× for 10× data); with row-scaled buckets the
    write and the bucket-to-bucket join keep every core busy. Both
    tables MUST share the count — Spark only elides the exchange when
    the bucket specs match."""
    b = 8
    while b < 256 and n_rows > b * 1_000_000:
        b *= 2
    return b


def _bucketed_marts(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Session-shared bucketed fact layout (orders + lineitem, both
    hash-bucketed on the order key with a row-scaled bucket count,
    one sorted file per bucket): the storage-layout strategy for
    repeated big-fact joins at 100 TB — both sides land
    co-partitioned on disk, so every subsequent join/aggregation on
    the key reads bucket i against bucket i with NO shuffle exchange.
    Built once per (session, sf_dir) like ``llmops._pq_shared``; in
    production this IS the warehouse table layout (``bucketBy`` on
    the canonical join key at ingest), not a per-query step. The
    ``repartition(n, key)`` before the write yields exactly one file
    per bucket, which lets Spark also elide the per-bucket sort on
    the scan side."""
    cache = getattr(spark, "_wh_bucketed_marts", None)
    if cache is None:
        cache = {}
        spark._wh_bucketed_marts = cache
    if sf_dir not in cache:
        import hashlib

        from .. import tmputil

        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        base = tmputil.scratch_dir("wh_bucketed_")
        n_buckets = _mart_buckets(
            load_table(spark, sf_dir, "lineitem").count()
        )
        names = []
        for table, key in (("orders", "o_orderkey"),
                           ("lineitem", "l_orderkey")):
            name = f"wh_{table}_bucketed_{tag}"
            (
                load_table(spark, sf_dir, table)
                .repartition(n_buckets, F.col(key))
                .write.format("parquet")
                .bucketBy(n_buckets, key)
                .sortBy(key)
                .option("path", f"{base}/{table}")
                .mode("overwrite")
                .saveAsTable(name)
            )
            names.append(name)
        cache[sf_dir] = (names[0], names[1])
    return cache[sf_dir]


@query(
    "bucketed_colocated_join",
    survey="ext-bucketing ext-layout J3 A2 O1",
    oracle=f"""
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               {MONEY_SUM_SQL.format(
                   expr="l.l_extendedprice * (1.0 - l.l_discount)")}
                   AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join over the bucketed layout (``_bucketed_marts``):
    lineitem joins orders bucket-to-bucket with ZERO shuffle exchange
    on the join key — the plan gate
    (tests/test_tpch_plans.py::test_bucketed_join_is_exchange_free)
    asserts no ``Exchange hashpartitioning`` feeds the join and both
    scans read ``Bucketed: true``. The ``merge`` hint pins the
    sort-merge strategy the layout exists for: at 100 TB neither fact
    side broadcasts, and without bucketing this join shuffles BOTH
    corpora every run. The only exchange left is the 5-group
    post-join priority rollup."""
    onm, lnm = _bucketed_marts(spark, sf_dir)
    o = spark.table(onm)
    li = spark.table(lnm)
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            money_sum(revenue).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "bucket_pruned_lookup",
    survey="ext-bucketing ext-layout ext-pruning J3 A3 P7",
    oracle=f"""
        SELECT o.o_orderkey, o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               {MONEY_SUM_SQL.format(
                   expr="l.l_extendedprice * (1.0 - l.l_discount)")}
                   AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IN (1, 2, 3)
        GROUP BY o.o_orderkey, o.o_orderpriority
        ORDER BY o.o_orderkey
    """,
)
def bucket_pruned_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup over the bucketed layout (``_bucketed_marts``):
    an equality/IN filter on the bucket key lets Spark open ONLY the
    buckets those keys hash to — the scan prints
    ``SelectedBucketsCount: k (out of n)`` and every other bucket
    file is never read (gated in tests/test_tpch_plans.py::
    test_bucket_pruned_lookup_reads_one_bucket). This is the
    second payoff of authoring the layout once at ingest: the same
    files that make the fact-fact join exchange-free make key
    lookups O(corpus/n_buckets) I/O — at 100 TB with thousands of
    buckets, an order-detail fetch reads gigabytes, not the corpus.
    Shares the session-shared marts with ``bucketed_colocated_join``
    (no extra build)."""
    onm, lnm = _bucketed_marts(spark, sf_dir)
    o = spark.table(onm).filter(F.col("o_orderkey").isin(1, 2, 3))
    li = spark.table(lnm).filter(F.col("l_orderkey").isin(1, 2, 3))
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            money_sum(revenue).alias("revenue"),
        )
        .orderBy("o_orderkey")
    )
