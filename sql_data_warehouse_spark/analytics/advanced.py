"""Advanced analytics surface: funnel / retention / time-series LOCF /
full-outer reconciliation / rolling extrema / distribution ranks /
blocked fuzzy matching / inter-arrival histograms.

These extend the reference's analysis-query families (ranking
`/root/reference/scripts/analysis/06_ranking_analysis.sql`, change-
over-time `07_change_over_time_analysis.sql`, part-to-whole
`11_part_to_whole_analysis.sql`) with the event-funnel / cohort /
gap-fill shapes a warehouse grows next, each expressed as a single
declarative plan Catalyst can push down and each gated by a DuckDB
oracle.

Scale notes per query; the common rules: every grid / cohort matrix
is derived from an aggregate (rows ≈ span, never ≈ events), window
functions over global grids only when the grid is aggregate-sized,
self-joins only within blocks (Σ block², never n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import graph as _graph
from ..sources import load_table
from .registry import query
from ..tmputil import scratch_dir
from .xengine import CENTS_SQL, MICRO_SUM_SQL, MONEY_SUM_SQL, cents, micros, money_sum


# ------------------------------------------------------------------ funnel


@query(
    "funnel_view_click_purchase",
    survey="ext-funnel A1 A2 J5",
    tags=("events", "funnel"),
    oracle="""
        WITH fv AS (
          SELECT user_id, MIN(ts) AS first_view
          FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        fc AS (
          SELECT e.user_id, MIN(e.ts) AS first_click
          FROM events e JOIN fv ON e.user_id = fv.user_id
                        AND e.ts > fv.first_view
          WHERE e.event_type = 'click' GROUP BY e.user_id
        ),
        fp AS (
          SELECT e.user_id, MIN(e.ts) AS first_purchase
          FROM events e JOIN fc ON e.user_id = fc.user_id
                        AND e.ts > fc.first_click
          WHERE e.event_type = 'purchase' GROUP BY e.user_id
        )
        SELECT CAST((SELECT COUNT(*) FROM fv) AS BIGINT) AS n_view,
               CAST((SELECT COUNT(*) FROM fc) AS BIGINT) AS n_click,
               CAST((SELECT COUNT(*) FROM fp) AS BIGINT) AS n_purchase
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user
    advances a stage only with an event STRICTLY AFTER their first
    event of the previous stage (the classic in-order funnel, not
    set-intersection).

    Plan: three user_id-keyed aggregations, each consuming the
    previous stage's (user_id, first_ts) relation — every join and
    groupBy shuffles on the same key so AQE reuses the exchange; the
    stage relations shrink monotonically. No window over raw events,
    no per-user collect_list. At 100 TB: identical shape, stage
    relations ≈ |users| rows."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    fv = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    fc = (
        e.filter(F.col("event_type") == "click")
        .join(fv, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(fc, "user_id")
        .filter(F.col("ts") > F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        fv.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(fc.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(fp.agg(F.count(F.lit(1)).alias("n_purchase")))
    )


# ---------------------------------------------------------------- cohorts


@query(
    "user_retention_cohorts",
    survey="ext-cohort A4 A5 W1",
    tags=("events", "funnel"),
    oracle="""
        WITH cohort AS (
          SELECT user_id,
                 MIN(date_trunc('week', ts)) AS cohort_week
          FROM events GROUP BY user_id
        ),
        active AS (
          SELECT DISTINCT user_id, date_trunc('week', ts) AS week
          FROM events
        )
        SELECT CAST(c.cohort_week AS TIMESTAMP) AS cohort_week,
               CAST(datediff('day', CAST(c.cohort_week AS DATE),
                             CAST(a.week AS DATE)) // 7 AS INTEGER)
                   AS week_offset,
               CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
        FROM active a JOIN cohort c ON a.user_id = c.user_id
        GROUP BY 1, 2
    """,
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: cohort = week of a user's first
    event; cell (cohort, k) counts cohort members active k weeks
    later. Two user_id aggregations plus one user_id join — the
    cohort matrix is |weeks|² rows regardless of event volume."""
    e = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    cohort = e.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    active = e.select("user_id", wk.alias("week")).distinct()
    offset = F.expr(
        "CAST(datediff(CAST(week AS DATE), CAST(cohort_week AS DATE)) div 7 AS INT)"
    )
    return (
        active.join(cohort, "user_id")
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# ------------------------------------------------------------- LOCF fill


@query(
    "events_hourly_locf",
    survey="ext-timeseries A4 W-none",
    tags=("events", "timeseries"),
    oracle="""
        WITH bounds AS (
          SELECT date_trunc('hour', MIN(ts)) AS t0,
                 date_trunc('hour', MAX(ts)) AS t1
          FROM events
        ),
        grid AS (
          SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour_start
          FROM bounds
        ),
        agg AS (
          SELECT date_trunc('hour', ts) AS hour_start,
                 SUM({micros}) AS v_micros
          FROM events
          WHERE event_type = 'purchase' AND value > 18.0
          GROUP BY 1
        )
        SELECT g.hour_start,
               a.v_micros IS NULL AS was_gap,
               CAST(last_value(a.v_micros IGNORE NULLS) OVER (
                     ORDER BY g.hour_start
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS DOUBLE) / 1000000.0 AS locf_value
        FROM grid g LEFT JOIN agg a USING (hour_start)
    """.format(micros="CAST(floor((value) * 1000000.0 + 0.5) AS BIGINT)"),
)
def events_hourly_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill with last-observation-carried-forward: dense hourly
    grid over the event span, sparse hourly sums (purchases > 18.0
    leave ~14% of hours empty at sf0.01), empty hours inherit the
    previous populated hour's value (`last(..., ignorenulls=True)`).

    The LOCF window is a GLOBAL order — safe here because it runs on
    the grid (rows = span hours, an aggregate-sized relation), never
    on raw events. At 100 TB the grid for a decade of hours is 87 k
    rows; partition the window by month and carry one boundary row
    per partition if the span itself ever becomes large."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = bounds.select(
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour_start"
        )
    )
    agg = (
        e.filter((F.col("event_type") == "purchase") & (F.col("value") > 18.0))
        .groupBy(F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(F.sum(micros(F.col("value"))).alias("v_micros"))
    )
    w = Window.orderBy("hour_start").rowsBetween(Window.unboundedPreceding, 0)
    return grid.join(agg, "hour_start", "left").select(
        "hour_start",
        F.col("v_micros").isNull().alias("was_gap"),
        (
            F.last("v_micros", ignorenulls=True).over(w).cast("double")
            / F.lit(1000000.0)
        ).alias("locf_value"),
    )


# ---------------------------------------------------- full-outer reconcile


@query(
    "monthly_orders_vs_events",
    survey="ext-fullouter J-full A4 U1",
    tags=("events",),
    oracle=f"""
        WITH om AS (
          SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
                 CAST(COUNT(*) AS BIGINT) AS n_orders,
                 {MONEY_SUM_SQL.format(expr="o_totalprice")} AS order_value
          FROM orders GROUP BY 1
        ),
        em AS (
          SELECT date_trunc('month', ts) AS month,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 {MICRO_SUM_SQL.format(expr="value")} AS event_value
          FROM events GROUP BY 1
        )
        SELECT COALESCE(om.month, em.month) AS month,
               CAST(COALESCE(om.n_orders, 0) AS BIGINT) AS n_orders,
               CAST(COALESCE(om.order_value, 0.0) AS DOUBLE) AS order_value,
               CAST(COALESCE(em.n_events, 0) AS BIGINT) AS n_events,
               CAST(COALESCE(em.event_value, 0.0) AS DOUBLE) AS event_value
        FROM om FULL JOIN em ON om.month = em.month
    """,
)
def monthly_orders_vs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer reconciliation of two independent monthly rollups
    (orders 1995–2001 vs events 2024 — the calendars are disjoint, so
    every row is one-sided and the FULL join semantics are actually
    exercised, zero-filling the absent side). Both inputs aggregate
    before the join: the full-outer runs on |months| rows."""
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    om = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("order_value"),
    )
    em = e.groupBy(F.date_trunc("month", "ts").alias("month")).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(micros(F.col("value"))).cast("double") / F.lit(1000000.0)).alias(
            "event_value"
        ),
    )
    return om.join(em, "month", "full_outer").select(
        "month",
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
        F.coalesce("order_value", F.lit(0.0)).cast("double").alias("order_value"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("event_value", F.lit(0.0)).cast("double").alias("event_value"),
    )


# ------------------------------------------------------- rolling extrema


@query(
    "rolling_daily_minmax",
    survey="ext-rolling W6 W7 A4",
    tags=("tpch",),
    oracle=f"""
        WITH daily AS (
          SELECT CAST(date_trunc('day', l_shipdate) AS TIMESTAMP) AS day,
                 SUM({CENTS_SQL.format(expr="l_extendedprice * (1.0 - l_discount)")})
                     AS day_cents
          FROM lineitem
          WHERE l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'
          GROUP BY 1
        )
        SELECT day,
               CAST(day_cents AS DOUBLE) / 100.0 AS revenue,
               CAST(MIN(day_cents) OVER w AS DOUBLE) / 100.0 AS roll_min_3d,
               CAST(MAX(day_cents) OVER w AS DOUBLE) / 100.0 AS roll_max_3d
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_daily_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 3-day revenue extrema over a daily rollup (Q1-1996
    quarter): aggregate first (90 rows), then a ROWS-frame min/max
    window on the rollup — the window never touches raw lineitem.
    Shipdate filter pushes to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.filter(
            F.col("l_shipdate").between("1996-01-01", "1996-03-31")
        )
        .groupBy(F.date_trunc("day", "l_shipdate").alias("day"))
        .agg(
            F.sum(
                cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            ).alias("day_cents")
        )
    )
    w = Window.orderBy("day").rowsBetween(-2, 0)
    return daily.select(
        "day",
        (F.col("day_cents").cast("double") / F.lit(100.0)).alias("revenue"),
        (F.min("day_cents").over(w).cast("double") / F.lit(100.0)).alias(
            "roll_min_3d"
        ),
        (F.max("day_cents").over(w).cast("double") / F.lit(100.0)).alias(
            "roll_max_3d"
        ),
    )


# ------------------------------------------------------ distribution ranks


@query(
    "nation_revenue_percentile",
    survey="ext-rank W3 A2 J4",
    tags=("tpch",),
    oracle=f"""
        WITH nat AS (
          SELECT n.n_name AS nation,
                 SUM({CENTS_SQL.format(expr="l.l_extendedprice * (1.0 - l.l_discount)")})
                     AS rev_cents
          FROM lineitem l
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          GROUP BY n.n_name
        )
        SELECT nation,
               CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
               percent_rank() OVER (ORDER BY rev_cents) AS pct_rank,
               cume_dist() OVER (ORDER BY rev_cents) AS cume_dist
        FROM nat
    """,
)
def nation_revenue_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist over per-nation revenue: the rank
    window runs on the 25-row nation rollup (supplier→nation joins
    broadcast). Both engines compute percent_rank as
    (rank-1)/(n-1) over exact int64 cents, so the doubles are
    bit-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    nat = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            ).alias("rev_cents")
        )
    )
    w = Window.orderBy("rev_cents")
    return nat.select(
        "nation",
        (F.col("rev_cents").cast("double") / F.lit(100.0)).alias("revenue"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
    )


# --------------------------------------------------- blocked fuzzy match


@query(
    "supplier_fuzzy_pairs",
    survey="ext-fuzzy J-self P8",
    tags=("dedup",),
    oracle="""
        SELECT a.s_name AS name_a, b.s_name AS name_b,
               CAST(levenshtein(a.s_name, b.s_name) AS INTEGER) AS edit_dist
        FROM supplier a JOIN supplier b
          ON a.s_nationkey = b.s_nationkey AND a.s_name < b.s_name
        WHERE levenshtein(a.s_name, b.s_name) <= 2
    """,
)
def supplier_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate pairs by blocked fuzzy matching:
    self-join suppliers WITHIN a nation block (Σ block²), keep pairs
    within Levenshtein distance 2. Both engines implement textbook
    Levenshtein, so the distance is engine-independent.

    SCALE BOUND: the nation block grows linearly with the supplier
    count, so Σ block² grows quadratically — measured 0.5 s → 49 s
    for sf0.1 → sf1 (400 suppliers/nation → 2 M verified pairs).
    This is the exact VERIFIER-role form (cf. `embedding_near_dup`);
    the production path is `supplier_fuzzy_pairs_banded`, whose
    segment blocks stay Σ block²-bounded as data grows.

    Parallelism: supplier at sf10 is ONE parquet row group, and a
    broadcast join inherits the probe side's partitioning — the r8
    full sf10 sweep caught the whole 200M-levenshtein verify running
    as a single task (1400 s on one core). Repartitioning the probe
    side first spreads the quadratic work across the cluster; the
    quadratic BOUND is unchanged (that is the banded twin's job),
    only the single-task collapse is fixed."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n_part = spark.sparkContext.defaultParallelism
    a = s.repartition(n_part).alias("a")
    b = s.alias("b")
    return (
        a.join(
            b,
            (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
            & (F.col("a.s_name") < F.col("b.s_name")),
        )
        .select(
            F.col("a.s_name").alias("name_a"),
            F.col("b.s_name").alias("name_b"),
            F.levenshtein(F.col("a.s_name"), F.col("b.s_name")).alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 2)
    )


# ---------------------------------------------------------- heavy hitters


@query(
    "heavy_hitter_event_types",
    survey="ext-sketch A1 O2",
    tags=("events", "sketch"),
    oracle="""
        SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS est_count
        FROM events GROUP BY event_type
        ORDER BY est_count DESC LIMIT 3
    """,
)
def heavy_hitter_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via Spark 4's ``approx_top_k`` frequency sketch
    (mergeable Misra-Gries-style summary — one pass, map-side partial
    sketches, tiny merge). With ``maxItemsTracked`` ≥ the true
    cardinality the sketch is EXACT, so the DuckDB exact top-k gates
    it; at 100 TB the same plan holds with bounded error and fixed
    sketch memory per partition. Top-3 counts are distinct in the
    testdata, so the cutoff is tie-free."""
    e = load_table(spark, sf_dir, "events")
    sk = e.select(
        F.expr("approx_top_k(event_type, 3, 100000)").alias("topk")
    ).select(F.explode("topk").alias("kv"))
    return sk.select(
        F.col("kv.item").alias("item"),
        F.col("kv.count").cast("long").alias("est_count"),
    )




# -------------------------------------- banded fuzzy match (PassJoin)


def _fuzzy_bands_sql(supplier: str) -> str:
    """Shared SQL text (Spark + DuckDB): banded candidate generation
    for Levenshtein<=2 over the 9-digit tail of s_name.

    The 9 digit positions are partitioned into 4 STRIDE-INTERLEAVED
    parts (P0={1,5,9}, P1={2,6}, P2={3,7}, P3={4,8} — every part
    contains a low-order digit, so no part is constant over a small
    key range the way a contiguous high-order segment is). Two
    equal-length names within 2 substitutions differ in <=2 digit
    positions, touching <=2 parts — so >=2 of the 4 parts are
    untouched, and the pair shares the concatenated key of at least
    one of the C(4,2)=6 part-combinations (pigeonhole). Block key =
    (nation, combo, key).

    The band join runs over DISTINCT (nation, name) values, not
    supplier rows: the output is distinct name pairs either way, but
    with d duplicate rows per name the row-level join pays d² per
    true pair before its DISTINCT — the sf10 sweep measured 65×
    wall for 10× data (100 copies/name), vs 1.3× after the collapse.
    Same lesson as simhash_near_dup_clusters: collapse exact
    duplicates before any pairwise stage."""
    import itertools

    parts = {0: [1, 5, 9], 1: [2, 6], 2: [3, 7], 3: [4, 8]}

    def expr(ps):
        return " || ".join(f"substr(s_name, {9 + d}, 1)" for d in ps)

    selects = [
        f"SELECT s_nationkey, s_name, {bid} AS band,"
        f" {expr(parts[i] + parts[j])} AS bkey FROM names"
        for bid, (i, j) in enumerate(itertools.combinations(range(4), 2))
    ]
    bands = "\n          UNION ALL\n          ".join(selects)
    return f"""
        WITH names AS (
          SELECT DISTINCT s_nationkey, s_name FROM {supplier}
        ),
        bands AS (
          {bands}
        ),
        cand AS (
          SELECT DISTINCT a.s_name AS name_a, b.s_name AS name_b
          FROM bands a JOIN bands b
            ON a.s_nationkey = b.s_nationkey
           AND a.band = b.band AND a.bkey = b.bkey
           AND a.s_name < b.s_name
        )
        SELECT name_a, name_b,
               CAST(levenshtein(name_a, name_b) AS INTEGER) AS edit_dist
        FROM cand WHERE levenshtein(name_a, name_b) <= 2
    """


@query(
    "supplier_fuzzy_pairs_banded",
    survey="ext-fuzzy J-self P8 A2",
    tags=("dedup",),
    oracle=_fuzzy_bands_sql("supplier"),
)
def supplier_fuzzy_pairs_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable edit-distance self-join by combinatorial segment
    blocking (the partition-signature family of Pass-Join, Li et al.,
    PVLDB 2011): see `_fuzzy_bands_sql` for the stride-interleaved
    2-of-4 scheme. Exactly complete for substitution-type divergence
    (<=2 substituted characters — the Hamming regime of fixed-width
    identifiers); insert/delete coverage adds Pass-Join's shifted
    probes at the same plan shape.

    Why not one shared segment of 3 (the naive PassJoin banding): a
    CONTIGUOUS high-order segment is constant over a small key range,
    so its band degenerates to the whole nation block (measured
    28 s at sf1 — as slow as the naive Σ nation² join). Interleaving
    gives every part a low-order digit: at sf1 each of the 6 bands
    keys on >=2 varying digits, blocks stay O(block) and the banded
    join runs in 4.9 s at sf1 vs 49 s naive (1.4x for 10x data; the
    6-band union costs ~3 s of fixed overhead at any scale). The SAME generated SQL text is
    the DuckDB oracle, and tests/test_operators.py asserts banded ==
    naive pair-for-pair at sf0.01."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView(
        "td_supplier"
    )
    return spark.sql(_fuzzy_bands_sql("td_supplier"))


# ------------------------------------------------- inter-arrival histogram


@query(
    "order_gap_histogram",
    survey="ext-gaps W5 A4 A2",
    tags=("tpch",),
    oracle="""
        WITH gaps AS (
          SELECT datediff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate),
                   o_orderdate) AS gap_days
          FROM orders
        )
        SELECT CAST(gap_days // 30 AS INTEGER) AS gap_months,
               CAST(COUNT(*) AS BIGINT) AS n_gaps
        FROM gaps WHERE gap_days IS NOT NULL
        GROUP BY 1
    """,
)
def order_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer inter-arrival analysis: day gaps between a customer's
    consecutive orders (LAG over the per-customer date sequence),
    bucketed into 30-day months. Ordering by date alone is
    tie-ambiguous but gap-multiset-deterministic: equal dates
    contribute gap 0 in any tie order. One shuffle on o_custkey."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    gaps = o.select(
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "gap_days"
        )
    ).filter(F.col("gap_days").isNotNull())
    return gaps.groupBy(
        F.expr("CAST(gap_days div 30 AS INT)").alias("gap_months")
    ).agg(F.count(F.lit(1)).alias("n_gaps"))


# ------------------------------------------------------- recursive CTE

_BOM_RECURSIVE_TEXT = """
    WITH RECURSIVE bom (root, part_key, lvl) AS (
        SELECT p_partkey, p_partkey, 0
        FROM {part} WHERE p_partkey BETWEEN 1 AND 8
        UNION ALL
        SELECT b.root, p.p_partkey, b.lvl + 1
        FROM bom b
        CROSS JOIN (VALUES (0), (1)) AS t(off)
        JOIN {part} p ON p.p_partkey = b.part_key * 2 + t.off
        WHERE b.lvl < 30
    )
    SELECT b.root AS root_part,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(MAX(b.lvl) AS INTEGER) AS max_depth,
           CAST(SUM(CAST(floor(p.p_retailprice * 100.0 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS subtree_value
    FROM bom b JOIN {part} p ON b.part_key = p.p_partkey
    GROUP BY b.root
"""


@query(
    "bom_subtree_rollup",
    survey="ext-recursive A2 A7",
    tags=("tpch", "sql"),
    oracle=_BOM_RECURSIVE_TEXT.format(part="part"),
)
def bom_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``): bill-of-materials
    subtree rollup over the implicit binary part hierarchy
    (children of k are 2k and 2k+1 — deterministic, no extra edge
    table needed), counting parts / depth / retail value per root
    1–8. The SAME literal SQL text runs in DuckDB — the gate covers
    Spark's iterative recursion execution against DuckDB's recursive
    evaluator. Depth guard 30 bounds the iteration at any scale
    factor; at 100 TB a real BOM would carry an edge table bucketed
    on the parent key so every step's join is co-partitioned.

    The child generator is a 2-row VALUES cross join feeding an
    EQUI-join (``p_partkey = part_key*2 + off``), not
    ``p = k*2 OR p = k*2+1``: an OR-of-equalities cannot compile to a
    hash join, so each recursion step ran as a BroadcastNestedLoopJoin
    — O(frontier × parts) per level, measured 14.8 s → 832 s for
    sf0.1 → sf1 (56× for 10× data). The exploded-equi form hash-joins
    every level: 832 s → 10.3 s at sf1."""
    # Spark guards runaway recursion with a 1M-row accumulator cap
    # (spark.sql.cteRecursionRowLimit) — an anti-footgun default, not
    # a capacity bound. The sf10 sweep tripped it at 2M parts; the
    # real termination guard here is the depth<30 predicate, so size
    # the row cap to the data (left set: the DataFrame executes after
    # this builder returns, and raising the cap never loosens the
    # depth guard).
    spark.conf.set("spark.sql.cteRecursionRowLimit", str(2**31 - 1))
    load_table(spark, sf_dir, "part").createOrReplaceTempView("td_part")
    return spark.sql(_BOM_RECURSIVE_TEXT.format(part="td_part"))


# ------------------------------------------------- first/last per group


@query(
    "customer_first_last_order",
    survey="ext-firstlast W1 W-frame A2",
    tags=("tpch",),
    oracle=f"""
        WITH w AS (
          SELECT o_custkey,
                 first_value({CENTS_SQL.format(expr="o_totalprice")}) OVER win
                     AS first_cents,
                 last_value({CENTS_SQL.format(expr="o_totalprice")}) OVER win
                     AS last_cents,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS rn,
                 COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
          FROM orders
          WINDOW win AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING)
        )
        SELECT o_custkey, first_cents, last_cents,
               CAST(n_orders AS BIGINT) AS n_orders
        FROM w WHERE rn = 1
    """,
)
def customer_first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First and last order value per customer via ``first_value`` /
    ``last_value`` over an UNBOUNDED-to-UNBOUNDED frame (ordering
    made total with the unique o_orderkey tiebreak, so both engines
    pick identical rows). One shuffle on o_custkey shared by all
    three windows — Catalyst collapses same-partitioning windows
    into a single sort+exchange."""
    o = load_table(spark, sf_dir, "orders")
    ordering = [F.col("o_orderdate"), F.col("o_orderkey")]
    base = Window.partitionBy("o_custkey").orderBy(*ordering)
    full = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w = o.select(
        "o_custkey",
        F.first(cents(F.col("o_totalprice"))).over(full).alias("first_cents"),
        F.last(cents(F.col("o_totalprice"))).over(full).alias("last_cents"),
        F.row_number().over(base).alias("rn"),
        F.count(F.lit(1)).over(base.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )).alias("n_orders"),
    )
    return w.filter(F.col("rn") == 1).select(
        "o_custkey", "first_cents", "last_cents",
        F.col("n_orders").cast("long").alias("n_orders"),
    )


# --------------------------------------------------- pivot → unpivot


_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@query(
    "nation_segment_unpivot",
    survey="ext-unpivot ext-pivot A3",
    tags=("tpch",),
    oracle="""
        SELECT n.n_name AS nation, c.c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'FURNITURE',
                                 'HOUSEHOLD', 'MACHINERY')
        GROUP BY 1, 2
    """,
)
def nation_segment_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long): pivot customers per nation × segment into
    5 segment columns, then ``unpivot`` back to (nation, segment,
    count) — the oracle is the direct two-key group-by, so the gate
    proves pivot∘unpivot is the identity on populated cells (NULL
    cells from absent combinations are dropped, matching the group-by
    which never emits them). The pivot's column list is explicit, so
    no collect-distinct pre-pass; both steps are one shuffle."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    wide = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(F.count(F.lit(1)))
    )
    return (
        wide.unpivot(
            ids=["nation"], values=_SEGMENTS,
            variableColumnName="segment", valueColumnName="n_customers",
        )
        .filter(F.col("n_customers").isNotNull())
        .select("nation", "segment", F.col("n_customers").cast("long"))
    )


# ------------------------------------------------- correlated EXISTS


_EXISTS_TEXT = """
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM {orders} o
    WHERE EXISTS (SELECT 1 FROM {lineitem} l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_extendedprice > 55000.0)
      AND NOT EXISTS (SELECT 1 FROM {lineitem} l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
"""


@query(
    "orders_exists_no_returns",
    survey="ext-sql J6 A2 P8",
    tags=("tpch", "sql"),
    oracle=_EXISTS_TEXT.format(orders="orders", lineitem="lineitem"),
)
def orders_exists_no_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS through the raw SQL surface
    (same literal text both engines): orders containing a >55k line
    and no returned line, counted by priority. Catalyst decorrelates
    both subqueries into one LeftSemi and one LeftAnti hash join on
    l_orderkey — no per-row subquery execution; the two lineitem
    scans carry their pushed filters."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("td_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("td_lineitem")
    return spark.sql(_EXISTS_TEXT.format(orders="td_orders",
                                         lineitem="td_lineitem"))


# ---------------------------------------------------- column profiler


@query(
    "profile_orders_columns",
    survey="ext-profile S8 A1 U1",
    tags=("quality",),
    oracle="""
        SELECT 'o_orderkey' AS col_name,
               CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
               CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
               CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus',
               CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
               CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
               MIN(o_orderstatus), MAX(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_orderdate',
               CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT),
               CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
               CAST(MIN(o_orderdate) AS VARCHAR),
               CAST(MAX(o_orderdate) AS VARCHAR)
        FROM orders
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic column profiler (the reference's quality checks
    generalized, scripts/tests/quality_check_silver.sql): null count,
    exact distinct count, min/max per column — computed in ONE pass
    over the table (all aggregates in a single groupBy-less agg, then
    exploded into one row per column), where the UNION-ALL oracle
    scans once per column. At 100 TB the single-scan shape is the
    whole point; swap exact COUNT(DISTINCT) for approx_count_distinct
    when a 2% error is acceptable (`approx_distinct_users` gates that
    path)."""
    o = load_table(spark, sf_dir, "orders")
    prof = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            a
            for col in ("o_orderkey", "o_orderstatus", "o_orderdate")
            for a in (
                F.count(col).alias(f"nn_{col}"),
                F.countDistinct(col).alias(f"nd_{col}"),
                F.min(col).cast("string").alias(f"mn_{col}"),
                F.max(col).cast("string").alias(f"mx_{col}"),
            )
        ],
    )
    rows = [
        F.struct(
            F.lit(col).alias("col_name"),
            (F.col("n_rows") - F.col(f"nn_{col}")).alias("n_nulls"),
            F.col(f"nd_{col}").alias("n_distinct"),
            F.col(f"mn_{col}").alias("min_val"),
            F.col(f"mx_{col}").alias("max_val"),
        )
        for col in ("o_orderkey", "o_orderstatus", "o_orderdate")
    ]
    return prof.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


# ------------------------------------------------ string aggregation


@query(
    "part_type_brand_concat",
    survey="ext-stringagg A2 P9",
    tags=("tpch",),
    oracle="""
        SELECT p_type,
               string_agg(DISTINCT p_brand, ',' ORDER BY p_brand) AS brands,
               CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n_brands
        FROM part GROUP BY p_type
    """,
)
def part_type_brand_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic string aggregation (LISTAGG/STRING_AGG): the
    distinct brands per part type, sorted then joined — Spark's
    ``collect_set`` is order-nondeterministic, so ``sort_array``
    before ``concat_ws`` is what makes the result (and the hash
    gate) stable; the oracle's ORDER BY inside string_agg is the
    same contract. Set sizes are bounded by the brand domain (25),
    so the collected arrays never approach executor memory."""
    p = load_table(spark, sf_dir, "part")
    return p.groupBy("p_type").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("p_brand"))).alias("brands"),
        F.countDistinct("p_brand").alias("n_brands"),
    )


# ------------------------------------------------ JSON-lines roundtrip


@query(
    "etl_json_events",
    survey="ext-json-source S1 S3 A2",
    tags=("etl",),
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
                    AS DOUBLE) / 1000000.0 AS total_value,
               CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_ts_us,
               CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_ts_us
        FROM events GROUP BY event_type
    """,
)
def etl_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines ingestion roundtrip: the events table is exported
    once per session to JSONL (timestamps as integer microseconds —
    the lossless wire form; Spark's default JSON timestamp format
    truncates to millis) and read back through ``spark.read.json``
    with an EXPLICIT schema (no inference pass — schema-on-read the
    way a production bronze layer declares it, reference
    scripts/bronze/ddl_bronze.sql). The aggregate over the re-read
    JSON must hash-equal the DuckDB aggregate over the original
    parquet — proving the export/ingest cycle loses nothing."""
    import os
    import tempfile

    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    cache = getattr(spark, "_wh_json_landing", None)
    if cache is None:
        cache = {}
        spark._wh_json_landing = cache
    path = cache.get(sf_dir)
    if path is None:
        path = os.path.join(scratch_dir("wh_json_events_"), "j")
        e = load_table(spark, sf_dir, "events")
        e.select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
            "props",
        ).write.mode("overwrite").json(path)
        cache[sf_dir] = path
    schema = StructType([
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ])
    j = spark.read.schema(schema).json(path)
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5))
                  .cast("long")).cast("double") / F.lit(1000000.0)
        ).alias("total_value"),
        F.min("ts_us").alias("first_ts_us"),
        F.max("ts_us").alias("last_ts_us"),
    )


# ------------------------------------- grouped-agg pandas UDF (MAD)


@query(
    "part_type_price_mad",
    survey="ext-pandasudf A2 A8",
    tags=("tpch", "pandas"),
    oracle="""
        SELECT p_type,
               mad(CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT))
                   AS mad_cents,
               CAST(COUNT(*) AS BIGINT) AS n_parts
        FROM part GROUP BY p_type
    """,
)
def part_type_price_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per part type via a GROUPED_AGG
    pandas UDF — the robust-statistics aggregate Spark has no
    built-in for, computed on Arrow-batched numpy per group (the
    remaining Pandas-API flavor after mapInPandas /
    applyInPandasWithState / scalar pandas_udf elsewhere in this
    package). Input is exact integer cents, and both numpy and DuckDB
    interpolate even-count medians as the mean of the two middle
    values, so the result is .0/.5-exact and hash-gated.

    The UDF is a NESTED closure referencing only numpy (cloudpickle
    ships it by value — workers can't import this package when the
    driver loads __spark_entry__ by path). Groups are type-bounded
    (150 parts/type at sf1); a group too large for one Arrow batch
    would switch to the two-pass percentile_approx plan instead."""
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: the module's `from __future__ import
    # annotations` turns type hints into strings the UDF-type
    # inference can't resolve for a nested function
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def mad_cents(v):  # Series -> scalar
        a = v.to_numpy(dtype="int64")
        med = np.median(a)
        return float(np.median(np.abs(a - med)))

    # Spark disallows mixing a GROUPED_AGG pandas UDF with built-in
    # aggregates in one agg(), so the count is a pandas aggregate too
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def n_rows(v):
        return len(v)

    p = load_table(spark, sf_dir, "part")
    c = cents(F.col("p_retailprice"))
    return p.groupBy("p_type").agg(
        mad_cents(c).alias("mad_cents"),
        n_rows(c).alias("n_parts"),
    )


# --------------------------------------------------------------- graph


def _copurchase_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-direction co-purchase pair counts (src, dst, n), built
    ONCE per (session, sf_dir) and eagerly checkpointed — the shared
    graph artifact: the support-1 projection is exactly the DISTINCT
    edge set PageRank wants (the grouped count's keys), and the
    support-2 filter is the triangle-mining graph. One lineitem
    self-join per corpus snapshot, not one per graph query — the
    same amortization as ``llmops._sig_index``."""
    cache = getattr(spark, "_wh_copurchase_pairs", None)
    if cache is None:
        cache = {}
        spark._wh_copurchase_pairs = cache
    if sf_dir not in cache:
        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        a, b = li.alias("a"), li.alias("b")
        cache[sf_dir] = (
            a.join(
                b,
                (F.col("a.ok") == F.col("b.ok"))
                & (F.col("a.pk") < F.col("b.pk")),
            )
            .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
    return cache[sf_dir]


@query(
    "copurchase_pagerank_top20",
    survey="ext-graph A2 A7 O2",
    oracle=_graph.copurchase_pagerank_sql(),
)
def copurchase_pagerank_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph (parts connected when
    they ship in the same order), 3 fixed iterations, top-20 parts.

    The graph family the reference lacks entirely; see
    ``operators/graph.py`` for the scaled-integer formulation that
    makes an iterative double-typed algorithm hash-gateable: ranks
    are BIGINTs at 10^12 scale, contributions use integer division,
    and integer sums are exact + associative, so the result is
    bit-identical across partitionings and engines. Plan shape per
    iteration: one keyed join (ranks→edge sources) + one keyed agg
    (sum per destination) over a localCheckpoint-ed edge relation —
    the canonical distributed PageRank step, linear in |edges|.
    Top-20 compiles to TakeOrderedAndProject (no global sort)."""
    edges = _graph.edges_from_pair_counts(
        _copurchase_pair_counts(spark, sf_dir))
    ranks = _graph.pagerank_scaled(edges, n_iter=3)
    return (
        ranks.orderBy(F.col("rank_scaled").desc(), F.col("node"))
        .limit(20)
        .select(F.col("node").alias("part_id"), "rank_scaled")
    )
