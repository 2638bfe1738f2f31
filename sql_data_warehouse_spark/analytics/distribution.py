"""Distribution-shape analytics: exact distributed quantiles, robust
(winsorized) means, sliding-window distinct counts, and per-dimension
embedding outlier detection.

These extend the reference's measures/magnitude families
(`/root/reference/scripts/analysis/04_measures_exploration.sql`,
`05_magnitude_analysis.sql` — scalar AVG/SUM framing) with the
distribution questions those averages hide: where the quartiles sit
(exact, not approx), what the mean is once tails are clamped
(robust statistics), how many distinct actors a trailing window saw
(engagement), and which embedding vectors are dimension-level
anomalies (feature-quality audit for the training-data pipeline).

Scale notes per operator live on the queries; the shared machinery is
:mod:`..operators.quantiles` (two-level histogram rank-select — exact
quantiles with no global sort).

Cross-engine determinism (registry rules): quantiles, counts and
clamps are exact integers end-to-end; each reported ratio is ONE
fixed-order double division of two exact integers; embedding floats
are quantized ``floor(x·1024)`` (×2¹⁰ is exact in binary floating
point, so the quantization is bit-deterministic) before any
cross-row aggregation; dates canonicalize to ISO strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.quantiles import (
    grouped_exact_quantiles,
    type1_quantile_sql,
    weighted_type1_quantile_sql,
)
from ..sources import load_table
from .registry import query

# ------------------------------------------ exact grouped quantiles

# o_totalprice cents span ~[9e4, 6e7] (TPC-H price model, SF-invariant
# domain): 2^20-cent (~$10.5k) bins give ~57 histogram buckets per
# group and bound every rank-select sort to one bin's occupancy.
_CENTS_BUCKET = 1 << 20

_PRIORITY_CENTS_REL = (
    "(SELECT o_orderpriority AS priority, "
    "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents "
    "FROM orders)"
)


@query(
    "exact_priority_quantiles",
    survey="ext-quantile A2 A4 W6",
    tags=("tpch", "distribution"),
    oracle=f"""
        WITH q AS (
{type1_quantile_sql(_PRIORITY_CENTS_REL, "priority", "cents", [25, 50, 75])}
        )
        SELECT priority,
               CAST(MAX(n) AS BIGINT) AS n_orders,
               CAST(MIN(CASE WHEN q_pct = 25 THEN q_val END) AS BIGINT)
                 AS p25_cents,
               CAST(MIN(CASE WHEN q_pct = 50 THEN q_val END) AS BIGINT)
                 AS p50_cents,
               CAST(MIN(CASE WHEN q_pct = 75 THEN q_val END) AS BIGINT)
                 AS p75_cents
        FROM q GROUP BY priority ORDER BY priority
    """,
)
def exact_priority_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT order-value quartiles per order priority — the
    distribution companion to the scalar AVG in the reference's
    measures exploration (`04_measures_exploration.sql`), kept exact
    where ``approx_order_value_percentiles`` (the sketch twin)
    accepts error for one pass.

    Scale shape: :func:`..operators.quantiles.grouped_exact_quantiles`
    — per-(priority, 2²⁰-cent-bin) histogram (ONE corpus shuffle,
    output ≈ 5 × 57 rows regardless of fact count), rank location on
    that grid, then a broadcast of the 15-row selector back onto the
    facts so the only sort is the ≤1-bin candidate set per (group,
    percentile). NO per-group full sort anywhere — the definitional
    ROW_NUMBER form the DuckDB oracle runs is exactly the plan this
    rewrite exists to avoid, which makes it the right independent
    twin. Type-1 semantics: value at rank ceil(p·n/100), lower median
    for even n; all ranks in exact BIGINT arithmetic."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long").alias("cents"),
    )
    q = grouped_exact_quantiles(
        o, "priority", "cents", [25, 50, 75], _CENTS_BUCKET)
    pick = [
        F.min(F.when(F.col("q_pct") == p, F.col("q_val")))
        .alias(f"p{p}_cents")
        for p in (25, 50, 75)
    ]
    return (
        q.groupBy("priority")
        .agg(F.max("n").alias("n_orders"), *pick)
        .orderBy("priority")
    )


# --------------------------------------------- winsorized robust mean

_NATION_CENTS_REL = (
    "(SELECT n.n_name AS nation, "
    "CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents "
    "FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
    "JOIN nation n ON n.n_nationkey = c.c_nationkey)"
)


@query(
    "winsorized_nation_order_value",
    survey="ext-robust A2 A8 J4",
    tags=("tpch", "distribution"),
    oracle=f"""
        WITH base AS MATERIALIZED (
          SELECT * FROM {_NATION_CENTS_REL} t
        ),
        q AS (
{type1_quantile_sql("base", "nation", "cents", [5, 95])}
        ),
        lims AS (
          SELECT nation,
                 MIN(CASE WHEN q_pct = 5 THEN q_val END) AS p05_cents,
                 MIN(CASE WHEN q_pct = 95 THEN q_val END) AS p95_cents,
                 MAX(n) AS n_orders
          FROM q GROUP BY nation
        )
        SELECT b.nation,
               CAST(MAX(l.n_orders) AS BIGINT) AS n_orders,
               CAST(MAX(l.p05_cents) AS BIGINT) AS p05_cents,
               CAST(MAX(l.p95_cents) AS BIGINT) AS p95_cents,
               CAST(CAST(SUM(b.cents) AS HUGEINT) AS DOUBLE)
                 / CAST(MAX(l.n_orders) AS DOUBLE) AS mean_cents,
               CAST(CAST(SUM(GREATEST(l.p05_cents,
                                      LEAST(l.p95_cents, b.cents)))
                         AS HUGEINT) AS DOUBLE)
                 / CAST(MAX(l.n_orders) AS DOUBLE) AS win_mean_cents
        FROM base b JOIN lims l ON l.nation = b.nation
        GROUP BY b.nation ORDER BY b.nation
    """,
)
def winsorized_nation_order_value(
    spark: SparkSession, sf_dir: str,
) -> DataFrame:
    """Winsorized (p05/p95-clamped) mean order value per customer
    nation, next to the raw mean — the robust-statistics read of the
    reference's magnitude-by-country family
    (`05_magnitude_analysis.sql`): one whale order can move a raw
    nation mean double digits; the winsorized mean is the signal.

    Scale shape: the exact p05/p95 limits come from the same
    two-level histogram rank-select as ``exact_priority_quantiles``
    (no per-nation sort), and the 25-row limit relation BROADCASTS
    back onto the fact scan for the clamp — so the whole query is
    the orders→customer equi-join plus two corpus-sized aggregations.
    Determinism: clamps compare exact BIGINT cents; both means are
    one double division of exact decimal(38,0)-summed cents by the
    exact count (Spark's partial-agg order can't perturb a decimal
    sum); nation enrich broadcasts the 25-row dim."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation"),
    )
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), "c_nationkey")
        .select("nation", "cents")
    )
    lims = (
        grouped_exact_quantiles(base, "nation", "cents", [5, 95],
                                _CENTS_BUCKET)
        .groupBy("nation")
        .agg(
            F.min(F.when(F.col("q_pct") == 5, F.col("q_val")))
            .alias("p05_cents"),
            F.min(F.when(F.col("q_pct") == 95, F.col("q_val")))
            .alias("p95_cents"),
            F.max("n").alias("n_orders"),
        )
    )
    clamped = base.join(F.broadcast(lims), "nation").select(
        "nation", "cents", "p05_cents", "p95_cents", "n_orders",
        F.greatest("p05_cents", F.least("p95_cents", F.col("cents")))
        .alias("wc"),
    )
    dec = "decimal(38,0)"
    return (
        clamped.groupBy("nation")
        .agg(
            F.max("n_orders").alias("n_orders"),
            F.max("p05_cents").alias("p05_cents"),
            F.max("p95_cents").alias("p95_cents"),
            (F.sum(F.col("cents").cast(dec)).cast("double")
             / F.max("n_orders").cast("double")).alias("mean_cents"),
            (F.sum(F.col("wc").cast(dec)).cast("double")
             / F.max("n_orders").cast("double")).alias("win_mean_cents"),
        )
        .orderBy("nation")
    )


# --------------------------------------- trailing-7-day distinct users


@query(
    "rolling_7day_distinct_users",
    survey="ext-window A5 W6 P6",
    tags=("events", "distribution"),
    oracle="""
        WITH ed AS MATERIALIZED (
          SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
        ),
        days AS (SELECT DISTINCT d FROM ed)
        SELECT strftime(days.d, '%Y-%m-%d') AS day,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT)
                 AS active_users_7d
        FROM days JOIN ed e
          ON e.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
        GROUP BY days.d ORDER BY days.d
    """,
)
def rolling_7day_distinct_users(
    spark: SparkSession, sf_dir: str,
) -> DataFrame:
    """Trailing-7-day distinct active users per observed event day —
    the sliding-window engagement metric (WAU daily). DISTINCT over a
    sliding window has no window-function form (COUNT(DISTINCT) OVER
    RANGE is unsupported in both engines — and in T-SQL, which is why
    the reference never attempts it); the textbook distributed
    rewrite is CONTRIBUTION EXPLODE: each distinct (user, day) pair
    contributes to the ≤7 window-end days it is visible from, then
    one grouped COUNT(DISTINCT) per target day.

    Scale shape: dedup to (user, day) pairs first (one shuffle,
    output ≤ users×days), explode ×7 (narrow, no shuffle), semi-join
    to the observed-day domain (broadcast — days are bounded by the
    calendar), then Spark's two-phase distinct aggregation. Shuffle
    volume is 7×|pairs|, NEVER 7 self-joins of the fact table — the
    oracle runs the definitional range join instead, an independent
    derivation. Domain choice: days WITH events (a trailing window
    ending on a dead day is reportable as 0 only if a calendar grid
    is prescribed — that variant is ``events_hourly_gapfill``'s
    territory). Day canonicalizes to an ISO string on both engines."""
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        F.to_date("ts").alias("d"), "user_id").distinct()
    days = pairs.select("d").distinct().select(F.col("d").alias("day_d"))
    contrib = pairs.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("day_d"),
    )
    return (
        contrib.join(F.broadcast(days), "day_d", "left_semi")
        .groupBy("day_d")
        .agg(F.count_distinct("user_id").alias("active_users_7d"))
        .select(
            F.date_format("day_d", "yyyy-MM-dd").alias("day"),
            "active_users_7d",
        )
        .orderBy("day")
    )


# ------------------------------------- embedding dimension outliers

# floor(x · 2^10): exact in IEEE doubles (scaling by a power of two
# only shifts the exponent), so the quantization — and everything
# downstream, all integer — is bit-identical across engines.
_Q_SCALE = 1024
_OUTLIER_Z = 3  # flag |z| > 3, compared as dev² > 9·var_num — exact
_OUTLIER_TOPK = 50


@query(
    "embedding_dim_outliers",
    survey="ext-mlqa A2 A8 O3",
    tags=("embeddings", "distribution"),
    oracle=f"""
        WITH q AS MATERIALIZED (
          SELECT vec_id, label, i.i AS dim,
                 CAST(floor(CAST(embedding[i.i] AS DOUBLE) * {_Q_SCALE})
                      AS BIGINT) AS q
          FROM embeddings,
               (SELECT unnest(generate_series(1, 64)) AS i) i
        ),
        st AS (
          SELECT dim,
                 CAST(COUNT(*) AS HUGEINT) AS n,
                 CAST(SUM(q) AS HUGEINT) AS s,
                 CAST(SUM(CAST(q AS HUGEINT) * q) AS HUGEINT) AS ss
          FROM q GROUP BY dim
        )
        SELECT vec_id, label,
               CAST(SUM(CASE WHEN
                 (st.n * q.q - st.s) * (st.n * q.q - st.s)
                   > {_OUTLIER_Z * _OUTLIER_Z} * (st.n * st.ss - st.s * st.s)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outlier_dims
        FROM q JOIN st USING (dim)
        GROUP BY vec_id, label
        HAVING n_outlier_dims >= 1
        ORDER BY n_outlier_dims DESC, vec_id
        LIMIT {_OUTLIER_TOPK}
    """,
)
def embedding_dim_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding vectors that are PER-DIMENSION anomalies: for each of
    the 64 dimensions, corpus mean/variance; a (vector, dim) cell is
    an outlier when |z| > {z}; report the top-{k} vectors by outlier-
    dim count. The feature-quality audit a training pipeline runs
    before trusting an embedding column for semantic dedup or ANN —
    the per-dim twin of the whole-vector ``embedding_drift_by_label``.

    Exactness at scale: z-scores over floats would need a cross-row
    float sum (order-dependent). Instead every value quantizes to
    ``floor(x·2¹⁰)`` (exact — power-of-two scale), and the z test
    algebraically clears denominators: |q − s/n| > z·sqrt((ss −
    s²/n)/n)  ⟺  (n·q − s)² > z²·(n·ss − s²) — ALL integer, no
    division, no sqrt, so partial-agg order is immaterial and the
    DuckDB twin matches bit-for-bit (HUGEINT there, decimal(38,0)
    here; products reach ~10²¹ at 100 TB corpus sizes, past BIGINT).

    Plan shape: posexplode → one 64-row groupBy(dim) stats pass →
    the 64-row stats relation BROADCASTS back onto the exploded scan
    → grouped flag-count per vector → sort+limit top-{k}
    (TakeOrderedAndProject). Two corpus-sized passes, both narrow."""
    e = load_table(spark, sf_dir, "embeddings")
    dec = "decimal(38,0)"
    q = e.select(
        "vec_id", "label",
        F.posexplode("embedding").alias("dim0", "x"),
    ).select(
        "vec_id", "label",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("x").cast("double") * _Q_SCALE)
        .cast("long").alias("q"),
    )
    st = q.groupBy("dim").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("q").cast(dec).alias("s"),
        F.sum(F.col("q").cast(dec) * F.col("q")).cast(dec).alias("ss"),
    )
    dev = F.col("n") * F.col("q") - F.col("s")
    var_num = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    flagged = q.join(F.broadcast(st), "dim").select(
        "vec_id", "label",
        F.when(dev * dev > F.lit(_OUTLIER_Z * _OUTLIER_Z) * var_num, 1)
        .otherwise(0).alias("is_out"),
    )
    return (
        flagged.groupBy("vec_id", "label")
        .agg(F.sum("is_out").cast("long").alias("n_outlier_dims"))
        .filter(F.col("n_outlier_dims") >= 1)
        .orderBy(F.col("n_outlier_dims").desc(), "vec_id")
        .limit(_OUTLIER_TOPK)
    )


embedding_dim_outliers.__doc__ = embedding_dim_outliers.__doc__.format(
    z=_OUTLIER_Z, k=_OUTLIER_TOPK)


# ------------------------------------------- scalable NTILE deciles

# Lifetime totals span ~[0, 2.4e9] cents (TPC-H: per-customer order
# count is SF-invariant): 2^24-cent (~$168k) bins keep the boundary
# histogram ≈ 150 rows while bounding each in-bin residual sort.
_LTV_BUCKET = 1 << 24


@query(
    "customer_value_deciles_scalable",
    survey="ext-window W3 A2 O1",
    tags=("tpch", "distribution"),
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
def customer_value_deciles_scalable(
    spark: SparkSession, sf_dir: str,
) -> DataFrame:
    """``customer_value_deciles`` with the NTILE global sort REMOVED:
    the scale-safe twin, gated against the SAME definitional
    ntile-window oracle — the NTILE counterpart of the W2 pair
    (``gold_dim_customers`` / ``gold_dim_customers_scalable_sk``).
    The original documents its global window as "inherent to NTILE";
    :func:`..operators.quantiles.scalable_ntile` shows it isn't: the
    9 exact boundary PAIRS (total, custkey) at the ntile cut ranks —
    remainder rule included — come from two-level histogram
    rank-select, broadcast as one row, and every customer's decile is
    9 pair comparisons. No stage sorts more than one 2²⁴-cent bin's
    customers; boundary-pair correctness under ties is the property
    test's job (equal totals straddling a cut rank must split by
    custkey exactly as NTILE splits them)."""
    from ..operators.quantiles import scalable_ntile

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(
                F.sum(
                    F.floor(F.col("o_totalprice") * F.lit(100.0)
                            + F.lit(0.5)).cast("long")
                ),
                F.lit(0).cast("long"),
            ).alias("total_cents")
        )
    )
    tiled = scalable_ntile(
        per_cust, "total_cents", "c_custkey", 10, _LTV_BUCKET)
    return (
        tiled.groupBy(F.col("tile").alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum("total_cents").cast("double") / F.lit(100.0))
            .alias("decile_revenue"),
        )
        .orderBy("decile")
    )


# --------------------------------------- EWMA with exact dyadic weights

# α = 1/2 makes every EWMA weight a power of two, so the recursion
# E_t = (E_{t-1} + v_t)/2 clears denominators EXACTLY:
#   2^(T-1) · E_T = v_1 + Σ_{k=2..T} 2^(k-2) · v_k
# — numerator and denominator are exact integers and the reported
# EWMA is one double division. Weights reach 2^(T-2), so the
# numerator is ≤ 2^(T-1)·v_max; with month-revenue ≤ ~10¹¹ cents it
# stays inside decimal(38,0)/HUGEINT (~10³⁸) only while
# 2^(T-1) ≤ 10²⁷, i.e. T ≤ ~90 months (ADVICE r7 #1 corrected the
# earlier ~120 claim: 2^119·10¹¹ ≈ 6.6×10⁴⁶ overflows). TPC-H spans
# ~84 months, inside the bound — and because Spark decimal overflow
# is a SILENT NULL (non-ANSI) while DuckDB HUGEINT raises, the
# builder enforces t ≤ 90 with assert_true so a longer series fails
# loudly on BOTH engines instead of diverging. Each power of two is
# built as a PRODUCT OF TWO LONG SHIFTS (each half-exponent ≤ 62),
# never a float power() cast.
# integer division MUST be div/// — engine "/" on ints is float
# division and CAST of the .5 halves rounds in DuckDB but truncates
# in Spark (measured divergence at t=5)
_EWMA_W = ("CAST(shiftleft(CAST(1 AS BIGINT),"
           " CAST(({t} - 2) div 2 AS INT)) AS DECIMAL(38,0))"
           " * CAST(shiftleft(CAST(1 AS BIGINT),"
           " CAST(({t} - 2) - ({t} - 2) div 2 AS INT)) AS DECIMAL(38,0))")
_EWMA_W_SQL = ("(1::HUGEINT << CAST(({t} - 2) // 2 AS INT))"
               " * (1::HUGEINT << CAST(({t} - 2) - ({t} - 2) // 2 AS INT))")


@query(
    "ewma_monthly_revenue",
    survey="ext-timeseries A4 W6 W5",
    tags=("tpch", "distribution", "timeseries"),
    oracle=f"""
        WITH m AS MATERIALIZED (
          SELECT n.n_name AS nation, strftime(o.o_orderdate, '%Y-%m') AS ym,
                 CAST(SUM(CAST(floor(o.o_totalprice * 100.0 + 0.5)
                               AS BIGINT)) AS BIGINT) AS rev_cents
          FROM orders o
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n ON n.n_nationkey = c.c_nationkey
          GROUP BY nation, ym
        ),
        t AS (
          SELECT nation, ym, rev_cents,
                 CAST(ROW_NUMBER() OVER (PARTITION BY nation ORDER BY ym)
                      AS BIGINT) AS t
          FROM m
        ),
        w AS (
          -- domain guard mirroring the builder's assert_true (ADVICE
          -- r8 #2): with small revenues HUGEINT keeps producing rows
          -- out to t~120+ while Spark raises at 91 — both engines
          -- must reject the same inputs, so the oracle errors at
          -- t > 90 unconditionally too (error() is branch-lazy).
          SELECT nation, ym, rev_cents, t,
                 CASE WHEN t > 90 THEN error('ewma_monthly_revenue: '
                        || 't > 90 months overflows decimal(38,0) — '
                        || 'rescale revenue or re-window')
                      WHEN t = 1 THEN 1::HUGEINT
                      ELSE {_EWMA_W_SQL.format(t="t")} END
                   AS wt
          FROM t
        )
        SELECT nation, ym, rev_cents,
               CAST(SUM(wt * rev_cents) OVER (PARTITION BY nation
                      ORDER BY ym ROWS UNBOUNDED PRECEDING)
                    // CASE WHEN t = 1 THEN 1::HUGEINT
                       ELSE {_EWMA_W_SQL.format(t="t + 1")} END
                    AS BIGINT) AS ewma_cents
        FROM w
        ORDER BY nation, ym
    """,
)
def ewma_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of monthly revenue per
    nation (α = 1/2, E_1 = v_1) — the smoothing companion to the OLS
    trend (``nation_revenue_trend_ols``) and the seasonal index
    (``nation_revenue_seasonality``): trend fits the level, EWMA
    tracks it with recency bias. α = 1/2 is the EXACTNESS choice:
    every weight is a power of two, so the whole recursion is
    integer arithmetic — reported floored to whole cents — and the
    cross-engine gate is bit-for-bit (the
    dyadic-denominator analogue of the pre-log PMI trick) — see the
    module block above for the cleared-denominator identity and the
    decimal(38,0) overflow bound.

    Scale shape: one corpus-sized aggregation to (nation, month) —
    everything after runs on the ≤ nations × months grid (the window
    cumsum partitions are ~80 rows). Denominator 2^(T-1) arrives as
    the same two-shift product as the weights, with the t+1 offset
    (2^((t+1)-2) = 2^(t-1))."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation"),
    )
    m = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), "c_nationkey")
        .groupBy(
            "nation",
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
                .cast("long")
            ).cast("long").alias("rev_cents")
        )
    )
    wn = Window.partitionBy("nation").orderBy("ym")
    t = m.withColumn("t", F.row_number().over(wn).cast("long"))
    wt = F.when(
        F.col("t") == 1, F.lit(1).cast("decimal(38,0)")
    ).otherwise(F.expr(_EWMA_W.format(t="t")))
    den = F.when(
        F.col("t") == 1, F.lit(1).cast("decimal(38,0)")
    ).otherwise(F.expr(_EWMA_W.format(t="t + 1")))
    cum = Window.partitionBy("nation").orderBy("ym").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    # Overflow guard (ADVICE r7 #1): past ~90 months 2^(t-1)·v_max
    # exceeds decimal(38,0) and Spark would NULL silently where
    # DuckDB raises. assert_true returns NULL on success, raises on
    # violation; coalesce keeps it in the plan at zero cost. The
    # oracle mirrors the SAME t<=90 domain check with error()
    # (ADVICE r8 #2), so for 91+-month inputs both engines reject —
    # DuckDB no longer returns data where Spark raises.
    guard = F.assert_true(
        F.col("t") <= F.lit(90),
        F.lit("ewma_monthly_revenue: t > 90 months overflows"
              " decimal(38,0) — rescale revenue or re-window"),
    )
    return (
        t.withColumn("num", F.sum(wt * F.col("rev_cents")).over(cum))
        .withColumn("den", den)
        .select(
            "nation", "ym", "rev_cents",
            # FLOOR division of exact integers (whole cents): the
            # ~2^80-scale numerator does NOT round-trip through double
            # identically in Spark decimal vs DuckDB HUGEINT (measured
            # ulp drift) — integer division sidesteps the conversion
            F.coalesce(
                guard.cast("bigint"),
                F.expr("CAST(num div den AS BIGINT)"),
            ).alias("ewma_cents"),
        )
        .orderBy("nation", "ym")
    )


# ----------------------------------- funnel conversion-time quantiles

_FUNNEL_SEC_BUCKET = 1 << 15  # ~9.1h bins over a ≤month span


@query(
    "funnel_conversion_time_quantiles",
    survey="ext-funnel ext-quantile A1 W1",
    tags=("events", "distribution"),
    oracle=f"""
        WITH conv AS MATERIALIZED (
          SELECT v.user_id,
                 CAST(date_diff('second', v.first_view, p.first_purchase)
                      AS BIGINT) AS delta_sec
          FROM (SELECT user_id, MIN(ts) AS first_view FROM events
                WHERE event_type = 'view' GROUP BY user_id) v
          JOIN (SELECT e.user_id, MIN(e.ts) AS first_purchase
                FROM events e
                JOIN (SELECT user_id, MIN(ts) AS first_view FROM events
                      WHERE event_type = 'view' GROUP BY user_id) fv
                  ON fv.user_id = e.user_id
                WHERE e.event_type = 'purchase' AND e.ts >= fv.first_view
                GROUP BY e.user_id) p
            ON p.user_id = v.user_id
        ),
        q AS (
{type1_quantile_sql("(SELECT CAST(1 AS INT) AS g, delta_sec FROM conv) c",
                    "g", "delta_sec", [50, 90, 99])}
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
               CAST(MIN(CASE WHEN q_pct = 50 THEN q_val END) AS BIGINT)
                 AS p50_sec,
               CAST(MIN(CASE WHEN q_pct = 90 THEN q_val END) AS BIGINT)
                 AS p90_sec,
               CAST(MIN(CASE WHEN q_pct = 99 THEN q_val END) AS BIGINT)
                 AS p99_sec
        FROM q
    """,
)
def funnel_conversion_time_quantiles(
    spark: SparkSession, sf_dir: str,
) -> DataFrame:
    """EXACT p50/p90/p99 of view→purchase conversion time — the
    latency-distribution companion to the count-based
    ``funnel_view_click_purchase``: a conversion RATE hides whether
    converts take minutes or weeks. Conversion = each user's first
    purchase at-or-after their first view; deltas are exact integer
    seconds.

    Scale shape: two grouped MIN aggregations (shuffles key on
    user_id), an equi-join, then
    :func:`..operators.quantiles.grouped_exact_quantiles` over the
    per-user deltas with a constant group — the single-group case is
    exactly where a definitional ROW_NUMBER form degenerates to ONE
    partition holding every user (the oracle runs precisely that, on
    purpose), while the histogram rank-select sorts only the one
    ~9-hour bin per percentile."""
    ev = load_table(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("first_view"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id").agg(F.min("ts").alias("first_purchase"))
    )
    conv = fv.join(fp, "user_id").select(
        F.lit(1).alias("g"),
        (F.unix_timestamp("first_purchase")
         - F.unix_timestamp("first_view")).cast("long")
        .alias("delta_sec"),
    )
    q = grouped_exact_quantiles(
        conv, "g", "delta_sec", [50, 90, 99], _FUNNEL_SEC_BUCKET)
    return q.groupBy().agg(
        F.max("n").alias("n_converted"),
        *[
            F.min(F.when(F.col("q_pct") == p, F.col("q_val")))
            .alias(f"p{p}_sec")
            for p in (50, 90, 99)
        ],
    )


# ------------------------------- Kolmogorov-Smirnov two-sample test

_KS_SEG_A = "AUTOMOBILE"
_KS_SEG_B = "BUILDING"


@query(
    "ks_test_order_value_segments",
    survey="ext-stats A2 W6 P7",
    tags=("tpch", "distribution", "stats"),
    oracle=f"""
        WITH v AS MATERIALIZED (
          SELECT CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
                   AS cents,
                 CAST(c.c_mktsegment = '{_KS_SEG_A}' AS INT) AS a,
                 CAST(c.c_mktsegment = '{_KS_SEG_B}' AS INT) AS b
          FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          WHERE c.c_mktsegment IN ('{_KS_SEG_A}', '{_KS_SEG_B}')
        ),
        s AS (
          SELECT cents, CAST(SUM(a) AS BIGINT) AS g1,
                 CAST(SUM(b) AS BIGINT) AS g2
          FROM v GROUP BY cents
        ),
        tot AS (SELECT CAST(SUM(g1) AS BIGINT) AS n1,
                       CAST(SUM(g2) AS BIGINT) AS n2 FROM s),
        w AS (
          SELECT cents,
                 abs(CAST(SUM(g1) OVER (ORDER BY cents) AS HUGEINT)
                       * (SELECT n2 FROM tot)
                     - CAST(SUM(g2) OVER (ORDER BY cents) AS HUGEINT)
                       * (SELECT n1 FROM tot)) AS dev
          FROM s
        ),
        m AS (SELECT MAX(dev) AS ks_num FROM w)
        SELECT tot.n1, tot.n2,
               CAST(m.ks_num AS BIGINT) AS ks_num,
               CAST(m.ks_num AS DOUBLE)
                 / (CAST(tot.n1 AS DOUBLE) * CAST(tot.n2 AS DOUBLE))
                 AS ks_stat,
               (SELECT CAST(MIN(cents) AS BIGINT) FROM w, m
                WHERE w.dev = m.ks_num) AS argmax_cents
        FROM tot CROSS JOIN m
    """,
)
def ks_test_order_value_segments(
    spark: SparkSession, sf_dir: str,
) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov statistic between the
    {a} and {b} market segments' order-value distributions — the
    distribution-DRIFT test behind data-quality monitors and segment
    A/B reads (``corpus_drift_stat`` is the embedding-space analogue;
    this is the classic univariate form). D = max over observed
    values of |F₁(v) − F₂(v)|, reported with the exact integer
    numerator max|c₁(v)·n₂ − c₂(v)·n₁| (no float ECDFs — the division
    happens ONCE on the final 1-row relation) plus the value where
    the gap peaks (min such value — a total order).

    Scale shape: the same two-level decomposition as the quantile
    helper — per-(2²⁰-cent-bin, value) counts in one shuffle,
    cross-bin cumulative offsets on the BIN grid (grid-sized window),
    in-bin running sums over per-bin partitions bounded by bin
    occupancy, then one max aggregation. The oracle runs the
    definitional single global cumulative window instead — the plan
    this rewrite avoids, hence an independent derivation. Overflow:
    c·n products reach ~10¹⁸ at 100 TB — decimal(38,0)/HUGEINT on
    both sides."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    v = (
        o.join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isin(_KS_SEG_A, _KS_SEG_B))
        .select(
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
            .cast("long").alias("cents"),
            (F.col("c_mktsegment") == _KS_SEG_A).cast("int").alias("a"),
            (F.col("c_mktsegment") == _KS_SEG_B).cast("int").alias("b"),
        )
    )
    s = (
        v.withColumn("bin", F.expr(f"cents div {_CENTS_BUCKET}"))
        .groupBy("bin", "cents")
        .agg(F.sum("a").alias("g1"), F.sum("b").alias("g2"))
    )
    # cross-bin offsets on the bin grid (grid-sized window)
    bins = s.groupBy("bin").agg(
        F.sum("g1").alias("t1"), F.sum("g2").alias("t2"))
    wb = Window.orderBy("bin")
    offs = bins.select(
        "bin",
        (F.sum("t1").over(wb) - F.col("t1")).alias("off1"),
        (F.sum("t2").over(wb) - F.col("t2")).alias("off2"),
    )
    tot = bins.agg(
        F.sum("t1").cast("long").alias("n1"),
        F.sum("t2").cast("long").alias("n2"))
    wi = Window.partitionBy("bin").orderBy("cents")
    dec = "decimal(38,0)"
    dev_rel = (
        s.join(F.broadcast(offs), "bin")
        .crossJoin(F.broadcast(tot))
        .select(
            "cents",
            F.abs(
                (F.col("off1") + F.sum("g1").over(wi)).cast(dec)
                * F.col("n2")
                - (F.col("off2") + F.sum("g2").over(wi)).cast(dec)
                * F.col("n1")
            ).alias("dev"),
            "n1", "n2",
        )
        # branch point: feeds the max AND the argmax scan
        .localCheckpoint(eager=True)
    )
    m = dev_rel.agg(F.max("dev").alias("ks_num"))
    return (
        dev_rel.crossJoin(F.broadcast(m))
        .groupBy("n1", "n2")
        .agg(
            F.max("ks_num").cast("long").alias("ks_num"),
            (F.max("ks_num").cast("double")
             / (F.col("n1").cast("double") * F.col("n2").cast("double")))
            .alias("ks_stat"),
            F.min(F.when(F.col("dev") == F.col("ks_num"),
                         F.col("cents"))).alias("argmax_cents"),
        )
        .select("n1", "n2", "ks_num", "ks_stat", "argmax_cents")
    )


ks_test_order_value_segments.__doc__ = (
    ks_test_order_value_segments.__doc__.format(a=_KS_SEG_A, b=_KS_SEG_B))


# --------------------------------------------- weighted quantiles

# p_retailprice cents live in [90000, 99991) (TPC-H price model):
# 2^9-cent (~$5) bins give ~20 histogram buckets per brand.
_PRICE_BUCKET = 1 << 9

_BRAND_QTY_REL = (
    "(SELECT p.p_brand AS brand, "
    "CAST(floor(p.p_retailprice * 100.0 + 0.5) AS BIGINT) AS price_cents, "
    "CAST(l.l_quantity AS BIGINT) AS qty "
    "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey)"
)


@query(
    "weighted_median_unit_price",
    survey="ext-quantile A2 J4 W6",
    tags=("tpch", "distribution"),
    oracle=f"""
        WITH q AS (
{weighted_type1_quantile_sql(_BRAND_QTY_REL, "brand", "price_cents",
                             "qty", [50, 90])}
        )
        SELECT brand,
               CAST(MAX(w_total) AS BIGINT) AS units_sold,
               CAST(MIN(CASE WHEN q_pct = 50 THEN q_val END) AS BIGINT)
                 AS wp50_cents,
               CAST(MIN(CASE WHEN q_pct = 90 THEN q_val END) AS BIGINT)
                 AS wp90_cents
        FROM q GROUP BY brand ORDER BY brand
    """,
)
def weighted_median_unit_price(
    spark: SparkSession, sf_dir: str,
) -> DataFrame:
    """QUANTITY-WEIGHTED median (and p90) retail price per brand —
    "the price at which half the UNITS ship", not half the catalog
    rows: the demand-weighted read of the reference's cost-range
    bucketing (`10_data_segmentation.sql` slices the catalog; this
    slices the FLOW). Weighted type-1 semantics and the positive-
    integer-weight precondition live on
    :func:`..operators.quantiles.grouped_weighted_quantiles`.

    Scale shape: the part→lineitem equi-join feeds a pre-aggregation
    to DISTINCT (brand, price) with summed unit weights — ~catalog-
    sized, not fact-sized — then the same two-level histogram
    rank-select as the unweighted family (counts → weight sums, ~20
    price bins per brand), selector broadcast, in-bucket cumulative
    walk over ≤1 bin's distinct prices. The oracle is the
    definitional single cumulative-weight window."""
    from ..operators.quantiles import grouped_weighted_quantiles

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.col("l_quantity").cast("long").alias("qty"))
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_brand").alias("brand"),
        F.floor(F.col("p_retailprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long").alias("price_cents"),
    )
    base = li.join(p, "l_partkey").select("brand", "price_cents", "qty")
    q = grouped_weighted_quantiles(
        base, "brand", "price_cents", "qty", [50, 90], _PRICE_BUCKET)
    return (
        q.groupBy("brand")
        .agg(
            F.max("w_total").alias("units_sold"),
            F.min(F.when(F.col("q_pct") == 50, F.col("q_val")))
            .alias("wp50_cents"),
            F.min(F.when(F.col("q_pct") == 90, F.col("q_val")))
            .alias("wp90_cents"),
        )
        .orderBy("brand")
    )


# --------------------------------------------------- grouped mode


@query(
    "brand_size_mode",
    survey="ext-stats A2 A3 O1",
    tags=("tpch", "distribution", "stats"),
    oracle="""
        WITH c AS (
          SELECT p_brand AS brand, CAST(p_size AS BIGINT) AS size_v,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM part GROUP BY brand, size_v
        ),
        r AS (
          SELECT brand, size_v, n,
                 ROW_NUMBER() OVER (PARTITION BY brand
                                    ORDER BY n DESC, size_v) AS rk
          FROM c
        )
        SELECT brand, size_v AS mode_size, n AS n_at_mode
        FROM r WHERE rk = 1 ORDER BY brand
    """,
)
def brand_size_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal part size per brand (most frequent value; smallest size
    wins ties) — the MODE aggregate the reference's magnitude family
    never reaches for because T-SQL lacks it. At scale mode is TWO
    grouped aggregations, never a sort: count per (group, value),
    then per-group argmax as ``MAX(struct(n, -value, value))`` —
    lexicographic struct comparison encodes the (count DESC, value
    ASC) tiebreak, so the pick is total-ordered and the plan is all
    map-side-combinable hash aggregates (the oracle's definitional
    ranked window is exactly the per-group sort this avoids)."""
    c = (
        load_table(spark, sf_dir, "part")
        .groupBy(F.col("p_brand").alias("brand"),
                 F.col("p_size").cast("long").alias("size_v"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    best = c.groupBy("brand").agg(
        F.max(F.struct(
            F.col("n"),
            (-F.col("size_v")).alias("neg_size"),
            F.col("size_v"),
        )).alias("b")
    )
    return best.select(
        "brand",
        F.col("b.size_v").alias("mode_size"),
        F.col("b.n").alias("n_at_mode"),
    ).orderBy("brand")


# ------------------------------------------ trailing-window anomalies

_ANOM_WIN = 24  # trailing hours
_ANOM_Z = 3


@query(
    "hourly_event_anomalies",
    survey="ext-timeseries A4 W6 P8",
    tags=("events", "distribution", "timeseries"),
    oracle=f"""
        WITH h AS (
          SELECT date_trunc('hour', ts) AS hr,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1
        ),
        w AS (
          SELECT hr, c,
                 CAST(COUNT(c) OVER tw AS BIGINT) AS n,
                 CAST(SUM(c) OVER tw AS BIGINT) AS s,
                 SUM(CAST(c AS HUGEINT) * c) OVER tw AS ss
          FROM h
          WINDOW tw AS (ORDER BY hr
                        ROWS BETWEEN {_ANOM_WIN} PRECEDING
                                 AND 1 PRECEDING)
        )
        SELECT hr AS hour_start, c AS n_events,
               s AS trail_sum, n AS trail_n
        FROM w
        WHERE n = {_ANOM_WIN}
          AND (n::HUGEINT * c - s) * (n::HUGEINT * c - s)
                > {_ANOM_Z * _ANOM_Z} * (n::HUGEINT * ss - s::HUGEINT * s)
        ORDER BY hr
    """,
)
def hourly_event_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours whose event volume is a >{z}σ anomaly against the
    TRAILING {w}-hour window — the ops-monitoring alert rule, next to
    the per-type distributional ``event_value_anomalies`` (population
    z there, trailing-window z here: a ramping series flags there
    long after it flagged here). Only fully-warmed hours judge
    (exactly {w} trailing points), so the first day is calibration,
    not alerts.

    Exactness: the z test clears denominators — |c − s/n| > z·σ ⟺
    (n·c − s)² > z²·(n·ss − s²) — ALL integer (the
    ``embedding_dim_outliers`` identity on a time axis), so no float
    ever crosses the gate. The cleared-denominator products run in
    decimal(38,0) (Spark) / HUGEINT (DuckDB), not int64 (ADVICE r7
    #2): dev² ≤ (24·c)² overflows int64 once an hour exceeds ~1.3e8
    events, where non-ANSI Spark would wrap silently while DuckDB
    errors — the same wide-integer guard as the rest of the
    cleared-denominator family. The ss ACCUMULATION is widened too
    (ADVICE r8 #1): a bare int64 ``SUM(c·c)`` would wrap past
    c ≈ 6.8e8 events/hour before the cleared products ever ran. The
    remaining ceiling is the 38-digit type itself: dev² ≤ (24·c)²
    crosses decimal(38,0)/HUGEINT at c ≈ 4e17 events/hour (Spark
    NULLs the product and silently drops the row; DuckDB raises) —
    stated as the domain bound, ~9 orders beyond any hourly count
    the int64 ingest path could produce. Scale shape: one corpus-sized hourly
    aggregate; the trailing window runs over the HOUR GRID (720 rows
    per month regardless of event count — the unpartitioned window is
    grid-sized by construction, same argument as the gapfill
    family)."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("c"))
    tw = Window.orderBy("hr").rowsBetween(-_ANOM_WIN, -1)
    w = h.select(
        "hr", "c",
        F.count("c").over(tw).alias("n"),
        F.sum("c").over(tw).alias("s"),
        # ss accumulates WIDE (ADVICE r8 #1): a bare int64 SUM(c*c)
        # wraps silently in non-ANSI Spark past c ~ 6.8e8 events/hour
        # while the oracle's HUGEINT raises — widen BEFORE squaring so
        # both engines agree out to the count column's own range.
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .over(tw).alias("ss"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    sd = F.col("s").cast("decimal(38,0)")
    dev = nd * F.col("c") - sd
    var_num = nd * F.col("ss") - sd * F.col("s")
    return (
        w.filter(
            (F.col("n") == _ANOM_WIN)
            & (dev * dev > F.lit(_ANOM_Z * _ANOM_Z) * var_num)
        )
        .select(
            F.col("hr").alias("hour_start"),
            F.col("c").alias("n_events"),
            F.col("s").alias("trail_sum"),
            F.col("n").alias("trail_n"),
        )
        .orderBy("hour_start")
    )


hourly_event_anomalies.__doc__ = hourly_event_anomalies.__doc__.format(
    z=_ANOM_Z, w=_ANOM_WIN)


# --------------------------------- position-weighted attribution

# U-shaped (position-based) multi-touch credit in exact integer
# micros, summing to exactly 1,000,000 per conversion:
#   n=1 click  → 1,000,000
#   n=2 clicks → 500,000 / 500,000
#   n≥3        → first 400,000, last 400,000, each middle
#                200,000 div (n−2), remainder to the EARLIEST middle
# — every branch is integer arithmetic with a stated tie rule, so the
# credit ledger hash-gates and audits to the conversion count.
_ATTR_WINDOW_DAYS = 7


@query(
    "position_weighted_attribution",
    survey="ext-attribution A4 W1 J-range",
    tags=("events", "distribution"),
    oracle=f"""
        WITH conv AS MATERIALIZED (
          SELECT event_id AS conv_id, user_id, ts AS conv_ts
          FROM events WHERE event_type = 'purchase'
        ),
        touch AS MATERIALIZED (
          SELECT c.conv_id, e.event_id AS click_id,
                 CAST(e.ts AS DATE) AS click_day,
                 ROW_NUMBER() OVER (PARTITION BY c.conv_id
                                    ORDER BY e.ts, e.event_id) AS pos,
                 COUNT(*) OVER (PARTITION BY c.conv_id) AS n
          FROM conv c JOIN events e
            ON e.user_id = c.user_id AND e.event_type = 'click'
           AND e.ts <= c.conv_ts
           AND e.ts >= c.conv_ts - INTERVAL {_ATTR_WINDOW_DAYS} DAY
        ),
        credit AS (
          SELECT click_day,
                 CASE WHEN n = 1 THEN 1000000
                      WHEN n = 2 THEN 500000
                      WHEN pos = 1 OR pos = n THEN 400000
                      ELSE 200000 // (n - 2)
                           + CASE WHEN pos = 2
                                  THEN 200000 % (n - 2) ELSE 0 END
                 END AS micros
          FROM touch
        )
        SELECT strftime(click_day, '%Y-%m-%d') AS day,
               CAST(SUM(micros) AS BIGINT) AS credit_micros,
               CAST(SUM(micros) AS DOUBLE) / 1000000.0
                 AS attributed_conversions
        FROM credit
        GROUP BY click_day ORDER BY day
    """,
)
def position_weighted_attribution(
    spark: SparkSession, sf_dir: str,
) -> DataFrame:
    """U-shaped multi-touch attribution: every purchase's credit
    splits across the user's clicks in the prior {d} days — 40/20/40
    between first touch, middles, and last touch — and the ledger
    aggregates to attributed conversions per click DAY. The
    multi-touch generalization of the single-touch
    ``events_asof_attribution`` (last-touch over-credits the final
    click; U-shaped is the standard corrective). Credit arithmetic
    and the remainder rule are on the module block above — exact
    micros, Σ = 1,000,000 per conversion, so SUM(credit)/1e6 audits
    to the attributed-conversion count.

    Scale shape: the conversion→click match is an equi-join on
    user_id with the time window as a filter predicate (per-user
    event history is bounded — the sessionize argument; never a
    nested-loop range join), position/count from one window pass
    partitioned by conversion (per-partition rows = clicks in one
    {d}-day window), then a grouped integer sum over click days."""
    ev = load_table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"), "user_id",
        F.col("ts").alias("conv_ts"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts"))
    touch = (
        conv.join(clicks, "user_id")
        .filter(
            (F.col("ts") <= F.col("conv_ts"))
            & (F.col("ts") >= F.col("conv_ts")
               - F.expr(f"INTERVAL {_ATTR_WINDOW_DAYS} DAYS"))
        )
        .select("conv_id", "click_id",
                F.to_date("ts").alias("click_day"), "ts")
    )
    wp = Window.partitionBy("conv_id").orderBy("ts", "click_id")
    wn = Window.partitionBy("conv_id")
    pos = touch.select(
        "click_day",
        F.row_number().over(wp).alias("pos"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    micros = (
        F.when(F.col("n") == 1, 1000000)
        .when(F.col("n") == 2, 500000)
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")), 400000)
        .otherwise(
            F.expr("200000 div (n - 2)")
            + F.when(F.col("pos") == 2,
                     F.expr("200000 % (n - 2)")).otherwise(0)
        )
    )
    return (
        pos.select(
            F.date_format("click_day", "yyyy-MM-dd").alias("day"),
            micros.alias("micros"),
        )
        .groupBy("day")
        .agg(
            F.sum("micros").cast("long").alias("credit_micros"),
            (F.sum("micros").cast("double") / F.lit(1000000.0))
            .alias("attributed_conversions"),
        )
        .orderBy("day")
    )


position_weighted_attribution.__doc__ = (
    position_weighted_attribution.__doc__.format(d=_ATTR_WINDOW_DAYS))


# ------------------------------------------ leave-one-out encoding


@query(
    "loo_target_encoding",
    survey="ext-training A2 J4 W9",
    tags=("tpch", "distribution", "training"),
    oracle="""
        WITH base AS MATERIALIZED (
          SELECT o.o_orderkey, n.n_name AS nation,
                 CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
                   AS cents
          FROM orders o
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n ON n.n_nationkey = c.c_nationkey
        ),
        g AS (
          SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(cents) AS BIGINT) AS s
          FROM base GROUP BY nation
        )
        SELECT b.o_orderkey, b.nation, b.cents,
               CAST(g.s - b.cents AS DOUBLE)
                 / CAST(g.n - 1 AS DOUBLE) AS loo_mean_cents
        FROM base b JOIN g ON g.nation = b.nation
        WHERE g.n > 1
    """,
)
def loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAVE-ONE-OUT target encoding of the nation category against
    order value: each order's feature is the mean of the OTHER
    orders in its nation, (Σ − own)/(n − 1) — the standard
    leakage-free categorical encoding for tabular model training
    (a plain group mean leaks each row's own target into its
    feature; LOO is the one-line fix, and the fact that it's exact
    algebra — no per-row re-aggregation — is why it scales). The
    row-level sibling of the SCD2/split-leakage family's
    leakage-prevention theme.

    Scale shape: one grouped aggregate to the 25-row (nation, n, Σ)
    relation, broadcast back onto the fact scan — each row's encode
    is two exact-integer reads plus ONE division (deterministic:
    exact BIGINT numerator and denominator, single double op).
    Output is row-level by design — it's a FEATURE COLUMN — so the
    gate hashes the full encoded relation, not a summary."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation"),
    )
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), "c_nationkey")
        .select("o_orderkey", "nation", "cents")
    )
    g = base.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
    return (
        base.join(F.broadcast(g), "nation")
        .filter(F.col("n") > 1)
        .select(
            "o_orderkey", "nation", "cents",
            ((F.col("s") - F.col("cents")).cast("double")
             / (F.col("n") - 1).cast("double")).alias("loo_mean_cents"),
        )
    )
