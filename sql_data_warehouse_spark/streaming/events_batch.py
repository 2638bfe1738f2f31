"""Batch-equivalent event analytics — the SQL-checkable twins of the
Structured Streaming jobs in ``streaming/jobs.py``. Same
transformations, same results; the streaming versions add watermarks
and incremental state.

Beyond-reference surface (the reference is batch-only): tumbling
windows, gap-based sessionization, JSON property extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..analytics.registry import query
from ..analytics.xengine import MICRO_SUM_SQL, micro_sum
from ..sources import load_table

SESSION_GAP_MIN = 30


@query(
    "events_tumbling_hourly",
    survey="ext-stream A4",
    tags=("streaming",),
    oracle=f"""
        SELECT date_trunc('hour', ts) AS window_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               {MICRO_SUM_SQL.format(expr="value")} AS total_value,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation — the batch twin of the
    streaming job (F.window == date_trunc for tumbling windows).
    MIN/MAX on raw doubles are exact (no arithmetic); SUM uses the
    scaled-int64 scheme."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            micro_sum(F.col("value")).alias("total_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "events_sessionized",
    survey="ext-stream W5 W6 A7",
    tags=("streaming",),
    oracle=f"""
        WITH flagged AS (
          SELECT user_id, ts, event_id, event_type, value,
                 CASE WHEN epoch_us(ts) - epoch_us(
                          LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                        > {SESSION_GAP_MIN} * 60 * 1000000
                      OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        ),
        sessions AS (
          SELECT *,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_seq
          FROM flagged
        )
        SELECT user_id,
               CAST(session_seq AS BIGINT) AS session_seq,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS DOUBLE) / 1000000.0
                 AS duration_sec,
               {MICRO_SUM_SQL.format(expr="value")} AS total_value
        FROM sessions
        GROUP BY user_id, session_seq
    """,
)
def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): LAG to flag
    session starts, running SUM to number sessions, then per-session
    rollup. All windows partition by user_id — one shuffle, then
    in-partition work; this is the canonical scalable sessionization
    shape (the streaming twin uses session windows /
    applyInPandasWithState)."""
    e = load_table(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w_lag))
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(
            (gap_us > SESSION_GAP_MIN * 60 * 1_000_000)
            | F.lag("ts").over(w_lag).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn(
        "session_seq", F.sum("new_session").over(w_run).cast("long")
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).cast("double")
            / F.lit(1000000.0)
        ).alias("duration_sec"),
        micro_sum(F.col("value")).alias("total_value"),
    )


@query(
    "events_user_totals",
    survey="ext-stream A2",
    tags=("streaming",),
    oracle=f"""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               {MICRO_SUM_SQL.format(expr="value")} AS total_value
        FROM events GROUP BY user_id
    """,
)
def events_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals — the batch twin of the
    applyInPandasWithState stateful stream (streaming/jobs.py
    user_running_totals); tests/test_streaming.py proves the stream's
    final state equals this aggregation."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        micro_sum(F.col("value")).alias("total_value"),
    )


@query(
    "events_hourly_gapfill",
    survey="ext-timeseries A4 W-none",
    tags=("streaming",),
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
                 CAST(COUNT(*) AS BIGINT) AS n_events
          FROM events GROUP BY 1
        )
        SELECT g.hour_start,
               CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events,
               COALESCE(a.n_events, 0) = 0 AS is_gap
        FROM grid g LEFT JOIN agg a USING (hour_start)
    """,
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill (hypertable-style dense rollup): generate
    the full hourly grid between min and max event time with
    ``sequence`` + explode, left-join the real rollup, zero-fill
    gaps. The grid generation is O(span) rows on ONE aggregated row —
    no per-event cost — and the join shuffles only the tiny rollup."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start")
    )
    agg = e.groupBy(F.date_trunc("hour", "ts").alias("hour_start")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return grid.join(agg, "hour_start", "left").select(
        "hour_start",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        (F.coalesce("n_events", F.lit(0)) == 0).alias("is_gap"),
    )


@query(
    "events_json_props",
    survey="ext-json P8 A2",
    tags=("streaming",),
    oracle="""
        SELECT CAST(json_extract(props, '$.k') AS INTEGER) // 10 AS k_decile,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        WHERE CAST(json_extract(props, '$.k') AS INTEGER) IS NOT NULL
        GROUP BY 1
        ORDER BY 1
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured property extraction: parse a JSON column,
    bucket by an extracted field. JVM-side get_json_object — no UDF."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.filter(k.isNotNull())
        .groupBy(
            (
                (k.cast("decimal(38,0)") / F.lit(10).cast("decimal(38,0)"))
                .cast("long")
                .cast("int")
            ).alias("k_decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("k_decile")
    )


# ------------------------------------------------------------- range join

_RANGE_WINDOW_US = 900_000_000  # 15 minutes in microseconds


@query(
    "events_range_join_attribution",
    survey="ext-rangejoin J-range A2",
    tags=("streaming",),
    oracle="""
        SELECT p.event_id, p.user_id,
               CAST(p.ts AS TIMESTAMP) AS purchase_ts,
               CAST(COUNT(c.event_id) AS BIGINT) AS n_clicks_15m
        FROM events p LEFT JOIN events c
          ON c.user_id = p.user_id AND c.event_type = 'click'
         AND c.ts > p.ts - INTERVAL 15 MINUTE AND c.ts <= p.ts
        WHERE p.event_type = 'purchase'
        GROUP BY 1, 2, 3
    """,
)
def events_range_join_attribution(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Interval range join, bucketized: clicks within the 15 minutes
    before each purchase by the same user.

    The naive plan is an inequality join — Catalyst can only run that
    as BroadcastNestedLoopJoin (all-pairs per user; quadratic in the
    hot user's events). The scale-safe pattern is **banding**: bin
    both sides to the window width, replicate the build side to
    (bin, bin+1), equi-join on (user_id, bin) — a plain hash shuffle
    join whose per-bucket cost is bounded by events-per-user-per-15min
    — then apply the exact time predicate. 2× replication buys an
    equi-join plan that holds at 100 TB; same trick as the salted
    skew join (operators/skew.py).

    A purchase in bin k meets click replicas with bin == k: the
    original replica of clicks in bin k and the +1 replica of clicks
    in bin k-1 — each physical click at most once, no dedup needed.
    """
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.floor(us / F.lit(_RANGE_WINDOW_US)).alias("bin"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.floor(us / F.lit(_RANGE_WINDOW_US)).alias("c_bin"),
    )
    replicated = clicks.withColumn(
        "c_bin", F.explode(F.array(F.col("c_bin"), F.col("c_bin") + 1)))
    joined = purchases.join(
        replicated,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("bin") == F.col("c_bin"))
        & (F.col("c_ts") > F.col("ts") - F.expr("INTERVAL 15 MINUTES"))
        & (F.col("c_ts") <= F.col("ts")),
        "left",
    )
    return joined.groupBy("event_id", "user_id", "ts").agg(
        F.count("c_ts").alias("n_clicks_15m"),
    ).select(
        "event_id", "user_id",
        F.col("ts").alias("purchase_ts"),
        "n_clicks_15m",
    )


# ------------------------------------------------------ cascading rollup


@query(
    "events_rollup_cascade",
    survey="ext-rollup ext-timeseries A7",
    tags=("streaming",),
    oracle=f"""
        WITH hourly AS MATERIALIZED (
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM({{micros}}) AS BIGINT) AS value_micros
            FROM events GROUP BY 1, 2
        ),
        daily AS MATERIALIZED (
            SELECT date_trunc('day', window_start) AS window_start,
                   event_type,
                   CAST(SUM(n_events) AS BIGINT) AS n_events,
                   CAST(SUM(value_micros) AS BIGINT) AS value_micros
            FROM hourly GROUP BY 1, 2
        ),
        monthly AS (
            SELECT date_trunc('month', window_start) AS window_start,
                   event_type,
                   CAST(SUM(n_events) AS BIGINT) AS n_events,
                   CAST(SUM(value_micros) AS BIGINT) AS value_micros
            FROM daily GROUP BY 1, 2
        )
        SELECT 'hour' AS grain, window_start, event_type, n_events,
               CAST(value_micros AS DOUBLE) / 1000000.0 AS total_value
        FROM hourly
        UNION ALL
        SELECT 'day', window_start, event_type, n_events,
               CAST(value_micros AS DOUBLE) / 1000000.0 FROM daily
        UNION ALL
        SELECT 'month', window_start, event_type, n_events,
               CAST(value_micros AS DOUBLE) / 1000000.0 FROM monthly
    """.format(micros="CAST(floor((value) * 1000000.0 + 0.5) AS BIGINT)"),
)
def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution continuous aggregate (hypertable rollup
    cascade): hour → day → month, each grain aggregated FROM the
    previous one, never from raw events.

    At 100 TB this is the whole point of cascading: the raw table is
    scanned exactly once (for the hourly grain); day and month are
    re-aggregations of a table ~5 orders of magnitude smaller.
    Spark's ReuseExchange rule deduplicates the shared hourly
    sub-plan across the three UNION branches, so the physical plan
    scans events once even without an explicit cache. Sums cascade
    exactly because they're scaled int64 all the way down — division
    to double happens only at output.
    """
    e = load_table(spark, sf_dir, "events")
    micros = F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)) \
        .cast("long")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(micros).alias("value_micros"),
    )
    daily = hourly.groupBy(
        F.date_trunc("day", "window_start").alias("window_start"),
        "event_type",
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("value_micros").alias("value_micros"),
    )
    monthly = daily.groupBy(
        F.date_trunc("month", "window_start").alias("window_start"),
        "event_type",
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("value_micros").alias("value_micros"),
    )

    def out(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"), "window_start", "event_type",
            "n_events",
            (F.col("value_micros").cast("double") / F.lit(1000000.0))
            .alias("total_value"),
        )

    return out(hourly, "hour").unionByName(out(daily, "day")) \
        .unionByName(out(monthly, "month"))


# --------------------------------------------------- anomaly detection

_AD_SCALE = 10000  # value → exact int at 1e-4 resolution


@query(
    "event_value_anomalies",
    survey="ext-anomaly A2 A8 J-broadcast W-none",
    tags=("streaming",),
    oracle=f"""
        WITH scaled AS (
          SELECT event_type,
                 CAST(floor(value * {_AD_SCALE}.0 + 0.5) AS BIGINT) AS s
          FROM events
        ),
        stats AS (
          SELECT event_type,
                 COUNT(*) AS n,
                 SUM(s) AS sum_s,                       -- HUGEINT: exact
                 SUM(CAST(s AS HUGEINT) * s) AS sum_ss  -- widen BEFORE the square
          FROM scaled GROUP BY event_type
        ),
        enriched AS (
          SELECT event_type, n,
                 CAST(sum_s AS DOUBLE) / CAST(n AS DOUBLE)
                     AS mean_s,
                 sqrt(CAST(n * sum_ss - sum_s * sum_s AS DOUBLE))
                   / CAST(n AS DOUBLE) AS std_s
          FROM stats
        )
        SELECT e.event_type,
               CAST(e.n AS BIGINT) AS n_events,
               e.mean_s / {_AD_SCALE}.0 AS mean_value,
               e.std_s / {_AD_SCALE}.0 AS stddev_value,
               CAST(SUM(CASE WHEN abs(CAST(sc.s AS DOUBLE) - e.mean_s)
                                  > 3.0 * e.std_s
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM scaled sc JOIN enriched e ON sc.event_type = e.event_type
        GROUP BY e.event_type, e.n, e.mean_s, e.std_s
        ORDER BY e.event_type
    """,
)
def event_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value anomaly report: population mean/stddev
    and the 3-sigma outlier count — with the variance computed in
    EXACT integer space so the cross-engine hash holds. A naive
    ``stddev_pop`` is nondeterministic across engines AND across
    Spark's own partitionings (float partial aggregation); here
    ``n·Σs² − (Σs)²`` is computed on scaled-int64 values summed as
    decimal(38,0) (Spark) / HUGEINT (DuckDB) — exact and
    order-independent — and only the final sqrt/divisions touch
    doubles, identically on both sides.

    Scale shape: two passes over events — a grouped exact-moment
    aggregation (map-side partials, 5-row result), then the 5-row
    stats broadcast back for the outlier comparison. The classic
    two-pass variance; no window over the fact, no float drift."""
    ev = load_table(spark, sf_dir, "events")
    scaled = ev.select(
        "event_type",
        F.floor(F.col("value") * F.lit(float(_AD_SCALE)) + F.lit(0.5))
        .cast("long").alias("s"),
    )
    dec = "decimal(38,0)"
    stats = (
        scaled.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("s").cast(dec)).alias("sum_s"),
            # widen BEFORE the square: s*s in int64 wraps silently in
            # non-ANSI Spark once |value| nears sqrt(2^63)/SCALE while
            # DuckDB raises (the hourly_event_anomalies lesson)
            F.sum(F.col("s").cast(dec) * F.col("s")).alias("sum_ss"),
        )
        .select(
            "event_type", "n",
            (F.col("sum_s").cast("double") / F.col("n").cast("double"))
            .alias("mean_s"),
            (
                F.sqrt(
                    (F.col("n").cast(dec) * F.col("sum_ss")
                     - F.col("sum_s") * F.col("sum_s")).cast("double")
                )
                / F.col("n").cast("double")
            ).alias("std_s"),
        )
    )
    return (
        scaled.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "n", "mean_s", "std_s")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("s").cast("double") - F.col("mean_s"))
                    > F.lit(3.0) * F.col("std_s"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers")
        )
        .select(
            "event_type",
            F.col("n").alias("n_events"),
            (F.col("mean_s") / F.lit(float(_AD_SCALE))).alias("mean_value"),
            (F.col("std_s") / F.lit(float(_AD_SCALE))).alias("stddev_value"),
            "n_outliers",
        )
        .orderBy("event_type")
    )


@query(
    "events_session_window_builtin",
    survey="ext-stream ext-sessionwindow A7",
    tags=("streaming",),
    oracle="""
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        islands AS (
          SELECT user_id, ts,
                 SUM(new_session) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        )
        SELECT user_id,
               CAST(MIN(ts) AS TIMESTAMP) AS session_start,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM islands GROUP BY user_id, sid
    """,
)
def events_session_window_builtin(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Spark's BUILT-IN ``session_window`` operator (batch mode, same
    operator the streaming engine uses for stateful session
    aggregation) gated against the gaps-and-islands oracle: a session
    merges events closer than 30 min to the PREVIOUS event, so the
    island boundary is ``diff >= gap`` — the exact semantics of
    ``session_window(ts, '30 minutes')`` (window end = last + gap,
    exclusive). Cross-checks the hand-rolled LAG/SUM form
    (`events_sessionized`) against the engine-native operator;
    physically one shuffle on user_id then in-partition merge."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


@query(
    "events_variant_props",
    survey="ext-variant ext-json A2",
    tags=("streaming",),
    oracle="""
        SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 7 AS k_mod7,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER)
                   AS max_k
        FROM events
        WHERE CAST(json_extract(props, '$.k') AS INTEGER) IS NOT NULL
        GROUP BY 1
    """,
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through the VARIANT type (Spark 4):
    ``parse_json`` once into a variant, typed access via
    ``variant_get`` — the open-format answer to a JSON column that
    avoids per-access string re-parsing (contrast
    `events_json_props`, which re-runs get_json_object per
    extraction). At 100 TB the variant column is parsed once at
    ingest and stored binary (Parquet variant shredding); every
    downstream read is a typed field access.

    The extraction is ONE projection (``variant_get(parse_json(..))``
    aliased to a column; filter/key/max all reference the attribute):
    rebuilding the variant expression in each consumer made Catalyst
    evaluate the interpreted variant path 3x per row — measured
    4.7 s vs 1.7 s at sf1 for the single-eval projection."""
    e = load_table(spark, sf_dir, "events")
    kk = e.select(
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k")
    )
    return (
        kk.filter(F.col("k").isNotNull())
        .groupBy((F.col("k") % 7).alias("k_mod7"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("k").alias("max_k"),
        )
    )
