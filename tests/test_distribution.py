"""Plan-shape and property gates for the distribution family
(analytics/distribution.py, operators/quantiles.py): the scale claims
in the docstrings (no per-group full sort, broadcast selector/limits,
contribution-explode instead of range self-join) asserted against
executed plans, plus a definitional equivalence property for the
two-level histogram rank-select — correctness itself is gated by the
DuckDB oracles via tests/test_correctness.py and the driver."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sql_data_warehouse_spark.analytics import distribution
from sql_data_warehouse_spark.operators.quantiles import (
    grouped_exact_quantiles,
)

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _only_cross_of_one_row_aggregate(plan: str) -> bool:
    return all(
        ", Cross" in line
        for line in plan.splitlines()
        if "BroadcastNestedLoopJoin" in line
    )


# ---------------------------------------- rank-select vs definition


def _definitional_type1(df, grp, val, percents):
    """The textbook form the rewrite must equal: full per-group sort,
    value at rank ceil(p·n/100)."""
    w = Window.partitionBy(grp).orderBy(val)
    r = df.select(
        F.col(grp), F.col(val).alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(grp)).alias("n"),
    )
    out = []
    for p in percents:
        out.append(
            r.filter(F.col("rn") == F.expr(f"({p} * n + 99) div 100"))
            .select(grp, F.lit(p).alias("q_pct"),
                    F.col("v").alias("q_val"), "n")
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionAll(o)
    return res


def test_rank_select_equals_definition_with_boundary_ties(spark):
    """Adversarial fixture: duplicate values massed exactly at bucket
    boundaries (v = k·width and k·width − 1), group sizes both even
    and odd, and percentiles that land the target rank on the FIRST
    and LAST row of a bucket — the straddle cases the selector's
    (cum_before < target <= cum_thru) interval must get right."""
    width = 4
    rows = []
    for g, vals in {
        "a": [0, 3, 3, 4, 4, 4, 7, 8, 8, 12],        # even n, ties at 4=width
        "b": [1, 2, 3, 4, 5, 6, 7],                  # odd n, uniform
        "c": [4, 4, 4, 4, 4],                        # one value == boundary
        "d": [0, 15],                                # n=2, extreme spread
    }.items():
        rows += [(g, v) for v in vals]
    df = spark.createDataFrame(rows, "g string, v long")
    ps = [1, 5, 25, 50, 75, 95, 100]
    got = grouped_exact_quantiles(df, "g", "v", ps, width)
    want = _definitional_type1(df, "g", "v", ps)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect()))


def test_exact_quantiles_plan_broadcasts_selector(spark):
    df = distribution.exact_priority_quantiles(spark, SF_SMOKE)
    plan = _plan(df)
    # the selector comes back onto the facts as a broadcast hash join
    assert "BroadcastHashJoin" in plan
    assert _only_cross_of_one_row_aggregate(plan)
    # the only row_number window is the in-bucket residual pick —
    # never a full per-group sort of the fact relation (the histogram
    # cumsum is a SUM window over grid-sized partitions)
    assert plan.count("row_number()") == 1


def test_winsorized_means_sit_inside_clamp_range(spark):
    rows = distribution.winsorized_nation_order_value(
        spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.p05_cents <= r.p95_cents
        assert r.p05_cents <= r.win_mean_cents <= r.p95_cents
        # clamping can only pull the mean toward the center, never
        # past the limits; the raw mean is unconstrained but finite
        assert r.mean_cents > 0


# ------------------------------------------- rolling distinct users


def test_rolling_distinct_no_range_self_join(spark):
    df = distribution.rolling_7day_distinct_users(spark, SF_SMOKE)
    plan = _plan(df)
    # contribution explode + broadcast day-domain semi-join: any
    # nested-loop range join here would be the O(days × events) plan
    # the rewrite exists to avoid
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan


def test_rolling_distinct_is_trailing_window(spark):
    ev = (
        distribution.load_table(spark, SF_SMOKE, "events")
        .select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
        .collect()
    )
    by_day: dict = {}
    for r in ev:
        by_day.setdefault(r.d, set()).add(r.user_id)
    got = {
        r.day: r.active_users_7d
        for r in distribution.rolling_7day_distinct_users(
            spark, SF_SMOKE).collect()
    }
    import datetime as dt

    for day in by_day:
        users = set()
        for back in range(7):
            users |= by_day.get(day - dt.timedelta(days=back), set())
        assert got[day.isoformat()] == len(users)
    assert set(got) == {d.isoformat() for d in by_day}


# ---------------------------------------- embedding dim outliers


def test_dim_outliers_plan_and_bounds(spark):
    df = distribution.embedding_dim_outliers(spark, SF_SMOKE)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan  # top-k, not global window
    assert "BroadcastHashJoin" in plan      # 64-row stats broadcast
    assert _only_cross_of_one_row_aggregate(plan)
    rows = df.collect()
    for r in rows:
        assert 1 <= r.n_outlier_dims <= 64


# ------------------------------------------------ scalable NTILE


def test_scalable_ntile_equals_window_ntile_under_ties(spark):
    """Adversarial fixture for the boundary-PAIR claim: a run of
    equal values long enough to straddle several tile cuts (NTILE
    must split it by key), n chosen so the remainder rule kicks in
    (n mod t != 0), and values massed at bin edges."""
    from sql_data_warehouse_spark.operators.quantiles import (
        scalable_ntile,
    )

    rows = (
        [(k, 100) for k in range(1, 18)]       # 17-way tie across cuts
        + [(k, 4 * (k % 5)) for k in range(18, 41)]  # bin-edge values
        + [(41, 700), (42, 0), (43, 0)]        # extremes + tail tie
    )
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        (r.k): r.tile
        for r in scalable_ntile(df, "v", "k", 7, 4).collect()
    }
    w = Window.orderBy(F.desc("v"), F.asc("k"))
    want = {
        r.k: r.tile
        for r in df.withColumn("tile", F.ntile(7).over(w)).collect()
    }
    assert got == want


def test_scalable_deciles_plan_has_no_global_fact_sort(spark):
    from sql_data_warehouse_spark.analytics.distribution import (
        customer_value_deciles_scalable,
    )

    df = customer_value_deciles_scalable(spark, SF_SMOKE)
    plan = _plan(df)
    # the only row_number is the in-bin residual pick; ntile itself
    # must be absent (that's the global-sort operator being replaced)
    assert "ntile" not in plan
    assert plan.count("row_number()") == 1
    rows = df.collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    # ntile remainder rule: bucket sizes differ by at most one and
    # are non-increasing
    sizes = [r.n_customers for r in rows]
    assert max(sizes) - min(sizes) <= 1
    assert sizes == sorted(sizes, reverse=True)


# ------------------------------------------------ EWMA / funnel


def test_ewma_is_exact_dyadic_recursion(spark):
    """EWMA output must equal the literal recursion E_t=(E_{t-1}+v)/2
    floored to cents — driven per nation over the real smoke data."""
    from sql_data_warehouse_spark.analytics.distribution import (
        ewma_monthly_revenue,
    )

    rows = ewma_monthly_revenue(spark, SF_SMOKE).collect()
    assert rows
    from collections import defaultdict
    from fractions import Fraction

    series = defaultdict(list)
    for r in rows:
        series[r.nation].append(r)
    for nation, rs in series.items():
        rs.sort(key=lambda r: r.ym)
        e = None
        for r in rs:
            v = Fraction(r.rev_cents)
            e = v if e is None else (e + v) / 2
            assert r.ewma_cents == e.numerator // e.denominator, (
                nation, r.ym)


def test_funnel_quantiles_ordered_and_positive(spark):
    from sql_data_warehouse_spark.analytics.distribution import (
        funnel_conversion_time_quantiles,
    )

    [r] = funnel_conversion_time_quantiles(spark, SF_SMOKE).collect()
    assert r.n_converted > 0
    assert 0 <= r.p50_sec <= r.p90_sec <= r.p99_sec


# ------------------------------------------------ KS two-sample


def test_ks_statistic_bounds_and_argmax(spark):
    from sql_data_warehouse_spark.analytics.distribution import (
        ks_test_order_value_segments,
    )

    [r] = ks_test_order_value_segments(spark, SF_SMOKE).collect()
    assert r.n1 > 0 and r.n2 > 0
    assert 0.0 <= r.ks_stat <= 1.0
    assert r.ks_num == int(round(r.ks_stat * r.n1 * r.n2))
    assert r.argmax_cents > 0


# --------------------------------------- weighted quantiles / mode


def test_weighted_quantile_equals_definition_with_tied_values(spark):
    """Weighted rank-select vs the definitional cumulative-weight
    window — tied values must merge their weights BEFORE the walk,
    and a weight mass sitting exactly on a target must select that
    value, not its successor."""
    from sql_data_warehouse_spark.operators.quantiles import (
        grouped_weighted_quantiles,
    )

    rows = [
        ("a", 10, 3), ("a", 10, 2), ("a", 20, 5), ("a", 30, 10),
        ("b", 5, 1), ("b", 6, 1),
        ("c", 7, 100),
    ]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = {
        (r.g, r.q_pct): (r.q_val, r.w_total)
        for r in grouped_weighted_quantiles(
            df, "g", "v", "w", [25, 50, 100], 4).collect()
    }
    # group a: W=20; t25=5 -> cumw(10)=5 picks 10; t50=10 -> cumw(20)=10
    # picks 20 (mass exactly on target); t100=20 -> 30
    assert got[("a", 25)] == (10, 20)
    assert got[("a", 50)] == (20, 20)
    assert got[("a", 100)] == (30, 20)
    # group b: W=2; t50=1 -> 5 ; group c: single value at every p
    assert got[("b", 50)] == (5, 2)
    assert got[("c", 25)] == (7, 100)


def test_brand_mode_plan_has_no_window(spark):
    from sql_data_warehouse_spark.analytics.distribution import (
        brand_size_mode,
    )

    df = brand_size_mode(spark, SF_SMOKE)
    plan = _plan(df)
    assert "row_number" not in plan and "Window" not in plan
    rows = df.collect()
    assert len(rows) == 25
    for r in rows:
        assert r.n_at_mode >= 1


def test_hourly_anomalies_warmup_and_exactness(spark):
    from sql_data_warehouse_spark.analytics.distribution import (
        _ANOM_WIN, hourly_event_anomalies,
    )

    rows = hourly_event_anomalies(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.trail_n == _ANOM_WIN       # only fully-warmed hours
        assert r.n_events >= 0 and r.trail_sum >= 0


def test_hourly_anomalies_ss_accumulates_wide(spark):
    """ADVICE r8 #1: the ss window sum must SQUARE INTO decimal(38,0)
    — a bare int64 SUM(c*c) wraps silently in non-ANSI Spark past
    c≈6.8e8 events/hour while the DuckDB oracle raises. The wrap is
    unreachable at test scale, so pin the TYPE in the analyzed plan
    (the same style as the plan-shape tests) on both engines."""
    from sql_data_warehouse_spark.analytics.distribution import (
        hourly_event_anomalies,
    )
    from sql_data_warehouse_spark.analytics.registry import all_queries

    df = hourly_event_anomalies(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "cast(c" in plan and "as decimal(38,0)" in plan, (
        "ss no longer widens before squaring:\n" + plan
    )
    oracle = all_queries()["hourly_event_anomalies"].oracle
    assert "CAST(c AS HUGEINT) * c" in oracle


def test_assortativity_in_bounds(spark):
    from sql_data_warehouse_spark.analytics.mining import (
        copurchase_degree_assortativity,
    )

    [r] = copurchase_degree_assortativity(spark, SF_SMOKE).collect()
    assert r.n_edges > 0
    assert -1.0 - 1e-9 <= r.assortativity <= 1.0 + 1e-9
    # direction-doubling identities
    assert r.s_j >= 2 * r.n_edges  # every endpoint degree >= 1


def test_attribution_credit_audits_to_conversions(spark):
    """Σ credit must equal 1,000,000 micros per attributed
    conversion: total ledger / 1e6 == number of purchases that had
    ≥1 click in the window."""
    from sql_data_warehouse_spark.analytics.distribution import (
        _ATTR_WINDOW_DAYS, position_weighted_attribution,
    )

    rows = position_weighted_attribution(spark, SF_SMOKE).collect()
    assert rows
    total = sum(r.credit_micros for r in rows)
    assert total % 1000000 == 0
    ev = distribution.load_table(spark, SF_SMOKE, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("cid"), "user_id",
        F.col("ts").alias("cts"))
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts")
    n_attr = (
        conv.join(clk, "user_id")
        .filter((F.col("ts") <= F.col("cts"))
                & (F.col("ts") >= F.col("cts")
                   - F.expr(f"INTERVAL {_ATTR_WINDOW_DAYS} DAYS")))
        .select("cid").distinct().count()
    )
    assert total == 1000000 * n_attr


def test_loo_encoding_is_leakage_free(spark):
    """LOO identity: n·mean_all = cents + (n−1)·loo_mean per row —
    i.e. adding the row back recovers the plain group mean exactly."""
    from sql_data_warehouse_spark.analytics.distribution import (
        loo_target_encoding,
    )

    df = loo_target_encoding(spark, SF_SMOKE)
    g = df.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
    rows = df.join(g, "nation").collect()
    for r in rows[:200]:
        assert abs((r.s - r.cents) / (r.n - 1) - r.loo_mean_cents) < 1e-9


def test_ewma_overflow_guard_fires_past_90_months(spark, tmp_path):
    """The ADVICE r7 #1 claim, executed: past ~90 months the dyadic
    EWMA numerator exceeds decimal(38,0), where non-ANSI Spark would
    silently NULL while DuckDB raises — the builder's assert_true
    must turn that silent divergence into a loud error. Build a
    96-month synthetic slice and expect the failure; 84 months (the
    TPC-H span) must pass."""
    import datetime

    import pytest
    from pyspark.sql import Row

    from sql_data_warehouse_spark.analytics.distribution import (
        ewma_monthly_revenue,
    )

    def write_sf(months: int) -> str:
        d = tmp_path / f"m{months}"
        d.mkdir()
        spark.createDataFrame(
            [Row(n_nationkey=0, n_name="A")]
        ).write.parquet(str(d / "nation.parquet"))
        spark.createDataFrame(
            [Row(c_custkey=1, c_nationkey=0)]
        ).write.parquet(str(d / "customer.parquet"))
        base = datetime.date(2000, 1, 1)
        spark.createDataFrame([
            Row(o_orderkey=i, o_custkey=1,
                o_orderdate=datetime.date(
                    base.year + i // 12, i % 12 + 1, 15),
                o_totalprice=100.0)
            for i in range(months)
        ]).write.parquet(str(d / "orders.parquet"))
        return str(d)

    ok = ewma_monthly_revenue(spark, write_sf(84)).collect()
    assert len(ok) == 84 and all(r.ewma_cents is not None for r in ok)

    with pytest.raises(Exception, match="90 months"):
        ewma_monthly_revenue(spark, write_sf(96)).collect()

    # ADVICE r8 #2: the ORACLE must reject the same 91+-month domain.
    # With tiny revenues HUGEINT doesn't overflow until t≈120+, so
    # without the mirrored guard DuckDB would return rows where Spark
    # raises — run the registered oracle SQL on the same synthetic
    # slices and assert both verdicts match the Spark side.
    import duckdb

    from sql_data_warehouse_spark.analytics.registry import all_queries

    oracle = all_queries()["ewma_monthly_revenue"].oracle

    def run_oracle_months(months: int):
        con = duckdb.connect()
        try:
            base = datetime.date(2000, 1, 1)
            con.sql("CREATE TABLE nation AS SELECT 0 AS n_nationkey,"
                    " 'A' AS n_name")
            con.sql("CREATE TABLE customer AS SELECT 1 AS c_custkey,"
                    " 0 AS c_nationkey")
            con.sql("CREATE TABLE orders (o_orderkey INT, o_custkey INT,"
                    " o_orderdate DATE, o_totalprice DOUBLE)")
            con.executemany(
                "INSERT INTO orders VALUES (?, ?, ?, ?)",
                [(i, 1, datetime.date(base.year + i // 12,
                                      i % 12 + 1, 15), 100.0)
                 for i in range(months)],
            )
            return con.sql(oracle).fetchall()
        finally:
            con.close()

    assert len(run_oracle_months(84)) == 84
    with pytest.raises(Exception, match="90 months"):
        run_oracle_months(96)
