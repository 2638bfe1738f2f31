"""Plan-shape and property gates for the distributional-statistics
family (analytics/stats.py): the scale claims in the docstrings
(broadcast directions, grid-sized windows, two-level cumsum, Bloom
soundness) asserted against executed plans and definitional rewrites
— correctness itself is gated by the DuckDB oracles via
tests/test_correctness.py and the driver."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sql_data_warehouse_spark.analytics import stats

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _only_cross_of_one_row_aggregate(plan: str) -> bool:
    """The sanctioned BroadcastNestedLoopJoin shape: a Cross of a
    broadcast 1-row aggregate (the W9 grand-total pattern) — any
    OTHER nested-loop join is a scale bug."""
    return all(
        ", Cross" in line
        for line in plan.splitlines()
        if "BroadcastNestedLoopJoin" in line
    )


# ------------------------------------------------- association rules


def test_rules_topk_is_take_ordered_and_rules_broadcast(spark):
    df = stats.basket_association_rules(spark, SF_SMOKE)
    plan = _plan(df)
    # final rank is sort+limit, not a global window
    assert "TakeOrderedAndProject" in plan
    # the enrichment broadcasts the post-support rule set, and the
    # only wide joins are the basket self-join + pair aggregation
    assert "BroadcastHashJoin" in plan
    assert _only_cross_of_one_row_aggregate(plan)


def test_rules_are_directional_and_bounded(spark):
    rows = stats.basket_association_rules(spark, SF_SMOKE).collect()
    assert rows, "sf0.001 corpus should yield supported pairs"
    for r in rows:
        assert r.antecedent != r.consequent
        assert r.n_ab >= stats._RULES_MIN_SUPPORT
        assert 0.0 < r.confidence <= 1.0
        assert r.lift > 0.0
        # confidence = n_ab / n_ante exactly
        assert r.confidence == r.n_ab / r.n_ante


# ------------------------------------------------------ Bloom audit


def test_bloom_has_no_false_negatives(spark):
    """Bloom soundness: every true member passes all k probes, so
    bloom positives >= members and the audit's fpr denominator only
    ever counts non-members."""
    row = stats.bloom_semi_join_audit(spark, SF_SMOKE).collect()[0]
    assert row.n_bloom_pos >= row.n_members
    assert row.n_false_pos == row.n_bloom_pos - row.n_members
    assert 0.0 <= row.fpr <= 1.0


def test_bloom_bits_relation_broadcasts(spark):
    plan = _plan(stats.bloom_semi_join_audit(spark, SF_SMOKE))
    # the <=m-row set-bit relation broadcasts into the probe side —
    # the whole point of the pattern at 100 TB
    assert "BroadcastHashJoin" in plan
    assert _only_cross_of_one_row_aggregate(plan)


# -------------------------------------------------- concentration


def test_gini_bounds_and_degenerate_case(spark):
    for r in stats.nation_revenue_gini(spark, SF_SMOKE).collect():
        assert 0.0 <= r.gini < 1.0
        assert r.n_customers >= 1


def test_hhi_bounds(spark):
    for r in stats.nation_brand_revenue_hhi(spark, SF_SMOKE).collect():
        # 1/n_brands (perfectly even) <= hhi <= 1 (monopoly)
        assert 1.0 / r.n_brands <= r.hhi + 1e-12
        assert r.hhi <= 1.0


def test_gini_window_runs_over_customer_aggregate(spark):
    plan = _plan(stats.nation_revenue_gini(spark, SF_SMOKE))
    # rank window sits above the per-customer aggregate, and orders
    # is scanned exactly once
    assert plan.count("orders.parquet") == 1, plan
    assert "Window" in plan


# --------------------------------------------- calibrated filtering


def test_length_filter_grid_window_and_broadcast_join_back(spark):
    df = stats.lang_calibrated_length_filter(spark, SF_SMOKE)
    plan = _plan(df)
    # the verdict joins back to docs via a BROADCAST of the
    # (lang x n_chars) grid — the doc-level pass is map-only
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_length_filter_drops_a_bottom_decile_per_language(spark):
    df = stats.lang_calibrated_length_filter(spark, SF_SMOKE)
    agg = (
        df.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("keep_flag").alias("kept"))
        .collect()
    )
    for r in agg:
        dropped = r.n - r.kept
        # strictly-below-decile semantics: dropped docs are < ~10% + the
        # tie block straddling the cutoff, and something is always kept
        assert 0 < r.kept <= r.n
        assert dropped >= 0
    # per-language calibration: the shortest doc of EVERY language
    # with >=10 docs is dropped
    shortest = (
        df.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("lang").orderBy("n_chars", "doc_id")),
        )
        .filter("rn = 1")
        .join(df.groupBy("lang").agg(F.count(F.lit(1)).alias("n")), "lang")
        .filter("n >= 10")
        .collect()
    )
    assert all(r.keep_flag == 0 for r in shortest)


# ------------------------------------------- systematic sample


def test_systematic_sample_two_level_cumsum_matches_single_window(spark):
    """Equivalence twin (the scalable-SK proof pattern): the
    two-level bucketed cumulative sum must reproduce the definitional
    single-window per-nation cumsum row-for-row."""
    from sql_data_warehouse_spark.sources import load_table

    got = stats.nation_weighted_systematic_sample(spark, SF_SMOKE)

    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey",
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long").alias("cents"))
    c = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey")
    n = load_table(spark, SF_SMOKE, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name")
    rows = o.join(c, "o_custkey").join(n, "c_nationkey")
    w = (Window.partitionBy("n_name").orderBy("o_orderkey")
         .rowsBetween(Window.unboundedPreceding, 0))
    ref = (
        rows.select(
            "n_name", "o_orderkey", "cents",
            F.sum("cents").over(w).alias("cum_cents"),
            F.sum("cents").over(Window.partitionBy("n_name"))
            .alias("total_cents"),
        )
        .withColumn(
            "step",
            F.greatest(
                F.expr(f"total_cents div {stats._SAMPLE_PER_NATION}"),
                F.lit(1)),
        )
        .filter(F.expr("cum_cents div step")
                > F.expr("(cum_cents - cents) div step"))
        .select("n_name", "o_orderkey", "cents", "cum_cents")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ref.collect()))


def test_systematic_sample_size_near_target(spark):
    got = stats.nation_weighted_systematic_sample(spark, SF_SMOKE)
    sizes = got.groupBy("n_name").agg(F.count(F.lit(1)).alias("k")).collect()
    for r in sizes:
        # every step boundary selects exactly one order, and a nation's
        # money axis holds at most PER_NATION+1 boundaries (the +1 when
        # total is not a multiple of step)
        assert 1 <= r.k <= stats._SAMPLE_PER_NATION + 1


# ------------------------------------------- correlation / CUSUM


def test_brand_correlation_is_bounded(spark):
    for r in stats.brand_qty_price_correlation(spark, SF_SMOKE).collect():
        assert -1.0 - 1e-12 <= r.pearson_r <= 1.0 + 1e-12
        assert r.n_items >= 2


def test_changepoint_month_is_inside_series(spark):
    from sql_data_warehouse_spark.sources import load_table

    got = {r.n_name: r for r in
           stats.nation_revenue_changepoint(spark, SF_SMOKE).collect()}
    o = load_table(spark, SF_SMOKE, "orders").select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long").alias("m"))
    lo, hi = o.agg(F.min("m"), F.max("m")).collect()[0]
    for r in got.values():
        assert lo <= r.cp_month <= hi
        assert r.cusum_stat >= 0


# ---------------------------------------------- TWAP / shares / KMV


def test_twap_lies_within_value_range(spark):
    from sql_data_warehouse_spark.sources import load_table

    lo, hi = (load_table(spark, SF_SMOKE, "events")
              .agg(F.min("value"), F.max("value")).collect()[0])
    for r in stats.user_value_twap(spark, SF_SMOKE).collect():
        assert lo * 100 - 1 <= r.twap_cents <= hi * 100 + 1
        assert r.span_us > 0


def test_hierarchical_shares_sum_to_one(spark):
    rows = stats.region_nation_revenue_shares(spark, SF_SMOKE).collect()
    by_region: dict = {}
    region_share: dict = {}
    for r in rows:
        by_region.setdefault(r.r_name, 0.0)
        by_region[r.r_name] += r.share_in_region
        region_share[r.r_name] = r.region_share_global
    for v in by_region.values():
        assert abs(v - 1.0) < 1e-9  # nations partition their region
    assert abs(sum(region_share.values()) - 1.0) < 1e-9


def test_kmv_degenerate_small_corpus_is_exact(spark):
    """sf0.001 has 15 distinct users < K=64: the sketch holds every
    value, the estimate must equal the exact count, and the oracle
    must agree at this scale too (the gate only runs sf0.01)."""
    from tests.oracle_harness import compare, run_oracle

    q = stats.kmv_distinct_users_estimate
    df = q(spark, SF_SMOKE)
    row = df.collect()[0]
    assert row.n_exact < stats._KMV_K
    assert row.n_est == float(row.n_exact)
    from sql_data_warehouse_spark.analytics import all_queries

    compare(df, run_oracle(
        all_queries()["kmv_distinct_users_estimate"].oracle, SF_SMOKE),
        "kmv@sf0.001")


def test_interpolate_matches_observed_and_nulls_edges(spark):
    rows = sorted(
        stats.events_hourly_interpolate(spark, SF_SMOKE).collect(),
        key=lambda r: r.hour_start)
    observed = [r for r in rows if not r.was_gap]
    assert observed
    # an observed hour interpolates to exactly itself
    for r in observed:
        assert r.interp_value is not None
    # gaps before the first / after the last observation stay NULL
    first_obs = rows.index(observed[0])
    last_obs = rows.index(observed[-1])
    for r in rows[:first_obs]:
        assert r.interp_value is None
    for r in rows[last_obs + 1:]:
        assert r.interp_value is None
    # interior gap values lie within the surrounding observations
    for i, r in enumerate(rows):
        if r.was_gap and r.interp_value is not None:
            prev = next(x for x in reversed(rows[:i]) if not x.was_gap)
            nxt = next(x for x in rows[i + 1:] if not x.was_gap)
            lo = min(prev.interp_value, nxt.interp_value)
            hi = max(prev.interp_value, nxt.interp_value)
            assert lo - 1e-9 <= r.interp_value <= hi + 1e-9


def test_copurchase_communities_are_closed_under_edges(spark):
    from sql_data_warehouse_spark.analytics.advanced import (
        _copurchase_pair_counts,
    )

    comm = {r.part_id: r.community_id for r in
            stats.copurchase_communities(spark, SF_SMOKE).collect()}
    sizes: dict = {}
    for cid in comm.values():
        sizes[cid] = sizes.get(cid, 0) + 1
    got_sizes = {r.part_id: r.community_size for r in
                 stats.copurchase_communities(spark, SF_SMOKE).collect()}
    edges = (_copurchase_pair_counts(spark, SF_SMOKE)
             .filter("n >= 2").collect())
    for e in edges:
        # both endpoints of every supported edge share a community
        assert comm[e.src] == comm[e.dst]
    for pid, cid in comm.items():
        assert cid <= pid  # label = min member id
        assert got_sizes[pid] == sizes[cid]


def test_scd2_pit_join_matches_python_rederivation(spark):
    """Leakage-free PIT semantics, re-derived row-by-row in Python
    over the whole smoke corpus: every purchase gets the k of the
    latest STRICTLY-PRIOR non-purchase k-change, never a future one."""
    import json as _json

    from sql_data_warehouse_spark.analytics.incremental import (
        scd2_point_in_time_join,
    )
    from sql_data_warehouse_spark.sources import load_table

    rows = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type", "props").collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    expected = {}
    for uid, evs in by_user.items():
        evs.sort(key=lambda r: (r.ts, r.event_id))
        cur_k, prev_k, started = None, object(), False
        versions = []
        for r in evs:
            if r.event_type != "purchase":
                k = _json.loads(r.props)["k"]
                if not started or k != cur_k:
                    cur_k, started = k, True
                versions.append((r.ts, r.event_id, cur_k))
        for r in evs:
            if r.event_type == "purchase":
                prior = [v for v in versions
                         if (v[0], v[1]) < (r.ts, r.event_id)]
                expected[r.event_id] = prior[-1][2] if prior else None
    got = {r.event_id: r.k_at_purchase for r in
           scd2_point_in_time_join(spark, SF_SMOKE).collect()}
    assert got == expected


# ------------------------------------------------ KMV daily merge


def test_kmv_daily_merge_equals_direct_sketch(spark):
    """The mergeability theorem, asserted against the direct sketch:
    bottom-K of per-day bottom-Ks == global bottom-K."""
    from sql_data_warehouse_spark.analytics.stats import (
        kmv_daily_merge_estimate, kmv_distinct_users_estimate,
    )

    [m] = kmv_daily_merge_estimate(spark, SF_SMOKE).collect()
    [d] = kmv_distinct_users_estimate(spark, SF_SMOKE).collect()
    assert m.kth_min_hash == d.kth_min_hash
    assert m.n_est == d.n_est
    assert m.n_days > 0
