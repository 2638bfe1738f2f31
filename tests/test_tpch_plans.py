"""Physical-plan assertions for the adapted TPC-H suite: the scale
claims in each docstring (broadcast dims, semi/anti joins, top-k as
TakeOrderedAndProject, single-scan window rewrites) must be visible
in the executed plan, not just asserted in prose."""

from __future__ import annotations

from sql_data_warehouse_spark.analytics import tpch

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q4_exists_is_semi_join(spark):
    plan = _plan(tpch.order_priority_late_ship(spark, SF_SMOKE))
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q7_dims_broadcast_one_fact_join(spark):
    plan = _plan(tpch.volume_shipping_pairs(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    # exactly one fact-fact edge (lineitem⋈orders); everything else
    # must broadcast
    assert plan.count("SortMergeJoin") <= 1


def test_q8_semi_joins_prune_fact(spark):
    plan = _plan(tpch.nation_market_share(spark, SF_SMOKE))
    assert "LeftSemi" in plan
    assert plan.count("SortMergeJoin") <= 1


def test_q10_topk_is_take_ordered(spark):
    plan = _plan(tpch.returned_item_customers(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    # returnflag filter reaches the lineitem scan
    pushed = plan.split("PushedFilters:", 1)[1].split("]", 1)[0]
    assert "l_returnflag" in pushed


def test_q16_not_in_is_broadcast_anti_join(spark):
    plan = _plan(tpch.part_supplier_counts(spark, SF_SMOKE))
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q19_disjunction_stays_hash_join(spark):
    plan = _plan(tpch.brand_quantity_revenue(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q15_single_fact_scan_window_max(spark):
    df = tpch.top_revenue_suppliers(spark, SF_SMOKE)
    plan = _plan(df)
    # the MAX(total_revenue) subquery is a window over the small
    # aggregate, not a second scan of lineitem
    assert plan.count("lineitem.parquet") == 1, plan
    assert "Window" in plan


def test_q21_single_fact_scan(spark):
    df = tpch.suppliers_kept_waiting(spark, SF_SMOKE)
    plan = _plan(df)
    # EXISTS + NOT-EXISTS collapsed into windows over ONE reduction
    # of lineitem — the fact is scanned exactly once
    assert plan.count("lineitem.parquet") == 1, plan
    assert "Window" in plan
    assert "TakeOrderedAndProject" in plan


def test_q2_correlated_min_is_window_single_scan(spark):
    df = tpch.min_cost_supplier(spark, SF_SMOKE)
    plan = _plan(df)
    # the per-part MIN(cost) subquery is a window over the derived
    # partsupp aggregate, not a second lineitem scan
    assert plan.count("lineitem.parquet") == 1, plan
    assert "Window" in plan
    assert "TakeOrderedAndProject" in plan


def test_q11_share_threshold_is_w9_rewrite(spark):
    df = tpch.important_stock_parts(spark, SF_SMOKE)
    plan = _plan(df)
    # the `> fraction × SUM(...)` scalar subquery runs as a
    # grand-total window over the per-part aggregate — one fact scan
    assert plan.count("lineitem.parquet") == 1, plan
    assert "Window" in plan


def test_q20_in_subqueries_are_semi_joins(spark):
    df = tpch.excess_stock_suppliers(spark, SF_SMOKE)
    plan = _plan(df)
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_new_advanced_queries_avoid_nested_loops(spark):
    """The session's new self-join / reconciliation queries must all
    compile to hash/sort-merge joins — a BroadcastNestedLoopJoin in
    any of them is the O(n*m) failure mode the sf1 sweep caught in
    the first recursive-CTE formulation."""
    from sql_data_warehouse_spark.analytics import all_queries

    reg = all_queries()
    sf = "/root/testdata/sf0.001"
    # funnel_view_click_purchase is excluded: its final combine is
    # two crossJoins of SINGLE-ROW aggregates (the scalar-broadcast
    # pattern, intentionally a 1x1 nested loop).
    for name in (
        "supplier_fuzzy_pairs_banded",
        "monthly_orders_vs_events",
        "user_retention_cohorts",
        "events_hourly_locf",
        "customer_first_last_order",
        "orders_exists_no_returns",
    ):
        plan = reg[name].builder(spark, sf)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_quota_cap_windows_are_salted_then_bounded(spark):
    """source_quota_cap's scale claim: the corpus-sized window
    partitions by (source, salt) — never by source alone — and the
    source-only window runs AFTER the local cap filter (over the
    bounded survivor relation)."""
    from sql_data_warehouse_spark.analytics import curation as c

    plan = _plan(c.source_quota_cap_q(spark, SF_SMOKE))
    w_specs = [ln for ln in plan.splitlines() if "Window" in ln]
    assert any("_salt" in ln for ln in w_specs), w_specs
    # no nested-loop anywhere
    assert "BroadcastNestedLoopJoin" not in plan


def test_ccnet_cutoff_join_is_broadcast(spark):
    """ccnet_bucket_sample's corpus pass must join the ≤|langs|-row
    cutoff relation by broadcast — a shuffle join here would
    repartition the whole corpus for a 5-row table."""
    from sql_data_warehouse_spark.analytics import curation as c

    plan = _plan(c.ccnet_bucket_sample_q(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_batch_manifest_windows_stay_sharded(spark):
    """length_bucket_batches' corpus window must partition by
    (shard, bucket_cap) — never run unpartitioned over the corpus."""
    from sql_data_warehouse_spark.analytics import incremental as inc

    plan = _plan(inc.length_bucket_batches(spark, SF_SMOKE))
    w_specs = [ln for ln in plan.splitlines() if "Window" in ln]
    assert w_specs and all(
        "shard" in ln and "bucket_cap" in ln for ln in w_specs
    ), w_specs


def test_temperature_mixture_single_corpus_shuffle(spark):
    """domain_mixture_temperature touches the corpus exactly once
    (the groupBy(source) partial agg); everything downstream operates
    on the <=|sources|-row relation, so the plan must contain exactly
    one scan of the documents table."""
    from sql_data_warehouse_spark.analytics import incremental as inc

    plan = _plan(inc.domain_mixture_temperature(spark, SF_SMOKE))
    assert plan.count("documents.parquet") <= 1, plan


def test_ivf_int8_corpus_never_shuffle_joins(spark):
    """ivf_ann_topk_int8's scale contract: the corpus side joins only
    against broadcast relations (probes) — no sort-merge join, and no
    corpus self-join to recover the label column (it rides through
    the quantization projection; a join-back would shuffle the corpus
    at 100 TB)."""
    from sql_data_warehouse_spark.operators import similarity
    from sql_data_warehouse_spark.sources import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = _plan(similarity.ivf_int8_topk(emb, queries, k=10, nprobe=2))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 1


def test_scalable_sk_windows_stay_bucketed(spark):
    """The W2 scale contract for BOTH scalable surrogate-key forms:
    every window in the plan partitions by the range bucket (the
    dimension never funnels through one unpartitioned window task),
    and the offsets relation joins back by broadcast. The global
    cumulative-offset window runs over n_buckets rows, but Spark
    still plans it as a Window node — it must be the ONLY
    unpartitioned one and its input is the tiny per-bucket count
    aggregate, which the plan shows as the AdaptiveSparkPlan child of
    the offsets branch."""
    from sql_data_warehouse_spark.medallion.gold import (
        gold_dim_customers_scalable_sk,
        gold_dim_products_scalable_sk,
    )

    for df in (gold_dim_customers_scalable_sk(spark),
               gold_dim_products_scalable_sk(spark)):
        plan = _plan(df)
        w_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
        # a Window node prints `[funcs], [partition], [order]`;
        # an UNPARTITIONED one drops the middle group
        unpart = [ln for ln in w_lines if len(ln.split("], [")) == 2]
        assert len(unpart) <= 1, unpart
        # ...and the one allowed unpartitioned window is the
        # n_buckets-row offset cumsum (ordered by the bucket id),
        # never a window over dimension rows
        assert all("_b#" in ln for ln in unpart), unpart
        # the corpus-sized local rank runs partitioned by the bucket
        assert any("windowspecdefinition(_b#" in ln for ln in w_lines
                   if len(ln.split("], [")) == 3), w_lines
        assert "BroadcastHashJoin" in plan


def test_q06_rank_twins_rank_window_over_aggregate(spark):
    """Both Q06 window-rank forms (RANK and the round-7 DENSE_RANK
    twin) must plan exactly ONE ranking window, and it must rank the
    AGGREGATED total_revenue column (the 295-row product-revenue
    relation — dim-sized by design), never a raw fact column. The
    other Window nodes in the plan are the medallion ETL's own
    (dedup/end-dating/surrogate keys), already gated elsewhere. No
    join may degrade to a nested loop."""
    from sql_data_warehouse_spark.medallion import analysis

    for builder, func in (
        (analysis.wh_q06_top5_products_rank, "[rank(total_revenue"),
        (analysis.wh_q06_top5_products_dense_rank,
         "[dense_rank(total_revenue"),
    ):
        plan = _plan(builder(spark, SF_SMOKE))
        rank_lines = [
            ln for ln in plan.splitlines()
            if "Window [" in ln and func in ln
        ]
        assert len(rank_lines) == 1, (func, plan)
        assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_join_is_exchange_free(spark):
    """The bucketed-layout scale contract: both fact scans read the
    bucketed files (Bucketed: true), the fact-fact join is sort-merge
    with NO shuffle exchange on the join key, and the only exchange
    in the whole plan is the 5-group post-join priority rollup."""
    from sql_data_warehouse_spark.analytics import extended

    plan = _plan(extended.bucketed_colocated_join(spark, SF_SMOKE))
    assert plan.count("Bucketed: true") == 2, plan
    assert "SortMergeJoin" in plan
    ex = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(ex) == 1 and "o_orderpriority" in ex[0], ex
    assert "orderkey" not in ex[0]


def test_bucket_pruned_lookup_reads_one_bucket(spark):
    """Bucket pruning: the IN-list point lookup must open only the
    buckets its keys hash to on BOTH sides of the join — the scan
    prints SelectedBucketsCount k out of n with k < n — and keep the
    join exchange-free on the key."""
    import re

    from sql_data_warehouse_spark.analytics import extended

    plan = _plan(extended.bucket_pruned_lookup(spark, SF_SMOKE))
    picks = re.findall(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert len(picks) == 2, plan
    for k, n in picks:
        assert int(k) < int(n), picks
    ex = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert all("orderkey" not in ln for ln in ex), ex


def test_pagerank_topk_is_take_ordered_no_nested_loop(spark):
    """copurchase_pagerank_top20's scale claims in the plan: the
    top-20 compiles to TakeOrderedAndProject (distributed per-
    partition top-k, no global sort), and no iteration degenerates
    to a nested-loop or cartesian join."""
    from sql_data_warehouse_spark.analytics import all_queries

    df = all_queries()["copurchase_pagerank_top20"].builder(
        spark, SF_SMOKE)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ngram_topk_windows_are_salted_then_bounded(spark):
    """ngram_doc_freq_topk's scale claim: the corpus-sized window
    partitions by (lang, salt) — never by lang alone — so no single
    partition carries a whole language's gram statistics."""
    from sql_data_warehouse_spark.analytics import all_queries

    df = all_queries()["ngram_doc_freq_topk"].builder(spark, SF_SMOKE)
    plan = _plan(df)
    w_specs = [ln for ln in plan.splitlines() if "Window" in ln]
    # the salt expression is projected to a _w0 column below the
    # Window node; the salted stage shows as a second partition key
    assert any("_w0" in ln for ln in w_specs), w_specs
    # the salted shuffle is the actual scale gate: the corpus-sized
    # exchange partitions by (lang, salt), never by lang alone (the
    # salt expression itself is folded into the aggregate's result
    # projection, so its text never reaches executedPlan toString)
    salted_ex = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
        and "lang" in ln and "_w0" in ln
    ]
    assert salted_ex, plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_transition_matrix_windows_are_keyed_or_aggregate(spark):
    """event_transition_matrix's scale claims: the corpus-sized LEAD
    window is partitioned by user_id (bounded per-user partitions),
    and the only other window (the normalizing SUM) runs over the
    type×type aggregate. No pairwise stage anywhere."""
    from sql_data_warehouse_spark.analytics import all_queries

    df = all_queries()["event_transition_matrix"].builder(spark, SF_SMOKE)
    plan = _plan(df)
    assert any(
        "Exchange hashpartitioning" in ln and "user_id" in ln
        for ln in plan.splitlines()
    ), plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pmi_topk_is_take_ordered_vocab_broadcast(spark):
    """pmi_collocations_topk: the final top-k compiles to
    TakeOrderedAndProject (distributed top-k, no global sort of the
    pair relation) and the vocab joins broadcast; the co-occurrence
    self-join stays keyed (no nested-loop)."""
    from sql_data_warehouse_spark.analytics import all_queries

    df = all_queries()["pmi_collocations_topk"].builder(spark, SF_SMOKE)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pareto_frontier_windows_are_bucket_partitioned(spark):
    """pareto_frontier_parts: the corpus-sized windows partition by
    the price bucket — the single-partition window is only the
    bucket-grid running max (aggregate-sized). No pairwise stage."""
    from sql_data_warehouse_spark.analytics import all_queries

    df = all_queries()["pareto_frontier_parts"].builder(spark, SF_SMOKE)
    plan = _plan(df)
    assert any(
        "Exchange hashpartitioning" in ln and "_b" in ln
        for ln in plan.splitlines()
    ), plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_triangle_counts_keyed_joins_only(spark):
    """copurchase_triangle_counts: every stage is a keyed join (apex
    wedge join, (x, y) semi-close) — no nested-loop, no cartesian;
    the wedge closer is a LeftSemi."""
    from sql_data_warehouse_spark.analytics import all_queries

    df = all_queries()["copurchase_triangle_counts"].builder(
        spark, SF_SMOKE)
    plan = _plan(df)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cms_sketch_broadcasts_no_nested_loop(spark):
    """cms_event_type_estimates: the sketch-sized relation joins the
    key probes by broadcast; no nested-loop or cartesian stage."""
    from sql_data_warehouse_spark.analytics import all_queries

    df = all_queries()["cms_event_type_estimates"].builder(spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ols_trend_downstream_is_grid_sized(spark):
    """nation_revenue_trend_ols: the nation×month grid is
    materialized once (the orders scan + broadcast dim joins live in
    the checkpoint build), so the returned plan reads the grid
    relation only — no parquet re-scan, no shuffle join; the month
    origin arrives as a 1-row broadcast cross."""
    from sql_data_warehouse_spark.analytics import all_queries

    df = all_queries()["nation_revenue_trend_ols"].builder(spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("orders.parquet") == 0, plan
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan
