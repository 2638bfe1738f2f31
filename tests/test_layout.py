"""Physical-layout verification: the 100 TB design claims in
sources/layout.py must be visible in the actual physical plans —
partition pruning on time predicates, zero-shuffle bucketed joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_data_warehouse_spark.sources import load_table
from sql_data_warehouse_spark.sources.layout import (
    write_bucketed_table,
    write_time_partitioned,
)

from .conftest import SF_SMOKE


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_time_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "events_part")
    write_time_partitioned(
        load_table(spark, SF_SMOKE, "events"), path, "ts", "date"
    )
    df = spark.read.parquet(path).filter(F.col("ts_date") == "2024-01-02")
    plan = _physical_plan(df)
    # The partition predicate must land in PartitionFilters (directory
    # pruning), not PushedFilters (row-group filtering after listing).
    assert "PartitionFilters" in plan
    assert "ts_date" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    # Pruned read returns exactly the partition's rows.
    full = spark.read.parquet(path)
    want = full.filter(F.col("ts_date") == "2024-01-02").count()
    assert df.count() == want and want > 0


def test_bucketed_join_no_shuffle(spark, tmp_path):
    write_bucketed_table(
        load_table(spark, SF_SMOKE, "orders"), "t_bkt_orders", "o_orderkey", 4
    )
    write_bucketed_table(
        load_table(spark, SF_SMOKE, "lineitem"), "t_bkt_lineitem", "l_orderkey", 4
    )
    o = spark.table("t_bkt_orders")
    li = spark.table("t_bkt_lineitem")
    joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderkey").count()
    plan = _physical_plan(joined)
    # Bucket co-location: the join itself needs no Exchange. (The
    # final groupBy on the same key also reuses the bucketing.)
    join_section = plan.split("SortMergeJoin")[0] if "SortMergeJoin" in plan else plan
    assert "Exchange hashpartitioning" not in join_section, plan[:2000]
    # Same results as the flat join.
    flat_o = load_table(spark, SF_SMOKE, "orders")
    flat_li = load_table(spark, SF_SMOKE, "lineitem")
    flat = (
        flat_o.join(flat_li, flat_o.o_orderkey == flat_li.l_orderkey)
        .groupBy("o_orderkey")
        .count()
    )
    assert joined.count() == flat.count()


def test_decontaminate_broadcasts_benchmark(spark):
    """The corpus side must never shuffle on gram: benchmark grams
    broadcast into a hash join."""
    from sql_data_warehouse_spark.analytics.curation import (
        decontaminate_benchmark,
    )

    plan = _physical_plan(decontaminate_benchmark(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_range_join_is_equi_join(spark):
    """The bucketized interval join must compile to an equi-join,
    never the quadratic BroadcastNestedLoopJoin that a naive
    inequality join produces."""
    from sql_data_warehouse_spark.streaming.events_batch import (
        events_range_join_attribution,
    )

    plan = _physical_plan(events_range_join_attribution(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_pricing_summary_pushdown_and_partial_agg(spark):
    """TPC-H Q1: the ship-date filter reaches the parquet scan and
    the aggregation is two-phase (map-side partial + final)."""
    from sql_data_warehouse_spark.analytics.core import (
        lineitem_pricing_summary,
    )

    plan = _physical_plan(lineitem_pricing_summary(spark, SF_SMOKE))
    pushed = plan.split("PushedFilters:", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """Z-ordered files have tight min/max rectangles in BOTH columns,
    so TxnTable stats-pruning skips files for predicates on either —
    range layout on one column only helps that column."""
    from pyspark.sql import Row

    from sql_data_warehouse_spark.sources.layout import zorder_frame
    from sql_data_warehouse_spark.sources.txn import TxnTable

    # b must NOT be a linear function of a (linear maps preserve
    # range clustering mod 1000); the quadratic term decorrelates
    rows = [Row(a=(i * 7919) % 1000, b=(i * i * 31 + i) % 997)
            for i in range(20000)]
    df = spark.createDataFrame(rows)

    ztbl = TxnTable(str(tmp_path / "z"))
    ztbl.overwrite(zorder_frame(df, "a", "b", n_files=16),
                   stat_cols=("a", "b"))
    rtbl = TxnTable(str(tmp_path / "r"))
    rtbl.overwrite(df.repartitionByRange(16, "a"), stat_cols=("a", "b"))

    def files_read(tbl, col):
        v = tbl.latest_version()
        total = len(tbl._files(v))
        kept = len([
            f for f in tbl._files(v)
            if not (f.stats[col]["max"] < 0 or f.stats[col]["min"] > 99)
        ])
        return kept, total

    zk_a, zn = files_read(ztbl, "a")
    zk_b, _ = files_read(ztbl, "b")
    rk_a, rn = files_read(rtbl, "a")
    rk_b, _ = files_read(rtbl, "b")
    # range layout: great on a, useless on b (every file spans ~all b)
    assert rk_a <= rn // 4
    assert rk_b >= rn - 1
    # z-order: skips a substantial fraction on BOTH dimensions
    assert zk_a <= zn // 2, (zk_a, zn)
    assert zk_b <= zn // 2, (zk_b, zn)
    # and pruned reads return exactly the right rows
    got = ztbl.read(spark, prune=("b", 0, 99)).filter("b <= 99").count()
    want = df.filter("b <= 99").count()
    assert got == want


def test_lsh_index_partition_pruning(spark, tmp_path):
    """The (band, bucket)-partitioned LSH index must prune at the
    DIRECTORY level: the query-bucket predicate lands in
    PartitionFilters (not PushedFilters), the pruned read touches a
    strict subset of the index's files, and the pruned search returns
    exactly the unpruned result."""
    from pyspark.sql import functions as F

    from sql_data_warehouse_spark.operators.similarity import (
        lsh_index_topk, lsh_index_write,
    )

    path = str(tmp_path / "lsh_idx")
    emb = load_table(spark, SF_SMOKE, "embeddings")
    lsh_index_write(emb, path)

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = lsh_index_topk(spark, path, queries, k=10)
    plan = _physical_plan(out)
    part = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "band" in part and "bucket" in part, part

    # Directory pruning is REAL, not just a plan annotation: delete a
    # parquet file from a (band, bucket) directory the queries don't
    # need — AFTER both DataFrames have listed the index (the
    # InMemoryFileIndex is built at spark.read.parquet time, and
    # ignoreMissingFiles defaults to false). The pruned search never
    # schedules that file, so it still succeeds; a full scan of the
    # same listing fails on it.
    import os

    from sql_data_warehouse_spark.operators.similarity import (
        SIM_LSH_BANDS, _bucket_array_seqfold,
    )

    full = spark.read.parquet(path)
    needed = {
        (b, int(r["bks"][b]))
        for r in queries.select(
            _bucket_array_seqfold("embedding", 8, 4, 64).alias("bks")
        ).collect()
        for b in range(SIM_LSH_BANDS)
    }
    victim = None
    for band in range(SIM_LSH_BANDS):
        for bucket in range(16):
            d = f"{path}/band={band}/bucket={bucket}"
            if (band, bucket) not in needed and os.path.isdir(d):
                files = [f for f in os.listdir(d) if f.endswith(".parquet")]
                if files:
                    victim = f"{d}/{files[0]}"
                    break
        if victim:
            break
    assert victim, "no unneeded bucket directory to sacrifice"
    os.remove(victim)

    got = out.groupBy("query_id").count().collect()  # pruned: succeeds
    assert all(r["count"] == 10 for r in got), got
    with pytest.raises(Exception):
        full.count()  # unpruned over the same listing: hits the hole
