"""Physical data layout for cluster scale — the write-side half of the
100 TB design (TESTDATA.md table notes are the contract; this module
implements them):

- **Facts partition by time** (`orders` by order month, `lineitem` by
  ship month, `events` by event date): time-range predicates prune
  whole directories before any I/O (static pruning), and dimension
  joins prune at runtime via dynamic partition pruning.
- **Facts bucket by join key** (`l_orderkey`/`o_orderkey`): two tables
  bucketed the same way co-locate matching keys, so the fact-fact
  join runs with ZERO shuffle — at 100 TB the orders⋈lineitem shuffle
  is otherwise the single largest network cost in the workload.
- **Dimensions stay unpartitioned** (broadcast side; partitioning tiny
  tables just multiplies file count).

Local testdata is single-file parquet; these writers produce the
cluster layout into a target directory so plans can be verified
(tests/test_layout.py asserts partition pruning and the shuffle-free
bucketed join on the actual physical plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_table

DEFAULT_BUCKETS = 8  # local-scale stand-in; at 100 TB size ≈ data / 1 GB


def write_time_partitioned(df: DataFrame, path: str, ts_col: str,
                           granularity: str = "month") -> None:
    """Write parquet partitioned by a derived time column. The derived
    column is appended (not replacing ts), so row-level predicates on
    the raw timestamp still push down within partitions."""
    part_col = f"{ts_col}_{granularity}"
    out = df.withColumn(
        part_col, F.date_format(F.date_trunc(granularity, F.col(ts_col)), "yyyy-MM")
        if granularity == "month"
        else F.to_date(F.col(ts_col)).cast("string")
    )
    out.write.mode("overwrite").partitionBy(part_col).parquet(path)


def write_bucketed_table(df: DataFrame, table: str, bucket_col: str,
                         n_buckets: int = DEFAULT_BUCKETS) -> None:
    """Register a bucketed+sorted catalog table: co-located,
    pre-sorted buckets let equi-joins and aggregations on the bucket
    key skip both shuffle AND sort."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def layout_facts(spark: SparkSession, sf_dir: str, out_dir: str,
                 n_buckets: int = DEFAULT_BUCKETS) -> None:
    """Produce the full cluster layout from flat testdata: partitioned
    events/lineitem/orders + bucketed orders/lineitem join tables."""
    write_time_partitioned(
        load_table(spark, sf_dir, "events"), f"{out_dir}/events", "ts", "date"
    )
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "l_shipdate", F.to_date("l_shipdate")
    )
    write_time_partitioned(li, f"{out_dir}/lineitem", "l_shipdate", "month")
    write_bucketed_table(
        load_table(spark, sf_dir, "orders"), "bkt_orders", "o_orderkey", n_buckets
    )
    write_bucketed_table(
        load_table(spark, sf_dir, "lineitem"), "bkt_lineitem", "l_orderkey", n_buckets
    )
