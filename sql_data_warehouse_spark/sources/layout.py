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

from pyspark.sql import Column, DataFrame, SparkSession
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


# --------------------------------------------------------------- Z-order

_Z_BITS = 16


def zorder_key(a: Column, b: Column,
               a_min: float, a_max: float,
               b_min: float, b_max: float) -> Column:
    """Z-order (Morton) sort key for two numeric columns: each value
    is min-max-normalized to 16 bits and the bits are interleaved, so
    sorting by the key lays rows out along a space-filling curve —
    nearby (a, b) rectangles land in the same files.

    Why it matters at 100 TB: range partitioning on ONE column gives
    per-file min/max stats that prune scans on that column only;
    Z-ordering bounds every file to a compact rectangle in BOTH
    dimensions, so stats-based pruning (TxnTable.read(prune=...),
    parquet row-group skipping, Delta/Iceberg data skipping) works on
    either predicate. Pure bit arithmetic — whole-stage codegen, no
    UDF."""
    def _scaled(c: Column, lo: float, hi: float) -> Column:
        span = (hi - lo) or 1.0
        x = (c.cast("double") - F.lit(float(lo))) / F.lit(float(span))
        x = F.least(F.greatest(x, F.lit(0.0)), F.lit(1.0))
        return F.floor(x * F.lit(float((1 << _Z_BITS) - 1))).cast("long")

    sa, sb = _scaled(a, a_min, a_max), _scaled(b, b_min, b_max)
    z = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        bit_a = F.shiftright(sa, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(sb, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(bit_a, 2 * i + 1)) \
             .bitwiseOR(F.shiftleft(bit_b, 2 * i))
    return z


def zorder_frame(df: DataFrame, col_a: str, col_b: str,
                 n_files: int = 16) -> DataFrame:
    """Range-partition ``df`` by the Z-key of (col_a, col_b) —
    feed the result to any writer (plain parquet, TxnTable.overwrite
    with ``stat_cols=(col_a, col_b)``) to get files whose min/max
    stats are tight in BOTH columns. Bounds come from one tiny
    2-aggregate pass."""
    r = df.agg(
        F.min(col_a).alias("a0"), F.max(col_a).alias("a1"),
        F.min(col_b).alias("b0"), F.max(col_b).alias("b1"),
    ).collect()[0]
    z = zorder_key(
        F.col(col_a), F.col(col_b),
        float(r["a0"]), float(r["a1"]), float(r["b0"]), float(r["b1"]),
    )
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
