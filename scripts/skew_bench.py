"""Measured skew evidence for BASELINE.md.

Builds a pathologically skewed join at sf1 scale (events ×10 with
30% of rows remapped to ONE hot user), then times three plans:

1. naive sort-merge join, AQE skew splitting OFF — the failure mode
2. the same join with AQE skew splitting ON — Spark's runtime fix
3. the explicit salted join (operators/skew.py) with AQE OFF — the
   portable fix for engines/paths where AQE can't see the skew
   (e.g. when the skewed side must pair with a replicated build)

All three must return identical aggregate results (asserted).
Usage: python scripts/skew_bench.py [sf_dir=/tmp/sf1]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sql_data_warehouse_spark.operators.skew import salted_join
from sql_data_warehouse_spark.session import get_spark
from sql_data_warehouse_spark.sources import load_table

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"

spark = get_spark("skew-bench", master="local[32]",
                  **{"spark.ui.enabled": "false",
                     "spark.sql.shuffle.partitions": "32"})

# 50M synthetic rows (events at sf1 are only 1M — too small for the
# hot key to hurt); 30% land on user 0, the rest spread over 100k
# users. sf_dir is kept for provenance; the shape matches events.
N = 50_000_000
skewed = (
    spark.range(0, N, 1, 64)
    .select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 10 < 3, F.lit(0))
        .otherwise(F.col("id") % 100_000).alias("user_id"),
        ((F.col("id") % 1000) / F.lit(7.0)).alias("value"),
    )
    .persist()
)
dim = (
    skewed.select("user_id").distinct()
    .withColumn("segment", F.concat(F.lit("seg"), F.col("user_id") % 7))
    .persist()
)
n = skewed.count()
print(f"rows={n}, hot-user share={skewed.filter('user_id=0').count()/n:.2f}")
dim.count()


def run(tag, autoskew, fn):
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(autoskew).lower())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    t0 = time.time()
    out = fn().groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 1e6 + 0.5).cast("long")).alias("v"),
    ).collect()
    dt = time.time() - t0
    print(f"{tag}: {dt:.1f}s")
    return dt, sorted((r["segment"], r["n"], r["v"]) for r in out)


d1, r1 = run("naive sort-merge, AQE skew OFF", False,
             lambda: skewed.join(dim, "user_id"))
d2, r2 = run("sort-merge, AQE skew ON      ", True,
             lambda: skewed.join(dim, "user_id"))
d3, r3 = run("explicit salted join, AQE OFF", False,
             lambda: salted_join(skewed, dim, "user_id", "event_id", 16))
assert r1 == r2 == r3, "plans disagree!"
print("results identical across all three plans")
