"""Per-query wall-time profile of the driver contract at sf0.01.

Replicates driver_sim.py's environment (foreign cwd, default session)
but times each queries() entry (Spark side + oracle side separately)
and prints a sorted table, so we can see exactly where the driver's
time budget goes.
"""
import importlib.util, os, sys, time

os.chdir("/tmp")
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false").getOrCreate())

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

t0 = time.time()
e = mod.entry(spark)
e.collect()
print(f"entry(): {time.time()-t0:.1f}s", flush=True)

qs, os_ = mod.queries(), mod.oracle_sql()
rows = []
for name, fn in sorted(qs.items()):
    t1 = time.time()
    sdf = fn(spark, SF).toPandas()
    t_spark = time.time() - t1
    t_oracle = 0.0
    if name in os_:
        t2 = time.time()
        con.sql(os_[name]).df()
        t_oracle = time.time() - t2
    rows.append((t_spark + t_oracle, t_spark, t_oracle, name, len(sdf)))
    print(f"  {name}: spark={t_spark:.2f}s oracle={t_oracle:.2f}s rows={len(sdf)}",
          flush=True)

total = time.time() - t0
print(f"\nTOTAL: {total:.1f}s for {len(rows)} queries")
print("\nSlowest 20:")
for tt, ts, to, name, n in sorted(rows, reverse=True)[:20]:
    print(f"  {tt:6.2f}s (spark {ts:5.2f} / oracle {to:5.2f})  {name}")
