"""Simulates the driver: loads __spark_entry__ by path from a foreign cwd,
builds a DEFAULT SparkSession (none of the repo's configs), runs entry()
+ every queries() entry at sf0.01, runs oracle_sql() in DuckDB, and
hash-compares values order-insensitively."""
import hashlib, importlib.util, os, sys
os.chdir("/tmp")
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)

from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[4]").config("spark.ui.enabled","false").getOrCreate()

import duckdb, pandas as pd, datetime as dt, math
TABLES = ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]
SF=os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(df):
    cols = sorted(df.columns); df = df[cols]
    rows=[]
    for r in df.itertuples(index=False, name=None):
        vals=[]
        for v in r:
            if v is None or v is pd.NaT or (isinstance(v,float) and math.isnan(v)): vals.append("NULL")
            elif isinstance(v,float): vals.append(repr(v))
            elif hasattr(v,"item"): vals.append(canonv(v.item()))
            else: vals.append(str(v))
        rows.append("|".join(vals))
    rows.sort()
    return cols, hashlib.sha256("\n".join(rows).encode()).hexdigest(), len(rows)
def canonv(v):
    if isinstance(v,float): return repr(v)
    return str(v)

e = mod.entry(spark)
n = len(e.collect())
print(f"entry(): {n} rows, schema={[f.name for f in e.schema]}")
assert n > 0

qs, os_ = mod.queries(), mod.oracle_sql()
only = os.environ.get("SPARK_GRAFT_QUERIES")
if only:
    names = [n.strip() for n in only.split(",") if n.strip()]
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown query names: {unknown}")
    qs = {n: qs[n] for n in names}
print(f"{len(qs)} queries, {len(os_)} oracles")
fails=[]
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF).toPandas()
    if name not in os_:
        print(f"  {name}: rows-only {len(sdf)}"); continue
    odf = con.sql(os_[name]).df()
    sc, sh, sn = canon(sdf); oc, oh, on = canon(odf)
    ok = (sc==oc) and (sh==oh) and (sn==on)
    print(f"  {name}: {'MATCH' if ok else 'MISMATCH'} rows={sn}/{on}")
    if not ok:
        fails.append(name)
        if sc!=oc: print(f"    cols: {sc} vs {oc}")
print("RESULT:", "ALL MATCH" if not fails else f"FAILS: {fails}")
sys.exit(1 if fails else 0)
