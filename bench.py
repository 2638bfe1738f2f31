#!/usr/bin/env python
"""Benchmark harness: times every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is executed with the noop sink (full computation, no
driver-side materialization) after a warm-up action, so timings
measure the engine, not collect() serialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from sql_data_warehouse_spark.analytics import all_queries  # noqa: E402
from sql_data_warehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM + file listing so the first query isn't charged
    # session-start cost.
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    timings: dict[str, float] = {}
    for name, q in all_queries().items():
        start = time.monotonic()
        df = q.builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - start, 3)
        # Per-query progress to stderr (stdout stays one JSON line).
        print(f"{timings[name]:8.2f}  {name}", file=sys.stderr, flush=True)

    out = {
        "metric": "total_query_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
