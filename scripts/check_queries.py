#!/usr/bin/env python
"""Spot-check named registry queries against their DuckDB oracles at
sf0.01 (same comparison as the driver / tests/test_correctness.py):

    python scripts/check_queries.py name1 name2 ...
    python scripts/check_queries.py --tag tpch        # by name substring
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
sys.path.insert(0, str(Path(_REPO) / "tests"))

from sql_data_warehouse_spark.analytics import all_queries  # noqa: E402
from sql_data_warehouse_spark.session import get_spark  # noqa: E402
from oracle_harness import compare, run_oracle  # noqa: E402

SF = "/root/testdata/sf0.01"


def main() -> None:
    args = sys.argv[1:]
    queries = all_queries()
    if args and args[0] == "--module":
        mod = args[1]
        names = [n for n, q in queries.items()
                 if q.builder.__module__.endswith(mod)]
    else:
        names = args or sorted(queries)
    spark = get_spark("check")
    spark.sparkContext.setLogLevel("ERROR")
    failed = []
    for name in names:
        q = queries[name]
        t0 = time.monotonic()
        try:
            df = q.builder(spark, SF)
            if q.oracle is None:
                n = df.count()
                print(f"  {name}: rows-only {n}  [{time.monotonic()-t0:.2f}s]")
                continue
            compare(df, run_oracle(q.oracle, SF), name)
            print(f"  {name}: MATCH  [{time.monotonic()-t0:.2f}s]")
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"  {name}: FAIL {exc}")
    print("RESULT:", "ALL MATCH" if not failed else f"FAILS: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
