#!/usr/bin/env python
"""Synthesize a larger scale factor from /root/testdata/sf0.1 by
key-offset replication, for scaling-curve measurements (BASELINE.md).

Usage: python scripts/make_scaled_sf.py [N] [OUT_DIR]
  N        replication factor (default 10 -> ~sf1)
  OUT_DIR  output dir (default /tmp/sf1)

Each replica i is self-consistent: every key column is offset by
i * (max_key + 1) of its table, so FK joins (orders->customer,
lineitem->orders/part/supplier, events.user_id) resolve within the
replica and the join/agg cardinality characteristics scale linearly.
nation/region stay fixed (TPC-H semantics: they never scale).

Content perturbation, so similarity workloads aren't purely
degenerate:
- documents: replicas i>0 get a short ``[replica i]`` suffix
  (n_chars recomputed) — cross-replica copies stay NEAR-duplicates,
  like a real crawl corpus full of boilerplate variants.
- embeddings: replicas i>0 get deterministic per-(replica, vec, dim)
  noise in [-0.05, 0.05) — cross-replica twins keep cosine ~0.99,
  again the realistic near-dup regime.

DuckDB does the replication (a generator utility, not engine
surface; the engine under test is the PySpark package).

ROW_GROUP_SIZE 8192: DuckDB's default 122,880-row groups put the
whole 50k-row documents/embeddings tables in ONE row group — and a
parquet row group is Spark's minimum split unit, so every scan of
those tables ran as a single task regardless of maxPartitionBytes
(first sf1 run: doc_stats 40× instead of ~10×, all embeddings
queries superlinear). Real 100 TB inputs are many files/row groups;
small groups here restore the splittability the bench is supposed to
model.
"""
from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> key columns offset by i * (max(first key col) + 1)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
# FK columns take the referenced table's offset base, not their own.
FK_BASE = {"o_custkey": "customer", "l_orderkey": "orders",
           "l_partkey": "part", "l_suppkey": "supplier",
           "user_id": "events_user"}
COPY = ["region", "nation"]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1")
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    bases: dict[str, int] = {}
    for t, keys in KEYED.items():
        bases[t] = con.sql(
            f"SELECT MAX({keys[0]}) + 1 FROM '{SRC}/{t}.parquet'"
        ).fetchone()[0]
    bases["events_user"] = con.sql(
        f"SELECT MAX(user_id) + 1 FROM '{SRC}/events.parquet'"
    ).fetchone()[0]
    bases["orders"] = con.sql(
        f"SELECT MAX(o_orderkey) + 1 FROM '{SRC}/orders.parquet'"
    ).fetchone()[0]

    for t in COPY:
        shutil.copy(f"{SRC}/{t}.parquet", out / f"{t}.parquet")
        print(f"{t}: copied")

    for t, keys in KEYED.items():
        repl = [
            f"{k} + i * {bases[FK_BASE.get(k, t)]} AS {k}" for k in keys
        ]
        if t == "events":
            # DuckDB writes plain TIMESTAMP as NTZ parquet; the engine
            # (like the source testdata) expects an instant-typed ts.
            repl.append("CAST(ts AS TIMESTAMPTZ) AS ts")
        con.sql(
            f"COPY (SELECT src.* REPLACE ({', '.join(repl)}) "
            f"FROM '{SRC}/{t}.parquet' src, range({n}) t(i) ORDER BY i) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 8192)"
        )
        print(f"{t}: x{n}")

    doc_base = con.sql(
        f"SELECT MAX(doc_id) + 1 FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    con.sql(
        f"""COPY (
          SELECT doc_id + i * {doc_base} AS doc_id,
                 CASE WHEN i = 0 THEN text
                      ELSE text || ' [replica ' || i || ']' END AS text,
                 lang, source,
                 CASE WHEN i = 0 THEN n_chars
                      ELSE length(text || ' [replica ' || i || ']')
                 END AS n_chars
          FROM '{SRC}/documents.parquet' src, range({n}) t(i) ORDER BY i
        ) TO '{out}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 8192)"""
    )
    print(f"documents: x{n}")

    vec_base = con.sql(
        f"SELECT MAX(vec_id) + 1 FROM '{SRC}/embeddings.parquet'"
    ).fetchone()[0]
    con.sql(
        f"""COPY (
          SELECT vec_id + i * {vec_base} AS vec_id,
                 CASE WHEN i = 0 THEN embedding ELSE
                   list_transform(
                     list_zip(embedding, range(1, len(embedding) + 1)),
                     z -> CAST(CAST(z[1] AS DOUBLE)
                          + ((hash(i * 1000003 + z[2] * 31 + vec_id)
                              % 100) / 1000.0 - 0.05) AS FLOAT))
                 END AS embedding,
                 label
          FROM '{SRC}/embeddings.parquet' src, range({n}) t(i) ORDER BY i
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 8192)"""
    )
    print(f"embeddings: x{n}")
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
