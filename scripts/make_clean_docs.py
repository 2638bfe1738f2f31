#!/usr/bin/env python
"""Synthesize a CLEAN (low-duplication) scaled documents table from
/root/testdata/sf0.1 — the counterpart of make_scaled_sf.py's
near-dup-dense replication, for measuring the keep-best dedup forms
when buckets are SPARSE (BASELINE.md round 4: chain vs exact on a
clean corpus).

Usage: python scripts/make_clean_docs.py [N] [OUT_DIR]
  N        replication factor (default 100 -> ~sf10 documents)
  OUT_DIR  output dir (default /tmp/sf10_clean); only
           documents.parquet is written — the keep-best queries read
           nothing else.

Replica i > 0 suffixes EVERY OTHER WORD with a replica tag, so every
word 3-shingle of a replicated doc contains at least one modified
word: cross-replica jaccard ~ 0, far below any dedup threshold. Each
replica keeps sf0.1's natural within-corpus duplication, so the ×N
corpus has the SAME duplication density as sf0.1 — "clean" — instead
of make_scaled_sf.py's N-copies-per-doc extreme regime.

DuckDB does the replication (generator utility, not engine surface).
ROW_GROUP_SIZE 8192 for splittability — see make_scaled_sf.py.
"""
from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10_clean")
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    doc_base = con.sql(
        f"SELECT MAX(doc_id) + 1 FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    con.sql(
        f"""COPY (
          SELECT doc_id + i * {doc_base} AS doc_id,
                 CASE WHEN i = 0 THEN text ELSE
                   array_to_string(
                     list_transform(
                       string_split(text, ' '),
                       (w, j) -> CASE WHEN j % 2 = 0
                                 THEN w || 'r' || i ELSE w END),
                     ' ')
                 END AS text,
                 lang, source,
                 CASE WHEN i = 0 THEN n_chars ELSE
                   length(array_to_string(
                     list_transform(
                       string_split(text, ' '),
                       (w, j) -> CASE WHEN j % 2 = 0
                                 THEN w || 'r' || i ELSE w END),
                     ' '))
                 END AS n_chars
          FROM '{SRC}/documents.parquet' src, range({n}) t(i) ORDER BY i
        ) TO '{out}/documents.parquet'
          (FORMAT PARQUET, ROW_GROUP_SIZE 8192)"""
    )
    rows = con.sql(
        f"SELECT count(*) FROM '{out}/documents.parquet'"
    ).fetchone()[0]
    print(f"documents: x{n} -> {rows} rows at {out}")


if __name__ == "__main__":
    main()
