"""load_table per-session plan memo: reuse and staleness hardening
(VERDICT r9 #4 / ADVICE r9: a table rewritten under sf_dir mid-session
must not be served a stale plan pinned at first read)."""

from __future__ import annotations

import os

from pyspark.sql import Row

from sql_data_warehouse_spark.sources import load_table


def test_memo_reuses_plan_object(spark, tmp_path):
    d = str(tmp_path)
    spark.createDataFrame([Row(a=1)]).coalesce(1).write.parquet(
        f"{d}/nation.parquet")
    df1 = load_table(spark, d, "nation")
    df2 = load_table(spark, d, "nation")
    assert df1 is df2


def test_memo_invalidates_on_rewrite(spark, tmp_path):
    d = str(tmp_path)
    p = f"{d}/nation.parquet"
    spark.createDataFrame([Row(a=1)]).coalesce(1).write.parquet(p)
    df1 = load_table(spark, d, "nation")
    assert [r["a"] for r in df1.collect()] == [1]
    spark.createDataFrame([Row(a=2), Row(a=3)]).coalesce(1).write.mode(
        "overwrite").parquet(p)
    os.utime(p)  # dir mtime granularity can round to the same ns
    df2 = load_table(spark, d, "nation")
    assert df2 is not df1
    assert sorted(r["a"] for r in df2.collect()) == [2, 3]
