"""Local replica of the driver's oracle gate: run each registered
query in Spark AND its oracle SQL in DuckDB on the same sf dir, then
compare row count, column names and exact values (column-name-sorted,
row-sorted) — the same shape as the driver's order-insensitive
value-hash. Exact equality here ⇒ the hash matches."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb
import pandas as pd

from sql_data_warehouse_spark.sources.tables import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            con.sql(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def _norm_val(v):
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, float):
        return None if math.isnan(v) else v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return None if pd.isna(v) else v.to_pydatetime().replace(tzinfo=None)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, dt.date):
        return dt.datetime(v.year, v.month, v.day)
    if hasattr(v, "item"):  # numpy scalar
        return _norm_val(v.item())
    if isinstance(v, (list, tuple)) or v.__class__.__name__ == "ndarray":
        return tuple(_norm_val(x) for x in v)
    return v


def normalize(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [
        tuple(_norm_val(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "?") -> None:
    spark_pdf = spark_df.toPandas()
    s_cols, s_rows = normalize(spark_pdf)
    o_cols, o_rows = normalize(oracle_pdf)
    assert s_cols == o_cols, f"{name}: column mismatch {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count {len(s_rows)} vs {len(o_rows)}"
    )
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        # Python == says 5 == 5.0, but the driver hashes STRINGS
        # ("5" vs "5.0") — a DuckDB HUGEINT→float64 column vs a
        # Spark int64 column passes a value compare and still fails
        # the driver. Enforce type-kind parity too.
        kind_mismatch = any(
            isinstance(a, float) != isinstance(b, float)
            for a, b in zip(sr, orow)
            if a is not None and b is not None
        )
        if sr != orow or kind_mismatch:
            detail = [
                f"  col {c}: spark={a!r} oracle={b!r}"
                + (f" (Δ={abs(a - b):.3e})" if isinstance(a, float) and isinstance(b, float) else "")
                for c, a, b in zip(s_cols, sr, orow)
                if a != b
                or (a is not None and b is not None
                    and isinstance(a, float) != isinstance(b, float))
            ]
            raise AssertionError(
                f"{name}: value mismatch at sorted row {i}:\n" + "\n".join(detail)
            )
