"""Cross-engine determinism helpers (Spark side + DuckDB-SQL macros).

The driver hash-compares Spark output against DuckDB output, so every
value must be bit-identical. Rules (each verified empirically against
both engines at sf0.001–sf0.1):

- Sums over doubles go through scaled int64: ``floor(x*S + 0.5)`` is
  a pure IEEE double expression, identical in both engines; the int64
  sum is exact and association-free; one final division restores the
  scale. ``S=100`` for money (cents), ``S=1e6`` for generic measures.
- ``cast(double as decimal)`` is FORBIDDEN: Spark rounds the shortest
  decimal repr (Java BigDecimal HALF_UP), DuckDB rounds the binary
  value; they disagree exactly on the .xx5 boundaries money data is
  full of.
- Temporal outputs are always TIMESTAMP, never DATE (pandas dtype
  divergence: datetime.date objects vs datetime64).
- Integer division: both Spark ``div`` and DuckDB ``//`` truncate
  toward zero (T-SQL semantics).
- Sub-second time arithmetic uses exact integer microseconds
  (``unix_micros`` / ``epoch_us``), never double epochs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- DuckDB-side macro snippets (format with the inner expr) ---
CENTS_SQL = "CAST(floor(({expr}) * 100.0 + 0.5) AS BIGINT)"
MONEY_SUM_SQL = (
    "CAST(SUM(CAST(floor(({expr}) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0"
)
MICROS_SQL = "CAST(floor(({expr}) * 1000000.0 + 0.5) AS BIGINT)"
MICRO_SUM_SQL = (
    "CAST(SUM(CAST(floor(({expr}) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0"
)
# T-SQL DATEDIFF(MONTH, a, b) boundary count.
DATEDIFF_MONTH_SQL = (
    "CAST((year({b}) - year({a})) * 12 + (month({b}) - month({a})) AS INTEGER)"
)


def cents(col: Column) -> Column:
    """Money → exact integer cents (bit-identical to ``CENTS_SQL``)."""
    return F.floor(col * F.lit(100.0) + F.lit(0.5)).cast("long")


def money_sum(col: Column) -> Column:
    """Deterministic money sum: int64 cents sum, one final division."""
    return F.sum(cents(col)).cast("double") / F.lit(100.0)


def micros(col: Column) -> Column:
    """Generic double measure → scaled int64 at 1e-6 resolution."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)).cast("long")


def micro_sum(col: Column) -> Column:
    return F.sum(micros(col)).cast("double") / F.lit(1000000.0)
