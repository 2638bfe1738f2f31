"""Skyline (Pareto frontier) operator — the classic multi-criteria
OLAP query the reference's ranking family (`/root/reference/scripts/
analysis/06_ranking_analysis.sql`) stops short of: "best" rows when
two measures pull in opposite directions (cheapest AND biggest), i.e.
rows no other row dominates.

Scale design — the 2-D skyline needs NO pairwise work at all:

- Dominators of a row always sit at (price ≤, size ≥), so after
  bucketing the minimized axis into ORDERED, DISJOINT fixed-width
  ranges, every strictly-cheaper-bucket dominator is summarized by a
  per-bucket MAX — a bucket-count-sized aggregate, running-maxed with
  an aggregate-grid window (rows ≈ buckets, never ≈ input).
- Within a bucket, strictly-cheaper rows are covered by a
  VALUE-RANGE window frame (``rangeBetween(unboundedPreceding, -1)``
  on integer cents — excludes price ties exactly), and price-ties by
  a per-(bucket, price) MAX. Both windows partition by bucket, so no
  partition ever exceeds a bucket's row count — the same
  range-bucketed-window pattern as :mod:`.skew`'s scalable surrogate
  keys, and the fixed bucket width keeps the bucket relation
  sf-proportional without a quantile pass.

Correctness of the split (proof in :func:`pareto_frontier_2d`):
  keep x ⟺ size(x) > max{size(o) : price(o) < price(x)}   (strict-cheaper)
         ∧ size(x) = max{size(o) : price(o) = price(x)}   (price ties)
The first max decomposes exactly into (lower buckets' running max,
in-bucket strict-range max) because bucket ranges are disjoint and
ordered: o in a lower bucket ⟹ price(o) < price(x), and equal prices
share a bucket. Ties on BOTH axes are all kept (no strict edge) —
matching the NOT EXISTS dominance oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier_2d(df: DataFrame, min_col: str, max_col: str,
                       bucket_width: int = 500) -> DataFrame:
    """Rows not dominated on (minimize ``min_col``, maximize
    ``max_col``) — both integer-valued columns. A row x is dominated
    iff some o has (o.min ≤ x.min ∧ o.max ≥ x.max) with at least one
    strict; survivors keep all input columns.

    keep x ⟺ max_col(x) > running-max over strictly smaller min_col
           ∧ max_col(x) = group-max over equal min_col
    (see module docstring for why the bucket split computes exactly
    the strictly-smaller running max)."""
    b = (F.col(min_col) / F.lit(bucket_width)).cast("long").alias("_b")
    rows = df.select("*", b)
    # Bucket summary grid: rows ≈ #buckets. The running max over
    # PRECEDING buckets is an aggregate-grid window (module header
    # rule: global windows only over aggregate-sized relations).
    bstats = rows.groupBy("_b").agg(F.max(max_col).alias("_bmax"))
    wprev = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, -1)
    bprev = bstats.select(
        "_b", F.max("_bmax").over(wprev).alias("_prevmax"))
    # In-bucket windows: value-range frame on the integer minimize
    # axis excludes ties exactly; both partition by bucket.
    wstrict = (
        Window.partitionBy("_b").orderBy(F.col(min_col).cast("long"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    weq = Window.partitionBy("_b", min_col)
    lows = F.lit(-(1 << 62)).cast("long")
    flagged = (
        rows.join(F.broadcast(bprev), "_b")
        .select(
            "*",
            F.coalesce(F.max(max_col).over(wstrict), lows).alias("_smax"),
            F.max(max_col).over(weq).alias("_emax"),
        )
    )
    keep = (
        (F.col(max_col) > F.greatest(F.coalesce("_prevmax", lows),
                                     F.col("_smax")))
        & (F.col(max_col) == F.col("_emax"))
    )
    return flagged.filter(keep).drop("_b", "_prevmax", "_smax", "_emax")


def pareto_frontier_sql(rel: str, min_col: str, max_col: str,
                        key_cols: str) -> str:
    """DuckDB twin: the DEFINITION, not the rewrite — quadratic
    NOT EXISTS dominance, fine at oracle scale and a genuinely
    independent derivation of the same set."""
    return f"""
        SELECT {key_cols}
        FROM {rel} a
        WHERE NOT EXISTS (
          SELECT 1 FROM {rel} o
          WHERE o.{min_col} <= a.{min_col} AND o.{max_col} >= a.{max_col}
            AND (o.{min_col} < a.{min_col} OR o.{max_col} > a.{max_col})
        )
    """
