"""As-of (point-in-time) join — an operator Spark lacks natively,
built as a composition of existing DataFrame ops (no UDFs):

    left ASOF JOIN right ON key, right.ts <= left.ts   (backward)

Mechanism: tag both sides, union, then one windowed
``last(right_payload, ignorenulls)`` per key ordered by (ts, side) —
right rows sort before left rows at equal timestamps, so the match is
inclusive. This is the canonical distributed as-of shape:

- ONE shuffle, on the join key (the union is shuffle-free).
- In-partition work is a single ordered scan — O(n log n) for the
  sort, no per-left-row probe, no range explosion.
- At 100 TB: both inputs land in the same hash-partitioning, skewed
  keys split by AQE; compare with a naive range join (quadratic per
  key) or collecting the right side (driver OOM).

Determinism: callers must ensure at most one right row per
(key, ts) — e.g. ``max_by`` pre-aggregation — otherwise which tied
row wins is unspecified (the same caveat applies to DuckDB's ASOF,
which the oracle uses as the semantic twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(left: DataFrame, right: DataFrame, key: str,
                       left_ts: str = "ts", right_ts: str = "ts",
                       right_prefix: str = "matched_") -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.ts <= left.ts`` for the same key (NULLs when no prior
    right row exists). Output: all left columns + right columns
    renamed ``{right_prefix}{col}``."""
    r_payload = F.struct(*[F.col(c) for c in right.columns])
    l_payload = F.struct(*[F.col(c) for c in left.columns])
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        r_payload.alias("__r"),
    )
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        l_payload.alias("__l"),
    )
    u = l_tagged.withColumn(
        "__r", F.lit(None).cast(r_tagged.schema["__r"].dataType)
    ).unionByName(r_tagged.withColumn("__l", F.lit(None).cast(l_tagged.schema["__l"].dataType)))
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns] + [
        F.col(f"__match.{c}").alias(f"{right_prefix}{c}") for c in right.columns
    ]
    return matched.select(*out_cols)
