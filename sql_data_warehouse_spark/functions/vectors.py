"""Vector math over ``array<float>`` embedding columns — pure Column
expressions (F.zip_with / F.aggregate fold JVM-side; no UDFs), with
DuckDB SQL twins for the oracle gate.

Accumulation order is the array order in both engines (sequential
fold), so double results are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double (sequential fold — deterministic)."""
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(None)).otherwise(dot(a, b) / denom)


# --- DuckDB twins.  list_* lambdas fold left-to-right like Spark's
# aggregate, and element casts to DOUBLE mirror the Spark side. ---

def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(list_zip({a}, {b}), "
        f"z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))), "
        f"(acc, v) -> acc + v)"
    )


def cosine_sql(a: str, b: str) -> str:
    d = dot_sql(a, b)
    na = f"sqrt({dot_sql(a, a)})"
    nb = f"sqrt({dot_sql(b, b)})"
    return (
        f"CASE WHEN {na} * {nb} = 0 THEN NULL "
        f"ELSE {d} / ({na} * {nb}) END"
    )
