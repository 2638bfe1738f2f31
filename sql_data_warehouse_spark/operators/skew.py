"""Skew mitigation primitives.

AQE's skew-join splitting (enabled in session defaults) handles most
skew at runtime; these explicit operators cover the cases AQE can't:
aggregations with pathological hot keys, and joins where the skewed
side must pair with a *replicated* build side.

- **Two-phase (salted) aggregation**: append a random-ish salt to the
  grouping key, partially aggregate on (key, salt) — hot keys spread
  over `n_salts` reducers — then finalize on the key. For algebraic
  aggregates (count/sum/min/max) the result is identical to a direct
  groupBy. Spark's map-side partial aggregation already does this
  implicitly per-task; the explicit salt helps when a single key
  exceeds what ONE reducer can hold in the final shuffle.
- **Salted join**: salt the skewed (big) side, replicate each build
  row `n_salts` times with matching salts — every reducer gets
  1/n_salts of the hot key's rows.

The salt must be deterministic for the oracle gate, so it's derived
from a stable row attribute (hash of a secondary column), not rand().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_by_key(df: DataFrame, key: str, salt_from: str,
                        n_salts: int = 16) -> DataFrame:
    """groupBy(key).count() robust to hot keys: partial counts on
    (key, salt) then a final sum over the tiny per-key salt rows.
    Output: (key, n) — identical to the direct aggregation."""
    salt = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return partial.groupBy(key).agg(F.sum("__n").cast("long").alias("n"))


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_from: str, n_salts: int = 16) -> DataFrame:
    """Equi-join where `big` has hot keys and `small` is too large to
    broadcast: salt the big side, explode the small side across all
    salts, join on (key, salt). Row multiplicity identical to the
    plain join."""
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    )
    exploded_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(exploded_small, [key, "__salt"]).drop("__salt")
