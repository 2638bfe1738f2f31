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

from pyspark.sql import Column, DataFrame, Window
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


def scalable_row_number(df: DataFrame, order_col: str,
                        key_col: str = "sk",
                        n_parts: int | None = None,
                        tiebreakers: tuple[str, ...] = ()) -> DataFrame:
    """Global ROW_NUMBER over a non-null numeric ``order_col`` (plus
    optional ``tiebreakers``) without the single-partition shuffle —
    the scale-safe surrogate-key generator (the reference's W2
    ``ROW_NUMBER() OVER (ORDER BY ...)`` funnels the whole relation
    through ONE reducer; fine at 100k rows, a wall at 100 TB).

    Three phases, keys equal to the global window's bit-for-bit:

    1. **Deterministic range boundaries**, computed ONCE driver-side
       (``approxQuantile`` — one column-pruned stats pass) and inlined
       as literals. This is what makes the two downstream consumers
       agree: a ``repartitionByRange`` pid would be re-sampled per
       exchange (measured: 608 duplicate keys from divergent
       boundaries between the count branch and the rank branch).
       Boundary PLACEMENT still doesn't matter for correctness — the
       bucket rule is monotone in ``order_col``, so bucket i's rows
       all precede bucket i+1's and a row's global rank is (rows in
       earlier buckets) + (local rank) regardless of where the cuts
       fall.
    2. **Local rank per bucket**: one shuffle keyed by bucket — n
       reducers each holding ~1/n of the data, never one reducer
       holding all of it.
    3. **Exact bucket counts** (map-side-combined aggregation over a
       second column-pruned scan) cumulated by one tiny window over n
       rows and broadcast back.

    **Composite order keys** (the reference's second W2 site,
    ``ROW_NUMBER() OVER (ORDER BY prd_start_dt, prd_key)``,
    load_gold.sql:51): pass the remaining key columns as
    ``tiebreakers``. Only ``order_col`` drives the range bucketing;
    the local window orders by the FULL composite key. Ties in
    ``order_col`` can never straddle a bucket boundary — the bucket
    id is a pure function of the ``order_col`` VALUE (count of cuts
    ≤ value), so two rows with equal ``order_col`` always land in the
    same bucket no matter where ``approxQuantile`` placed the cuts,
    and within that one bucket the local window applies the exact
    composite order. Rows with distinct ``order_col`` sort correctly
    across buckets because the bucket rule is monotone in
    ``order_col``. Hence: global rank = (rows in earlier buckets) +
    (composite local rank), for any boundary placement.

    Requires (``order_col``, *tiebreakers*) unique and ``order_col``
    non-null and numeric (a surrogate key needs a unique natural
    ordering anyway). Gated byte-identical to the global window by
    ``gold_dim_customers_scalable_sk`` / ``gold_dim_products_scalable_sk``
    (same DuckDB oracles as the reference-faithful forms),
    tests/test_operators.py, and the tie-stress property test in
    tests/test_properties.py."""
    spark = df.sparkSession
    n = n_parts or spark.sparkContext.defaultParallelism
    # n == 1 → no cuts (single bucket): approxQuantile rejects an
    # empty probability list, and the one-bucket plan IS the global
    # window, which is what a one-reducer request means.
    cuts = sorted(set(
        df.stat.approxQuantile(order_col, [i / n for i in range(1, n)],
                               0.001)
    )) if n > 1 else []
    bounds = F.array(*[F.lit(float(c)) for c in cuts])
    bucket = F.aggregate(
        bounds,
        F.lit(0),
        lambda acc, b: acc + F.when(
            b <= F.col(order_col).cast("double"), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    bucketed = df.withColumn("_b", bucket)
    order_keys = [F.col(order_col).asc()] + [
        F.col(c).asc() for c in tiebreakers
    ]
    local = bucketed.withColumn(
        "_lrank",
        F.row_number().over(
            Window.partitionBy("_b").orderBy(*order_keys)
        ),
    )
    counts = bucketed.groupBy("_b").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_b",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
    )
    return (
        local.join(F.broadcast(offsets), "_b")
        .withColumn(key_col, (F.col("_off") + F.col("_lrank")).cast("long"))
        .drop("_b", "_lrank", "_off")
    )


def salted_grouped_topk(df: DataFrame, group_col: str,
                        order_cols: list[Column], k: int,
                        salt_from: str, n_salts: int = 32,
                        rank_col: str = "rnk") -> DataFrame:
    """Per-group top-k under a TOTAL order without a per-group global
    window: stage 1 takes the local top-k within (group, salt)
    buckets, stage 2 ranks only the ≤ k·n_salts survivors per group.

    A direct ``row_number() OVER (PARTITION BY group)`` funnels every
    row of a group through ONE partition — the W2 global-window
    hazard when groups are huge (e.g. per-language vocabulary
    statistics: few languages, billions of grams). Correct for any
    total order because each member of the true per-group top-k is
    within the top-k of its own salt class under the same order —
    the same containment argument as
    ``curation.source_quota_cap`` (property-tested in
    tests/test_properties.py). ``order_cols`` must be a TOTAL order
    (include a tiebreaker) or ranks are nondeterministic in any
    formulation."""
    salt = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    w_local = Window.partitionBy(group_col, salt).orderBy(*order_cols)
    pruned = (
        df.withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= k)
        .drop("_lr")
    )
    w_global = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        pruned.withColumn(
            rank_col, F.row_number().over(w_global).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
