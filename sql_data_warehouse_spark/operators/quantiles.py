"""Exact distributed quantiles WITHOUT a global per-group sort.

The reference's analysis scripts reach for medians/ranges via ORDER BY
over the whole relation (e.g. `/root/reference/scripts/analysis/
03_date_range_exploration.sql`'s MIN/MAX framing and the ranking
windows in `06_ranking_analysis.sql`); the engine behind T-SQL sorts
per partition. At 100 TB a per-group full sort is the bottleneck —
and `percentile_approx` trades exactness away. This module is the
scale path for EXACT type-1 quantiles:

Two-level histogram rank-select (the classic distributed selection
rewrite):

1. Bucket every value into FIXED-WIDTH bins (``v div width`` — data-
   independent, so the bucketing is one narrow projection, no
   boundary sampling pass, no ``approxQuantile`` driver round-trip).
2. One shuffle builds the per-(group, bucket) histogram — output is
   ``groups × buckets`` rows, independent of fact count.
3. A window over that TINY histogram (per-group partitions of
   ~dozens of bucket rows) finds, for each requested percentile, the
   single bucket whose cumulative count straddles the target rank
   ``ceil(p·n/100)`` and the residual rank inside it.
4. The selector (groups × percentiles rows) BROADCASTS back onto the
   bucketed facts; only rows landing in a selected bucket survive the
   join, and a row_number window partitioned by (group, percentile)
   sorts just those ~n/buckets rows to pick the residual rank.

No stage sorts more than one bucket's worth of rows per (group,
percentile); every exchange after step 2 is broadcast-sized. Ties are
immaterial: equal values share a bucket, and rank-select only reads
the VALUE at the rank, which is identical under any tie order.

Type-1 ("inverted CDF") semantics: the quantile is the value at rank
``ceil(p·n/100)``, 1-indexed ascending — for even n the median is the
LOWER middle value. All arithmetic is exact integers (``(p·n + 99)
div 100``), so the DuckDB oracle twin reproduces it bit-for-bit from
the definitional ``ROW_NUMBER`` form — an independent derivation, the
same twin discipline as ``operators/skew.scalable_row_number``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_exact_quantiles(
    df: DataFrame,
    grp: str,
    val: str,
    percents: list[int],
    bucket_width: int,
) -> DataFrame:
    """Exact type-1 percentiles of integer column ``val`` per ``grp``.

    Returns one row per (group, percentile): ``[grp, q_pct, q_val,
    n]`` where ``q_val`` is the value at rank ``ceil(q_pct·n/100)``
    of the ascending per-group order and ``n`` the group size.

    ``val`` must be non-negative integers (``div`` truncates toward
    zero, which would misorder negative buckets); callers quantize
    money to cents first. ``bucket_width`` trades selector fan-in
    (domain/width buckets in the histogram) against step-4 sort size
    (≤ width distinct values' rows per group) — pick it so both are
    thousands, not millions, at the target scale.
    """
    b = df.select(
        F.col(grp), F.col(val).alias("v"),
    ).withColumn("bkt", F.expr(f"v div {bucket_width}"))

    # one corpus-sized shuffle: the (group, bucket) histogram
    hist = b.groupBy(grp, "bkt").agg(F.count(F.lit(1)).alias("cnt"))

    # grid-sized window: per-group partitions hold ~domain/width rows
    w = Window.partitionBy(grp).orderBy("bkt")
    cum = (
        hist.withColumn("cum_thru", F.sum("cnt").over(w))
        .withColumn("cum_before", F.col("cum_thru") - F.col("cnt"))
    )
    n = hist.groupBy(grp).agg(F.sum("cnt").alias("n"))

    sel = (
        cum.join(n, grp)
        .withColumn(
            "q_pct", F.explode(F.array(*[F.lit(p) for p in percents]))
        )
        .withColumn("target", F.expr("(q_pct * n + 99) div 100"))
        .filter(
            (F.col("cum_before") < F.col("target"))
            & (F.col("target") <= F.col("cum_thru"))
        )
        .select(
            grp, "q_pct", "bkt",
            (F.col("target") - F.col("cum_before")).alias("rank_in"),
            "n",
        )
    )

    # selector is groups × percentiles rows — broadcast it, so the
    # only rows that reach the rank window live in selected buckets
    cand = b.join(F.broadcast(sel), [grp, "bkt"])
    w2 = Window.partitionBy(grp, "q_pct").orderBy("v")
    return (
        cand.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == F.col("rank_in"))
        .select(grp, "q_pct", F.col("v").alias("q_val"), "n")
    )


def type1_quantile_sql(
    rel: str, grp: str, val: str, percents: list[int],
) -> str:
    """Definitional DuckDB twin: full per-group ROW_NUMBER sort, value
    at rank ``(p·n + 99) // 100`` — an INDEPENDENT derivation of the
    same type-1 semantics (no bucketing), so the oracle gate checks
    the two-level rewrite against the textbook definition. Returns a
    relation ``[{grp}, q_pct, q_val, n]`` matching
    :func:`grouped_exact_quantiles`."""
    branches = "\n          UNION ALL\n".join(
        f"""          SELECT {grp}, CAST({p} AS INT) AS q_pct,
                 MIN(CASE WHEN rn = ({p} * n + 99) // 100
                          THEN {val} END) AS q_val,
                 MAX(n) AS n
          FROM r GROUP BY {grp}"""
        for p in percents
    )
    return f"""
        WITH r AS (
          SELECT {grp}, {val},
                 ROW_NUMBER() OVER (PARTITION BY {grp}
                                    ORDER BY {val}) AS rn,
                 CAST(COUNT(*) OVER (PARTITION BY {grp}) AS BIGINT) AS n
          FROM {rel}
        )
{branches}
    """


def scalable_ntile(
    df: DataFrame,
    val: str,
    key: str,
    n_tiles: int,
    bucket_width: int,
) -> DataFrame:
    """NTILE(n) over ``ORDER BY val DESC, key ASC`` WITHOUT the global
    sort — the decile/percentile-bucketing companion to
    :func:`grouped_exact_quantiles` and the NTILE analogue of
    ``operators/skew.scalable_row_number``.

    NTILE is rank arithmetic, not value arithmetic: with n rows, the
    first ``n mod t`` tiles hold ``n div t + 1`` rows, the rest
    ``n div t`` — equal values SPLIT across tiles by the key
    tiebreak, so value-only boundaries (a quantile bucketing) would
    diverge whenever a tie straddles a tile edge. This computes the
    t−1 exact BOUNDARY PAIRS (val, key) at the cumulative tile ranks
    ``r_i = i·(n div t) + min(i, n mod t)`` by two-level histogram
    rank-select (fixed-width value bins → locate the bin holding each
    r_i on the bin histogram → in-bin row_number picks the residual
    rank, tie-broken by the key), then broadcasts ONE row carrying
    all boundary pairs and assigns each input row ``tile = 1 + #
    boundaries strictly ahead of it`` in (val DESC, key ASC) order.

    Requires n ≥ n_tiles rows and unique ``key`` (both hold for any
    keyed relation worth bucketing). No stage sorts more than one
    value-bin's rows; the only unpartitioned window runs on the BIN
    HISTOGRAM (domain/width rows), and the assignment join is the
    sanctioned broadcast-one-row-aggregate cross.

    Returns the input rows with a ``tile`` column (int, 1-based).
    """
    b = df.select(
        F.col(key).alias("k"), F.col(val).alias("v"),
    ).withColumn("bkt", F.expr(f"v div {bucket_width}"))

    hist = b.groupBy("bkt").agg(F.count(F.lit(1)).alias("cnt"))
    # DESC value order ⇒ DESC bucket order; histogram-sized window
    w = Window.orderBy(F.desc("bkt"))
    cum = (
        hist.withColumn("cum_thru", F.sum("cnt").over(w))
        .withColumn("cum_before", F.col("cum_thru") - F.col("cnt"))
    )
    n = hist.agg(F.sum("cnt").alias("n"))
    sel = (
        cum.crossJoin(F.broadcast(n))
        .withColumn(
            "i", F.explode(F.array(*[F.lit(i) for i in
                                     range(1, n_tiles)]))
        )
        .withColumn(
            "target",
            F.expr(f"i * (n div {n_tiles}) + least(i, n % {n_tiles})"),
        )
        .filter(
            (F.col("cum_before") < F.col("target"))
            & (F.col("target") <= F.col("cum_thru"))
        )
        .select("i", "bkt",
                (F.col("target") - F.col("cum_before")).alias("rank_in"))
    )

    cand = b.join(F.broadcast(sel), "bkt")
    w2 = Window.partitionBy("i").orderBy(F.desc("v"), F.asc("k"))
    bounds = (
        cand.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == F.col("rank_in"))
        .groupBy()
        .agg(*[
            agg
            for i in range(1, n_tiles)
            for agg in (
                F.min(F.when(F.col("i") == i, F.col("v")))
                .alias(f"bv{i}"),
                F.min(F.when(F.col("i") == i, F.col("k")))
                .alias(f"bk{i}"),
            )
        ])
    )
    # row is AFTER boundary i (⇒ lives in a later tile) when it sorts
    # strictly behind the boundary pair in (v DESC, k ASC) order
    after = [
        F.when(
            (F.col("v") < F.col(f"bv{i}"))
            | ((F.col("v") == F.col(f"bv{i}"))
               & (F.col("k") > F.col(f"bk{i}"))),
            1,
        ).otherwise(0)
        for i in range(1, n_tiles)
    ]
    tile = sum(after[1:], after[0]) + F.lit(1)
    return (
        b.crossJoin(F.broadcast(bounds))
        .select(
            F.col("k").alias(key), F.col("v").alias(val),
            tile.cast("int").alias("tile"),
        )
    )


def grouped_weighted_quantiles(
    df: DataFrame,
    grp: str,
    val: str,
    weight: str,
    percents: list[int],
    bucket_width: int,
) -> DataFrame:
    """WEIGHTED type-1 percentiles: the value at which the cumulative
    WEIGHT (ascending by value) first reaches ``ceil(p·W/100)`` of
    the group's total weight W — "the price at which half the UNITS
    sold", not half the rows. Same two-level histogram shape as
    :func:`grouped_exact_quantiles` with counts replaced by integer
    weight sums; stage one pre-aggregates to DISTINCT values per
    group (ties carry summed weight), so the in-bucket cumulative
    walk is over distinct values and every rank target is exact
    BIGINT arithmetic. Returns ``[grp, q_pct, q_val, w_total]``.

    ``weight`` must be positive integers (quantize first); zero-weight
    rows would make the "first value reaching the target" sensitive
    to tie order between a zero-weight value and its successor."""
    b = (
        df.select(F.col(grp), F.col(val).alias("v"),
                  F.col(weight).alias("w"))
        .groupBy(grp, "v")
        .agg(F.sum("w").alias("w"))
        .withColumn("bkt", F.expr(f"v div {bucket_width}"))
    )
    hist = b.groupBy(grp, "bkt").agg(F.sum("w").alias("wb"))
    wgrid = Window.partitionBy(grp).orderBy("bkt")
    cum = (
        hist.withColumn("cum_thru", F.sum("wb").over(wgrid))
        .withColumn("cum_before", F.col("cum_thru") - F.col("wb"))
    )
    tot = hist.groupBy(grp).agg(F.sum("wb").alias("w_total"))
    sel = (
        cum.join(tot, grp)
        .withColumn(
            "q_pct", F.explode(F.array(*[F.lit(p) for p in percents]))
        )
        .withColumn("target", F.expr("(q_pct * w_total + 99) div 100"))
        .filter(
            (F.col("cum_before") < F.col("target"))
            & (F.col("target") <= F.col("cum_thru"))
        )
        .select(
            grp, "q_pct", "bkt",
            (F.col("target") - F.col("cum_before")).alias("rank_in"),
            "w_total",
        )
    )
    cand = b.join(F.broadcast(sel), [grp, "bkt"])
    w2 = Window.partitionBy(grp, "q_pct").orderBy("v")
    return (
        cand.withColumn("cumw", F.sum("w").over(w2))
        .groupBy(grp, "q_pct")
        .agg(
            F.min(F.when(F.col("cumw") >= F.col("rank_in"), F.col("v")))
            .alias("q_val"),
            F.max("w_total").alias("w_total"),
        )
    )


def weighted_type1_quantile_sql(
    rel: str, grp: str, val: str, weight: str, percents: list[int],
) -> str:
    """Definitional DuckDB twin of :func:`grouped_weighted_quantiles`:
    one cumulative-weight window over the distinct values per group —
    the single-sort plan the two-level rewrite avoids."""
    branches = "\n          UNION ALL\n".join(
        f"""          SELECT {grp}, CAST({p} AS INT) AS q_pct,
                 MIN(CASE WHEN cumw >= ({p} * wt + 99) // 100
                          THEN v END) AS q_val,
                 MAX(wt) AS w_total
          FROM r GROUP BY {grp}"""
        for p in percents
    )
    return f"""
        WITH d AS (
          SELECT {grp}, {val} AS v,
                 CAST(SUM({weight}) AS BIGINT) AS w
          FROM {rel} GROUP BY {grp}, {val}
        ),
        r AS (
          SELECT {grp}, v,
                 CAST(SUM(w) OVER (PARTITION BY {grp} ORDER BY v)
                      AS BIGINT) AS cumw,
                 CAST(SUM(w) OVER (PARTITION BY {grp}) AS BIGINT) AS wt
          FROM d
        )
{branches}
    """
