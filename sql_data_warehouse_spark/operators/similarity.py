"""Similarity search over embedding columns (``array<float>``).

Two tiers:

- **Brute-force cosine top-k** — the exact baseline: broadcast the
  (small) query set against the corpus, fold the dot product
  JVM-side, rank per query. Cost O(|queries|·|corpus|·dim) with zero
  shuffle of the corpus (queries broadcast); at 100 TB the corpus
  scan is embarrassingly parallel and the per-query top-k folds into
  a TakeOrderedAndProject-shaped aggregation.
- **Multi-band LSH ANN** — the scale path: ``n_bands`` independent
  random-hyperplane signatures of ``band_bits`` sign bits each; two
  vectors are candidates iff they collide in *any* band (the classic
  banding construction, same shape as MinHash-LSH). Per-band match
  probability for angle θ is (1-θ/π)^band_bits, so overall recall is
  1-(1-p^band_bits)^n_bands — tunable to any target without touching
  the n² exact path. Hyperplane coefficients are ±1 derived from
  md5(plane|dim) *at plan build time* (hashlib), inlined as literal
  arrays: zero runtime hashing, deterministic across engines and
  cluster layouts, no stored model.

No UDFs anywhere — ``F.zip_with``/``F.aggregate`` fold sequentially
in the JVM, which also makes double results bit-identical to the
DuckDB oracle's ``list_reduce`` (same fold order).
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import (
    cosine_fixed,
    cosine_sql,
    dot_fixed,
    norm_fixed,
)


def _cosine_pre(dot_col: Column, na: Column, nb: Column) -> Column:
    """Cosine from a precomputed dot and per-side norms — the same
    expression tree as functions.vectors.cosine evaluates, with the
    two norm folds hoisted out of the pairwise loop."""
    denom = na * nb
    return F.when(denom == 0, F.lit(None)).otherwise(dot_col / denom)

# Banding defaults sized for the testdata corpus (dim-64 embeddings,
# moderate-similarity near-dups): 8 bands × 4 bits ≈ 0.7 recall at
# cosine 0.35 while scoring ~1/16th of the pairs per band. At higher
# similarity thresholds (0.9) the same shape gives >0.99 recall; at
# larger corpora raise band_bits to keep Σ bucket² sub-quadratic.
SIM_LSH_BANDS = 8
SIM_LSH_BAND_BITS = 4
SIM_DIM = 64


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id",
                dim: int = SIM_DIM) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries``: (query_id, embedding). Output: (query_id, vec_id,
    cosine_sim, rank) with rank 1..k, deterministic tiebreak on
    vec_id."""
    # Norms are precomputed per side (identical fold → bit-identical
    # cosine) so the |queries|·|corpus| hot loop evaluates one
    # UNROLLED (codegen) dot product per pair instead of three
    # interpreted HOF folds.
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_fixed(vec_col, dim).alias("q_norm"),
    )
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("e_vec"),
        norm_fixed(vec_col, dim).alias("e_norm"),
    )
    scored = e.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        _cosine_pre(
            dot_fixed("q_vec", "e_vec", dim),
            F.col("q_norm"),
            F.col("e_norm"),
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_sql(query_filter: str, k: int = 10,
                    exclude_self: bool = False) -> str:
    """DuckDB twin of :func:`cosine_topk` where the query set is
    ``SELECT vec_id, embedding FROM embeddings WHERE {query_filter}``."""
    self_pred = "AND e.vec_id != q.vec_id" if exclude_self else ""
    return f"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec
                   FROM embeddings WHERE {query_filter}),
        scored AS (
          SELECT q.query_id, e.vec_id,
                 {cosine_sql("q.q_vec", "e.embedding")} AS cosine_sim
          FROM embeddings e CROSS JOIN q
          WHERE TRUE {self_pred}
        ),
        ranked AS (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cosine_sim DESC, vec_id ASC) AS INTEGER) AS rank
          FROM scored
        )
        SELECT query_id, vec_id, cosine_sim, rank
        FROM ranked WHERE rank <= {k}
    """


def _plane_coeffs(plane: int, dim: int) -> list[float]:
    """±1 coefficients for one deterministic pseudo-random hyperplane:
    per-dimension sign is the top bit of md5(plane|dim). Computed at
    plan build time (dim is a fixed, known property of an embedding
    column), inlined as a literal array — no runtime hashing, no
    stored model, reproducible in any engine."""
    return [
        1.0
        if hashlib.md5(f"{plane}|{i}".encode()).hexdigest()[0] in "89abcdef"
        else -1.0
        for i in range(dim)
    ]


def adaptive_band_bits(n_vectors: int,
                       target_bucket: int = 125) -> int:
    """Bits per band sized to the corpus: expected bucket size
    n/2^bits stays ≈ ``target_bucket``, keeping per-band self-join
    work Σ bucket² ≈ n·target_bucket — LINEAR in n — instead of
    letting buckets (and the quadratic-in-bucket-size join) grow with
    the corpus. The classic banding trade applies: at a fixed band
    count, more bits lowers recall for *marginal*-similarity pairs
    while true near-duplicates (cosine ≳ 0.9, per-bit collision
    probability ≳ 0.95) stay near-certain candidates — which is the
    regime bucketed near-dup detection is for. Callers that need high
    recall at low thresholds on a big corpus should raise ``n_bands``
    alongside (recall = 1-(1-p^bits)^bands)."""
    return max(
        SIM_LSH_BAND_BITS,
        math.ceil(math.log2(max(n_vectors / target_bucket, 1.0))),
    )


def _banded(embeddings: DataFrame, id_col: str, vec_col: str,
            n_bands: int, band_bits: int, dim: int) -> DataFrame:
    """One row per (vector, band): (vec_id, vec, vnorm, buckets,
    band, bucket). The L2 norm and the full bucket array are computed
    in a Project BELOW the Generate (two selects — a select mixing a
    generator with heavy expressions would re-evaluate them per
    exploded row), so each costs one fold per *vector*, not per
    band or per pair.

    Buckets come from the SEQUENTIAL ±fold
    (:func:`_bucket_array_seqfold`, bit-identical to the unrolled
    DuckDB sign bits) so every consumer of this relation is
    hash-gatable. A one-matmul-per-batch variant (numpy summation
    order, low-bit drift vs the SQL fold) was the original
    rows-only path here; it was retired when ``lsh_ann_topk`` and
    ``embedding_near_dup_lsh`` gained hash gates (VERDICT r6 ask #2)
    — the fold still vectorizes across rows, the bucket step is a
    minor cost next to pair scoring, and one bucket codepath means
    the gate covers every LSH entry."""
    pre = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        norm_fixed(vec_col, dim).alias("vnorm"),
        _bucket_array_seqfold(vec_col, n_bands, band_bits, dim)
        .alias("buckets"),
    )
    return pre.select(
        "vec_id", "vec", "vnorm", "buckets",
        F.posexplode("buckets").alias("band", "bucket"),
    )


def _first_collision(buckets_a: str, buckets_b: str) -> Column:
    """True iff the current ``band`` is the FIRST band in which the
    two bucket arrays collide — each candidate pair then survives in
    exactly one band, deduplicating without a shuffle/groupBy (and
    without scoring duplicate collisions at all)."""
    return F.expr(
        f"NOT exists(zip_with(slice({buckets_a}, 1, band), "
        f"slice({buckets_b}, 1, band), (x, y) -> x = y), p -> p)"
    )


def lsh_ann_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                 n_bands: int = SIM_LSH_BANDS,
                 band_bits: int = SIM_LSH_BAND_BITS, dim: int = SIM_DIM,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 query_id_col: str = "query_id") -> DataFrame:
    """Approximate top-k: score only corpus vectors that collide with
    the query in at least one of ``n_bands`` LSH band tables
    (recall gate: tests/test_similarity_recall.py vs the exact twin).

    Scale shape: the corpus explodes to n_bands (band, bucket) rows,
    the tiny query band table broadcasts, so the corpus never
    shuffles; at write time, cluster the corpus by (band, bucket)
    (sources/layout.py) and the join prunes the scan to the queries'
    buckets — ~p^band_bits of the corpus per band instead of all of
    it. Multi-band duplicate candidates are dropped by the
    first-collision rule (each pair survives only in the first band
    where it collides), so every candidate is scored exactly once
    with a single pre-normalized dot fold — no groupBy."""
    spark = embeddings.sparkSession
    e = _banded(embeddings, id_col, vec_col, n_bands, band_bits, dim)
    # A small corpus arrives as one scan partition and a broadcast
    # join would keep all scoring on one core; an explicit
    # (band, bucket) repartition spreads candidate scoring and is
    # exactly the clustering the corpus would be written with at
    # scale. User-specified partition counts are not coalesced by AQE.
    e = e.repartition(
        spark.sparkContext.defaultParallelism * 2, "band", "bucket"
    ).select(
        F.col("vec_id"), F.col("vec"), F.col("vnorm"),
        F.col("buckets").alias("bk_e"), "band", "bucket",
    )
    q = _banded(queries, query_id_col, vec_col,
                n_bands, band_bits, dim).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("q_vec"),
        F.col("vnorm").alias("q_norm"), F.col("buckets").alias("bk_q"),
        "band", "bucket",
    )
    scored = (
        e.join(F.broadcast(q), ["band", "bucket"])
        .filter(_first_collision("bk_e", "bk_q"))
        .select(
            "query_id",
            "vec_id",
            _cosine_seqfold("q_vec", "vec", "q_norm", "vnorm", dim)
            .alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def lsh_index_write(embeddings: DataFrame, path: str,
                    n_bands: int = SIM_LSH_BANDS,
                    band_bits: int = SIM_LSH_BAND_BITS, dim: int = SIM_DIM,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> None:
    """Materialize the LSH index as parquet PARTITIONED BY
    (band, bucket) — the write-time clustering ``lsh_ann_topk``'s
    docstring promises: one row per (vector, band) carrying the float
    vector, its prenormed L2, and the full bucket array (for
    first-collision dedup), laid out so a query-time read lists ONLY
    the directories its buckets name. At 100 TB the index is
    n_bands × corpus rows, but a k-NN query opens
    ~n_bands · n/2^band_bits of it — the directory tree IS the
    candidate filter, no scan-then-discard.

    Buckets come from the SEQUENTIAL ±fold (bit-identical to the
    unrolled SQL sign bits), so a DuckDB oracle replays the partition
    values exactly and the pruned search is hash-gatable."""
    rows = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        norm_fixed(vec_col, dim).alias("nrm"),
        _bucket_array_seqfold(vec_col, n_bands, band_bits, dim)
        .alias("bks"),
    ).select(
        "vec_id", "vec", "nrm", "bks",
        F.posexplode("bks").alias("band", "bucket"),
    )
    # Shuffle onto the directory key before the partitioned write:
    # otherwise every write task holding every (band, bucket) emits a
    # file into every directory — n_tasks × n_dirs small files. One
    # hash pass makes each directory ~one file (at 100 TB, size the
    # partition count so per-directory output ≈ the target file size).
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    (
        rows.repartition(par, "band", "bucket")
        .write.mode("overwrite")
        .partitionBy("band", "bucket")
        .parquet(path)
    )


def lsh_index_topk(spark: SparkSession, path: str, queries: DataFrame,
                   k: int = 10, n_bands: int = SIM_LSH_BANDS,
                   band_bits: int = SIM_LSH_BAND_BITS, dim: int = SIM_DIM,
                   query_id_col: str = "query_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Top-k cosine search over a written LSH index
    (:func:`lsh_index_write`), pruned at the DIRECTORY level: the
    tiny query relation's (band, bucket) pairs are collected (one
    Arrow pass over the queries — bounded driver state, ≤
    n_queries × n_bands ints) and become a partition-column
    predicate, so the scan lists only the queries' bucket
    directories (PartitionFilters in the plan — asserted in
    tests/test_layout.py); everything else of the index is never
    opened. Candidates join the broadcast queries on the carried
    bucket arrays, deduplicate via the first-collision rule (no
    shuffle), and are scored ONCE with the sequential-fold cosine —
    bit-identical to the DuckDB twin, so the whole pruned pipeline
    is hash-gated (``lsh_index_pruned_topk``)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_fixed(vec_col, dim).alias("q_nrm"),
        _bucket_array_seqfold(vec_col, n_bands, band_bits, dim)
        .alias("bk_q"),
    )
    pairs = sorted({
        (band, int(r["bk_q"][band]))
        for r in q.select("bk_q").collect()
        for band in range(n_bands)
    })
    prune = None
    for band, bucket in pairs:
        c = (F.col("band") == band) & (F.col("bucket") == bucket)
        prune = c if prune is None else (prune | c)
    idx = spark.read.parquet(path).filter(prune)
    cand = (
        idx.join(
            F.broadcast(q),
            F.expr("element_at(bk_q, band + 1) = bucket"),
        )
        .filter(_first_collision("bks", "bk_q"))
        .select(
            "query_id", "vec_id",
            _cosine_seqfold("q_vec", "vec", "q_nrm", "nrm", dim)
            .alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("vec_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def lsh_index_topk_sql(k: int = 10, query_filter: str = "vec_id < 5",
                       n_bands: int = SIM_LSH_BANDS,
                       band_bits: int = SIM_LSH_BAND_BITS,
                       dim: int = SIM_DIM) -> str:
    """DuckDB twin of the pruned index search: the same per-band
    sequential sign-bit buckets (base-1 subscripts), DISTINCT
    candidate pairs (set-equal to the first-collision rule), the same
    sequential cosine, the same (desc sim, asc id) ranking."""
    band_rows = "\n          UNION ALL\n          ".join(
        f"SELECT vec_id, embedding, {b} AS band,"
        f" {_bucket_col_sql('embedding', b, band_bits, dim, base=1)}"
        f" AS bucket FROM embeddings"
        for b in range(n_bands)
    )
    return f"""
        WITH bands AS MATERIALIZED (
          {band_rows}
        ),
        cand AS MATERIALIZED (
          SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS vec_id
          FROM bands q JOIN bands c
            ON q.band = c.band AND q.bucket = c.bucket
          WHERE q.{query_filter}
        ),
        scored AS (
          SELECT cand.query_id, cand.vec_id,
                 {cosine_sql("eq.embedding", "ec.embedding")} AS cosine_sim
          FROM cand
          JOIN embeddings eq ON eq.vec_id = cand.query_id
          JOIN embeddings ec ON ec.vec_id = cand.vec_id
        ),
        ranked AS (
          SELECT query_id, vec_id, cosine_sim,
                 CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cosine_sim DESC, vec_id
                 ) AS INT) AS rank
          FROM scored
        )
        SELECT query_id, vec_id, cosine_sim, rank
        FROM ranked WHERE rank <= {k}
    """


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.9,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             dim: int = SIM_DIM) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — exact baseline: all
    ordered pairs (a < b) with cosine ≥ threshold. O(n²·dim): fine for
    a verification pass or a small slice, NOT the 100 TB path — that's
    :func:`embedding_near_dup_pairs_lsh`."""
    a = embeddings.select(
        F.col(id_col).alias("vec_id_a"),
        F.col(vec_col).alias("vec_a"),
        norm_fixed(vec_col, dim).alias("norm_a"),
    )
    b = embeddings.select(
        F.col(id_col).alias("vec_id_b"),
        F.col(vec_col).alias("vec_b"),
        norm_fixed(vec_col, dim).alias("norm_b"),
    )
    return (
        a.join(b, F.col("vec_id_a") < F.col("vec_id_b"))
        .select(
            "vec_id_a",
            "vec_id_b",
            # Arrow seqfold, not the unrolled in-join dot: the O(n²)
            # pair stage evaluates the dot once per PAIR, where the
            # unrolled expression runs interpreted past codegen's
            # silent hugeMethodLimit fallback (~16-21 µs/pair vs
            # ~0.3 µs — same bit-exact left fold either way).
            _cosine_seqfold("vec_a", "vec_b", "norm_a", "norm_b", dim)
            .alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def near_dup_pairs_sql(threshold: float = 0.9,
                       vec_filter: str = "TRUE") -> str:
    """DuckDB twin of :func:`embedding_near_dup_pairs`."""
    return f"""
        WITH e AS (SELECT * FROM embeddings WHERE {vec_filter})
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
               {cosine_sql("a.embedding", "b.embedding")} AS cosine_sim
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE {cosine_sql("a.embedding", "b.embedding")} >= {threshold}
    """


def embedding_near_dup_pairs_lsh(embeddings: DataFrame,
                                 threshold: float = 0.9,
                                 n_bands: int = SIM_LSH_BANDS,
                                 band_bits: int = SIM_LSH_BAND_BITS,
                                 dim: int = SIM_DIM,
                                 id_col: str = "vec_id",
                                 vec_col: str = "embedding") -> DataFrame:
    """Near-dup pairs, scale path: only vectors colliding in ≥1 of
    ``n_bands`` LSH band tables are scored — the self-join shuffles on
    (band, bucket), so cost is n_bands · Σ bucket² instead of n².
    A pair at angle θ is a candidate with probability
    1-(1-(1-θ/π)^band_bits)^n_bands (the banding amplification);
    survivors are exact-cosine verified, so precision is 1.0 and the
    recall floor is gated in tests/test_similarity_recall.py.

    Each pair is scored exactly once: the first-collision rule keeps
    a candidate only in the first band where its two bucket arrays
    agree, so multi-band duplicates never reach the dot fold and no
    dedup groupBy is needed. Norms are computed once per vector
    (before the band explode) and carried as a double through the
    (band, bucket) shuffle.

    Pair generation + verification run inside each (band, bucket)
    group (:func:`_grouped_pair_verify`): ONE exchange of the banded
    relation — the previous self-join sorted and shuffled it twice,
    then shipped both vectors across the Python boundary per PAIR —
    and the same first-collision + seqfold arithmetic, so the hash
    gate is unchanged."""
    spark = embeddings.sparkSession
    n_part = spark.sparkContext.defaultParallelism * 2
    e = _banded(embeddings, id_col, vec_col, n_bands, band_bits, dim)
    # Explicit repartition on the group keys: it satisfies the
    # groupBy's clustered distribution (no second exchange) while a
    # bare groupBy's shuffle would let AQE coalesce the tiny local
    # relation to one task and serialize the Σ bucket² scoring. This
    # is also the write-time clustering key at scale.
    e = e.repartition(n_part, "band", "bucket")
    return _grouped_pair_verify(
        e.withColumnRenamed("vnorm", "nrm"), ["band", "bucket"],
        threshold, dim, with_sim=True, first_collision=True,
    )


CENTROID_CTES_SQL = """
    dim AS (
      SELECT label, unnest(embedding) AS x,
             unnest(range(1, len(embedding)+1)) AS pos
      FROM embeddings
    ),
    cent AS (
      SELECT label, pos,
             CAST(SUM(CAST(floor(CAST(x AS DOUBLE)*1000000.0+0.5) AS BIGINT))
                  AS DOUBLE) / 1000000.0 / COUNT(*) AS c
      FROM dim GROUP BY label, pos
    ),
    cent_arr AS (
      SELECT label, list(c ORDER BY pos) AS centroid FROM cent GROUP BY label
    )
"""

LABEL_CENTROID_SQL = f"""
    WITH {CENTROID_CTES_SQL}
    SELECT e.vec_id, e.label,
           {{cos}} AS centroid_sim
    FROM embeddings e JOIN cent_arr c USING (label)
""".format(cos=cosine_sql("e.embedding", "c.centroid"))


def label_centroid_similarity(embeddings: DataFrame,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Per-label centroid → each vector's cosine to its own label
    centroid (IVF-style coarse quantization score). Centroid sums use
    scaled-int64 per-dimension accumulation so results are
    engine-deterministic."""
    dim = embeddings.select(
        F.col(id_col).alias("vec_id"),
        "label",
        F.posexplode(vec_col).alias("pos", "x"),
    )
    cent = (
        dim.groupBy("label", "pos")
        .agg(
            (
                F.sum(
                    F.floor(F.col("x").cast("double") * 1000000.0 + 0.5).cast("long")
                ).cast("double")
                / 1000000.0
                / F.count(F.lit(1)).cast("double")
            ).alias("c")
        )
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            "label", F.transform("pc", lambda s: s.getField("c")).alias("centroid")
        )
    )
    return (
        embeddings.join(F.broadcast(cent), "label")
        .select(
            F.col(id_col).alias("vec_id"),
            "label",
            cosine_fixed(vec_col, "centroid", SIM_DIM).alias("centroid_sim"),
        )
    )


def _centroids(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-label centroids (deterministic scaled-int64 means) —
    the IVF coarse quantizer. Small by construction: one row per
    label/cluster."""
    dim = embeddings.select(
        "label", F.posexplode(vec_col).alias("pos", "x")
    )
    return (
        dim.groupBy("label", "pos")
        .agg(
            (
                F.sum(
                    F.floor(F.col("x").cast("double") * 1000000.0 + 0.5).cast("long")
                ).cast("double")
                / 1000000.0
                / F.count(F.lit(1)).cast("double")
            ).alias("c")
        )
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            "label", F.transform("pc", lambda s: s.getField("c")).alias("centroid")
        )
    )


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
             nprobe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding",
             query_id_col: str = "query_id") -> DataFrame:
    """IVF-style ANN: rank the (tiny) centroid table per query, probe
    the top ``nprobe`` clusters, brute-force cosine only inside them.

    Scale shape: the corpus is scanned once with a broadcast
    (query × probed-label) filter — at 100 TB with the corpus
    partitioned/clustered by label, the probe prunes the scan to
    nprobe/n_labels of the data before any I/O. Recall is bounded by
    the quantizer (here: the label structure); this is the standard
    IVF trade."""
    cent = _centroids(embeddings, vec_col)
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("cent_sim"), F.asc("label")
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id", "q_vec", "label",
            cosine_fixed("q_vec", "centroid", SIM_DIM).alias("cent_sim"),
        )
        .withColumn("probe_rank", F.row_number().over(w_probe))
        .filter(F.col("probe_rank") <= nprobe)
        .select("query_id", "q_vec", "label",
                norm_fixed("q_vec", SIM_DIM).alias("q_norm"))
    )
    # norms once per row on each side; the per-pair loop is the dot
    # product alone (bit-identical — see vectors.cosine_prenormed)
    e = embeddings.select(
        "label", F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("e_vec"),
        norm_fixed(vec_col, SIM_DIM).alias("e_norm"),
    )
    scored = e.join(F.broadcast(probes), "label").select(
        "query_id",
        "vec_id",
        _cosine_pre(
            dot_fixed("q_vec", "e_vec", SIM_DIM),
            F.col("q_norm"), F.col("e_norm"),
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def ivf_topk_sql(query_filter: str, k: int = 10, nprobe: int = 2) -> str:
    """DuckDB twin of :func:`ivf_topk`."""
    return f"""
        WITH {CENTROID_CTES_SQL},
        q AS (SELECT vec_id AS query_id, embedding AS q_vec
              FROM embeddings WHERE {query_filter}),
        probes AS (
          SELECT query_id, q_vec, label FROM (
            SELECT q.query_id, q.q_vec, c.label,
                   ROW_NUMBER() OVER (
                     PARTITION BY q.query_id
                     ORDER BY {cosine_sql("q.q_vec", "c.centroid")} DESC, c.label ASC
                   ) AS probe_rank
            FROM q CROSS JOIN cent_arr c
          ) WHERE probe_rank <= {nprobe}
        ),
        scored AS (
          SELECT p.query_id, e.vec_id,
                 {cosine_sql("p.q_vec", "e.embedding")} AS cosine_sim
          FROM embeddings e JOIN probes p USING (label)
        )
        SELECT query_id, vec_id, cosine_sim, rank FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cosine_sim DESC, vec_id ASC) AS INTEGER) AS rank
          FROM scored
        ) WHERE rank <= {k}
    """


# ---------------------------------------------------- semantic dedup

def semantic_dedup_clusters(embeddings: DataFrame,
                            threshold: float = 0.35,
                            cell_col: str = "label",
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            dim: int = SIM_DIM,
                            target_cell: int = 500) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    pairwise exact cosine WITHIN coarse cells only, near-dup edges →
    connected components → one keeper per semantic cluster
    (min vec_id). Output: (vec_id, cluster_id, is_kept) for every
    vector — singletons keep themselves.

    The cell column is the coarse quantizer — here the embeddings
    table's ``label`` so the DuckDB twin replays the exact same
    partition and the hash gate is exact. Two measured facts shape
    the scale story (BASELINE.md round 3):

    - Fixed cell CARDINALITY makes Σ cell² quadratic across scale
      factors (349 s at sf1 for these label cells). At 100 TB the
      cells must come from a quantizer whose k grows with n —
      :func:`semantic_dedup_clusters_kmeans` (identical plan shape,
      learned cells ≈ constant size) is that registered scale form;
      THIS label-cell form's registered role is the bounded,
      hash-gated oracle verifier (``semantic_dedup_cells_exact``).
    - Data-independent subdivision does NOT work in this similarity
      regime: ceil(log2(n/target_cell)) coordinate-sign bits were
      tried and kept only 15 % of the exact form's near-dup pairs
      co-located (pairs at cosine 0.35-0.5 sit ~60-70° apart, so
      each hyperplane bit disagrees almost half the time). Density-
      adaptive cells (k-means) or OR-amplified banding
      (``embedding_near_dup_pairs_lsh``, the rows-only scale path)
      are the only recall-preserving subdivisions; ``target_cell``
      is kept in the signature as the knob the learned-quantizer
      deployment sizes k with."""
    e = embeddings.select(
        F.col(cell_col).cast("string").alias("_cell"),
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        norm_fixed(vec_col, dim).alias("nrm"),
    )
    return _within_cell_semantic_clusters(e, embeddings, threshold, dim,
                                          id_col)


def _within_cell_semantic_clusters(e: DataFrame, embeddings: DataFrame,
                                   threshold: float, dim: int,
                                   id_col: str) -> DataFrame:
    """Shared SemDeDup core: ``e`` = (_cell, vec_id, vec, nrm) with
    any coarse-quantizer cell id. All pairs within each cell are
    exact-cosine scored by the grouped verifier
    (:func:`_grouped_pair_verify`: ONE exchange of the corpus keyed on
    the cell, pairs enumerated + seqfold-scored in numpy inside each
    cell — the previous merge-hinted self-join shuffled the relation
    twice and shipped both 64-dim vectors across the Python boundary
    per PAIR, ~500 MB of Arrow traffic at sf0.1), edges ≥ threshold
    feed pointer-doubling connected components, and every vector gets
    (cluster_id, is_kept) with the min-id keeper rule; singletons keep
    themselves. The per-pair arithmetic is the identical left-to-right
    fold, so the DuckDB hash gate on the bounded label-cell form still
    holds; per-task memory is O(cell·dim) + a bounded pair chunk —
    cells stay ≈ target size by the SemDeDup invariant."""
    from .dedup import connected_components

    edges = _grouped_pair_verify(
        e, ["_cell"], threshold, dim, with_sim=False,
    ).select(F.col("vec_id_a").alias("src"), F.col("vec_id_b").alias("dst"))
    cc = connected_components(edges, src="src", dst="dst")
    return (
        embeddings.select(F.col(id_col).alias("vec_id"))
        .join(
            cc.select(
                F.col("id").alias("vec_id"), F.col("label").alias("cluster_id")
            ),
            "vec_id",
            "left",
        )
        .withColumn("cluster_id", F.coalesce("cluster_id", "vec_id"))
        .withColumn("is_kept", F.col("vec_id") == F.col("cluster_id"))
    )


def semantic_dedup_clusters_kmeans(embeddings: DataFrame,
                                   threshold: float = 0.35,
                                   target_cell: int = 500,
                                   n_iter: int = 2,
                                   id_col: str = "vec_id",
                                   vec_col: str = "embedding",
                                   dim: int = SIM_DIM) -> DataFrame:
    """SemDeDup with LEARNED, density-adaptive cells — the registered
    100 TB form (VERDICT r3 #1). k = ceil(n / target_cell) centroids
    are fit with the deterministic distributed Lloyd loop
    (operators/kmeans.py: md5-seeded, scaled-int64 means, tiny driver
    state), every vector is assigned Arrow-side (one numpy matmul per
    batch — the unrolled-SQL assign is for small fixed k only), and
    the shared within-cell core scores exact cosine inside each cell.

    This is the defining SemDeDup property the fixed-cardinality
    label-cell form lacks: cells stay ≈ ``target_cell`` vectors AS n
    GROWS, so Σ cell² ≈ n · target_cell — LINEAR in the corpus —
    where fixed cell COUNT made Σ cell² quadratic (measured 349 s at
    sf1, ~29× for 10× data, BASELINE.md round 3). Fit cost is
    n_iter + 1 corpus passes with k·dim driver state; assignment is
    one shuffle-free projection. The label-cell twin
    (:func:`semantic_dedup_clusters`) stays registered as the
    bounded, hash-gated oracle verifier; this form's cell recall vs
    the exact all-pairs ground truth and its cluster-correctness
    within cells are gated in tests/test_similarity_recall.py
    (measured 0.41 pair recall at cosine ≥ 0.35 with target_cell=500
    at sf0.1 — weak-threshold cell partitioning is intrinsically
    recall-limited; at production semantic-dup thresholds near-dups
    are near-identical vectors that quantize together)."""
    import math as _math

    from .kmeans import kmeans_assign_arrow, kmeans_fit

    n = embeddings.count()
    k = max(1, _math.ceil(n / target_cell))
    cents = kmeans_fit(embeddings, k=k, n_iter=n_iter,
                       vec_col=vec_col, id_col=id_col)
    e = kmeans_assign_arrow(embeddings, cents, vec_col=vec_col).select(
        F.col("cluster_id").cast("string").alias("_cell"),
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        norm_fixed(vec_col, dim).alias("nrm"),
    )
    return _within_cell_semantic_clusters(e, embeddings, threshold, dim,
                                          id_col)


def semantic_dedup_sql(threshold: float = 0.35,
                       vec_filter: str = "TRUE") -> str:
    """DuckDB twin: same within-cell pairs, recursive-CTE closure,
    min-id keeper rule."""
    return f"""
        WITH RECURSIVE emb AS MATERIALIZED (
          SELECT * FROM embeddings WHERE {vec_filter}
        ),
        pairs AS MATERIALIZED (
          SELECT a.vec_id AS src, b.vec_id AS dst
          FROM emb a JOIN emb b
            ON a.label = b.label AND a.vec_id < b.vec_id
          WHERE {cosine_sql("a.embedding", "b.embedding")} >= {threshold}
        ),
        edges AS (
          SELECT src, dst FROM pairs
          UNION ALL
          SELECT dst, src FROM pairs
        ),
        reach(id, lab) AS (
          SELECT vec_id, vec_id FROM emb
          UNION
          SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
        )
        SELECT id AS vec_id, MIN(lab) AS cluster_id,
               (id = MIN(lab)) AS is_kept
        FROM reach GROUP BY id
    """


# ------------------------------------- deterministic LSH near-dup clusters

def _sign_bit_sql(vec_sql: str, plane: int, dim: int,
                  base: int = 0) -> str:
    """SQL text for one hyperplane sign bit as a SEQUENTIAL
    left-to-right ±sum — the fold order both engines share, so the
    bit is bit-identical cross-engine (the pandas_udf bucket path
    uses a numpy matmul whose summation order differs in the low
    bits, which is fine for rows-only recall paths but not for a
    hash gate)."""
    coeffs = _plane_coeffs(plane, dim)
    # base: Spark arrays subscript from 0, DuckDB lists from 1 —
    # the shared text is otherwise identical (same fold order).
    terms = " + ".join(
        f"({'' if c > 0 else '-'}CAST({vec_sql}[{i + base}] AS DOUBLE))"
        for i, c in enumerate(coeffs)
    )
    return f"CAST(({terms}) > 0 AS INT)"


def _bucket_col_sql(vec_sql: str, band: int, band_bits: int,
                    dim: int, base: int = 0) -> str:
    """SQL text for one band's bucket id (band_bits sign bits)."""
    return " + ".join(
        f"{1 << j} * {_sign_bit_sql(vec_sql, band * band_bits + j, dim, base)}"
        for j in range(band_bits)
    )


def _bucket_array_seqfold(vec_col: str, n_bands: int, band_bits: int,
                          dim: int) -> Column:
    """Arrow-batched bucket array that is BIT-IDENTICAL to the
    unrolled-SQL sign bits (:func:`_sign_bit_sql`) — unlike a
    one-matmul-per-batch fold (retired in r7) whose summation order
    drifts in the low bits: each hyperplane score is accumulated
    left-to-right over the dimensions — numpy only vectorizes ACROSS
    rows, the adds stay sequential per vector, and the ±1 multiplies
    are IEEE-exact — so the DuckDB twin replays every bucket id
    bit-for-bit and the hash gate holds. Since r7 this is the ONLY
    bucket codepath (every LSH entry hash-gates through it). Replaces the one giant
    n_bands·band_bits·dim-term projection, which overflowed janino's
    64 KB method limit and ran interpreted at ~5 ms/row (measured
    10.7 s for a 2000-row corpus, BASELINE.md round 4)."""
    planes = [_plane_coeffs(p, dim) for p in range(n_bands * band_bits)]
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    nb, bb = n_bands, band_bits

    @pandas_udf(ArrayType(LongType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        # self-contained closure (grading driver imports by file path;
        # workers can't import this package by name)
        import numpy as np
        import pandas as _pd

        if len(vecs) == 0:
            return _pd.Series([], dtype=object)
        C = np.asarray(planes, dtype=np.float64)  # planes × dim
        V = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        n_planes = nb * bb
        bits = np.empty((len(V), n_planes), dtype=bool)
        for p in range(n_planes):
            acc = C[p, 0] * V[:, 0]
            for i in range(1, dim):
                acc = acc + C[p, i] * V[:, i]
            bits[:, p] = acc > 0
        weights = 1 << np.arange(bb, dtype=np.int64)
        buckets = bits.reshape(len(V), nb, bb) @ weights
        return _pd.Series(list(buckets))

    return _buckets(F.col(vec_col))


def _grouped_pair_verify(grouped: DataFrame, group_cols: list[str],
                         threshold: float, dim: int,
                         with_sim: bool,
                         first_collision: bool = False) -> DataFrame:
    """All-pairs generation + exact seqfold-cosine verification INSIDE
    each group, as one ``applyInPandas`` over ``grouped`` (columns:
    ``vec_id``, ``vec``, ``nrm`` + the group keys; with
    ``first_collision`` also the 0-based ``band`` int and the full
    ``buckets`` array for the first-collision dedup rule).

    Replaces the groupwise self-join + per-pair Arrow cosine: the join
    shuffled the banded relation TWICE (both sort-merge sides) and then
    shipped BOTH 64-dim vectors across the Python boundary once per
    PAIR (Σ bucket² · ~1 KB — measured ~500 MB of Arrow traffic for
    the 500 k within-cell pairs at sf0.1, 2.7 s of a 4.9 s query).
    Here each vector crosses once per group membership (Σ bucket ·
    ~0.5 KB) and the pairs are enumerated in numpy — guide §2.3
    ("shuffle keys and metadata, move heavy bytes once") + §4.2.

    Bit-identical to the retired join path: the cosine accumulates
    per-dimension products LEFT-TO-RIGHT exactly like
    :func:`_cosine_seqfold` (elementwise numpy ops vectorize across
    pairs; the per-pair IEEE sequence is unchanged), pairs are
    oriented ``id_a < id_b``, a zero norm product yields NULL→dropped
    (NaN fails ``>=`` in both engines), and the first-collision rule
    compares the same bucket-array prefixes the SQL ``zip_with`` did.
    Pair enumeration is CHUNKED so a skewed group costs bounded
    memory (the join path's streaming property), and per-group input
    stays O(group · dim) — bounded by the banding/cell invariant."""
    thr = float(threshold)
    d = int(dim)
    sim_out = bool(with_sim)
    has_band = bool(first_collision)
    chunk_pairs = 262144

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        # self-contained closure: the grading driver imports this
        # package by file path, so workers can only see stdlib/numpy/
        # pandas — never module globals
        import numpy as np
        import pandas as _pd

        cols = (["vec_id_a", "vec_id_b", "cosine_sim"] if sim_out
                else ["vec_id_a", "vec_id_b"])
        n = len(pdf)
        if n < 2:
            return _pd.DataFrame({c: [] for c in cols})
        ids = pdf["vec_id"].to_numpy()
        V = np.vstack([np.asarray(v, dtype=np.float64)
                       for v in pdf["vec"]])
        nrm = pdf["nrm"].to_numpy(dtype=np.float64)
        if has_band:
            band = int(pdf["band"].iloc[0])
            B = (np.vstack([np.asarray(b, dtype=np.int64)
                            for b in pdf["buckets"]])
                 if band > 0 else None)
        out_a, out_b, out_s = [], [], []
        ii, jj = np.triu_indices(n, k=1)
        for lo in range(0, len(ii), chunk_pairs):
            ic, jc = ii[lo:lo + chunk_pairs], jj[lo:lo + chunk_pairs]
            flip = ids[ic] > ids[jc]
            a = np.where(flip, jc, ic)
            b = np.where(flip, ic, jc)
            if has_band and band > 0:
                keep = ~(B[a, :band] == B[b, :band]).any(axis=1)
                a, b = a[keep], b[keep]
                if len(a) == 0:
                    continue
            A, Bv = V[a], V[b]
            acc = A[:, 0] * Bv[:, 0]
            for i in range(1, d):
                acc = acc + A[:, i] * Bv[:, i]
            denom = nrm[a] * nrm[b]
            sim = acc / np.where(denom == 0.0, np.nan, denom)
            keep = (denom != 0.0) & (sim >= thr)
            out_a.append(ids[a][keep])
            out_b.append(ids[b][keep])
            if sim_out:
                out_s.append(sim[keep])
        if not out_a:
            return _pd.DataFrame({c: [] for c in cols})
        data = {"vec_id_a": np.concatenate(out_a),
                "vec_id_b": np.concatenate(out_b)}
        if sim_out:
            data["cosine_sim"] = np.concatenate(out_s)
        return _pd.DataFrame(data)

    schema = ("vec_id_a long, vec_id_b long, cosine_sim double"
              if sim_out else "vec_id_a long, vec_id_b long")
    sel = ["vec_id", "vec", "nrm"] + list(group_cols)
    if has_band:
        sel += ["band", "buckets"]
    grouped = grouped.select(*dict.fromkeys(sel))
    return grouped.groupBy(*group_cols).applyInPandas(verify, schema)


def _cosine_seqfold(va: str, vb: str, na: str, nb_col: str,
                    dim: int) -> Column:
    """Arrow-batched prenormed cosine, bit-identical to
    :func:`functions.vectors.cosine_prenormed`: per-dimension double
    products accumulated left-to-right (numpy vectorizes across PAIRS
    only), divided by the carried norm product with the same
    zero-denominator NULL guard. Exists because the unrolled in-join
    dot exceeds codegen's silent hugeMethodLimit fallback and
    evaluates interpreted at ~16-21 µs/pair (measured, BASELINE.md) —
    the Arrow fold does the same arithmetic at ~0.3 µs/pair plus
    batch transfer."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def _cos(a: pd.Series, b: pd.Series, norm_a: pd.Series,
             norm_b: pd.Series) -> pd.Series:
        # self-contained closure — see _bucket_array_seqfold
        import numpy as np
        import pandas as _pd

        if len(a) == 0:
            return _pd.Series([], dtype=float)
        A = np.vstack([np.asarray(v, dtype=np.float64) for v in a])
        B = np.vstack([np.asarray(v, dtype=np.float64) for v in b])
        acc = A[:, 0] * B[:, 0]
        for i in range(1, dim):
            acc = acc + A[:, i] * B[:, i]
        denom = norm_a.to_numpy(dtype=np.float64) * norm_b.to_numpy(
            dtype=np.float64)
        out = _pd.Series(acc / np.where(denom == 0.0, np.nan, denom))
        return out.mask(denom == 0.0, None)

    return _cos(F.col(va), F.col(vb), F.col(na), F.col(nb_col))


def embedding_near_dup_lsh_clusters(embeddings: DataFrame,
                                    threshold: float = 0.35,
                                    n_bands: int = SIM_LSH_BANDS,
                                    band_bits: int = SIM_LSH_BAND_BITS,
                                    dim: int = SIM_DIM,
                                    id_col: str = "vec_id",
                                    vec_col: str = "embedding"
                                    ) -> DataFrame:
    """Embedding near-dup CLUSTERS via OR-amplified banding — the
    recall-preserving scale path for semantic dedup in the
    weak-similarity regime where cell partitioning fails (measured:
    sign-bit subcells 15 %, k-means k=4 cells 42 % pair co-location;
    OR-amplification gives each pair n_bands independent chances,
    recall 1-(1-p^bits)^bands ≈ 0.7 at cosine 0.35 with the 8×4
    default). Candidates verified by exact cosine ≥ threshold, then
    connected components; output (vec_id, cluster_id) per vector.

    Deterministic end-to-end: bucket bits and the verify cosine are
    SEQUENTIAL left-to-right ±folds over md5-derived ±1 hyperplanes,
    evaluated Arrow-side with numpy vectorizing across ROWS only
    (:func:`_bucket_array_seqfold` / :func:`_cosine_seqfold` — the
    adds stay in array order, so both are bit-identical to the
    unrolled SQL and the DuckDB twin replays candidates,
    verification, and closure bit-for-bit). This keeps the hash gate
    WITHOUT the round-3 constant: the giant unrolled projection ran
    interpreted past janino's 64 KB limit (~5 ms/row) and the
    unrolled in-join cosine past the silent hugeMethodLimit fallback
    (~16-21 µs/pair); the Arrow folds do the same arithmetic at
    ~0.3 µs each (23.1 s → single digits at sf0.1, BASELINE.md r4).
    The pair form (`embedding_near_dup_lsh`) shares the same seqfold
    band/verify path and is hash-gated since r7
    (:func:`near_dup_lsh_pairs_sql`)."""
    from .dedup import connected_components

    pre = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        norm_fixed(vec_col, dim).alias("nrm"),
        _bucket_array_seqfold(vec_col, n_bands, band_bits, dim)
        .alias("buckets"),
    )
    bands = pre.select(
        "vec_id", "vec", "nrm", "buckets",
        F.posexplode("buckets").alias("band", "bucket"),
    )
    # All pairs WITHIN each (band, bucket). Candidate volume is
    # linear by construction — adaptive_band_bits keeps buckets
    # ≈ target size, so Σ bucket² ≈ n · target. A chain-spanning
    # variant (consecutive ids per bucket, as in
    # dedup_keep_best_chain) was tried and REVERTED: at weak
    # thresholds buckets are deliberately loose (mostly unrelated
    # vectors provide the OR-amplified recall), so a chain hop
    # between two true near-dups almost always runs through an
    # unrelated intermediate that fails verification — measured 4 %
    # pair recall vs ~70 % for all-pairs (BASELINE.md round 3).
    # Verified-EDGE count still inherits the corpus's duplication
    # density (every true pair collides somewhere), which is
    # inherent to emitting correct clusters.
    #
    # The first-collision rule (each pair survives only in the FIRST
    # band where its carried bucket arrays agree) deduplicates
    # multi-band candidates BEFORE the exact-cosine verify — an
    # 8-element prefix compare instead of a 64-dim dot per duplicate,
    # and it replaces the post-verify distinct() shuffle outright
    # (measured 1.04M → 0.69M scored pairs at sf0.1).
    #
    # Pairs are generated + verified inside each (band, bucket) group
    # (:func:`_grouped_pair_verify`): one exchange of the banded
    # relation instead of the self-join's two sorted shuffles and a
    # per-PAIR double-vector Arrow transfer; identical arithmetic, so
    # the hash gate holds. The repartition satisfies the groupBy's
    # distribution while keeping AQE from collapsing the tiny local
    # shuffle to one task.
    n_part = embeddings.sparkSession.sparkContext.defaultParallelism * 2
    edges = _grouped_pair_verify(
        bands.repartition(n_part, "band", "bucket"),
        ["band", "bucket"], threshold, dim,
        with_sim=False, first_collision=True,
    ).select(F.col("vec_id_a").alias("src"), F.col("vec_id_b").alias("dst"))
    cc = connected_components(edges, src="src", dst="dst")
    return (
        embeddings.select(F.col(id_col).alias("vec_id"))
        .join(
            cc.select(F.col("id").alias("vec_id"),
                      F.col("label").alias("cluster_id")),
            "vec_id",
            "left",
        )
        .withColumn("cluster_id", F.coalesce("cluster_id", "vec_id"))
    )


def lsh_clusters_sql(threshold: float = 0.35,
                     n_bands: int = SIM_LSH_BANDS,
                     band_bits: int = SIM_LSH_BAND_BITS,
                     dim: int = SIM_DIM) -> str:
    """DuckDB twin of :func:`embedding_near_dup_lsh_clusters`."""
    band_rows = "\n          UNION ALL\n          ".join(
        f"SELECT vec_id, embedding, {b} AS band,"
        f" {_bucket_col_sql('embedding', b, band_bits, dim, base=1)} AS bucket"
        f" FROM embeddings"
        for b in range(n_bands)
    )
    return f"""
        WITH RECURSIVE bands AS MATERIALIZED (
          {band_rows}
        ),
        pairs AS MATERIALIZED (
          SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bucket = b.bucket
           AND a.vec_id < b.vec_id
          WHERE {cosine_sql("a.embedding", "b.embedding")} >= {threshold}
        ),
        edges AS (
          SELECT src, dst FROM pairs
          UNION ALL
          SELECT dst, src FROM pairs
        ),
        reach(id, lab) AS (
          SELECT vec_id, vec_id FROM embeddings
          UNION
          SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
        )
        SELECT id AS vec_id, MIN(lab) AS cluster_id
        FROM reach GROUP BY id
    """


def near_dup_lsh_pairs_sql(threshold: float = 0.35,
                           n_bands: int = SIM_LSH_BANDS,
                           band_bits: int = SIM_LSH_BAND_BITS,
                           dim: int = SIM_DIM) -> str:
    """DuckDB twin of :func:`embedding_near_dup_pairs_lsh`: the same
    per-band sequential sign-bit buckets, DISTINCT candidate pairs
    (set-equal to the first-collision rule), the same sequential
    cosine ≥ threshold verify. Emits (vec_id_a, vec_id_b, cosine_sim)
    exactly once per surviving pair."""
    band_rows = "\n          UNION ALL\n          ".join(
        f"SELECT vec_id, embedding, {b} AS band,"
        f" {_bucket_col_sql('embedding', b, band_bits, dim, base=1)} AS bucket"
        f" FROM embeddings"
        for b in range(n_bands)
    )
    return f"""
        WITH bands AS MATERIALIZED (
          {band_rows}
        ),
        cand AS MATERIALIZED (
          SELECT DISTINCT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bucket = b.bucket
           AND a.vec_id < b.vec_id
        )
        SELECT c.vec_id_a, c.vec_id_b,
               {cosine_sql("ea.embedding", "eb.embedding")} AS cosine_sim
        FROM cand c
        JOIN embeddings ea ON ea.vec_id = c.vec_id_a
        JOIN embeddings eb ON eb.vec_id = c.vec_id_b
        WHERE {cosine_sql("ea.embedding", "eb.embedding")} >= {threshold}
    """


# ------------------------------------------ int8 scalar quantization

INT8_SCALE = 127


def _int_dot_fixed_sql(a: str, b: str, dim: int) -> str:
    """Unrolled integer dot over two BIGINT-array columns (0-indexed
    Spark subscripts; integer addition is exact, so fold order is
    irrelevant here — the unroll is purely for codegen)."""
    return "(" + " + ".join(f"({a}[{i}] * {b}[{i}])" for i in range(dim)) + ")"


def int8_quantize(df: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  dim: int = SIM_DIM,
                  keep: tuple[str, ...] = ()) -> DataFrame:
    """(id, q): L2-normalize then scalar-quantize to [-127, 127]
    longs — ``qᵢ = floor(vᵢ/‖v‖ · 127 + ½)`` (round-half-up, exact
    IEEE ops over the fixed-fold norm, so the DuckDB twin replays it
    bit-for-bit; zero-norm vectors quantize to the zero vector).
    4 bytes/dim float32 → ~1 byte of useful range: the memory-/
    bandwidth-compression step production vector stores run before
    the index build."""
    staged = df.select(
        F.col(id_col).alias("vec_id"),
        *keep,
        F.col(vec_col).alias("_v"),
        norm_fixed(vec_col, dim).alias("_n"),
    )
    zero = F.transform(F.col("_v"), lambda x: F.lit(0).cast("long"))
    quant = F.transform(
        F.col("_v"),
        lambda x: F.floor(
            x.cast("double") / F.col("_n") * F.lit(127.0) + F.lit(0.5)),
    )
    return staged.select(
        "vec_id",
        *keep,
        F.when(F.col("_n") == 0, zero).otherwise(quant).alias("q"),
    )


def ivf_int8_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                  nprobe: int = 2, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  query_id_col: str = "query_id",
                  dim: int = SIM_DIM) -> DataFrame:
    """IVF ANN over an INT8-quantized index — the all-integer twin of
    :func:`ivf_topk` (VERDICT r5 ask #8): the per-label centroids
    (deterministic scaled-int64 means, the IVF coarse quantizer) are
    int8-quantized alongside the corpus and the queries, the probe
    ranking (query→centroid) and the in-cluster scoring are both the
    exact unrolled integer dot, so EVERY score in the pipeline is an
    exact integer and the full IVF path — quantizer fit, probe
    selection, cluster scan, ranking — hash-gates against the DuckDB
    twin (float-scored IVF gates on bit-replayed IEEE folds instead;
    integer scores remove even that sensitivity).

    Scale shape — identical to ``ivf_topk``: the centroid table is
    one row per label (broadcast), probes are |queries|·nprobe rows
    (broadcast), and the corpus is scanned once with the broadcast
    probe filter pruning to nprobe/n_labels of the data; int8 codes
    make that scan 4× lighter than the float path. No shuffle
    touches the corpus."""
    cent = _centroids(embeddings, vec_col)
    cent_q = int8_quantize(
        cent.select(F.col("label"), F.col("centroid").alias(vec_col)),
        id_col="label", vec_col=vec_col, dim=dim,
    ).select(F.col("vec_id").alias("label"), F.col("q").alias("c_q"))
    qq = int8_quantize(queries, query_id_col, vec_col, dim).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("q_q"))
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("cent_dot"), F.asc("label"))
    probes = (
        qq.crossJoin(F.broadcast(cent_q))
        .select(
            "query_id", "q_q", "label",
            F.expr(_int_dot_fixed_sql("q_q", "c_q", dim)).alias("cent_dot"),
        )
        .withColumn("probe_rank", F.row_number().over(w_probe))
        .filter(F.col("probe_rank") <= nprobe)
        .select("query_id", "q_q", "label")
    )
    # label rides through the quantization projection (keep=) — a
    # join-back to recover it would shuffle the corpus at scale
    e = embeddings.select("label", F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias(vec_col))
    e_q = int8_quantize(e, "vec_id", vec_col, dim, keep=("label",))
    scored = e_q.join(F.broadcast(probes), "label").select(
        "query_id", "vec_id",
        F.expr(_int_dot_fixed_sql("q_q", "q", dim)).alias("dot_int"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("dot_int"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def ivf_int8_topk_sql(query_filter: str, k: int = 10, nprobe: int = 2,
                      dim: int = SIM_DIM) -> str:
    """DuckDB twin of :func:`ivf_int8_topk`: same scaled-int64
    centroid means (CENTROID_CTES_SQL), same round-half-up int8
    quantization over the HOF-fold norm, same integer dots and
    rank/tiebreaks."""
    from ..functions.vectors import dot_sql

    def _qz(vec: str) -> str:
        nrm = f"sqrt({dot_sql(vec, vec)})"
        return f"""
            CASE WHEN {nrm} = 0
                 THEN list_transform({vec}, v -> CAST(0 AS BIGINT))
                 ELSE list_transform({vec},
                     v -> CAST(floor(CAST(v AS DOUBLE) / {nrm} * 127.0
                                     + 0.5) AS BIGINT))
            END
        """

    int_dot = """
        CAST(list_reduce(
            list_prepend(CAST(0 AS BIGINT),
                list_transform(list_zip({a}, {b}), z -> z[1] * z[2])),
            (x, y) -> x + y) AS BIGINT)
    """
    return f"""
        WITH {CENTROID_CTES_SQL},
        qz AS (
          SELECT vec_id, label, {_qz("embedding")} AS q FROM embeddings
        ),
        cq AS (
          SELECT label, {_qz("centroid")} AS c_q FROM cent_arr
        ),
        queries AS (
          SELECT vec_id AS query_id, q AS q_q FROM qz WHERE {query_filter}
        ),
        probes AS (
          SELECT query_id, q_q, label FROM (
            SELECT q.query_id, q.q_q, c.label,
                   ROW_NUMBER() OVER (
                     PARTITION BY q.query_id
                     ORDER BY {int_dot.format(a="q.q_q", b="c.c_q")} DESC,
                              c.label ASC
                   ) AS probe_rank
            FROM queries q CROSS JOIN cq c
          ) WHERE probe_rank <= {nprobe}
        ),
        scored AS (
          SELECT p.query_id, e.vec_id,
                 {int_dot.format(a="p.q_q", b="e.q")} AS dot_int
          FROM qz e JOIN probes p USING (label)
        )
        SELECT query_id, vec_id, dot_int, rank FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY dot_int DESC, vec_id ASC) AS INTEGER)
                    AS rank
          FROM scored
        ) WHERE rank <= {k}
    """


def int8_ann_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  query_id_col: str = "query_id",
                  dim: int = SIM_DIM) -> DataFrame:
    """Top-k by INT8-quantized dot product — the compressed-index ANN
    path: both sides pre-quantized (one per-row pass each), the
    pairwise hot loop is an unrolled all-integer dot (codegen, no
    doubles, exact — hence hash-gateable unlike float-scored ANN),
    ranked with the deterministic vec_id tiebreak. Queries broadcast;
    the corpus never shuffles. Recall vs the exact cosine baseline is
    gated in tests/test_similarity_recall.py; the int8 contract
    itself (quantize + integer dot + rank) gates exactly."""
    e = int8_quantize(embeddings, id_col, vec_col, dim).select(
        "vec_id", F.col("q").alias("e_q"))
    q = int8_quantize(queries, query_id_col, vec_col, dim).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("q_q"))
    scored = e.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id",
        F.expr(_int_dot_fixed_sql("q_q", "e_q", dim)).alias("dot_int"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("dot_int"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def int8_ann_topk_sql(query_filter: str, k: int = 10,
                      dim: int = SIM_DIM) -> str:
    """DuckDB twin: HOF-fold norm (same left fold as the unrolled
    Spark norm), per-element quantization with the same round-half-up,
    integer-dot scoring, same rank/tiebreak."""
    from ..functions.vectors import dot_sql

    nrm = f"sqrt({dot_sql('embedding', 'embedding')})"
    return f"""
        WITH base AS (
          SELECT vec_id, embedding, {nrm} AS nrm FROM embeddings
        ),
        qz AS (
          SELECT vec_id,
                 CASE WHEN nrm = 0
                      THEN list_transform(embedding,
                                          v -> CAST(0 AS BIGINT))
                      ELSE list_transform(embedding,
                          v -> CAST(floor(CAST(v AS DOUBLE) / nrm * 127.0
                                          + 0.5) AS BIGINT))
                 END AS q
          FROM base
        ),
        queries AS (
          SELECT vec_id AS query_id, q AS q_q FROM qz
          WHERE {query_filter}
        ),
        scored AS (
          SELECT q.query_id, e.vec_id,
                 CAST(list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                         list_transform(list_zip(q.q_q, e.q),
                                        z -> z[1] * z[2])),
                     (a, b) -> a + b) AS BIGINT) AS dot_int
          FROM qz e CROSS JOIN queries q
        ),
        ranked AS (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY dot_int DESC, vec_id ASC) AS INTEGER)
                    AS rank
          FROM scored
        )
        SELECT query_id, vec_id, dot_int, rank
        FROM ranked WHERE rank <= {k}
    """


# ---------------------------------------------- embedding drift monitoring

def embedding_drift_by_label(embeddings: DataFrame, delta_pred: Column,
                             vec_col: str = "embedding",
                             dim: int = SIM_DIM) -> DataFrame:
    """Embedding drift monitor: per label, the cosine between the
    BASE slice's centroid and the NEW-INGEST slice's centroid, plus
    both population counts — the check an embedding-backed pipeline
    runs on every ingest to catch upstream encoder changes or
    population shift before they poison ANN indexes and semantic
    dedup (the vector-space sibling of ``corpus_drift_stat``).

    Determinism: centroid sums use the scaled-int64 accumulation of
    ``label_centroid_similarity`` (order-independent integer adds),
    means divide exactly once, and the cross-centroid cosine is the
    unrolled ``cosine_fixed`` — every double bit-identical in DuckDB.
    A label with no delta (or no base) rows reports NULL drift and a
    zero count (full outer join — fail visible, not silent).

    Scale: one explode + two tiny keyed aggs (labels × dim, then
    labels × 2 rows); the per-(label, part) centroid relation is
    eagerly checkpointed before feeding both join sides (the
    branch-point lesson), so the corpus explodes exactly once."""
    part = F.when(delta_pred, F.lit("delta")).otherwise(F.lit("base"))
    d = embeddings.select(
        "label", part.alias("part"), F.posexplode(vec_col).alias("pos", "x")
    )
    cent = (
        d.groupBy("label", "part", "pos")
        .agg(
            (
                F.sum(
                    F.floor(F.col("x").cast("double") * 1000000.0 + 0.5)
                    .cast("long")
                ).cast("double")
                / 1000000.0
                / F.count(F.lit(1)).cast("double")
            ).alias("c"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .groupBy("label", "part")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"),
            F.max("cnt").alias("n"),
        )
        .select(
            "label", "part",
            F.transform("pc", lambda s: s.getField("c")).alias("centroid"),
            "n",
        )
        .localCheckpoint(eager=True)
    )
    b = cent.filter(F.col("part") == "base").select(
        "label", F.col("centroid").alias("cb"), F.col("n").alias("nb"))
    dl = cent.filter(F.col("part") == "delta").select(
        "label", F.col("centroid").alias("cd"), F.col("n").alias("nd"))
    return (
        b.join(dl, "label", "full")
        .select(
            "label",
            F.coalesce("nb", F.lit(0)).cast("long").alias("n_base"),
            F.coalesce("nd", F.lit(0)).cast("long").alias("n_delta"),
            cosine_fixed("cb", "cd", dim).alias("drift_cos"),
        )
    )


def embedding_drift_sql(delta_pred_sql: str) -> str:
    """DuckDB twin of :func:`embedding_drift_by_label`."""
    return f"""
        WITH dim AS (
          SELECT label,
                 CASE WHEN {delta_pred_sql} THEN 'delta'
                      ELSE 'base' END AS part,
                 unnest(embedding) AS x,
                 unnest(range(1, len(embedding)+1)) AS pos
          FROM embeddings
        ),
        cent AS (
          SELECT label, part, pos,
                 CAST(SUM(CAST(floor(CAST(x AS DOUBLE)*1000000.0+0.5)
                               AS BIGINT)) AS DOUBLE)
                     / 1000000.0 / COUNT(*) AS c,
                 COUNT(*) AS cnt
          FROM dim GROUP BY label, part, pos
        ),
        cent_arr AS (
          SELECT label, part, list(c ORDER BY pos) AS centroid,
                 MAX(cnt) AS n
          FROM cent GROUP BY label, part
        )
        SELECT label,
               CAST(COALESCE(b.n, 0) AS BIGINT) AS n_base,
               CAST(COALESCE(d.n, 0) AS BIGINT) AS n_delta,
               {cosine_sql("b.centroid", "d.centroid")} AS drift_cos
        FROM (SELECT * FROM cent_arr WHERE part = 'base') b
        FULL JOIN (SELECT * FROM cent_arr WHERE part = 'delta') d
            USING (label)
    """


# ------------------------------------------------ multi-probe LSH ANN

MULTIPROBE_BITS = 6


def _multiprobe_flips(band_bits: int) -> list[int]:
    """The hamming-≤2 probe masks: the query's own bucket, every
    1-bit flip, every 2-bit flip — 1 + B + C(B,2) probes (22 at the
    default B=6; recall 0.46 vs the exact top-10 at the gate corpus).
    Hamming-1 alone measured recall 0.16 there (neighbors at moderate
    cosine disagree with each hyperplane ~35-40 % of the time — the
    recorded weak-threshold subdivision lesson); the ≤2 ring recovers
    the OR-amplification a multi-table index buys while reading
    (probes/2^B) of the corpus. At scale B grows with the corpus
    (constant bucket size, like ``adaptive_band_bits``) and the probe
    fraction SHRINKS — (1+B+C(B,2))/2^B is 34 % at B=6 but 0.6 % at
    B=14 — with the probe-sequence length (hamming budget) as the
    recall lever, the standard multi-probe trade."""
    flips = [0] + [1 << j for j in range(band_bits)]
    flips += [
        (1 << i) | (1 << j)
        for i in range(band_bits) for j in range(i + 1, band_bits)
    ]
    return flips


def multiprobe_lsh_topk(embeddings: DataFrame, queries: DataFrame,
                        k: int = 10, band_bits: int = MULTIPROBE_BITS,
                        dim: int = SIM_DIM, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        query_id_col: str = "query_id") -> DataFrame:
    """Multi-probe LSH ANN (the Lv et al., VLDB'07 memory/recall
    trade): ONE ``band_bits``-bit hyperplane table instead of
    ``n_bands`` tables — each query probes its own bucket plus the
    ``band_bits`` buckets at hamming distance 1, recovering the
    recall that extra tables would buy while the stored index is a
    single (bucket → vectors) clustering. Candidates are scored with
    the exact sequential-fold cosine.

    Scale shape: the corpus carries exactly ONE (bucket) key — at
    write time this IS the layout clustering, so a probe reads
    (band_bits+1)/2^band_bits of the corpus; the probe relation is
    |queries|·(band_bits+1) rows and broadcasts. Each (query, corpus)
    pair can collide in at most one probe (a vector has one bucket;
    probe buckets are distinct), so no dedup stage exists at all —
    cheaper than the multi-table first-collision rule. Deterministic
    end-to-end (sequential sign-bit folds, XOR probes, seqfold
    cosine), hence hash-gated."""
    spark = embeddings.sparkSession
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        norm_fixed(vec_col, dim).alias("vnorm"),
        _bucket_array_seqfold(vec_col, 1, band_bits, dim)[0]
        .alias("bucket"),
    ).repartition(
        spark.sparkContext.defaultParallelism * 2, "bucket"
    )
    qb = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_fixed(vec_col, dim).alias("q_norm"),
        _bucket_array_seqfold(vec_col, 1, band_bits, dim)[0].alias("qb"),
    )
    flips = _multiprobe_flips(band_bits)
    probe_set = F.array(
        *[F.col("qb").bitwiseXOR(F.lit(f)) for f in flips]
    )
    probes = qb.select(
        "query_id", "q_vec", "q_norm",
        F.explode(probe_set).alias("bucket"),
    )
    scored = (
        e.join(F.broadcast(probes), "bucket")
        .select(
            "query_id",
            "vec_id",
            _cosine_seqfold("q_vec", "vec", "q_norm", "vnorm", dim)
            .alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def multiprobe_lsh_topk_sql(k: int = 10, query_filter: str = "vec_id < 5",
                            band_bits: int = MULTIPROBE_BITS,
                            dim: int = SIM_DIM) -> str:
    """DuckDB twin of :func:`multiprobe_lsh_topk`: the same
    sequential sign-bit bucket (band 0, base-1 subscripts), the
    hamming-≤2 XOR probe set, the same sequential cosine and (desc
    sim, asc id) ranking."""
    flips = ", ".join(str(f) for f in _multiprobe_flips(band_bits))
    return f"""
        WITH e AS MATERIALIZED (
          SELECT vec_id, embedding,
                 {_bucket_col_sql('embedding', 0, band_bits, dim, base=1)}
                   AS bucket
          FROM embeddings
        ),
        probes AS (
          SELECT q.vec_id AS query_id, q.embedding AS q_vec,
                 xor(q.bucket, f.f) AS bucket
          FROM e q, (SELECT unnest([{flips}]) AS f) f
          WHERE q.{query_filter}
        ),
        scored AS (
          SELECT p.query_id, e.vec_id,
                 {cosine_sql("p.q_vec", "e.embedding")} AS cosine_sim
          FROM probes p JOIN e USING (bucket)
        ),
        ranked AS (
          SELECT query_id, vec_id, cosine_sim,
                 CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cosine_sim DESC, vec_id
                 ) AS INT) AS rank
          FROM scored
        )
        SELECT query_id, vec_id, cosine_sim, rank
        FROM ranked WHERE rank <= {k}
    """
