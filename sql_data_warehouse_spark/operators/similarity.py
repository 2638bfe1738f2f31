"""Similarity search over embedding columns (``array<float>``).

Two tiers:

- **Brute-force cosine top-k** — the exact baseline: broadcast the
  (small) query set against the corpus, fold the dot product
  JVM-side, rank per query. Cost O(|queries|·|corpus|·dim) with zero
  shuffle of the corpus (queries broadcast); at 100 TB the corpus
  scan is embarrassingly parallel and the per-query top-k folds into
  a TakeOrderedAndProject-shaped aggregation.
- **LSH-bucketed ANN** — the scale path: deterministic random
  hyperplanes (seeded per-dimension hash) → sign-bit signature →
  candidates share a signature prefix; only bucket-mates are scored.
  Trades recall for a ~bucket-count× cost reduction.

No UDFs anywhere — ``F.zip_with``/``F.aggregate`` fold sequentially
in the JVM, which also makes double results bit-identical to the
DuckDB oracle's ``list_reduce`` (same fold order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, cosine_sql, dot

SIM_LSH_BITS = 8


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries``: (query_id, embedding). Output: (query_id, vec_id,
    cosine_sim, rank) with rank 1..k, deterministic tiebreak on
    vec_id."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    scored = embeddings.crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        cosine(F.col("q_vec"), F.col(vec_col)).alias("cosine_sim"),
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


def _hyperplane_sign(vec, plane: int):
    """Sign bit for one deterministic pseudo-random hyperplane: the
    per-dimension coefficient is ±1 from the top bit of
    md5(plane|dim) — reproducible in any engine, no stored model."""
    signed = F.zip_with(
        vec,
        F.transform(
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda i: F.when(
                F.instr(
                    F.lit("89abcdef"),
                    F.md5(F.concat(F.lit(f"{plane}|"), i.cast("string"))).substr(1, 1),
                )
                > 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        ),
        lambda x, c: x.cast("double") * c,
    )
    return F.aggregate(signed, F.lit(0.0), lambda acc, v: acc + v) > 0


def lsh_bucket(vec, n_bits: int = SIM_LSH_BITS):
    """Random-hyperplane LSH bucket id (0..2^n_bits-1) as a Column."""
    bucket = F.lit(0).cast("long")
    for b in range(n_bits):
        bucket = bucket + F.when(
            _hyperplane_sign(vec, b), F.lit(2 ** b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_ann_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                 n_bits: int = SIM_LSH_BITS, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 query_id_col: str = "query_id") -> DataFrame:
    """Approximate top-k: score only corpus vectors whose LSH bucket
    matches the query's bucket. At scale, bucket the corpus once
    (write-time partition/cluster by bucket) and prune the scan to
    matching buckets — the scored set shrinks by ~2^n_bits."""
    e = embeddings.withColumn("bucket", lsh_bucket(F.col(vec_col), n_bits))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    scored = e.join(F.broadcast(q), "bucket").select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        cosine(F.col("q_vec"), F.col(vec_col)).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.9,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs — exact baseline: all
    ordered pairs (a < b) with cosine ≥ threshold. O(n²·dim): fine for
    a verification pass or a small slice, NOT the 100 TB path — that's
    :func:`embedding_near_dup_pairs_lsh`."""
    a = embeddings.select(
        F.col(id_col).alias("vec_id_a"), F.col(vec_col).alias("vec_a")
    )
    b = embeddings.select(
        F.col(id_col).alias("vec_id_b"), F.col(vec_col).alias("vec_b")
    )
    return (
        a.join(b, F.col("vec_id_a") < F.col("vec_id_b"))
        .select(
            "vec_id_a",
            "vec_id_b",
            cosine(F.col("vec_a"), F.col("vec_b")).alias("cosine_sim"),
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
                                 n_bits: int = SIM_LSH_BITS,
                                 id_col: str = "vec_id",
                                 vec_col: str = "embedding") -> DataFrame:
    """Near-dup pairs, scale path: only vectors sharing an LSH bucket
    are scored — the self-join shuffles on the bucket key, so cost is
    Σ bucket_size² instead of n². High-cosine pairs land in the same
    bucket with probability (1 - θ/π)^n_bits; multiple independent
    band tables (as in MinHash-LSH) push recall up when needed."""
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    a = e.select(
        F.col("vec_id").alias("vec_id_a"), F.col("vec").alias("vec_a"), "bucket"
    )
    b = e.select(
        F.col("vec_id").alias("vec_id_b"), F.col("vec").alias("vec_b"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .select(
            "vec_id_a",
            "vec_id_b",
            cosine(F.col("vec_a"), F.col("vec_b")).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
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
            cosine(F.col(vec_col), F.col("centroid")).alias("centroid_sim"),
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
            cosine(F.col("q_vec"), F.col("centroid")).alias("cent_sim"),
        )
        .withColumn("probe_rank", F.row_number().over(w_probe))
        .filter(F.col("probe_rank") <= nprobe)
        .select("query_id", "q_vec", "label")
    )
    scored = embeddings.join(F.broadcast(probes), "label").select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        cosine(F.col("q_vec"), F.col(vec_col)).alias("cosine_sim"),
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
