"""Learned IVF coarse quantizer: Lloyd's k-means over an embedding
column, expressed as DataFrame operations.

``operators/similarity.py`` builds its IVF index from the data's own
``label`` column; this module learns the partitioning instead — the
real-world case where no label exists. The loop is the canonical
distributed k-means shape (what ``pyspark.ml.clustering.KMeans``
runs under the hood), kept deterministic end-to-end so results are
reproducible across runs and cluster layouts:

- **Init**: the k seed vectors are the first k rows ordered by
  ``md5(vec_id)`` — a content-addressed pseudo-random draw, no RNG
  state, identical in any engine.
- **Assign**: nearest centroid by squared L2. Centroids are inlined
  as literal arrays (k·dim doubles — tiny), so assignment is one
  embarrassingly-parallel projection: per row, an
  ``array_min`` over k ``(dist, cluster_id)`` structs (struct
  ordering = min dist, ties to the lowest cluster id). No shuffle,
  no UDF, whole-stage codegen.
- **Update**: per-cluster mean via ``posexplode`` + scaled-int64
  accumulation (order-independent, so float summation cannot make
  two runs disagree). One shuffle per iteration on (cluster, dim) —
  at 100 TB this is the textbook map-side-combine aggregation, and
  the k·dim result collected to the driver is a few KB regardless of
  corpus size.
- Empty clusters keep their previous centroid.

The driver-side loop holds only the centroid table (k·dim doubles)
— iteration state never scales with the data. The projected corpus
is **persisted** for the duration of the fit (and unpersisted on
exit), so the whole loop costs one scan plus ``n_iter`` in-memory
passes. This is the standard Spark iterative-ML shape: tiny model
state on the driver, data-parallel assign/update on the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_fixed

_SCALE = 1000000.0


def _sq_l2_sql(vec_sql: str, centroid: list[float]) -> str:
    """SQL for the squared L2 distance between a vector column and a
    literal centroid array — UNROLLED per dimension so the whole
    k·dim assignment expression whole-stage-codegens (a
    zip_with/aggregate fold is interpreted, ~10× slower per element).
    Generated as a SQL string (one F.expr parse), not Column algebra
    — op-by-op construction costs a Py4J round-trip per node (see
    similarity._band_bucket_sql)."""
    return "(" + " + ".join(
        f"POWER(CAST({vec_sql}[{i}] AS DOUBLE) - {float(c)!r}D, 2)"
        for i, c in enumerate(centroid)
    ) + ")"


def _dist_structs_sql(vec_sql: str, centroids: list[list[float]]) -> str:
    """SQL array of (dist, cluster_id) structs — struct ordering =
    min dist, ties to the lowest cluster id."""
    structs = ", ".join(
        f"named_struct('dist', {_sq_l2_sql(vec_sql, c)}, "
        f"'cluster_id', CAST({cid} AS INT))"
        for cid, c in enumerate(centroids)
    )
    return f"array({structs})"


def _nearest(vec_sql: str, centroids: list[list[float]]):
    """Column: id of the nearest centroid (min squared-L2, ties to
    the lowest cluster id via struct ordering)."""
    return F.expr(
        f"array_min({_dist_structs_sql(vec_sql, centroids)}).cluster_id"
    )


def kmeans_fit(embeddings: DataFrame, k: int = 8, n_iter: int = 4,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> list[list[float]]:
    """Fit k centroids with ``n_iter`` Lloyd iterations; returns the
    centroid list (cluster id = list index). Deterministic: seeded by
    md5-order, updated with order-independent scaled-int means."""
    # The loop takes n_iter+1 actions over the corpus (seed draw + one
    # per Lloyd iteration); persist the projected (id, vec) columns so
    # that is 1 scan + n_iter memory passes instead of n_iter+1 scans.
    corpus = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    # A small corpus arrives as one file → one partition, serializing
    # every assign pass; spread it across the cluster before caching.
    # At scale the scan already has many partitions and this is a no-op.
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < par:
        corpus = corpus.repartition(par)
    corpus = corpus.persist()
    try:
        seeds = (
            corpus.orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
            .limit(k)
            .collect()
        )
        centroids = [[float(x) for x in r["_v"]] for r in seeds]

        for _ in range(n_iter):
            centroids = _lloyd_step(corpus, centroids)
    finally:
        corpus.unpersist()
    return centroids


def _lloyd_step(corpus: DataFrame,
                centroids: list[list[float]]) -> list[list[float]]:
    """One assign+update pass over the persisted (_id, _v) corpus."""
    # Two selects, not one: a select mixing a generator with other
    # expressions compiles to Project(exprs) ABOVE Generate, so the
    # k·dim nearest-centroid fold would be re-evaluated once per
    # EXPLODED row (dim× per vector). Assign first, then explode —
    # the assignment stays in a Project below the Generate and runs
    # once per vector.
    assigned = corpus.select(
        _nearest("_v", centroids).alias("cluster_id"), "_v"
    ).select("cluster_id", F.posexplode("_v").alias("pos", "x"))
    means = (
        assigned.groupBy("cluster_id", "pos")
        .agg(
            (
                F.sum(
                    F.floor(F.col("x").cast("double") * _SCALE + 0.5).cast("long")
                ).cast("double")
                / _SCALE
                / F.count(F.lit(1)).cast("double")
            ).alias("c")
        )
        .groupBy("cluster_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            "cluster_id",
            F.transform("pc", lambda s: s.getField("c")).alias("centroid"),
        )
        .collect()
    )
    new = list(centroids)  # empty clusters keep their old centroid
    for r in means:
        new[r["cluster_id"]] = [float(x) for x in r["centroid"]]
    return new


def kmeans_assign(embeddings: DataFrame, centroids: list[list[float]],
                  vec_col: str = "embedding") -> DataFrame:
    """Add ``cluster_id`` (nearest learned centroid) — one projection,
    no shuffle; at scale this is the write-time clustering key."""
    return embeddings.withColumn(
        "cluster_id", _nearest(vec_col, centroids)
    )


def ivf_kmeans_topk(embeddings: DataFrame, queries: DataFrame,
                    centroids: list[list[float]], k: int = 10,
                    nprobe: int = 2, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    query_id_col: str = "query_id") -> DataFrame:
    """IVF ANN over the LEARNED quantizer: rank centroids per query by
    squared L2, probe the top ``nprobe`` clusters, exact cosine only
    inside them.

    Scale shape: with the corpus written clustered by ``cluster_id``
    (sources/layout.py), the probe filter prunes the scan to
    nprobe/k of the files before any I/O; the scored set shrinks
    accordingly. Recall is the standard IVF trade, measured against
    the exact brute-force baseline in tests/test_kmeans.py."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    probes = q.select(
        "query_id",
        "q_vec",
        F.explode(
            F.expr(
                f"slice(array_sort({_dist_structs_sql('q_vec', centroids)}), "
                f"1, {nprobe})"
            )
        ).alias("probe"),
    ).select("query_id", "q_vec", F.col("probe.cluster_id").alias("cluster_id"))

    assigned = kmeans_assign(embeddings, centroids, vec_col)
    dim = len(centroids[0])
    scored = assigned.join(F.broadcast(probes), "cluster_id").select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        cosine_fixed("q_vec", vec_col, dim).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
