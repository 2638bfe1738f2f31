"""Training-data-pipeline operators registered as gated queries over
the documents/embeddings testdata: dedup (exact / fingerprint /
MinHash-LSH / n-gram Jaccard / SimHash), text analysis (stats,
quality, language-ID), similarity search (exact cosine top-k, LSH
ANN). Thin adapters over ``operators/`` — the library API — binding
them to the testdata tables with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import vectors
from ..functions.text import FINGERPRINT_SQL as _FP_SQL, lang_guess_sql
from ..operators import bpe, dedup, kmeans, multimodal, pq, similarity, text_analysis
from ..sources import load_table
from .registry import query

lang_guess_sql_text = lang_guess_sql("text")

# ------------------------------------------------------------ text analysis

@query(
    "doc_stats",
    survey="ext-text P1",
    tags=("llmops",),
    oracle=text_analysis.DOC_STATS_SQL,
)
def doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts, quality score, fingerprint per document — one
    projection pass, no shuffle."""
    return text_analysis.doc_stats(load_table(spark, sf_dir, "documents"))


@query(
    "lang_confusion",
    survey="ext-text A2",
    tags=("llmops",),
    oracle=text_analysis.LANG_CONFUSION_SQL,
)
def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic vs labels, as a confusion matrix."""
    return text_analysis.lang_confusion(load_table(spark, sf_dir, "documents"))


# ------------------------------------------------------------------- dedup

@query(
    "dedup_exact",
    survey="ext-dedup A2 A6",
    tags=("llmops",),
    oracle=dedup.EXACT_DUP_SQL,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dup_groups(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_fingerprint",
    survey="ext-dedup",
    tags=("llmops",),
    oracle=dedup.FINGERPRINT_DUP_SQL,
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.fingerprint_dup_groups(load_table(spark, sf_dir, "documents"))


def _sig_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus MinHash signature index (doc_id, signature), built
    ONCE per (session, sf_dir) and eagerly checkpointed — the stored
    LSH index artifact every full-corpus minhash consumer probes
    (``minhash_bands`` / ``minhash_candidate_pairs`` /
    ``minhash_estimate_error``). In production this is a maintained
    table updated by the ingest path (``stream_ingest_near_dup_*``
    maintain the %5-split variant); locally the checkpoint stands in
    for reading it, the same amortization as ``_pq_shared`` and
    ``streaming_live._base_band_index``. Signatures are deterministic
    (md5 OPH), so a cached read is bit-identical to a rebuild and the
    DuckDB oracles — which always re-derive from text — still gate
    every consumer exactly."""
    cache = getattr(spark, "_wh_minhash_sig_idx", None)
    if cache is None:
        cache = {}
        spark._wh_minhash_sig_idx = cache
    if sf_dir not in cache:
        cache[sf_dir] = dedup.minhash_signatures(
            load_table(spark, sf_dir, "documents")
        ).localCheckpoint(eager=True)
    return cache[sf_dir]


def _pairs_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus LSH candidate-pair table (doc_a, doc_b) — the
    handoff artifact between the banding stage and every verifier in
    a production dedup pipeline, built ONCE per (session, sf_dir)
    from the session signature index. Sharing it means the Σ bucket²
    self-join runs once per corpus snapshot, not once per consumer
    (``minhash_candidate_pairs`` emits it; ``minhash_estimate_error``
    samples it)."""
    cache = getattr(spark, "_wh_minhash_pairs_idx", None)
    if cache is None:
        cache = {}
        spark._wh_minhash_pairs_idx = cache
    if sf_dir not in cache:
        cache[sf_dir] = dedup._candidate_pairs_from_bands(
            dedup._band_hashes(_sig_index(spark, sf_dir))
        ).localCheckpoint(eager=True)
    return cache[sf_dir]


@query(
    "minhash_bands",
    survey="ext-dedup W-none",
    tags=("llmops",),
    oracle=dedup._minhash_bands_sql(),
)
def minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH banded signatures (the bucketing relation) — a
    pure banding projection over the session signature index."""
    return dedup._band_hashes(_sig_index(spark, sf_dir))


@query(
    "minhash_candidate_pairs",
    survey="ext-dedup J-self",
    tags=("llmops",),
    oracle=dedup.MINHASH_PAIRS_SQL,
)
def minhash_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs from LSH bucket collisions (banded
    Σ bucket² self-join over the session signature index, shared via
    the session pair table)."""
    return _pairs_index(spark, sf_dir)


@query(
    "minhash_estimate_error",
    survey="ext-dedup J-self A8",
    tags=("llmops",),
    oracle=dedup.minhash_estimate_error_sql(),
)
def minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit: MinHash-estimated vs exact Jaccard on a
    deterministic md5 sample of LSH candidate pairs (operators/
    dedup.py ``minhash_estimate_error``) — the measurement that
    calibrates the pipeline's verify threshold. Probes the session
    signature index for candidates; only sampled docs are re-shingled
    for the exact verifier, so corpus-wide work is zero beyond the
    maintained index."""
    return dedup.minhash_estimate_error(
        load_table(spark, sf_dir, "documents"),
        sigs=_sig_index(spark, sf_dir),
        pairs=_pairs_index(spark, sf_dir))


@query(
    "jaccard_pairs_sample",
    survey="ext-dedup J-self A8",
    tags=("llmops",),
    oracle=dedup.jaccard_pairs_sql(doc_filter="doc_id < 100"),
)
def jaccard_pairs_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard over an inverted shingle index (bounded to
    a 100-doc sample — the exact verifier that runs downstream of LSH
    candidates at scale)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return dedup.jaccard_pairs(docs)


@query(
    "simhash_signatures",
    survey="ext-dedup A7",
    tags=("llmops",),
    oracle=dedup.SIMHASH_SQL,
)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _simhash_index(spark, sf_dir)


def _simhash_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus SimHash signature index (doc_id, simhash), built
    ONCE per (session, sf_dir) and eagerly checkpointed — the simhash
    counterpart of ``_sig_index``; signatures are per-doc, so every
    restricted consumer (the 2000-doc bounded verifier) is an exact
    id-filter of this relation."""
    cache = getattr(spark, "_wh_simhash_idx", None)
    if cache is None:
        cache = {}
        spark._wh_simhash_idx = cache
    if sf_dir not in cache:
        cache[sf_dir] = dedup.simhash_signatures(
            load_table(spark, sf_dir, "documents")
        ).localCheckpoint(eager=True)
    return cache[sf_dir]


@query(
    "simhash_near_dup_pairs",
    survey="ext-dedup J-self",
    tags=("llmops",),
    oracle=dedup.simhash_pairs_sql(doc_filter="doc_id < 2000"),
)
def simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash hamming-band near-dup pairs — the BOUNDED VERIFIER form
    (2000-doc sample, like ``jaccard_pairs_sample`` /
    ``supplier_fuzzy_pairs``). Banded join with ``max_hamming <=
    n_bands - 1`` has full recall by pigeonhole, so the
    approximate-looking LSH plan yields an EXACT result — hence the
    hash gate. The full-corpus production form is
    ``simhash_near_dup_clusters``: pair output grows Σ cluster²
    (43 M pairs at sf1), so at scale the pair list is never
    materialized — candidates pipe straight into connected
    components."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    return dedup.simhash_near_dup_pairs(
        docs,
        sigs=_simhash_index(spark, sf_dir).filter(F.col("doc_id") < 2000))


@query(
    "simhash_near_dup_clusters",
    survey="ext-dedup J-self A2",
    tags=("llmops",),
    oracle=dedup.simhash_clusters_sql(),
)
def simhash_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus simhash dedup, scale-safe: collapse docs to one
    representative per DISTINCT signature (kills the Σ cluster²
    quadratic core — identical docs share a simhash), banded
    hamming join over distinct signatures only, connected components
    over the representative graph, labels fanned back per doc.
    Output is one (doc_id, cluster_id) row per document — ∝ corpus
    size by construction. Exact (full-recall banding + exact CC),
    hence the hash gate."""
    return dedup.simhash_near_dup_clusters(
        load_table(spark, sf_dir, "documents"),
        sigs=_simhash_index(spark, sf_dir),
    )


@query(
    "dedup_clusters",
    survey="ext-dedup J-self A2",
    tags=("llmops",),
    oracle=dedup.dedup_clusters_sql(doc_filter="doc_id < 200"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: exact jaccard pairs (≥0.35) over
    a bounded sample → connected components by min-label propagation.
    cluster_id = min doc_id of the cluster; singletons keep their own
    id, so the output covers every sampled doc. The DuckDB twin is a
    recursive-CTE transitive closure — gates the iterative Spark loop
    exactly."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = dedup.jaccard_pairs(docs, min_jaccard=0.35).select("doc_a", "doc_b")
    # Propagate over edge endpoints only; singleton docs (the vast
    # majority) skip the iterative loop and rejoin as their own label.
    cc = dedup.connected_components(pairs, src="doc_a", dst="doc_b")
    return (
        docs.select("doc_id")
        .join(cc.select(F.col("id").alias("doc_id"),
                        F.col("label").alias("cluster_id")), "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
    )


@query(
    "dedup_pipeline_keep_best",
    survey="ext-dedup ext-pipeline W3 A7",
    tags=("llmops",),
    oracle=dedup.dedup_keep_best_sql(min_jaccard=0.35),
)
def dedup_pipeline_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION dedup path end-to-end over the full corpus:
    MinHash-LSH candidate pairs → per-pair exact-Jaccard verification
    (``jaccard_verify``: O(|candidates|), never all-pairs) →
    connected components → keep the highest-quality doc per cluster
    (longest text, doc_id tiebreak). Output is one row per document
    with its cluster and keep/drop decision — the exact relation a
    training-data builder materializes before tokenization.

    Scale shape: every stage is the bounded-cost variant — candidate
    pairs come from the SESSION PAIR INDEX (the maintained LSH
    artifact; the Σ bucket² band join runs once per corpus snapshot,
    not per consumer), verification shingles ONLY documents that
    appear in a candidate pair (keyed left-semi restriction before
    the normalize+shingle scan — the same probe-don't-rebuild shape
    as ``minhash_estimate_error``), then O(log diameter) label
    propagation and a per-cluster window over the tiny cluster
    relation. Nothing touches n², and the corpus-wide text pass
    exists only inside the maintained index build. The candidate-doc
    shingle relation is eagerly checkpointed (it feeds both verifier
    sides); it is candidate-bounded — at extreme duplication density,
    where candidates ≈ corpus, the linear-volume
    ``dedup_keep_best_chain`` form is the documented path."""
    docs = load_table(spark, sf_dir, "documents")
    candidates = _pairs_index(spark, sf_dir)
    ids = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .union(candidates.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_docs = docs.select("doc_id", "text").join(ids, "doc_id", "left_semi")
    sets = dedup.shingle_sets(cand_docs).localCheckpoint(eager=True)
    verified = (
        dedup.jaccard_verify_sets(candidates, sets)
        .filter(F.col("jaccard") >= 0.35)
        .select("doc_a", "doc_b")
    )
    # Propagate labels over edge ENDPOINTS only (nodes=None): in a
    # deduped corpus ~90 % of docs are singletons, and at 100 TB the
    # iterative frame must be ∝ |edges|, not |corpus| — singletons
    # rejoin afterwards with label = own id via one left join.
    cc = dedup.connected_components(verified, src="doc_a", dst="doc_b")
    labeled = (
        docs.select("doc_id", "n_chars")
        .join(cc.select(F.col("id").alias("doc_id"),
                        F.col("label").alias("cluster_id")), "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
    )
    w = (
        Window.partitionBy("cluster_id")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
    )
    return labeled.select(
        "doc_id",
        "cluster_id",
        (F.row_number().over(w) == 1).alias("is_kept"),
    )


@query(
    "dedup_keep_best_chain",
    survey="ext-dedup ext-pipeline ext-sketch W3 A7",
    tags=("llmops",),
    oracle=dedup.dedup_keep_best_chain_sql(min_jaccard=0.35),
)
def dedup_keep_best_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LINEAR-VOLUME keep-best dedup (extreme-duplication path):
    fingerprint collapse → per-bucket CHAIN candidates (m-1 edges per
    m-doc LSH bucket, never m²/2) → bottom-k sketch Jaccard verify
    (fixed-size payload per doc) → connected components → keep
    longest per cluster. ``dedup_pipeline_keep_best`` (exact-verify)
    remains the moderate-duplication form; this one's verify shuffle
    stays ∝ corpus at ANY duplication density — the sf10 sweep
    (100 copies/doc) killed the exact form on local disk and runs
    this one in minutes (BASELINE.md round 3). Deterministic
    end-to-end, so the DuckDB twin hash-gates the estimator too."""
    return dedup.dedup_keep_best_chain(
        load_table(spark, sf_dir, "documents"),
        sigs=_sig_index(spark, sf_dir))


@query(
    "incremental_dedup_delta",
    survey="ext-dedup ext-pipeline ext-incremental A2 J6",
    tags=("llmops",),
    oracle=dedup.incremental_dedup_delta_sql(threshold=0.35, delta_mod=5),
)
def incremental_dedup_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: the 20 % 'new crawl batch'
    (doc_id % 5 == 0) is checked against the 80 % base corpus by
    probing the base's LSH band index — base×base pairs are never
    formed, so per-ingest cost is ∝ the delta's bucket collisions,
    independent of how big the already-ingested corpus has grown.
    Each delta doc is labeled dup_of_base / dup_in_delta (first-
    occurrence rule, no recursion) / unique with its match stats;
    exact-Jaccard verification keeps the decision deterministic and
    the whole pipeline hash-gated."""
    return dedup.incremental_dedup_delta(
        load_table(spark, sf_dir, "documents"), threshold=0.35, delta_mod=5,
        sigs=_sig_index(spark, sf_dir),
    )


@query(
    "incremental_dedup_delta_sketch",
    survey="ext-dedup ext-pipeline ext-incremental ext-sketch A2 W4",
    tags=("llmops",),
    oracle=dedup.incremental_dedup_delta_sketch_sql(threshold=0.35,
                                                    delta_mod=5),
)
def incremental_dedup_delta_sketch(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """The extreme-duplication-safe ingest dedup: per-bucket
    chain-predecessor candidates (≤ n_bands per delta doc at ANY
    duplication density — the exact form's candidates grow ∝ density
    and hit 10M pairs on the 100-copy sf10 replica) verified with
    fixed-size bottom-k sketches. Hash-gated including the estimator
    (pure md5 arithmetic). The exact form stays registered for
    clean/moderate ingests where full match stats are wanted."""
    return dedup.incremental_dedup_delta_sketch(
        load_table(spark, sf_dir, "documents"), threshold=0.35, delta_mod=5,
        sigs=_sig_index(spark, sf_dir),
    )


# -------------------------------------------------------------- similarity

@query(
    "ann_cosine_topk",
    survey="ext-sim W3 J-broadcast",
    tags=("llmops",),
    oracle=similarity.cosine_topk_sql(query_filter="vec_id < 5", k=10),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 5 query vectors (brute-force baseline;
    queries broadcast, corpus never shuffles)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.cosine_topk(emb, queries, k=10)


@query(
    "lsh_ann_topk",
    survey="ext-sim",
    tags=("llmops",),
    # HASH-GATED since r7 (VERDICT r6 ask #2): buckets and cosine are
    # sequential folds (bit-identical cross-engine), and the builder's
    # adaptive_band_bits resolves to the oracle's static
    # SIM_LSH_BAND_BITS at every gate scale (n ≤ 2000 → 4 bits; the
    # proven embedding_lsh_clusters pattern). The twin replays DISTINCT
    # band collisions — set-equal to the first-collision rule.
    oracle=similarity.lsh_index_topk_sql(k=10, query_filter="vec_id < 5"),
)
def lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN — the scale path (scores only
    bucket-mates; the corpus never self-pairs outside shared
    buckets). Exact twin: ann_cosine_topk (brute force). Bucket bits
    adapt to the corpus (Σ bucket² stays linear); at the driver's
    gate scale that resolves to the static oracle's width, so the
    whole approximate pipeline — banding, candidate generation,
    scoring, ranking — is hash-gated, not just row-counted. A frozen
    builder constant was rejected: it would quadratically degrade
    the sf≥1 bench while buying nothing at the gate scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.lsh_ann_topk(
        emb, queries, k=10,
        band_bits=similarity.adaptive_band_bits(emb.count()),
    )


@query(
    "embedding_near_dup",
    survey="ext-dedup J-self A8",
    tags=("llmops",),
    oracle=similarity.near_dup_pairs_sql(threshold=0.35, vec_filter="vec_id < 500"),
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the exact O(n²·dim)
    verifier, bounded to a 500-vector slice (the role it plays
    downstream of LSH candidate generation at scale; unbounded n² is
    never the production path — that's the LSH twin below)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    return similarity.embedding_near_dup_pairs(emb, threshold=0.35)


@query(
    "embedding_near_dup_lsh",
    survey="ext-dedup",
    tags=("llmops",),
    # HASH-GATED since r7 (VERDICT r6 ask #2) — same pattern as
    # lsh_ann_topk above: seqfold buckets + seqfold verify cosine,
    # adaptive bits == the oracle's static width at the gate scale.
    oracle=similarity.near_dup_lsh_pairs_sql(threshold=0.35),
)
def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed near-dup pairs: Σ bucket² work instead of n² —
    band width adapts to the corpus so bucket sizes (and the
    per-band self-join) stay bounded as n grows. Candidates are
    exact-cosine verified (precision 1.0; the recall floor vs the
    exact twin is gated in tests/test_similarity_recall.py), and the
    DuckDB twin replays banding + verification bit-for-bit at the
    gate scale.

    Scale caveat (measured, BASELINE.md r7 spot table): PAIR
    ENUMERATION is intrinsically output-bound — at high duplication
    multiplicity the true pair count itself grows with multiplicity²
    (the sf10 ×100-replica corpus emits ~10M verified pairs), so this
    form is the bounded verifier/reporting query; corpus-scale dedup
    consumes cluster MEMBERSHIP instead (embedding_lsh_clusters /
    semantic_dedup_clusters — linear output, one row per vector)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup_pairs_lsh(
        emb, threshold=0.35,
        band_bits=similarity.adaptive_band_bits(emb.count()),
    )


@query(
    "lsh_index_pruned_topk",
    survey="ext-sim ext-layout W3 P6",
    tags=("llmops",),
    oracle=similarity.lsh_index_topk_sql(k=10, query_filter="vec_id < 5"),
)
def lsh_index_pruned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-time layout for the ANN path (VERDICT r3 #7): the LSH
    index is MATERIALIZED as parquet partitioned by (band, bucket)
    (operators/similarity.lsh_index_write), and the 5-query top-10
    search reads it with a partition-column predicate built from the
    queries' own buckets — the scan lists only those directories
    (PartitionFilters, asserted on the executed plan in
    tests/test_layout.py), so at 100 TB a query opens
    ~n_bands·n/2^band_bits of the index instead of scanning it.
    Sequential-fold buckets and verify cosine keep the whole pruned
    pipeline bit-identical to the DuckDB twin — a hash-gated proof
    that pruning loses nothing."""
    cache = getattr(spark, "_wh_lsh_index", None)
    if cache is None:
        cache = {}
        spark._wh_lsh_index = cache
    path = cache.get(sf_dir)
    if path is None:
        from ..tmputil import scratch_dir

        path = scratch_dir("wh_lsh_index_")
        similarity.lsh_index_write(
            load_table(spark, sf_dir, "embeddings"), path
        )
        cache[sf_dir] = path
    queries = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    return similarity.lsh_index_topk(spark, path, queries, k=10)


@query(
    "semantic_dedup_clusters",
    survey="ext-dedup ext-semdedup ext-sim A2 J-self",
    tags=("llmops",),
    # HASH-GATED since r7 (VERDICT r6 ask #5): the learned Lloyd fit
    # unrolls into chained CTE stages with the density-adaptive k
    # computed IN SQL, then the recursive-CTE closure proven on
    # dedup_clusters replays the label propagation (margins measured
    # in kmeans.semantic_dedup_kmeans_sql's docstring). Cell recall
    # vs exact ground truth stays gated in
    # tests/test_similarity_recall.py.
    oracle=kmeans.semantic_dedup_kmeans_sql(threshold=0.35,
                                            target_cell=500, n_iter=2),
)
def semantic_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table with LEARNED density-
    adaptive cells: k = ceil(n/500) deterministic k-means centroids →
    Arrow-side assignment → exact cosine pairs within each cell →
    connected components → min-id keeper per semantic cluster. The
    defining SemDeDup scale property: cells stay ≈500 vectors as n
    grows, so Σ cell² ≈ n·500 — linear — where the fixed-cardinality
    label cells the previous registered form used were measured
    quadratic across scale factors (349 s at sf1, BASELINE.md r3).
    Reference analogue: the dedup role of
    scripts/silver/proc_load_silver.sql:68-71 at corpus scale."""
    return similarity.semantic_dedup_clusters_kmeans(
        load_table(spark, sf_dir, "embeddings"), threshold=0.35,
        target_cell=500, n_iter=2,
    )


@query(
    "semantic_dedup_cells_exact",
    survey="ext-dedup ext-semdedup ext-sim A2 J-self",
    tags=("llmops",),
    oracle=similarity.semantic_dedup_sql(threshold=0.35,
                                         vec_filter="vec_id < 1000"),
)
def semantic_dedup_cells_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BOUNDED, hash-gated SemDeDup verifier: label-column cells
    on a ≤1000-vector slice, exact cosine within cells, recursive-
    closure clusters replayed bit-for-bit by the DuckDB twin. The
    bound is the point — fixed cell cardinality is measured quadratic
    across scale factors, so the unbounded form of this query is
    never the production path (that's ``semantic_dedup_clusters``,
    learned cells); this slice exists to pin every stage of the
    shared within-cell core against an independent engine."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 1000
    )
    return similarity.semantic_dedup_clusters(emb, threshold=0.35)


@query(
    "embedding_lsh_clusters",
    survey="ext-dedup ext-sim ext-semdedup J-self A2",
    tags=("llmops",),
    oracle=similarity.lsh_clusters_sql(threshold=0.35),
)
def embedding_lsh_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-amplified LSH near-dup clusters — the recall-preserving,
    HASH-GATED scale path for semantic dedup (cell partitioning
    loses 58-85% of pairs in this similarity regime, measured in
    BASELINE.md): 8 bands × 4 deterministic hyperplane sign bits,
    candidates verified by exact cosine ≥ 0.35, connected
    components, one (vec_id, cluster_id) row per vector. Bucket
    bits are sequential ±folds, so the DuckDB twin replays the
    whole pipeline bit-for-bit.

    Band width adapts to the corpus (adaptive_band_bits keeps
    buckets ≈125 vectors, Σ bucket² linear); at the gate scales
    (n ≤ 2000) that resolves to the oracle's 4 bits, so the static
    twin stays exact. The classic trade documented in BASELINE.md
    applies: more bits preserve per-band cost, and at WEAK
    thresholds (0.35 ≈ 60-70°, per-bit p≈0.6) recall decays with
    bits — sub-quadratic weak-similarity joins are intrinsically
    recall-limited; at production semantic-dup thresholds (0.9+,
    p≈0.92) the same shape keeps recall ≥0.95 at any width."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup_lsh_clusters(
        emb, threshold=0.35,
        band_bits=similarity.adaptive_band_bits(emb.count()),
    )


@query(
    "label_centroid_similarity",
    survey="ext-sim A7",
    tags=("llmops",),
    oracle=similarity.LABEL_CENTROID_SQL,
)
def label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine of each vector to its label centroid (IVF coarse
    quantization building block). Centroid means use scaled-int64
    accumulation so both engines agree bit-for-bit."""
    return similarity.label_centroid_similarity(
        load_table(spark, sf_dir, "embeddings")
    )


@query(
    "ivf_ann_topk",
    survey="ext-sim A7 W3",
    tags=("llmops",),
    oracle=similarity.ivf_topk_sql(query_filter="vec_id < 5", k=10, nprobe=2),
)
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: probe the 2 nearest label-centroids per query, exact
    cosine inside the probed clusters only (operators/similarity.py).
    Fully deterministic, so — unlike the random-hyperplane LSH twin —
    the whole approximate pipeline is hash-gated."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.ivf_topk(emb, queries, k=10, nprobe=2)


@query(
    "ivf_kmeans_ann_topk",
    survey="ext-sim A7 W3",
    tags=("llmops",),
    # the 2-iteration Lloyd fit UNROLLS into chained CTE stages (the
    # BPE-oracle move); discrete argmin assignments survive the
    # numpy-vs-SQL fold difference by nine orders of magnitude of
    # measured margin, and the output cosines replay the fixed fold
    # bit-for-bit — see kmeans.ivf_kmeans_topk_sql. Recall vs the
    # exact baseline stays asserted in tests/test_kmeans.py.
    oracle=kmeans.ivf_kmeans_topk_sql(query_filter="vec_id < 5", k=10,
                                      nprobe=3, n_clusters=8, n_iter=2),
)
def ivf_kmeans_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over a LEARNED coarse quantizer: 2 Lloyd iterations of
    deterministic k-means (operators/kmeans.py) learn 8 clusters, then
    probe the 3 nearest per query and score exact cosine inside them —
    the no-label counterpart of ``ivf_ann_topk`` (recall@10 = 0.76 vs
    the exact baseline at sf0.01, identical to 4 iterations;
    tests/test_kmeans.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans.kmeans_fit(emb, k=8, n_iter=2)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return kmeans.ivf_kmeans_topk(emb, queries, cents, k=10, nprobe=3)


_PQ_SHARED: dict[tuple[str, str], tuple[list, DataFrame]] = {}


def _pq_shared(spark: SparkSession, sf_dir: str) -> tuple[list, DataFrame]:
    """Session-shared PQ index artifact (VERDICT r4 ask #5 / r5 ask
    #5): the codebook fit and the encoded corpus are built ONCE per
    (session, sf_dir) and reused by every PQ query — the production
    shape, where codebooks and the code table are STORED index
    artifacts consulted by searches, not refit per query. The shared
    fit is the DISTRIBUTED multi-subspace Lloyd loop ``pq.pq_fit``
    (the training-sets-too-big-to-collect scale path — it stays
    exercised every bench/driver run by whichever PQ query executes
    first); the bounded-sample fit ``pq.pq_fit_sampled`` keeps its
    recall + determinism gates in tests/test_similarity_recall.py."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PQ_SHARED:
        # Evict entries from other applications first (ADVICE r6 #3):
        # a long-lived process that restarts Spark sessions would
        # otherwise pin dead sessions' checkpointed DataFrames and
        # codebooks forever. Entries for the CURRENT app (other
        # sf_dirs) stay — that cross-query sharing is the cache's
        # point.
        app = spark.sparkContext.applicationId
        for stale in [k for k in _PQ_SHARED if k[0] != app]:
            del _PQ_SHARED[stale]
        emb = load_table(spark, sf_dir, "embeddings")
        books = pq.pq_fit(emb, m=16, k=16, n_iter=2)
        wide = pq.pq_encode(emb, books).localCheckpoint(eager=True)
        _PQ_SHARED[key] = (books, wide)
    return _PQ_SHARED[key]


def _pq_query_vectors(emb: DataFrame) -> list[tuple[int, list[float]]]:
    qrows = (
        emb.filter(F.col("vec_id") < 5)
        .select("vec_id", "embedding")
        .collect()
    )
    return [(r["vec_id"], [float(x) for x in r["embedding"]])
            for r in qrows]


@query(
    "pq_ann_topk",
    survey="ext-sim ext-pq W3",
    tags=("llmops",),
    # the multi-subspace Lloyd fit unrolls into chained CTE stages
    # (pq.pq_ann_topk_sql — the BPE/kmeans-oracle move), with
    # measured decision margins 7+ orders above float-fold noise and
    # fold-order-exact outputs; recall vs the exact L2 baseline
    # stays gated in tests/test_similarity_recall.py
    oracle=pq.pq_ann_topk_sql(query_filter="vec_id < 5", m=16, k=16,
                              n_iter=2),
)
def pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/pq.py): 16 subspaces × 16
    codewords, corpus encoded to 16-byte codes, 5 queries scored by
    ADC table lookups, ADC-top-50 exactly re-ranked — the
    memory-bound scale path (codes are 16× smaller than the float
    vectors, so a 100 TB corpus scans as ~6 TB in stage 1; stage 2
    touches 50 float rows per query). Codebook + code table come
    from the session-shared index artifact (``_pq_shared``) — fit
    and encode amortize across the PQ queries exactly as a stored
    index amortizes across searches. Recall@10 = 0.82 vs exact L2,
    gated in tests/test_similarity_recall.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    books, wide = _pq_shared(spark, sf_dir)
    return pq.pq_ann_topk(emb, _pq_query_vectors(emb), books, k=10,
                          codes_wide=wide)


@query(
    "pq_ann_topk_distfit",
    survey="ext-sim ext-pq W3",
    tags=("llmops",),
    # same unrolled-Lloyd oracle as pq_ann_topk (both queries search
    # the session-shared pq_fit index); the distributed-fit machinery
    # is what this entry pays for when it runs first
    oracle=pq.pq_ann_topk_sql(query_filter="vec_id < 5", m=16, k=16,
                              n_iter=2),
)
def pq_ann_topk_distfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN over codebooks from the DISTRIBUTED multi-subspace
    Lloyd loop (``pq.pq_fit`` — the codebook path for training sets
    too large to collect, VERDICT r3 #5). All 16 subspaces train
    together in one Arrow-batched mapInPandas pass per iteration:
    each batch emits per-(subspace, code, dim) scaled-int64 partial
    sums, the shuffle carries only those tiny rows (map-side
    combine), and driver state is the D·K-double codebook regardless
    of corpus size. The fit + corpus encode build the session-shared
    index artifact (``_pq_shared``): whichever PQ query runs first
    pays them once; the other pays only ADC search + re-rank
    (VERDICT r4/r5 ask #5). Recall@10 vs exact L2 is gated ≥ 0.8 in
    tests/test_similarity_recall.py (measured 0.82 at sf0.01)."""
    emb = load_table(spark, sf_dir, "embeddings")
    books, wide = _pq_shared(spark, sf_dir)
    return pq.pq_ann_topk(emb, _pq_query_vectors(emb), books, k=10,
                          codes_wide=wide)


# ------------------------------------------------------- selection funnel

@query(
    "corpus_filter_funnel",
    survey="ext-text ext-dedup A1 W1",
    tags=("llmops",),
    oracle=f"""
        WITH flags AS (
            SELECT doc_id,
                   {text_analysis.TOKEN_COUNT_SQL.format(col="text")} >= 10
                     AND {text_analysis.ALPHA_RATIO_SQL.format(col="text")} >= 0.5
                     AS q_ok,
                   {lang_guess_sql_text} != 'und' AS lang_ok,
                   doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_keeper
            FROM documents
        )
        SELECT 'total' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs FROM flags
        UNION ALL
        SELECT 'quality_pass', CAST(COALESCE(SUM(CASE WHEN q_ok THEN 1 END), 0) AS BIGINT) FROM flags
        UNION ALL
        SELECT 'lang_identified',
               CAST(COALESCE(SUM(CASE WHEN q_ok AND lang_ok THEN 1 END), 0) AS BIGINT) FROM flags
        UNION ALL
        SELECT 'deduplicated',
               CAST(COALESCE(SUM(CASE WHEN q_ok AND lang_ok AND is_keeper THEN 1 END), 0) AS BIGINT) FROM flags
    """,
)
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data selection funnel: quality filter → language
    filter → exact dedup, reported as per-stage survivor counts. One
    projection pass + one window shuffle (dedup keeper flag) + a tiny
    final aggregate — the canonical shape of a corpus selection job
    at 100 TB."""
    from pyspark.sql import Window

    from ..functions.text import alpha_ratio, lang_guess, token_count

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text"))
    flags = docs.select(
        ((token_count(F.col("text")) >= 10) & (alpha_ratio(F.col("text")) >= 0.5))
        .alias("q_ok"),
        (lang_guess(F.col("text")) != "und").alias("lang_ok"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_keeper"),
    )

    # ONE aggregate for all four funnel counters, unpivoted to stage
    # rows afterwards — a union of four separate aggregates re-ran the
    # full projection + dedup window per stage (4 corpus passes,
    # measured 65 s at sf10; single-pass ~4× less).
    def surv(cond) -> F.Column:
        return F.coalesce(F.sum(F.when(cond, F.lit(1))), F.lit(0)).cast("long")

    agg = flags.agg(
        F.count(F.lit(1)).cast("long").alias("_total"),
        surv(F.col("q_ok")).alias("_quality"),
        surv(F.col("q_ok") & F.col("lang_ok")).alias("_lang"),
        surv(
            F.col("q_ok") & F.col("lang_ok") & F.col("is_keeper")
        ).alias("_dedup"),
    )
    return agg.select(
        F.expr(
            "stack(4, 'total', _total, 'quality_pass', _quality, "
            "'lang_identified', _lang, 'deduplicated', _dedup) "
            "AS (stage, n_docs)"
        )
    )


# -------------------------------------------------------------- multimodal

@query(
    "media_decode_stats",
    survey="ext-media mapInPandas",
    tags=("llmops", "multimodal"),
    oracle="""
        WITH media AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS media_type,
                   octet_length(encode(text)) AS n_bytes,
                   md5(text) AS checksum
            FROM documents
        )
        SELECT media_type,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
               CAST(COUNT(DISTINCT checksum) AS BIGINT) AS distinct_payloads,
               CAST(MAX(n_bytes % 640) AS BIGINT) AS max_width,
               CAST(MAX((n_bytes * 7) % 480) AS BIGINT) AS max_height
        FROM media GROUP BY media_type
    """,
)
def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns decoded via Arrow-batched mapInPandas
    (deterministic fake codec — see operators/multimodal.py), then a
    plain JVM-side rollup. The oracle replays the fake decode
    arithmetically, which hash-gates the whole Python batch path:
    schema, batch shape, and every byte read."""
    media = multimodal.attach_fake_media(load_table(spark, sf_dir, "documents"))
    decoded = multimodal.decode_media(media)
    return decoded.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.countDistinct("checksum").alias("distinct_payloads"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
    )


@query(
    "media_real_decode_stats",
    survey="ext-media ext-codec mapInPandas",
    tags=("llmops", "multimodal"),
    oracle="""
        WITH img AS (
          SELECT doc_id, 16 + doc_id % 17 AS width, 8 + doc_id % 13 AS height
          FROM documents WHERE doc_id % 3 = 0
        ),
        img_stats AS (
          SELECT i.doc_id, i.width, i.height,
                 CAST(SUM((i.doc_id + 3 * gx.x + 7 * gy.y) % 256) AS BIGINT)
                   AS content_sum
          FROM img i,
               generate_series(0, 32) gx(x),
               generate_series(0, 20) gy(y)
          WHERE gx.x < i.width AND gy.y < i.height
          GROUP BY i.doc_id, i.width, i.height
        ),
        aud AS (
          SELECT doc_id, 64 + doc_id % 97 AS n_samples
          FROM documents WHERE doc_id % 3 = 1
        ),
        aud_stats AS (
          SELECT a.doc_id, a.n_samples,
                 CAST(SUM(ABS(((a.doc_id * 131 + g.i * 17) % 65536) - 32768))
                      AS BIGINT) AS content_sum
          FROM aud a, generate_series(0, 160) g(i)
          WHERE g.i < a.n_samples
          GROUP BY a.doc_id, a.n_samples
        )
        SELECT doc_id, 'image' AS media_type,
               CAST(width AS BIGINT) AS width,
               CAST(height AS BIGINT) AS height,
               CAST(0 AS BIGINT) AS sample_rate,
               CAST(0 AS BIGINT) AS n_samples,
               CAST(0 AS BIGINT) AS duration_ms,
               content_sum
        FROM img_stats
        UNION ALL
        SELECT doc_id, 'audio',
               CAST(0 AS BIGINT), CAST(0 AS BIGINT),
               CAST(8000 AS BIGINT),
               CAST(n_samples AS BIGINT),
               CAST(n_samples * 1000 // 8000 AS BIGINT),
               content_sum
        FROM aud_stats
    """,
)
def media_real_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec roundtrip (VERDICT r2 #4): deterministic doc_id-
    derived content → pure-stdlib PNG/WAV ENCODE (zlib deflate, CRC,
    RIFF headers) → pure-stdlib DECODE (inflate, unfilter, chunk/CRC
    verification) → per-doc stats, all inside one Arrow-batched
    mapInPandas. The oracle replays width/height/sample-count/content
    sums arithmetically in DuckDB, so a wrong filter implementation,
    a header off-by-one, or a short inflate breaks the hash."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.real_codec_roundtrip(docs)


@query(
    "media_video_decode_stats",
    survey="ext-media ext-codec mapInPandas-explode",
    tags=("llmops", "multimodal"),
    oracle="""
        WITH vid AS (
          SELECT doc_id, 8 + doc_id % 9 AS width, 4 + doc_id % 5 AS height,
                 2 + doc_id % 7 AS n_frames
          FROM documents WHERE doc_id % 3 = 2
        ),
        f AS (
          SELECT v.doc_id, v.width, v.height, v.n_frames, gf.f AS frame_idx
          FROM vid v, generate_series(0, 8) gf(f)
          WHERE gf.f < v.n_frames
        )
        SELECT f.doc_id,
               CAST(f.frame_idx AS BIGINT) AS frame_idx,
               CAST(f.width AS BIGINT) AS width,
               CAST(f.height AS BIGINT) AS height,
               CAST(f.n_frames AS BIGINT) AS n_frames,
               CAST(f.n_frames * 100 AS BIGINT) AS duration_ms,
               CAST(SUM((f.doc_id + 11 * f.frame_idx + 3 * gx.x
                         + 7 * gy.y) % 256) AS BIGINT) AS frame_sum
        FROM f,
             generate_series(0, 16) gx(x),
             generate_series(0, 8) gy(y)
        WHERE gx.x < f.width AND gy.y < f.height
        GROUP BY f.doc_id, f.frame_idx, f.width, f.height, f.n_frames
    """,
)
def media_video_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container roundtrip (VERDICT r7 ask #4 — the last
    documented fake, retired): deterministic doc_id-derived frames →
    pure-stdlib AVI ENCODE (RIFF hdrl/strl, bottom-up stride-padded
    uncompressed DIB frames, keyframe idx1) → pure-stdlib DECODE with
    full structural verification (header agreement, every idx1 entry
    replayed against actual movi offsets/lengths, stride strip, row
    re-flip) → one row PER FRAME with its exact pixel sum, inside one
    Arrow-batched mapInPandas. The oracle replays the frame geometry
    and pixel sums arithmetically in DuckDB, so a stride off-by-one,
    a row-order mistake, or a misparsed header breaks the hash.
    Reference parity: the warehouse has no media path — this is the
    beyond-reference multimodal family (SURVEY §2 ext-media)."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.video_codec_roundtrip(docs)


@query(
    "media_gif_decode_stats",
    survey="ext-media ext-codec mapInPandas-explode",
    tags=("llmops", "multimodal"),
    oracle="""
        WITH gif AS (
          SELECT doc_id, 6 + doc_id % 11 AS width, 3 + doc_id % 6 AS height,
                 1 + doc_id % 5 AS n_frames, 4 + doc_id % 7 AS delay_cs
          FROM documents WHERE doc_id % 3 = 2
        ),
        f AS (
          SELECT g.doc_id, g.width, g.height, g.n_frames, g.delay_cs,
                 gf.f AS frame_idx
          FROM gif g, generate_series(0, 5) gf(f)
          WHERE gf.f < g.n_frames
        )
        SELECT f.doc_id,
               CAST(f.frame_idx AS BIGINT) AS frame_idx,
               CAST(f.width AS BIGINT) AS width,
               CAST(f.height AS BIGINT) AS height,
               CAST(f.n_frames AS BIGINT) AS n_frames,
               CAST(f.n_frames * f.delay_cs * 10 AS BIGINT) AS duration_ms,
               CAST(SUM((3 * f.doc_id + 13 * f.frame_idx + 5 * gx.x
                         + 7 * gy.y) % 256) AS BIGINT) AS frame_sum
        FROM f,
             generate_series(0, 16) gx(x),
             generate_series(0, 8) gy(y)
        WHERE gx.x < f.width AND gy.y < f.height
        GROUP BY f.doc_id, f.frame_idx, f.width, f.height, f.n_frames,
                 f.delay_cs
    """,
)
def media_gif_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-animation roundtrip (VERDICT r8 ask #7 — the
    real-codec family's first COMPRESSED format): doc_id-derived
    frames → pure-stdlib GIF89a ENCODE (grayscale global palette,
    per-frame Graphic Control Extension, real variable-width LZW) →
    pure-stdlib DECODE with structural verification (signature,
    screen/descriptor agreement, palette checks, LZW code-range and
    exact-length gates) → one row PER FRAME with its exact pixel sum,
    inside one Arrow-batched mapInPandas. The oracle replays frame
    geometry, durations, and pixel sums arithmetically in DuckDB, so
    a mispacked LZW bit, a wrong width-growth rule, or a palette
    off-by-one breaks the hash. Reference parity: the warehouse has
    no media path — beyond-reference multimodal family (SURVEY §2
    ext-media)."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.gif_codec_roundtrip(docs)


@query(
    "media_frame_samples",
    survey="ext-media mapInPandas-explode",
    tags=("llmops", "multimodal"),
    oracle="""
        SELECT doc_id,
               CAST(LEAST(GREATEST(((doc_id * 37) % 30000) // 1000, 1), 8)
                    AS BIGINT) AS n_frames
        FROM documents WHERE doc_id % 3 = 2
    """,
)
def media_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (row-exploding mapInPandas): per-doc
    sampled-frame counts, hash-gated against the arithmetic the stub
    decoder implements (~1 fps capped at 8)."""
    media = multimodal.attach_fake_media(load_table(spark, sf_dir, "documents"))
    frames = multimodal.sample_frames(media)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames")
    )


@query(
    "media_embedding_topk",
    survey="ext-media ext-sim mapInPandas",
    tags=("llmops", "multimodal"),
    oracle=f"""
        WITH emb AS (
            SELECT doc_id,
                   list_transform(range(1, 17), i ->
                       (CAST(16 * (strpos('0123456789abcdef',
                                          substr(md5(text), 2*i-1, 1)) - 1)
                             + (strpos('0123456789abcdef',
                                       substr(md5(text), 2*i, 1)) - 1)
                             AS DOUBLE) - 127.5) / 127.5) AS emb
            FROM documents
        ),
        q AS (
            SELECT doc_id AS query_id, emb AS q_vec FROM emb
            WHERE doc_id % 167 = 0 AND doc_id < 500
        ),
        scored AS (
            SELECT q.query_id, e.doc_id AS vec_id,
                   {{cos}} AS cosine_sim
            FROM emb e CROSS JOIN q
        ),
        ranked AS (
            SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY cosine_sim DESC, vec_id ASC)
                      AS INTEGER) AS rank
            FROM scored
        )
        SELECT query_id, vec_id, cosine_sim, rank
        FROM ranked WHERE rank <= 5
    """.format(cos=vectors.cosine_sql("q.q_vec", "e.emb")),
)
def media_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal retrieval end-to-end: binary media payloads →
    Arrow-batched embedding extraction (stub encoder,
    operators/multimodal.embed_media) → exact cosine top-5 through
    the same ANN operator the text embeddings use
    (similarity.cosine_topk, queries broadcast, corpus never
    shuffles). The oracle replays the md5-byte projection
    arithmetically, so the gate covers the Python feature path AND
    the retrieval join bit-for-bit.

    FIXED query panel (r8 full-sf10-sweep fix): the panel is the
    %167 == 0 ids among the first 500 docs — a CONSTANT 3-query set
    at every sf, the standard retrieval-eval shape (panel fixed,
    corpus grows). The previous corpus-growing panel (every 167th
    doc) made the scorer quadratic by construction: 3k queries ×
    500k docs = 1.5B cosines at sf10, measured 326 s solo; fixed
    panel is corpus-linear. The driver-gate hash is unchanged —
    every sf0.01 doc_id is < 500, so both panels coincide there."""
    media = multimodal.attach_fake_media(load_table(spark, sf_dir, "documents"))
    emb = multimodal.embed_media(media)
    queries = emb.filter(
        (F.col("doc_id") % 167 == 0) & (F.col("doc_id") < 500)
    ).select(F.col("doc_id").alias("query_id"), "emb")
    return similarity.cosine_topk(
        emb, queries, k=5, id_col="doc_id", vec_col="emb", dim=16
    )


@query(
    "keyword_search_and",
    survey="ext-search ext-text A2 A6 P7",
    tags=("llmops",),
    oracle=text_analysis.keyword_search_sql(["stream", "join", "filter"]),
)
def keyword_search_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive keyword search ('stream' AND 'join' AND 'filter')
    over the documents corpus via the inverted-index plan
    (operators/text_analysis.keyword_search)."""
    return text_analysis.keyword_search(
        load_table(spark, sf_dir, "documents"),
        ["stream", "join", "filter"],
    )


@query(
    "bm25_top_docs",
    survey="ext-search ext-text A2 A8 O2 W-none",
    tags=("llmops",),
    oracle=text_analysis.bm25_rank_sql(["stream", "shuffle", "broadcast"]),
)
def bm25_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for the query ('stream','shuffle','broadcast') —
    deterministic ranking: exact-integer tf/df/dl inputs, one fixed
    double expression per (doc, term), fixed-order per-keyword column
    sums (see operators/text_analysis.bm25_rank)."""
    return text_analysis.bm25_rank(
        load_table(spark, sf_dir, "documents"),
        ["stream", "shuffle", "broadcast"],
    )


@query(
    "bpe_train_merges",
    survey="ext-text ext-bpe ext-tokenizer A2 O2",
    tags=("llmops",),
    # VERDICT r5 ask #7: a RECURSIVE CTE can't express the loop (the
    # per-step argmax aggregates over the recursive reference, which
    # SQL forbids) — but n_merges is a constant, so the oracle
    # UNROLLS 24 chained merge stages (operators/bpe.py block
    # comment); the full greedy trainer now hash-gates.
    oracle=bpe.bpe_train_capped_sql(n_merges=24),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEARN the BPE merge table from the corpus (operators/bpe.py —
    Sennrich et al. 2016): one distributed word-count pass collapses
    the corpus to its weighted vocabulary, then 24 greedy
    highest-pair merges run over the bounded top-50k head
    (``bpe_train_capped`` — the HuggingFace/SentencePiece shape;
    driver state ≤ max_vocab rows). The all-distributed loop
    (``bpe_train``: HOF pair counts + fold merge, ONE aggregate row
    to the driver per iteration) is the registered path's twin for
    vocabularies too large to collect, exact-equality-gated against
    this form in tests/test_operators.py."""
    return bpe.bpe_train_capped(
        load_table(spark, sf_dir, "documents"), n_merges=24
    )


@query(
    "bpe_encode_stats",
    survey="ext-text ext-bpe ext-tokenizer A2",
    tags=("llmops",),
    # the unrolled train chain's final state IS the encoded corpus
    # (sequential rank-order apply ≡ lowest-rank-first), so the
    # train-merges oracle machinery hash-gates the encode pass too;
    # the exact train/encode identity stays gated in
    # tests/test_operators.py
    oracle=bpe.bpe_encode_stats_sql(n_merges=24),
)
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the LEARNED BPE merge table
    (train → apply, the full tokenizer loop): 24 merges from
    ``bpe_train_capped``, applied per word by lowest-rank-first
    fusion in an Arrow-batched mapInPandas (stdlib-only closure).
    Per-language token accounting out — the number every training-
    budget decision starts from, now under the trained tokenizer
    instead of the fixed regex pre-tokenizer (``bpe_token_stats``)."""
    docs = load_table(spark, sf_dir, "documents")
    merges = [
        (r["left"], r["right"])
        for r in bpe.bpe_train_capped(docs, n_merges=24).collect()
    ]
    return bpe.bpe_encode_stats(docs, merges)


# ---------------------------------------------------- split leakage audit

_LEAK_MIN_JACCARD = 0.5


@query(
    "split_leakage_pairs",
    survey="ext-dedup ext-decon ext-split J-self A8",
    tags=("llmops",),
    oracle=f"""
        WITH bands AS ({dedup._minhash_bands_sql()}),
        splits AS (
          SELECT doc_id,
                 CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                        THEN 'train'
                      WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                        THEN 'val'
                      ELSE 'test' END AS split
          FROM documents
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS train_doc, b.doc_id AS test_doc
          FROM bands a
          JOIN splits sa ON sa.doc_id = a.doc_id AND sa.split = 'train'
          JOIN bands b
            ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
          JOIN splits sb ON sb.doc_id = b.doc_id AND sb.split = 'test'
        ),
        sets AS MATERIALIZED (
          SELECT doc_id, {dedup.shingle_set_sql()} AS sh FROM documents
        )
        SELECT c.train_doc, c.test_doc,
               CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_common,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / CAST(len(a.sh) + len(b.sh)
                        - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 AS jaccard
        FROM cand c
        JOIN sets a ON a.doc_id = c.train_doc
        JOIN sets b ON b.doc_id = c.test_doc
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / CAST(len(a.sh) + len(b.sh)
                     - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              >= {_LEAK_MIN_JACCARD}
    """,
)
def split_leakage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set leakage audit: near-duplicate (train, test) document
    pairs across the content-hash split boundary — the check a
    training pipeline runs before shipping a dataset version, since
    exact-hash splits keep EXACT duplicates together... in the same
    split only when texts are identical; near-duplicates of a test
    doc can land in train and leak the benchmark. MinHash-LSH
    candidates restricted to cross-split collisions (never a
    train×test product), then exact-Jaccard verification ≥ 0.5. The
    whole path is a deterministic function of the corpus, so it is
    hash-gated like the dedup pipelines."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(prefix < "cd", "train")
        .when(prefix < "e6", "val")
        .otherwise("test")
    )
    labeled = docs.select("doc_id", split.alias("split"))
    bands = dedup._band_hashes(_sig_index(spark, sf_dir)).join(
        labeled, "doc_id")
    a = bands.filter(F.col("split") == "train").alias("a")
    b = bands.filter(F.col("split") == "test").hint("merge").alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
        .localCheckpoint()  # candidate-sized; feeds ids + verify
    )
    # Shingle ONLY candidate docs — the probe-don't-rebuild shape
    # shared with minhash_estimate_error.
    ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_docs = docs.select("doc_id", "text").join(ids, "doc_id",
                                                   "left_semi")
    verified = dedup.jaccard_verify_sets(
        cand, dedup.shingle_sets(cand_docs).localCheckpoint(eager=True)
    ).filter(F.col("jaccard") >= _LEAK_MIN_JACCARD)
    return verified.select(
        F.col("doc_a").alias("train_doc"),
        F.col("doc_b").alias("test_doc"),
        "n_common",
        "jaccard",
    )


@query(
    "int8_ann_topk",
    survey="ext-sim ext-quant W3 J-broadcast",
    tags=("llmops",),
    oracle=similarity.int8_ann_topk_sql(query_filter="vec_id < 5", k=10),
)
def int8_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INT8 scalar-quantized ANN: normalize → quantize to [-127,127]
    longs → all-integer unrolled dot → top-10, deterministic
    tiebreak. The one ANN variant whose SCORES are exact integers, so
    the full pipeline (quantizer included) hash-gates — float-scored
    ANN variants gate rows-only or by recall. Recall vs exact cosine
    gated in tests/test_similarity_recall.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.int8_ann_topk(emb, queries, k=10)


@query(
    "ivf_ann_topk_int8",
    survey="ext-sim ext-quant A7 W3 J-broadcast",
    tags=("llmops",),
    oracle=similarity.ivf_int8_topk_sql(query_filter="vec_id < 5", k=10,
                                        nprobe=2),
)
def ivf_ann_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over an int8-quantized index (VERDICT r5 ask #8): the
    label-centroid coarse quantizer, the probe ranking AND the
    in-cluster scoring all run on exact integer dots, so the entire
    approximate pipeline — quantizer fit included — hash-gates. The
    compressed-index production shape: int8 codes shrink the probed
    scan 4×, and the probe prunes it to nprobe/n_labels of the
    corpus before I/O."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.ivf_int8_topk(emb, queries, k=10, nprobe=2)


@query(
    "media_audio_features",
    survey="ext-media ext-codec ext-dsp mapInPandas",
    tags=("llmops", "multimodal"),
    oracle="""
        WITH aud AS (
          SELECT doc_id, 64 + doc_id % 97 AS n
          FROM documents WHERE doc_id % 3 = 1
        ),
        samples AS (
          SELECT a.doc_id, g.i,
                 ((a.doc_id * 131 + g.i * 17) % 65536) - 32768 AS s
          FROM aud a, generate_series(0, 160) g(i)
          WHERE g.i < a.n
        ),
        lagged AS (
          SELECT doc_id, s,
                 lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
          FROM samples
        )
        SELECT doc_id,
               CAST(8000 AS BIGINT) AS sample_rate,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(MAX(ABS(s)) AS BIGINT) AS peak,
               CAST(SUM(CAST(s AS BIGINT) * s) AS BIGINT) AS energy,
               CAST(SUM(CASE WHEN prev IS NOT NULL
                             AND ((prev < 0) <> (s < 0))
                        THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
        FROM lagged GROUP BY doc_id
    """,
)
def media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction THROUGH the real WAV decode (peak /
    energy / zero crossings from the decoded PCM16 samples, exact
    integers) — the multimodal pipeline step after ingestion. The
    oracle replays the features arithmetically from the closed-form
    sample content, so any decode defect shifts the hash
    (operators/multimodal.py audio_feature_stats)."""
    return multimodal.audio_feature_stats(
        load_table(spark, sf_dir, "documents"))


@query(
    "dedup_yield_report",
    survey="ext-dedup ext-composition A2 A5 A8",
    tags=("llmops",),
    oracle=f"""
        WITH fp AS (
            SELECT doc_id, source, n_chars,
                   {_FP_SQL.format(col="text")} AS fp
            FROM documents
        ),
        keepers AS (
            SELECT fp, MIN(doc_id) AS keeper FROM fp GROUP BY fp
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN doc_id = keeper THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dropped,
               CAST(SUM(CASE WHEN doc_id <> keeper THEN n_chars
                        ELSE 0 END) AS BIGINT) AS chars_dropped
        FROM fp JOIN keepers USING (fp)
        GROUP BY source
    """,
)
def dedup_yield_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup YIELD report every curation run publishes: per
    source, how many documents survive exact-fingerprint dedup
    (keep-first-by-doc_id across the WHOLE corpus, so cross-source
    duplicates charge the source that re-crawled them) and how many
    bytes the drop saves. One shuffle on the md5 digest + a tiny
    per-source aggregate — the same linear shape as
    ``dedup_fingerprint``, reduced to the report a data-composition
    dashboard reads (operators/dedup.py fingerprint convention;
    reference analogue: the quality-report role of the
    silver-layer checks, tests/quality_check_silver.sql)."""
    from ..functions.text import fingerprint

    spark_df = load_table(spark, sf_dir, "documents")
    # Spread the regex-normalize+md5 map (the winnow lesson), compute
    # the fingerprint ONCE, and resolve keepers with a min-over-fp
    # window — one shuffle, no self-join recomputing the digest.
    n_part = spark_df.sparkSession.sparkContext.defaultParallelism
    d = spark_df.repartition(n_part).select(
        "doc_id", "source", "n_chars",
        fingerprint(F.col("text")).alias("fp"),
    )
    keeper = F.min("doc_id").over(Window.partitionBy("fp"))
    flagged = d.select(
        "source", "n_chars", (F.col("doc_id") == keeper).alias("_kept"))
    kept = F.col("_kept")
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum((~kept).cast("long")).alias("n_dropped"),
            F.sum(F.when(~kept, F.col("n_chars")).otherwise(F.lit(0)))
            .alias("chars_dropped"),
        )
    )


@query(
    "embedding_drift_by_label",
    survey="ext-drift ext-sim A2 J-full",
    tags=("llmops",),
    oracle=similarity.embedding_drift_sql("vec_id % 5 = 0"),
)
def embedding_drift_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor: per label, cosine between the base
    slice's centroid and the new-ingest slice's (vec_id % 5 = 0, the
    standing delta convention) plus both counts — the vector-space
    sibling of corpus_drift_stat, run before an ingest touches ANN
    indexes or semantic dedup. Scaled-int64 centroid sums + the
    unrolled fixed cosine keep every double bit-identical cross-
    engine; missing slices surface as NULL drift via the full outer
    join (operators/similarity.py embedding_drift_by_label)."""
    return similarity.embedding_drift_by_label(
        load_table(spark, sf_dir, "embeddings"),
        delta_pred=F.col("vec_id") % 5 == 0,
    )


@query(
    "split_leakage_repair",
    survey="ext-dedup ext-decon ext-split J-anti A2",
    tags=("llmops",),
    oracle=f"""
        WITH bands AS ({dedup._minhash_bands_sql()}),
        splits AS (
          SELECT doc_id, lang,
                 CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                        THEN 'train'
                      WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                        THEN 'val'
                      ELSE 'test' END AS split
          FROM documents
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS train_doc, b.doc_id AS eval_doc
          FROM bands a
          JOIN splits sa ON sa.doc_id = a.doc_id AND sa.split = 'train'
          JOIN bands b
            ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
          JOIN splits sb ON sb.doc_id = b.doc_id AND sb.split <> 'train'
        ),
        sets AS MATERIALIZED (
          SELECT doc_id, {dedup.shingle_set_sql()} AS sh FROM documents
        ),
        leaked AS (
          SELECT DISTINCT c.train_doc
          FROM cand c
          JOIN sets a ON a.doc_id = c.train_doc
          JOIN sets b ON b.doc_id = c.eval_doc
          WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / CAST(len(a.sh) + len(b.sh)
                       - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                >= {_LEAK_MIN_JACCARD}
        )
        SELECT s.split, s.lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN l.train_doc IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
               CAST(COUNT(*) - SUM(CASE WHEN l.train_doc IS NOT NULL
                                   THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_after
        FROM splits s
        LEFT JOIN leaked l ON l.train_doc = s.doc_id
        GROUP BY s.split, s.lang
    """,
)
def split_leakage_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The repair step after the leakage audit: any TRAIN document
    that near-duplicates (jaccard >= 0.5) a val OR test document is
    dropped from the shipped dataset — eval sets are sacred, so the
    train side pays — and the repaired per-(split, lang) manifest is
    emitted (before/dropped/after counts; val/test rows pass through
    with zero drops by construction).

    Unlike the pair-listing audit (``split_leakage_pairs``, whose
    output is inherently ∝ leak pairs), the repair needs only the
    DROP SET — so it collapses exact-duplicate contents FIRST (the
    sf10 lesson: 100-copy duplication made doc-level train×eval
    buckets pay duplication² pairs, 24.6 s → 439.6 s for 10× data).
    Contents carrying both a train and an eval member leak trivially
    (jaccard 1); cross-content candidates band-join one REPRESENTATIVE
    per content (shingle sets depend only on text, so rep-level
    jaccard IS member-level jaccard), and the decision propagates to
    all train members by fingerprint. Every stage is ∝ distinct
    contents, not members."""
    from ..functions.text import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(prefix < "cd", "train")
        .when(prefix < "e6", "val")
        .otherwise("test")
    )
    n_part = spark.sparkContext.defaultParallelism
    members = docs.repartition(n_part).select(
        "doc_id", "lang", split.alias("split"),
        fingerprint(F.col("text")).alias("fp"),
    ).localCheckpoint(eager=True)
    flags = members.groupBy("fp").agg(
        F.min("doc_id").alias("rep_id"),
        F.max((F.col("split") == "train").cast("int")).alias("has_train"),
        F.max((F.col("split") != "train").cast("int")).alias("has_eval"),
    )
    reps = (
        flags.join(
            docs.select(F.col("doc_id").alias("rep_id"), "text"), "rep_id")
        .select(F.col("rep_id").alias("doc_id"), "fp",
                "has_train", "has_eval", "text")
        .localCheckpoint(eager=True)
    )
    same_content = (
        reps.filter((F.col("has_train") == 1) & (F.col("has_eval") == 1))
        .select("fp")
    )
    rep_sigs = _sig_index(spark, sf_dir).join(
        reps.select("doc_id").hint("merge"), "doc_id", "left_semi")
    bands = dedup._band_hashes(rep_sigs).join(
        reps.select("doc_id", "fp", "has_train", "has_eval").hint("merge"),
        "doc_id")
    a = bands.filter(F.col("has_train") == 1).alias("a")
    b = bands.filter(F.col("has_eval") == 1).hint("merge").alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.fp") != F.col("b.fp")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
        .localCheckpoint()  # candidate-sized; feeds ids + verify
    )
    ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_reps = reps.select("doc_id", "text").join(ids, "doc_id",
                                                   "left_semi")
    cross_leaked = (
        dedup.jaccard_verify_sets(
            cand,
            dedup.shingle_sets(cand_reps).localCheckpoint(eager=True),
        )
        .filter(F.col("jaccard") >= _LEAK_MIN_JACCARD)
        .join(reps.select(F.col("doc_id").alias("doc_a"), "fp"), "doc_a")
        .select("fp")
    )
    leaked_fp = same_content.union(cross_leaked).distinct().select(
        F.col("fp").alias("leak_fp"))
    flagged = members.join(
        leaked_fp, members["fp"] == leaked_fp["leak_fp"], "left")
    dropped = F.col("leak_fp").isNotNull() & (F.col("split") == "train")
    return flagged.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(dropped.cast("long")).alias("n_dropped"),
        (F.count(F.lit(1)) - F.sum(dropped.cast("long"))).alias("n_after"),
    )


@query(
    "split_leakage_repair_chain",
    survey="ext-dedup ext-decon ext-split A2 W3",
    tags=("llmops",),
    oracle=f"""
        WITH clusters AS MATERIALIZED (
            {dedup.dedup_keep_best_chain_sql(min_jaccard=_LEAK_MIN_JACCARD)}
        ),
        labeled AS (
          SELECT c.doc_id, c.cluster_id, d.lang,
                 CASE WHEN substr(md5(CAST(c.doc_id AS VARCHAR)), 1, 2)
                        < 'cd' THEN 'train'
                      WHEN substr(md5(CAST(c.doc_id AS VARCHAR)), 1, 2)
                        < 'e6' THEN 'val'
                      ELSE 'test' END AS split
          FROM clusters c JOIN documents d USING (doc_id)
        ),
        cflags AS (
          SELECT cluster_id,
                 MAX(CASE WHEN split <> 'train' THEN 1 ELSE 0 END)
                     AS has_eval
          FROM labeled GROUP BY cluster_id
        )
        SELECT l.split, l.lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN l.split = 'train' AND f.has_eval = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
               CAST(COUNT(*) - SUM(CASE WHEN l.split = 'train'
                                        AND f.has_eval = 1
                                   THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_after
        FROM labeled l JOIN cflags f USING (cluster_id)
        GROUP BY l.split, l.lang
    """,
)
def split_leakage_repair_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE form of the leakage repair: drop a train doc when its
    near-dup CLUSTER (chain candidates → bottom-k verify → connected
    components at jaccard ≥ 0.5, the linear-at-any-duplication
    ``dedup_keep_best_chain`` machinery) contains any val/test member
    — cluster-transitive, deliberately stricter than the exact
    direct-pair rule, and the standard production choice. The exact
    form (``split_leakage_repair``) pays Σ bucket_train×bucket_eval
    verification pairs, which the 100-copy sf10 replica measured at
    duplication² (25.2 s sf1 → 372.0 s sf10 even after exact-content
    collapse, because the replicas are NEAR-dups with distinct
    fingerprints); this form's stages are all ∝ corpus. Chain
    candidates are valid here because jaccard-0.5 buckets are tight
    (the recorded bucket-tightness rule). Fully hash-gated — the
    oracle replays the chain pipeline and the recursive-CTE closure."""
    docs = load_table(spark, sf_dir, "documents")
    clusters = dedup.dedup_keep_best_chain(
        docs, min_jaccard=_LEAK_MIN_JACCARD,
        sigs=_sig_index(spark, sf_dir),
    ).select("doc_id", "cluster_id")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(prefix < "cd", "train")
        .when(prefix < "e6", "val")
        .otherwise("test")
    )
    # labeled feeds TWO consumers (the per-cluster eval flag and the
    # final join) — checkpoint it or the whole chain-dedup pipeline
    # upstream runs once per consumer (the branch-point lesson;
    # measured ~1.6x at sf10).
    labeled = clusters.join(
        docs.select("doc_id", "lang"), "doc_id"
    ).select("doc_id", "cluster_id", "lang",
             split.alias("split")).localCheckpoint(eager=True)
    cflags = labeled.groupBy("cluster_id").agg(
        F.max((F.col("split") != "train").cast("int")).alias("has_eval"))
    dropped = (F.col("split") == "train") & (F.col("has_eval") == 1)
    return (
        labeled.join(cflags, "cluster_id")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(dropped.cast("long")).alias("n_dropped"),
            (F.count(F.lit(1)) - F.sum(dropped.cast("long")))
            .alias("n_after"),
        )
    )


@query(
    "multiprobe_lsh_ann_topk",
    survey="ext-sim J-broadcast W3",
    tags=("llmops",),
    # hash-gated like lsh_ann_topk: seqfold buckets + XOR probe set +
    # seqfold cosine are bit-identical cross-engine; each (query,
    # corpus) pair collides in at most one probe, so the twin needs
    # no DISTINCT at all.
    oracle=similarity.multiprobe_lsh_topk_sql(k=10,
                                              query_filter="vec_id < 5"),
)
def multiprobe_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN — ONE hash table probed at hamming
    distance ≤ 1 (operators/similarity.multiprobe_lsh_topk, the Lv
    et al. VLDB'07 trade): the stored index is a single
    (bucket → vectors) clustering at 1/n_bands the footprint of the
    multi-table form, and recall is bought with band_bits+1 probes
    per query instead of extra tables. Complements `lsh_ann_topk`
    (multi-table OR-amplification) and the IVF/PQ families as the
    memory-constrained point on the ANN design surface."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.multiprobe_lsh_topk(emb, queries, k=10)




# ------------------------------------------- perceptual-hash near-dup

# dHash (difference/gradient hash): 64 luminance samples per image,
# bit i = sample i brighter than sample i+1 (wrapping) — the classic
# integer-exact perceptual signature family (pHash's DCT needs cos(),
# which is not cross-engine stable; aHash's global-mean threshold
# couples every bit to every pixel, so one local edit can flip
# distant borderline bits — measured hamming 11 vs 0 here for a
# suffix-edited pair). Samples come from the deterministic fake
# decode convention (operators/multimodal.attach_fake_media: the
# container ships no image codecs, media derives from text bytes):
# sample i = word-shape stat (7·len + 13·first char + 31·last char,
# mod 256) of token 1 + (i mod n_tokens) — an absolute-position
# "thumbnail strip" of the content, so local content edits perturb
# only local samples, the invariance real dHash has to local pixel
# noise. Swapping in a Pillow thumbnail changes ONE projection.
#
# 4 bands of 16 bits: two signatures within hamming ≤ 3 agree on ≥ 1
# whole 16-bit band (pigeonhole), so the band join is LOSSLESS for
# the threshold — the definitional all-pairs oracle is an equivalence
# check, not an approximation bound. Band WIDTH is the scale decision
# (the simhash 16→32-bit lesson, BASELINE.md): an 8-bit band has 256
# buckets TOTAL, so bucket depth grows ∝ corpus and the 8-band join
# degenerates to ~n²/256 at sf10 (~10⁸ pairs at 167k images); 16-bit
# bands give 65,536 buckets per band and the measured corpus pairs
# sit at hamming 0 anyway — threshold 3 trades no observed recall.
_DHASH_HAM_MAX = 3

# (7·len + 13·ascii(first) + 31·ascii(last)) % 256 of token t — the
# shared Spark/DuckDB word-shape "luminance"; greatest(len,1) keeps
# the empty-token substr start at 1 (start-0 semantics differ).
_DHASH_PIX = (
    "(7 * {ln}(t) + 13 * ascii(substr(t, 1, 1))"
    " + 31 * ascii(substr(t, CAST(greatest({ln}(t), 1) AS INTEGER), 1)))"
    " % 256"
)


def _dhash_pairs_sql() -> str:
    from ..functions.text import NORMALIZE_SQL

    ham = " + ".join(
        f"bit_count(xor(a.b{k}, b.b{k}))" for k in range(8))
    byte_cols = ", ".join(
        f"CAST(SUM(CASE WHEN i // 8 = {k} THEN bit * (1 << (i % 8)) "
        f"ELSE 0 END) AS BIGINT) AS b{k}"
        for k in range(8)
    )
    pix = _DHASH_PIX.format(ln="len")
    norm = NORMALIZE_SQL.format(col="text")
    return f"""
        WITH img AS MATERIALIZED (
          SELECT doc_id, string_split({norm}, ' ') AS toks
          FROM documents WHERE doc_id % 3 = 0
        ),
        px AS MATERIALIZED (
          SELECT doc_id, g.i AS i, {pix} AS p
          FROM (SELECT doc_id, toks, len(toks) AS n FROM img),
               UNNEST(generate_series(0, 63)) AS g(i),
               LATERAL (SELECT toks[CAST(1 + (g.i % n) AS INT)] AS t) lt
        ),
        bits AS (
          SELECT a.doc_id, a.i,
                 CASE WHEN a.p > b.p THEN 1 ELSE 0 END AS bit
          FROM px a JOIN px b
            ON b.doc_id = a.doc_id AND b.i = (a.i + 1) % 64
        ),
        sig AS MATERIALIZED (
          SELECT doc_id, {byte_cols} FROM bits GROUP BY doc_id
        )
        SELECT a.doc_id AS doc1, b.doc_id AS doc2,
               CAST({ham} AS BIGINT) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE {ham} <= {_DHASH_HAM_MAX}
        ORDER BY doc1, doc2
    """


@query(
    "media_dhash_near_dup",
    survey="ext-media ext-dedup J-self W9",
    tags=("llmops", "multimodal"),
    oracle=_dhash_pairs_sql(),
)
def media_dhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs by DIFFERENCE-HASH (dHash)
    perceptual signature: 64 deterministic luminance samples per
    image document, bit i = sample brighter than its neighbor
    (wrapping), pairs within hamming ≤ {h} — the multimodal twin of
    ``simhash_near_dup_pairs`` (text bits from token votes there,
    image bits from thumbnail gradients here). Sample provenance and
    the dHash-vs-aHash/pHash trade-off are documented on the module
    block above :func:`_dhash_pairs_sql`.

    Scale shape: signature build is one narrow pass (explode ×64, a
    64-row-per-doc lead window for the gradient, one grouped
    byte-pack — all JVM integer expressions); pair generation is the
    4-band LSH join (band value = a 16-bit signature half-word —
    width rationale on the module block), bounded by Σ bucket² like
    every banded family here, and LOSSLESS at threshold {h} by
    pigeonhole over 4 bands — which is exactly what
    lets the definitional all-pairs oracle gate it as an equivalence,
    same discipline as ``pareto_frontier_parts``. Hamming verify
    reads the two 8-byte signatures only (bit_count of xor) — no
    sample data crosses the pair join."""
    from ..functions.text import tokens

    img = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .withColumn("n", F.size("toks"))
    )
    px = img.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("i"),
        F.expr("element_at(toks, CAST(1 + (i % n) AS INT))").alias("t"),
    ).select(
        "doc_id", "i",
        F.expr(_DHASH_PIX.format(ln="length")).alias("p"),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("i")
    wall = wdoc.rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing)
    bits = px.select(
        "doc_id", "i",
        F.when(
            F.col("p")
            > F.coalesce(F.lead("p").over(wdoc),
                         F.first("p").over(wall)),
            1,
        ).otherwise(0).alias("bit"),
    )
    weight = ("CASE i % 8 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 "
              "WHEN 3 THEN 8 WHEN 4 THEN 16 WHEN 5 THEN 32 "
              "WHEN 6 THEN 64 ELSE 128 END")
    sig = bits.groupBy("doc_id").agg(
        *[
            F.sum(F.expr(f"CASE WHEN i div 8 = {k} THEN bit * {weight} "
                         f"ELSE 0 END")).cast("long").alias(f"b{k}")
            for k in range(8)
        ]
    ).localCheckpoint(eager=True)  # branch point: bands + both verify sides
    bands = sig.select(
        "doc_id",
        F.posexplode(F.array(*[
            (F.col(f"b{2 * k}") + F.col(f"b{2 * k + 1}") * 256)
            for k in range(4)
        ])).alias("band", "v"),
    )
    cand = (
        bands.alias("a")
        .join(bands.alias("b"),
              [F.col("a.band") == F.col("b.band"),
               F.col("a.v") == F.col("b.v"),
               F.col("a.doc_id") < F.col("b.doc_id")])
        .select(F.col("a.doc_id").alias("doc1"),
                F.col("b.doc_id").alias("doc2"))
        .distinct()
    )
    s1 = sig.select(F.col("doc_id").alias("doc1"),
                    *[F.col(f"b{k}").alias(f"x{k}") for k in range(8)])
    s2 = sig.select(F.col("doc_id").alias("doc2"),
                    *[F.col(f"b{k}").alias(f"y{k}") for k in range(8)])
    ham = sum(
        (F.bit_count(F.expr(f"x{k} ^ y{k}")) for k in range(8)),
        F.lit(0),
    )
    return (
        cand.join(s1, "doc1").join(s2, "doc2")
        .withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= _DHASH_HAM_MAX)
        .select("doc1", "doc2", "hamming")
        .orderBy("doc1", "doc2")
    )


media_dhash_near_dup.__doc__ = media_dhash_near_dup.__doc__.format(
    h=_DHASH_HAM_MAX)


# ------------------------------------- JL random-projection recall

# Johnson–Lindenstrauss sign projection: 64 dims → 16 dims via a ±1
# matrix derived from md5 (s(j,i) = +1 iff the first hex char of
# md5('jl|j|i') falls in the low half) — deterministic, shared
# bit-for-bit with the oracle, no RNG state. Inputs quantize to
# floor(x·2¹⁰) first (exact), so projections, dots and norms are all
# exact integers; only the final cosine is a fixed-shape double.
_JL_OUT_DIMS = 16
_JL_IN_DIMS = 64
_JL_TOPK = 10
_JL_N_QUERIES = 5
_JL_SIGN = (
    "CASE WHEN instr('01234567', substr(md5('jl|' || CAST({j} AS STRING)"
    " || '|' || CAST({i} AS STRING)), 1, 1)) > 0 THEN 1 ELSE -1 END"
)
_JL_SIGN_SQL = (
    "CASE WHEN instr('01234567', substr(md5('jl|' || CAST({j} AS VARCHAR)"
    " || '|' || CAST({i} AS VARCHAR)), 1, 1)) > 0 THEN 1 ELSE -1 END"
)


def _jl_recall_sql() -> str:
    return f"""
        WITH q AS MATERIALIZED (
          SELECT vec_id, g.i AS i,
                 CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1024)
                      AS BIGINT) AS qv
          FROM embeddings,
               UNNEST(generate_series(1, {_JL_IN_DIMS})) AS g(i)
        ),
        signs AS MATERIALIZED (
          SELECT j.j AS j, i.i AS i,
                 CAST({_JL_SIGN_SQL.format(j="j.j", i="i.i")} AS BIGINT)
                   AS s
          FROM UNNEST(generate_series(1, {_JL_OUT_DIMS})) AS j(j),
               UNNEST(generate_series(1, {_JL_IN_DIMS})) AS i(i)
        ),
        y AS MATERIALIZED (
          SELECT q.vec_id, s.j,
                 CAST(SUM(s.s * q.qv) AS BIGINT) AS y
          FROM q JOIN signs s ON s.i = q.i
          GROUP BY q.vec_id, s.j
        ),
        nf AS MATERIALIZED (
          SELECT vec_id, CAST(SUM(qv * qv) AS BIGINT) AS nrm
          FROM q GROUP BY vec_id
        ),
        nr AS MATERIALIZED (
          SELECT vec_id, CAST(SUM(y * y) AS HUGEINT) AS nrm
          FROM y GROUP BY vec_id
        ),
        full_rank AS (
          SELECT a.vec_id AS query_id, b.vec_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY CAST(dot.d AS DOUBLE)
                     / sqrt(CAST(na.nrm AS DOUBLE)
                            * CAST(nb.nrm AS DOUBLE)) DESC,
                     b.vec_id) AS rk
          FROM (SELECT vec_id FROM embeddings
                WHERE vec_id < {_JL_N_QUERIES}) a
          JOIN (SELECT vec_id FROM embeddings) b ON TRUE
          JOIN LATERAL (
            SELECT CAST(SUM(qa.qv * qb.qv) AS BIGINT) AS d
            FROM q qa JOIN q qb ON qb.i = qa.i
            WHERE qa.vec_id = a.vec_id AND qb.vec_id = b.vec_id
          ) dot ON TRUE
          JOIN nf na ON na.vec_id = a.vec_id
          JOIN nf nb ON nb.vec_id = b.vec_id
        ),
        red_rank AS (
          SELECT a.vec_id AS query_id, b.vec_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY CAST(dot.d AS DOUBLE)
                     / sqrt(CAST(na.nrm AS DOUBLE)
                            * CAST(nb.nrm AS DOUBLE)) DESC,
                     b.vec_id) AS rk
          FROM (SELECT vec_id FROM embeddings
                WHERE vec_id < {_JL_N_QUERIES}) a
          JOIN (SELECT vec_id FROM embeddings) b ON TRUE
          JOIN LATERAL (
            SELECT CAST(SUM(ya.y * yb.y) AS HUGEINT) AS d
            FROM y ya JOIN y yb ON yb.j = ya.j
            WHERE ya.vec_id = a.vec_id AND yb.vec_id = b.vec_id
          ) dot ON TRUE
          JOIN nr na ON na.vec_id = a.vec_id
          JOIN nr nb ON nb.vec_id = b.vec_id
        )
        SELECT f.query_id,
               CAST(COUNT(r.vec_id) AS BIGINT) AS n_hits,
               CAST(COUNT(r.vec_id) AS DOUBLE) / {_JL_TOPK}.0
                 AS recall_at_{_JL_TOPK}
        FROM full_rank f
        LEFT JOIN red_rank r
          ON r.query_id = f.query_id AND r.vec_id = f.vec_id
             AND r.rk <= {_JL_TOPK}
        WHERE f.rk <= {_JL_TOPK}
        GROUP BY f.query_id
        ORDER BY f.query_id
    """


@query(
    "jl_projection_ann_recall",
    survey="ext-ann A2 J-self O3",
    tags=("embeddings", "llmops", "ann"),
    oracle=_jl_recall_sql(),
)
def jl_projection_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{k} of brute-force cosine top-{k} run in a 16-dim
    Johnson–Lindenstrauss SIGN projection against the full 64-dim
    ranking — the measured answer to "how much ANN quality does a 4×
    dot-product cost cut buy?", complementing the bucketed ANN family
    (IVF/LSH/PQ prune CANDIDATES; JL shrinks the VECTORS — at 100 TB
    the projected corpus is what you keep in memory). Projection
    matrix provenance and exactness on the module block above.

    Scale shape: the 1,024-row ±1 matrix BROADCASTS onto the exploded
    quantized scan; projections/norms are two grouped integer sums;
    both rankings are {q}-query brute-force scans (query side
    broadcast, per-query ranked window — the ``ann_cosine_topk``
    shape) joined on (query, candidate) for the hit count. The gate
    compares EXACT integers end-to-end (both dot products, both norm
    products) so the recall itself — an 11-value discrete quantity —
    is bit-stable; the oracle re-derives everything from unnest +
    generate_series with LATERAL dots, an independent formulation.

    Measured recall at sf0.01: 0.2-0.3 (self hit included). The
    synthetic corpus is near-isotropic — neighbor margins are tiny,
    so a 4x compression genuinely costs most of the ranking, which
    is exactly what the audit should say; clustered real corpora
    (and the label-structured sf1 replicas) retain far more. The
    operator's value is that this number is MEASURED per corpus,
    not assumed from the JL bound."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id", F.posexplode("embedding").alias("i0", "x"),
    ).select(
        "vec_id", (F.col("i0") + 1).alias("i"),
        F.floor(F.col("x").cast("double") * 1024)
        .cast("long").alias("qv"),
    ).localCheckpoint(eager=True)  # branch: signs join + full norms + dots
    j_i = (
        spark.range(1, _JL_OUT_DIMS + 1).select(F.col("id").alias("j"))
        .crossJoin(spark.range(1, _JL_IN_DIMS + 1)
                   .select(F.col("id").alias("i")))
        .select("j", "i",
                F.expr(_JL_SIGN.format(j="j", i="i"))
                .cast("long").alias("s"))
    )
    y = (
        q.join(F.broadcast(j_i), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("s") * F.col("qv")).cast("long").alias("y"))
        .localCheckpoint(eager=True)  # branch: reduced norms + dots
    )
    nf = q.groupBy("vec_id").agg(
        F.sum(F.col("qv") * F.col("qv")).cast("long").alias("nrm"))
    nr = y.groupBy("vec_id").agg(
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("nrm"))

    def rank10(vecs, norms, dim_col, val_col):
        qs = vecs.filter(F.col("vec_id") < _JL_N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col(dim_col),
            F.col(val_col).alias("qval"))
        dots = (
            vecs.join(F.broadcast(qs), dim_col)
            .groupBy("query_id", "vec_id")
            .agg(F.sum(F.col("qval") * F.col(val_col))
                 .cast("decimal(38,0)").alias("d"))
        )
        na = norms.select(F.col("vec_id").alias("query_id"),
                          F.col("nrm").alias("nrm_q"))
        scored = (
            dots.join(F.broadcast(na), "query_id")
            .join(norms, "vec_id")
            .select(
                "query_id", "vec_id",
                (F.col("d").cast("double")
                 / F.sqrt(F.col("nrm_q").cast("double")
                          * F.col("nrm").cast("double"))).alias("c"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("c").desc(), F.col("vec_id"))
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _JL_TOPK)
            .select("query_id", "vec_id")
        )

    full10 = rank10(q, nf, "i", "qv")
    red10 = rank10(y, nr, "j", "y")
    hits = full10.join(
        red10.withColumn("hit", F.lit(1)), ["query_id", "vec_id"], "left")
    return (
        hits.groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long")
            .alias("n_hits"),
            (F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
             / F.lit(float(_JL_TOPK))).alias(f"recall_at_{_JL_TOPK}"),
        )
        .orderBy("query_id")
    )


jl_projection_ann_recall.__doc__ = jl_projection_ann_recall.__doc__.format(
    k=_JL_TOPK, q=_JL_N_QUERIES)
