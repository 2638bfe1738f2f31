"""Training-data-pipeline operators registered as gated queries over
the documents/embeddings testdata: dedup (exact / fingerprint /
MinHash-LSH / n-gram Jaccard / SimHash), text analysis (stats,
quality, language-ID), similarity search (exact cosine top-k, LSH
ANN). Thin adapters over ``operators/`` — the library API — binding
them to the testdata tables with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, similarity, text_analysis
from ..sources import load_table
from .registry import query

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


@query(
    "minhash_bands",
    survey="ext-dedup W-none",
    tags=("llmops",),
    oracle=dedup._minhash_bands_sql(),
)
def minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH banded signatures (the bucketing relation)."""
    return dedup.minhash_band_hashes(load_table(spark, sf_dir, "documents"))


@query(
    "minhash_candidate_pairs",
    survey="ext-dedup J-self",
    tags=("llmops",),
    oracle=dedup.MINHASH_PAIRS_SQL,
)
def minhash_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs from LSH bucket collisions."""
    return dedup.minhash_candidate_pairs(load_table(spark, sf_dir, "documents"))


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
    return dedup.simhash_signatures(load_table(spark, sf_dir, "documents"))


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
    oracle=None,  # bucketed ANN: approximate by design; rows-only gate
)
def lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN — the scale path (scores only
    bucket-mates). Approximate: gated rows-only; the exact twin
    (ann_cosine_topk) is the hash-gated baseline."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.lsh_ann_topk(emb, queries, k=10)


@query(
    "label_centroid_similarity",
    survey="ext-sim A7",
    tags=("llmops",),
    oracle=None,  # IVF-style coarse scoring; rows-only this round
)
def label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine of each vector to its label centroid (IVF coarse
    quantization building block)."""
    return similarity.label_centroid_similarity(
        load_table(spark, sf_dir, "embeddings")
    )
