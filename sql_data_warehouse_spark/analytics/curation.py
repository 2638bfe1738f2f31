"""Registry gates for the corpus-curation operators
(operators/curation.py): benchmark decontamination, token-budget
packing, Gopher-style repetition stats, winnowing near-dup pairs.

All four run over the ``documents`` table and are hash-gated against
DuckDB twins — including the two-pass distributed prefix sum, whose
result must equal the oracle's single ``SUM() OVER (ORDER BY ...)``
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import TOKENS_SQL, tokens
from ..operators import curation as dsir_sql
from ..operators.exact_substring import (
    exact_substring_spans, exact_substring_spans_sql,
    source_similarity_matrix_sql,
)
from ..operators.lm import (
    LM_REF_FILTER, ccnet_bucket_sample_sql, lm_quality_scores,
    lm_quality_scores_sql,
)
from ..operators.curation import (
    dsir_importance_topk, scrub_pii_multi, scrub_pii_multi_sql,
    rag_chunk_manifest, rag_chunk_manifest_sql, corpus_drift_stat_sql,
    source_quota_cap_sql,
    decontaminate, global_running_sum, repetition_stats,
    repetition_stats_sql, scrub_pii, token_ngrams_sql,
    winnow_near_dup_pairs, winnow_near_dup_pairs_sql,
)
from ..sources import load_table
from .registry import query

_DECON_N = 8
_BUDGET = 10_000


@query(
    "decontaminate_benchmark",
    survey="ext-decon ext-dedup A5",
    oracle=f"""
        WITH bench AS (
            SELECT DISTINCT gram FROM (
                SELECT unnest({token_ngrams_sql("substr(text, 1, 160)",
                                                _DECON_N)}) AS gram
                FROM documents WHERE doc_id % 97 = 0
            )
        )
        SELECT g.doc_id,
               CAST(COUNT(DISTINCT g.gram) AS BIGINT) AS n_hits
        FROM (
            SELECT doc_id,
                   unnest({token_ngrams_sql("text", _DECON_N)}) AS gram
            FROM documents
        ) g JOIN bench USING (gram)
        GROUP BY g.doc_id
    """,
    tags=("llmops",),
)
def decontaminate_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: the held-out eval set is a 160-char
    excerpt of every 97th document (the realistic contamination mode:
    eval text literally present in the crawl), and every corpus
    document sharing an 8-token gram with it is flagged with its
    distinct-overlap count — at minimum the excerpted sources flag
    themselves. Benchmark grams broadcast; the corpus never shuffles
    on gram."""
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0).select(
        F.substring("text", 1, 160).alias("text"))
    return decontaminate(d, bench, n=_DECON_N)


@query(
    "token_budget_pack",
    survey="ext-pack W6 O1",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
            FROM (
                SELECT doc_id, lang, {TOKENS_SQL.format(col="text")} AS toks
                FROM documents
            )
        ),
        ranked AS (
            SELECT doc_id, lang, n_tokens,
                   SUM(n_tokens) OVER (
                       ORDER BY n_distinct / CAST(n_tokens AS DOUBLE) DESC,
                                doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum_tokens
            FROM scored
        )
        SELECT doc_id, lang, n_tokens,
               CAST(cum_tokens AS BIGINT) AS cum_tokens
        FROM ranked WHERE cum_tokens <= {_BUDGET}
    """,
    tags=("llmops",),
)
def token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select the highest-quality documents (distinct-token ratio)
    until a 10k-token budget fills. The cumulative sum runs through
    the two-pass distributed prefix-sum (range partition + driver
    offsets), not a single-reducer global window — same result,
    100 TB-safe plan."""
    d = load_table(spark, sf_dir, "documents")
    # Token array staged as a column for the two size() consumers
    # (codegen's subexpression elimination already de-duplicates the
    # inlined form — A/B'd at sf10, no wall delta — but the staged
    # shape states the sharing instead of relying on it).
    scored = d.select(
        "doc_id", "lang", tokens(F.col("text")).alias("_toks")
    ).select(
        "doc_id", "lang",
        F.size("_toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("_toks")).cast("long").alias("n_distinct"),
    ).withColumn(
        "quality",
        F.col("n_distinct") / F.col("n_tokens").cast("double"),
    )
    packed = global_running_sum(
        scored, [F.desc("quality"), F.asc("doc_id")],
        F.col("n_tokens"), out_name="cum_tokens",
    )
    return (
        packed.filter(F.col("cum_tokens") <= _BUDGET)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


@query(
    "gopher_repetition",
    survey="ext-text A4 P1",
    oracle=repetition_stats_sql(3),
    tags=("llmops",),
)
def gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicate-trigram fraction (Gopher repetition
    rule): integer gram counts per doc, one deterministic division."""
    return repetition_stats(load_table(spark, sf_dir, "documents"), n=3)


@query(
    "winnow_near_dup_pairs",
    survey="ext-dedup ext-fingerprint J-self",
    oracle=winnow_near_dup_pairs_sql(),
    tags=("llmops",),
)
def winnow_near_dup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint near-dup pairs: window-min k-gram
    digests per doc, doc-frequency-capped fingerprint self-join
    (Σ df² bounded), pairs sharing ≥3 fingerprints."""
    return winnow_near_dup_pairs(load_table(spark, sf_dir, "documents"))


@query(
    "pii_scrub_stats",
    survey="ext-pii ext-text P1",
    oracle=r"""
        WITH fixture AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 10 = 0
                        THEN text || ' contact: user' ||
                             CAST(doc_id AS VARCHAR) || '@example.com'
                        ELSE text END AS text
            FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT)
                   AS n_redacted,
               CAST(length(text) - length(regexp_replace(text,
                    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>',
                    'g')) AS BIGINT) AS chars_removed,
               regexp_replace(text,
                    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>',
                    'g') AS clean_text
        FROM fixture
    """,
    tags=("llmops",),
)
def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus: every 10th document gets a
    deterministic synthetic email appended (the fixture — the raw
    corpus is email-free), then the scrubber redacts and reports
    match counts, removed bytes, and the clean text. Gate covers the
    regex semantics AND the rewritten text bit-for-bit."""
    d = load_table(spark, sf_dir, "documents")
    fixture = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.col("text"), F.lit(" contact: user"),
                F.col("doc_id").cast("string"), F.lit("@example.com")),
        ).otherwise(F.col("text")).alias("text"),
    )
    return scrub_pii(fixture)


@query(
    "udtf_ngram_explode",
    survey="ext-udtf ext-text P1",
    oracle=f"""
        SELECT doc_id,
               unnest({token_ngrams_sql("text", 3)}) AS gram
        FROM documents WHERE doc_id % 25 = 0
    """,
    tags=("llmops",),
)
def udtf_ngram_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (PySpark 4 table-function API) in a LATERAL join:
    a locally-defined @udtf class tokenizes and emits trigrams per
    document, invoked from SQL as ``documents d, LATERAL ngrams3(
    d.text) g``. The class is defined inside this function so
    cloudpickle ships it by value (workers can't import this package
    under the driver harness). Semantics — normalize, split, slide —
    mirror the pure-Column ``ngrams_of`` twin exactly, so the oracle
    is the same unnest; the UDTF's value is the API surface: per-row
    table expansion with arbitrary Python, the escape hatch when the
    expansion logic outgrows Column expressions."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="gram: string")
    class NGrams3:
        def eval(self, text: str):
            import re

            norm = re.sub(r" +", " ",
                          re.sub(r"[^a-z0-9 ]", " ",
                                 (text or "").lower())).strip()
            toks = norm.split(" ")
            n = 3
            hi = max(len(toks) - n + 1, 1)
            for i in range(hi):
                yield (" ".join(toks[i:i + n]),)

    spark.udtf.register("wh_ngrams3", NGrams3)
    d = load_table(spark, sf_dir, "documents")
    d.filter(F.col("doc_id") % 25 == 0).createOrReplaceTempView(
        "_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, g.gram "
        "FROM _udtf_docs d, LATERAL wh_ngrams3(d.text) g"
    )


@query(
    "grouped_reservoir_sample",
    survey="ext-sample W3 A2",
    oracle="""
        WITH ranked AS (
            SELECT doc_id, lang, source,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS INTEGER) AS pick
            FROM documents
        )
        SELECT source, doc_id, lang, pick
        FROM ranked WHERE pick <= 5
    """,
    tags=("llmops",),
)
def grouped_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group 'reservoir': 5 documents per source,
    chosen by content-addressed rank (md5 of the id — a fixed random
    permutation, reproducible in any engine and stable under
    re-partitioning, unlike rand()-based reservoirs). One window
    shuffle on the group key; at 100 TB each group samples
    independently on its own executors — this is how you draw
    audit/eval samples from every crawl source without a global
    pass."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
    return (
        d.withColumn("pick", F.row_number().over(w).cast("int"))
        .filter(F.col("pick") <= 5)
        .select("source", "doc_id", "lang", "pick")
    )


@query(
    "dsir_target_sample",
    survey="ext-sample ext-dsir ext-text A2 O2 W3",
    tags=("llmops",),
    oracle=dsir_sql.dsir_topk_sql(target_sql="lang = 'en'", k_top=100),
)
def dsir_target_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023): pick the 100 raw
    docs whose hashed-unigram profile best matches the TARGET domain
    (lang = 'en' as the target proxy) by Σ tf·p_target/p_raw over
    1024 md5 buckets — the rational-weight variant of the
    log-likelihood ratio (log-free so the whole selector replays
    bit-for-bit in DuckDB; the bm25 rational-idf precedent). Bucket
    stats collapse to a 1024-row broadcast relation; the corpus
    shuffles once on (doc, bucket); selection is sort+limit."""
    return dsir_importance_topk(
        load_table(spark, sf_dir, "documents"),
        target_pred=F.col("lang") == "en",
        k_top=100,
    )


@query(
    "exact_substring_spans",
    survey="ext-dedup ext-text W4 A2",
    tags=("llmops",),
    oracle=exact_substring_spans_sql(),
)
def exact_substring_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style span-level duplication audit (Lee et al.
    2022): per document, the union of word-5-gram spans that occur
    verbatim in ≥2 distinct documents — n_spans / dup_tokens /
    max_span_tokens, all integers. Positioned grams are linear in
    corpus tokens; the duplicated-gram detection is one
    wordcount-shaped shuffle; the island windows run over duplicated
    positions only (duplication-fraction × corpus)."""
    return exact_substring_spans(load_table(spark, sf_dir, "documents"))


@query(
    "lm_quality_scores",
    survey="ext-quality ext-text A2 J-left",
    tags=("llmops",),
    oracle=lm_quality_scores_sql(),
)
def lm_quality_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filter: add-½-smoothed bigram model fit
    on the lang='en' reference slice, every document scored by its
    mean smoothed bigram probability (position-ordered seqfold ⇒
    bit-identical doubles cross-engine; ln is deliberately avoided —
    not correctly-rounded across libms) plus OOV count and a
    keep/drop flag at 1.05× the uniform probability. The model is a
    RELATION (two keyed count tables, sort-merge joined), never a
    broadcast — the form that survives a 100 TB reference corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return lm_quality_scores(docs, docs.filter(F.expr(LM_REF_FILTER)))


_PII_FIXTURE_SQL = """
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 10 = 0
                THEN ' contact: user' || CAST(doc_id AS VARCHAR)
                     || '@example.com' ELSE '' END
           || CASE WHEN doc_id % 7 = 0
                THEN ' call 555-123-4567 now' ELSE '' END
           || CASE WHEN doc_id % 11 = 0
                THEN ' id 123-45-6789 ok' ELSE '' END
           || CASE WHEN doc_id % 13 = 0
                THEN ' host 192.168.1.100 up' ELSE '' END AS text
    FROM documents
"""


@query(
    "pii_multi_class_stats",
    survey="ext-pii ext-text P1",
    tags=("llmops",),
    oracle=scrub_pii_multi_sql(_PII_FIXTURE_SQL),
)
def pii_multi_class_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed PII audit over four classes (email / phone / SSN-shaped
    / IPv4): per-document match counts + redacted length, one
    no-shuffle projection (operators/curation.py scrub_pii_multi).
    The corpus carries no PII, so a deterministic fixture injects
    instances per class keyed on doc_id residues — same injection on
    both engines, so every count and the redacted length hash-gate."""
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    fixture = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(did % 10 == 0,
                   F.concat(F.lit(" contact: user"),
                            did.cast("string"),
                            F.lit("@example.com"))).otherwise(F.lit("")),
            F.when(did % 7 == 0,
                   F.lit(" call 555-123-4567 now")).otherwise(F.lit("")),
            F.when(did % 11 == 0,
                   F.lit(" id 123-45-6789 ok")).otherwise(F.lit("")),
            F.when(did % 13 == 0,
                   F.lit(" host 192.168.1.100 up")).otherwise(F.lit("")),
        ).alias("text"),
    )
    return scrub_pii_multi(fixture)


@query(
    "rag_chunk_manifest",
    survey="ext-chunk ext-text P1",
    tags=("llmops",),
    oracle=rag_chunk_manifest_sql(),
)
def rag_chunk_manifest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-side chunking: 64-token windows at stride 48 per
    document, each with its token span and content-address md5 — the
    manifest an embedding/RAG ingestion pipeline consumes. Pure
    map-stage explode, no shuffle, no UDF (operators/curation.py
    rag_chunk_manifest)."""
    return rag_chunk_manifest(load_table(spark, sf_dir, "documents"))


@query(
    "curriculum_shard_order",
    survey="ext-curriculum ext-shard ext-quality A2 W3",
    tags=("llmops",),
    oracle=f"""
        WITH scores AS ({{lm_sql}}),
        sharded AS (
          SELECT s.doc_id,
                 CAST(floor(s.mean_p * 1000000.0 + 0.5) AS BIGINT)
                     AS score_micros,
                 CAST(instr('0123456789abcdef',
                            substr(md5(CAST(s.doc_id AS VARCHAR)), 3, 1)) - 1
                      AS INTEGER)
                 + 16 * CAST(substr(md5(CAST(s.doc_id AS VARCHAR)), 4, 1)
                             < '8' AS INTEGER) AS shard
          FROM scores s
        ),
        per_shard AS (
          SELECT CAST(shard AS INTEGER) AS shard,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(score_micros) AS BIGINT) AS sum_score_micros
          FROM sharded GROUP BY shard
        )
        SELECT shard, n_docs, sum_score_micros,
               CAST(RANK() OVER (
                   ORDER BY sum_score_micros / CAST(n_docs AS DOUBLE) DESC,
                            shard) AS BIGINT) AS curriculum_rank
        FROM per_shard
    """.format(lm_sql=lm_quality_scores_sql()),
)
def curriculum_shard_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering for training shards — the composition a
    data pipeline actually runs: every document's bigram-LM quality
    score (``lm_quality_scores``) is integerized to micros BEFORE
    aggregation (floor(x·1e6 + 0.5) → BIGINT, so the per-shard sum is
    order-independent — the dsir trick), docs hash-assign to the same
    32 md5 shards as ``training_shard_manifest``, and shards are
    ranked easiest-first by mean quality (train-on-clean-first
    curricula). The final window runs over exactly 32 shard rows —
    bounded at any corpus size; everything upstream is the LM's keyed
    joins + one shard groupBy."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    scores = lm_quality_scores(docs, docs.filter(F.expr(LM_REF_FILTER)))
    sharded = scores.select(
        "doc_id",
        F.floor(F.col("mean_p") * 1000000.0 + 0.5).cast("long")
        .alias("score_micros"),
        (
            (F.instr(F.lit("0123456789abcdef"),
                     F.substring(F.md5(F.col("doc_id").cast("string")), 3, 1))
             - 1)
            + 16 * (F.substring(F.md5(F.col("doc_id").cast("string")), 4, 1)
                    < "8").cast("int")
        ).cast("int").alias("shard"),
    )
    per_shard = sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("score_micros").alias("sum_score_micros"),
    )
    w = Window.orderBy(
        F.desc(F.col("sum_score_micros") / F.col("n_docs").cast("double")),
        F.asc("shard"))
    return per_shard.select(
        "shard", "n_docs", "sum_score_micros",
        F.rank().over(w).cast("long").alias("curriculum_rank"),
    )


@query(
    "corpus_drift_stat",
    survey="ext-drift ext-quality A1 A4",
    tags=("llmops",),
    oracle=corpus_drift_stat_sql("doc_id % 5 = 0"),
)
def corpus_drift_stat_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot drift monitor: the new-ingest batch (doc_id % 5 = 0,
    the same delta convention as incremental_dedup_delta) checked
    against the base corpus's length-bucket distribution with the
    rational χ²-divergence (log-free ⇒ hash-gateable; the 10-bucket
    sum folds in bucket order on both engines). One scan, ≤10-row
    aggregate state (operators/curation.py corpus_drift_stat)."""
    from ..operators.curation import corpus_drift_stat

    return corpus_drift_stat(
        load_table(spark, sf_dir, "documents"),
        delta_pred=F.col("doc_id") % 5 == 0,
    )


@query(
    "source_similarity_matrix",
    survey="ext-dedup ext-composition J-self A2",
    tags=("llmops",),
    oracle=source_similarity_matrix_sql(),
)
def source_similarity_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-overlap matrix: exact Jaccard between every pair of
    crawl sources over their distinct char-8-shingle sets — the
    corpus-composition report read before domain mixing. The distinct
    (source, shingle) collapse bounds the inverted index's Σ df² at
    n_sources² per shingle, so the pair stage is tiny at any corpus
    size (operators/exact_substring.py source_similarity_matrix)."""
    from ..operators.exact_substring import source_similarity_matrix

    return source_similarity_matrix(load_table(spark, sf_dir, "documents"))


@query(
    "ccnet_bucket_sample",
    survey="ext-quality ext-sample W3 A2 A8",
    tags=("llmops",),
    oracle=ccnet_bucket_sample_sql()
)
def ccnet_bucket_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail sampling (Wenzek et al. 2020): bucket
    cutoffs are per-language LM-score tertiles estimated on a BOUNDED
    held-out slice (the only sorted window — CCNet's own production
    shape), then the corpus-sized pass is a map against the broadcast
    ≤|langs|-row cutoff relation: head kept fully, middle at ~50 % by
    md5-prefix coin, tail dropped. Registered this round; rotates
    into the driver window next round (the 50-slot window is full:
    35 pinned + 15 round-4 spotlights). Hash-gated — mean_p doubles
    are the seqfold bit-identical scores gated by lm_quality_scores
    (operators/lm.py ccnet_bucket_sample)."""
    from ..operators.lm import ccnet_bucket_sample

    docs = load_table(spark, sf_dir, "documents")
    return ccnet_bucket_sample(docs, docs.filter(F.expr(LM_REF_FILTER)))


@query(
    "source_quota_cap",
    survey="ext-sample ext-composition W3 O2",
    tags=("llmops",),
    oracle=source_quota_cap_sql()
)
def source_quota_cap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source frequency cap (RefinedWeb/C4 host capping): keep the
    top-15 docs per source by (n_chars DESC, doc_id) with the
    skew-safe two-phase top-K — per-(source, salt) local top-K first,
    then a re-rank over the ≤ cap×n_salt survivors — so the hottest
    host in a 100 TB crawl never lands on one reducer. The oracle is
    the naive single-window form the plan must reproduce exactly
    (operators/curation.py source_quota_cap)."""
    from ..operators.curation import source_quota_cap

    return source_quota_cap(load_table(spark, sf_dir, "documents"))


@query(
    "rag_chunk_dedup_rate",
    survey="ext-chunk ext-dedup A2 A5",
    tags=("llmops",),
    oracle=f"""
        WITH chunks AS MATERIALIZED ({rag_chunk_manifest_sql()}),
        df AS (
            SELECT chunk_hash,
                   COUNT(DISTINCT doc_id) AS n_docs_with
            FROM chunks GROUP BY chunk_hash
        )
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN f.n_docs_with >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_cross_doc_dup,
               CAST(SUM(CASE WHEN f.n_docs_with >= 2
                        THEN c.n_chunk_tokens ELSE 0 END) AS BIGINT)
                   AS dup_tokens
        FROM chunks c
        JOIN df f USING (chunk_hash)
        JOIN documents d USING (doc_id)
        GROUP BY d.source
    """,
)
def rag_chunk_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granularity dedup audit for the retrieval index: per
    source, how many of its 64-token chunks occur verbatim in ≥2
    distinct documents corpus-wide (and the token volume a
    chunk-level dedup would drop before embedding) — the check run
    before paying for embedding inference, where duplicated chunks
    cost real money and skew retrieval. Two wordcount-shaped shuffles
    (chunk_hash doc-frequency, then the doc_id join back to sources);
    everything else is the rag_chunk_manifest map stage."""
    chunks = rag_chunk_manifest(load_table(spark, sf_dir, "documents"))
    df_rel = chunks.groupBy("chunk_hash").agg(
        F.count_distinct("doc_id").alias("n_docs_with"))
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    dup = F.col("n_docs_with") >= 2
    return (
        chunks.join(df_rel, "chunk_hash")
        .join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(dup.cast("long")).alias("n_cross_doc_dup"),
            F.sum(F.when(dup, F.col("n_chunk_tokens")).otherwise(F.lit(0)))
            .alias("dup_tokens"),
        )
    )


@query(
    "corpus_summary_card",
    survey="ext-composition A1 A2 A5 A8",
    tags=("llmops",),
    oracle=f"""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(MIN(n_chars) AS BIGINT) AS min_chars,
               CAST(MAX(n_chars) AS BIGINT) AS max_chars,
               CAST(SUM(CAST(len({TOKENS_SQL.format(col="text")})
                             AS BIGINT)) AS BIGINT) AS total_tokens,
               CAST(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),
                                         1, 2) < 'cd'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_train
        FROM documents GROUP BY lang
    """,
)
def corpus_summary_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card table every published training corpus ships:
    per language — document/source counts, exact char and token
    totals, length extremes, and the train-split share under the
    content-addressed 80/10/10 rule. One scan, one partial-aggregated
    groupBy on a low-cardinality key; COUNT(DISTINCT source) is the
    only expanding term and is bounded by |lang|×|sources|. All
    integers ⇒ hash-gated. Reference analogue: the report role of
    tests/quality_check_gold.sql, lifted to corpus composition."""
    d = load_table(spark, sf_dir, "documents")
    train = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "cd"
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("source").alias("n_sources"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum(F.size(tokens(F.col("text"))).cast("long"))
        .alias("total_tokens"),
        F.sum(train.cast("long")).alias("n_train"),
    )


@query(
    "ngram_doc_freq_topk",
    survey="ext-text A2 W3 P9",
    oracle=f"""
        WITH grams AS (
          SELECT DISTINCT doc_id, lang,
                 unnest({token_ngrams_sql('text', 3)}) AS gram
          FROM documents
        ),
        dfreq AS (
          SELECT lang, gram, CAST(COUNT(*) AS BIGINT) AS doc_freq
          FROM grams GROUP BY lang, gram
        )
        SELECT lang, gram, doc_freq, rnk FROM (
          SELECT lang, gram, doc_freq,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY doc_freq DESC, gram) AS BIGINT) AS rnk
          FROM dfreq
        ) WHERE rnk <= 10
    """,
)
def ngram_doc_freq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary mining: top-10 token trigrams per language by
    DOCUMENT frequency (distinct docs containing the gram — the df
    statistic behind idf, stop-phrase lists, and boilerplate
    detection).

    Scale shape: explode grams → distinct (doc, lang, gram) → keyed
    count with map-side partial aggregation. The top-k is
    ``operators/skew.salted_grouped_topk``, NOT a single window over
    ``lang``: a per-language window funnels every gram of a language
    through one partition (the W2 global-window hazard — languages
    are few, grams are billions). Correct because the global top-10
    under the total order (doc_freq DESC, gram ASC) is contained in
    the union of its salt classes' top-10s under the same order
    (property-tested in tests/test_properties.py)."""
    from ..operators.curation import ngrams_of
    from ..operators.skew import salted_grouped_topk

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", tokens(F.col("text")).alias("w"))
    grams = (
        toks.select(
            "doc_id", "lang",
            F.explode(ngrams_of(F.col("w"), 3)).alias("gram"),
        )
        .distinct()
    )
    dfreq = grams.groupBy("lang", "gram").agg(
        F.count(F.lit(1)).cast("long").alias("doc_freq"))
    return salted_grouped_topk(
        dfreq, "lang", [F.col("doc_freq").desc(), F.col("gram")],
        k=10, salt_from="gram",
    ).select("lang", "gram", "doc_freq", "rnk")


# -------------------------------------------- stratified k-fold CV

_KFOLD_K = 5


@query(
    "kfold_stratified_assignment",
    survey="ext-training A3 W1 A5",
    tags=("llmops", "training"),
    oracle=f"""
        WITH ranked AS (
          SELECT vec_id, label,
                 ROW_NUMBER() OVER (
                   PARTITION BY label
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                 ) AS rn
          FROM embeddings
        )
        SELECT CAST(label AS BIGINT) AS label,
               CAST((rn - 1) % {_KFOLD_K} AS INT) AS fold,
               CAST(COUNT(*) AS BIGINT) AS n_vectors,
               CAST(MIN(vec_id) AS BIGINT) AS min_vec_id,
               CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id
        FROM ranked
        GROUP BY label, fold
        ORDER BY label, fold
    """,
)
def kfold_stratified_assignment(
    spark: SparkSession, sf_dir: str,
) -> DataFrame:
    """STRATIFIED {k}-fold cross-validation assignment: within each
    label, rows shuffle deterministically (md5 of the id — no RNG
    state, stable across runs and engines) and deal round-robin into
    {k} folds, so every fold's label distribution matches the
    corpus's by construction (per-label fold sizes differ by ≤ 1) —
    the eval-split primitive next to the single-split
    ``dataset_split_assignment``. Reported as the per-(label, fold)
    census with membership checksums (min + sum of ids), so the gate
    pins the ASSIGNMENT, not just the counts.

    Scale shape: one rank window per label partition (the md5 sort
    key is computed in the scan projection) and one grouped
    aggregate; both shuffle on the label key. Label skew bounds the
    partition sort, and a salting rewrite (``operators/skew``) is the
    documented escape hatch if one label dominates a real corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id")
    ranked = emb.select(
        "vec_id", "label", F.row_number().over(w).alias("rn"))
    return (
        ranked.groupBy(
            F.col("label").cast("long").alias("label"),
            ((F.col("rn") - 1) % _KFOLD_K).cast("int").alias("fold"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").alias("min_vec_id"),
            F.sum("vec_id").cast("long").alias("sum_vec_id"),
        )
        .orderBy("label", "fold")
    )


kfold_stratified_assignment.__doc__ = (
    kfold_stratified_assignment.__doc__.format(k=_KFOLD_K))
