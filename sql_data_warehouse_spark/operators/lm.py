"""N-gram language-model quality scoring (CCNet-style).

CCNet (Wenzek et al., 2020) ranks web documents by the perplexity of
a language model trained on a high-quality reference corpus and
keeps the best slice — the canonical model-based quality filter that
runs after dedup in LLM data pipelines. Re-expressed Spark-first:

- **Fit** — add-½-smoothed bigram model over a reference slice
  (here: the ``lang = 'en'`` documents; in production, the curated
  reference corpus). Conditional probability
  ``P(w2|w1) = (c(w1 w2) + ½) / (c(w1 ·) + ½·V)`` with ``V`` the
  reference vocabulary size. The model is two count relations
  (bigram, context) built by one groupBy each over the *reference*
  slice only — map-side partial aggregation, shuffle ∝ distinct
  grams.
- **Score** — every document's positioned bigrams LEFT JOIN the two
  count relations. The model is a RELATION whose size is bounded by
  the reference's distinct-gram count, so the join strategy is left
  to AQE's runtime sizes: broadcast while the count tables fit (the
  corpus-sized bigram relation then never shuffles), sort-merge when
  a 100 TB-reference count table does not (hot-context skew is a
  many-to-one join AQE splits). Unseen bigrams back off to c=0 —
  still a valid smoothed probability, and counted as ``n_oov``.
- **Determinism** — perplexity proper needs ``ln``, which is NOT
  correctly-rounded across libms (JVM vs DuckDB would differ in the
  last ulp and break the driver's value hash). The registered score
  is therefore the *mean smoothed probability*: each per-position
  ``p_i`` uses only IEEE-exact ops (+, *, /), and the per-document
  sum folds an array ordered by position — Spark ``F.aggregate``
  and DuckDB ``list_reduce`` run the same left fold in the same
  order, so the double is bit-identical cross-engine (the
  ``_cosine_seqfold`` trick from operators/similarity.py). Higher
  mean-p = more reference-like; a fixed multiple of the uniform
  probability 1/V gives the keep/drop rule.

Reference context: the reference warehouse has no model-based
filtering surface (pure sales-star T-SQL); this extends the quality
role of scripts/silver/proc_load_silver.sql's rule-based cleanup to
corpus curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import TOKENS_SQL, tokens

LM_REF_FILTER = "lang = 'en'"  # reference slice (CCNet: the target corpus)
LM_KEEP_MULT = 1.05            # keep iff mean_p >= LM_KEEP_MULT / V


def _positioned_bigrams(docs: DataFrame, id_col: str,
                        text_col: str) -> DataFrame:
    """(doc_id, pos, w1, w2): adjacent-token pairs with 1-based
    position. Token array materialized before the slice transform
    (HOF-inline pitfall)."""
    # Spread the tokenize+pair assembly first (single-row-group
    # inputs otherwise serialize the scan stage — the winnow lesson).
    # Conditional: a corpus-scale scan already has ≥ default-
    # parallelism partitions, and an unconditional repartition would
    # re-shuffle the whole corpus for nothing.
    n_part = docs.sparkSession.sparkContext.defaultParallelism
    # (Guard caveat, ADVICE r9: an input with enough-but-skewed
    # partitions skips the round-robin rebalance — acceptable here
    # because the guard targets the single-row-group LOCAL file case;
    # a skewed cluster-scale scan is AQE's job, not this spread's.)
    if docs.rdd.getNumPartitions() < n_part:
        docs = docs.repartition(n_part)
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("_t"))
    t = F.col("_t")
    # Guarded: sequence(1, 0) DESCENDS in Spark, so a <2-token doc
    # must short-circuit to an empty pair array (the DuckDB twin's
    # range(1, 1) is empty by construction).
    idx = F.sequence(F.lit(1), F.size(t) - F.lit(1))
    pairs = F.when(
        F.size(t) >= F.lit(2),
        F.transform(
            idx, lambda i: F.struct(F.element_at(t, i).alias("w1"),
                                    F.element_at(t, i + F.lit(1)).alias("w2"))),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (
        staged.select("doc_id", F.posexplode(pairs).alias("pos0", "p"))
        .select("doc_id", (F.col("pos0") + F.lit(1)).alias("pos"),
                F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def bigram_lm_counts(ref_docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> tuple[DataFrame, DataFrame, int]:
    """(bigram counts, context counts, vocab size) over the reference
    slice. Context count is the bigram-position count of ``w1`` (the
    standard conditional denominator), derived from the bigram
    relation so the two stay consistent by construction. ``V`` is a
    scalar — the one intentionally collected value (bounded driver
    state)."""
    bg = _positioned_bigrams(ref_docs, id_col, text_col)
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        ref_docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .agg(F.count_distinct("w"))
        .collect()[0][0]
    )
    return c12, c1, int(vocab)


def lm_quality_scores(docs: DataFrame, ref_docs: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      keep_mult: float = LM_KEEP_MULT) -> DataFrame:
    """Per-document (n_bigrams, n_oov, mean_p, keep) — see module doc."""
    c12, c1, vocab = bigram_lm_counts(ref_docs, id_col, text_col)
    bg = _positioned_bigrams(docs, id_col, text_col)
    half_v = 0.5 * vocab
    # p computed per ROW (one +, one /, both IEEE-exact), the fold
    # only ADDS in position order => bit-identical to the DuckDB twin.
    # No join-strategy hint: the model relations are bounded by the
    # reference's distinct-gram count, so AQE broadcasts them from
    # RUNTIME sizes when they fit (keeping the corpus-sized bigram
    # relation shuffle-free — two fewer corpus exchanges) and falls
    # back to sort-merge when a 100 TB-reference count table does
    # not. Forcing merge here shuffled the corpus bigrams twice at
    # every scale.
    scored = (
        bg.join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .select(
            "doc_id", "pos",
            F.coalesce("c12", F.lit(0)).alias("c12"),
            ((F.coalesce("c12", F.lit(0)).cast("double") + F.lit(0.5))
             / (F.coalesce("c1", F.lit(0)).cast("double") + F.lit(half_v)))
            .alias("p"),
        )
    )
    per_doc = (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.when(F.col("c12") == 0, 1).otherwise(0))
            .alias("n_oov"),
            F.array_sort(
                F.collect_list(F.struct("pos", "p"))).alias("_b"),
        )
        .select(
            "doc_id", "n_bigrams", F.col("n_oov").cast("long").alias("n_oov"),
            (
                F.aggregate("_b", F.lit(0.0),
                            lambda acc, x: acc + x["p"])
                / F.col("n_bigrams").cast("double")
            ).alias("mean_p"),
        )
    )
    thresh = keep_mult / vocab
    return (
        docs.select(F.col(id_col).alias("doc_id"), "lang")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id", "lang",
            F.coalesce("n_bigrams", F.lit(0)).cast("long")
            .alias("n_bigrams"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.coalesce("mean_p", F.lit(0.0)).alias("mean_p"),
            (F.coalesce("mean_p", F.lit(0.0)) >= F.lit(thresh))
            .alias("keep"),
        )
    )


def _bigrams_sql(src: str) -> str:
    t = TOKENS_SQL.format(col="text")
    return f"""
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               ts[i] AS w1, ts[i + 1] AS w2
        FROM (SELECT doc_id, {t} AS ts FROM {src})
        CROSS JOIN unnest(range(1, greatest(len(ts) - 1, 0) + 1)) u(i)
    """


def lm_quality_scores_sql(ref_filter: str = LM_REF_FILTER,
                          keep_mult: float = LM_KEEP_MULT) -> str:
    """DuckDB twin. The fold is ``list_reduce`` over the same
    position-ordered (c12, c1) list with the same 0.0 seed (prepend),
    so every double matches Spark bit-for-bit."""
    t = TOKENS_SQL.format(col="text")
    return f"""
        WITH ref AS (SELECT * FROM documents WHERE {ref_filter}),
        ref_bg AS ({_bigrams_sql("ref")}),
        c12 AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM ref_bg GROUP BY w1, w2
        ),
        c1 AS (
            SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1
            FROM c12 GROUP BY w1
        ),
        v AS (
            SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS vocab
            FROM (SELECT unnest({t}) AS w FROM ref)
        ),
        bg AS ({_bigrams_sql("documents")}),
        scored AS (
            SELECT bg.doc_id, bg.pos,
                   COALESCE(c12.c12, 0) AS c12,
                   (CAST(COALESCE(c12.c12, 0) AS DOUBLE) + 0.5)
                       / (CAST(COALESCE(c1.c1, 0) AS DOUBLE)
                          + 0.5 * (SELECT vocab FROM v)) AS p
            FROM bg
            LEFT JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2
            LEFT JOIN c1 ON bg.w1 = c1.w1
        ),
        per_doc AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(SUM(CASE WHEN c12 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_oov,
                   list_reduce(
                       list_prepend(0.0, list(p ORDER BY pos)),
                       (a, b) -> a + b) / CAST(COUNT(*) AS DOUBLE)
                       AS mean_p
            FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id, d.lang,
               COALESCE(p.n_bigrams, 0) AS n_bigrams,
               COALESCE(p.n_oov, 0) AS n_oov,
               COALESCE(p.mean_p, 0.0) AS mean_p,
               COALESCE(p.mean_p, 0.0)
                   >= {keep_mult} / CAST((SELECT vocab FROM v) AS DOUBLE)
                   AS keep
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """


# ------------------------------------------- CCNet head/middle/tail buckets

CCNET_HELD_OUT_MOD = 23    # held-out slice used to estimate cutoffs
CCNET_MIDDLE_HEX = "80"    # middle bucket kept at ~50% (128/256)


def ccnet_bucket_sample(docs: DataFrame, ref_docs: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        held_out_mod: int = CCNET_HELD_OUT_MOD) -> DataFrame:
    """CCNet's second half: bucket every document into head / middle /
    tail by LM quality and keep head fully, middle at ~50 %
    (content-addressed coin flip), tail not at all — the sampling rule
    Wenzek et al. (2020) apply after perplexity scoring.

    CCNet computes the bucket CUTOFFS on a held-out slice, then
    applies them to the full corpus as plain constants. That is
    exactly the shape that survives 100 TB: the rank-based tertile
    split (a per-language sorted window — single reducer per
    language) runs only on the bounded held-out slice
    (``doc_id % held_out_mod == 0`` here; a fixed-size sample in
    production), and the corpus-sized pass is a map stage comparing
    each score against a broadcast ≤|langs|-row cutoff relation.
    Contrast ``stratified_sample_by_lang``, whose corpus-wide
    per-group window is the naive form this replaces.

    Determinism: ``mean_p`` doubles are bit-identical cross-engine
    (the seqfold property gated by ``lm_quality_scores``), ties break
    on doc_id, and the middle-bucket coin is an md5-prefix threshold
    — so the DuckDB twin replays bucket membership exactly. A
    language absent from the held-out slice has no cutoffs and
    defaults to head (keep everything — fail open, mirrored in SQL).

    Returns one row per (lang, bucket): n_docs, n_kept, kept_chars.

    Reference context: extends the quality-gate role of
    scripts/silver/proc_load_silver.sql to corpus curation.
    """
    # scores feeds TWO consumers (the held-out cutoff branch and the
    # corpus bucketing pass); un-checkpointed, the whole LM fit+score
    # pipeline would run once per consumer (the eager-localCheckpoint
    # lesson from connected_components — measured ~2x here).
    scores = lm_quality_scores(docs, ref_docs, id_col,
                               text_col).localCheckpoint(eager=True)
    held = scores.filter(F.col("doc_id") % held_out_mod == 0)
    w_rank = Window.partitionBy("lang").orderBy(
        F.col("mean_p").desc(), F.col("doc_id"))
    ranked = (
        held.select("lang", "mean_p", "doc_id")
        .withColumn("rn", F.row_number().over(w_rank))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("lang")))
    )
    cond1 = F.expr("rn = (n + 2) div 3")
    cond2 = F.expr("rn = (2 * n + 2) div 3")
    cuts = ranked.groupBy("lang").agg(
        F.max(F.when(cond1, F.col("mean_p"))).alias("c1p"),
        F.max(F.when(cond1, F.col("doc_id"))).alias("c1i"),
        F.max(F.when(cond2, F.col("mean_p"))).alias("c2p"),
        F.max(F.when(cond2, F.col("doc_id"))).alias("c2i"),
    )
    p, i = F.col("mean_p"), F.col("doc_id")
    is_head = (
        F.col("c1p").isNull()
        | (p > F.col("c1p"))
        | ((p == F.col("c1p")) & (i <= F.col("c1i")))
    )
    is_mid = (p > F.col("c2p")) | ((p == F.col("c2p")) & (i <= F.col("c2i")))
    bucket = (
        F.when(is_head, F.lit("head"))
        .when(is_mid, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    coin = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    bucketed = (
        scores.join(docs.select(F.col(id_col).alias("doc_id"), "n_chars"),
                    "doc_id")
        .join(F.broadcast(cuts), "lang", "left")
        .select(
            "lang", "n_chars",
            bucket.alias("bucket"),
            (
                (bucket == "head")
                | ((bucket == "middle") & (coin < CCNET_MIDDLE_HEX))
            ).alias("keep"),
        )
    )
    return bucketed.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum(F.when(F.col("keep"), F.col("n_chars")).otherwise(F.lit(0)))
        .alias("kept_chars"),
    )


def ccnet_bucket_sample_sql(ref_filter: str = LM_REF_FILTER,
                            held_out_mod: int = CCNET_HELD_OUT_MOD) -> str:
    """DuckDB twin of :func:`ccnet_bucket_sample` — wraps the
    lm_quality_scores twin as a CTE, replays the held-out tertile
    cutoffs and the md5-coin keep rule."""
    return f"""
        WITH scores AS MATERIALIZED ({lm_quality_scores_sql(ref_filter)}),
        ranked AS (
            SELECT lang, mean_p, doc_id,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY mean_p DESC, doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY lang) AS n
            FROM scores WHERE doc_id % {held_out_mod} = 0
        ),
        cuts AS (
            SELECT lang,
                   MAX(CASE WHEN rn = (n + 2) // 3 THEN mean_p END) AS c1p,
                   MAX(CASE WHEN rn = (n + 2) // 3 THEN doc_id END) AS c1i,
                   MAX(CASE WHEN rn = (2 * n + 2) // 3 THEN mean_p END)
                       AS c2p,
                   MAX(CASE WHEN rn = (2 * n + 2) // 3 THEN doc_id END)
                       AS c2i
            FROM ranked GROUP BY lang
        ),
        bucketed AS (
            SELECT s.lang, d.n_chars,
                   CASE WHEN c.c1p IS NULL
                             OR s.mean_p > c.c1p
                             OR (s.mean_p = c.c1p AND s.doc_id <= c.c1i)
                        THEN 'head'
                        WHEN s.mean_p > c.c2p
                             OR (s.mean_p = c.c2p AND s.doc_id <= c.c2i)
                        THEN 'middle'
                        ELSE 'tail' END AS bucket,
                   substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 2)
                       < '{CCNET_MIDDLE_HEX}' AS coin
            FROM scores s
            JOIN documents d USING (doc_id)
            LEFT JOIN cuts c ON c.lang = s.lang
        )
        SELECT lang, bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN bucket = 'head'
                             OR (bucket = 'middle' AND coin)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN bucket = 'head'
                             OR (bucket = 'middle' AND coin)
                        THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
        FROM bucketed GROUP BY lang, bucket
    """
