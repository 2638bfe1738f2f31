"""Corpus text-analysis operators: per-document statistics, quality
scoring, language identification, fingerprinting.

All pure Column expressions (see functions/text.py) — a single
projection pass over the corpus, no shuffle, no UDF: at 100 TB this
runs at parquet scan speed with full column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    ALPHA_RATIO_SQL,
    FINGERPRINT_SQL,
    NORMALIZE_SQL,
    TOKEN_COUNT_SQL,
    alpha_ratio,
    fingerprint,
    lang_guess,
    lang_guess_sql,
    token_count,
    tokens,
)


def doc_stats(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Per-document statistics + quality score.

    Quality heuristic (deterministic, tunable): short documents and
    low-alphabetic documents are 'low'; mid-length clean text is
    'high'. The point is the operator shape — single-pass, pushdown-
    friendly — not the specific thresholds."""
    t = F.col(text_col)
    n_tokens = token_count(t)
    ar = alpha_ratio(t)
    avg_token_len = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        F.length(F.concat_ws("", tokens(t))).cast("double")
        / n_tokens.cast("double")
    )
    quality = (
        F.when((n_tokens < 10) | (ar < 0.5), "low")
        .when(n_tokens >= 40, "high")
        .otherwise("medium")
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(t).cast("long").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        avg_token_len.alias("avg_token_len"),
        ar.alias("alpha_ratio"),
        quality.alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )


DOC_STATS_SQL = f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           {TOKEN_COUNT_SQL.format(col="text")} AS n_tokens,
           CASE WHEN {TOKEN_COUNT_SQL.format(col="text")} = 0 THEN 0.0
                ELSE CAST(length(list_aggregate(string_split({NORMALIZE_SQL.format(col="text")}, ' '), 'string_agg', '')) AS DOUBLE)
                     / CAST({TOKEN_COUNT_SQL.format(col="text")} AS DOUBLE) END
             AS avg_token_len,
           {ALPHA_RATIO_SQL.format(col="text")} AS alpha_ratio,
           CASE WHEN {TOKEN_COUNT_SQL.format(col="text")} < 10
                     OR {ALPHA_RATIO_SQL.format(col="text")} < 0.5 THEN 'low'
                WHEN {TOKEN_COUNT_SQL.format(col="text")} >= 40 THEN 'high'
                ELSE 'medium' END AS quality,
           {FINGERPRINT_SQL.format(col="text")} AS fingerprint
    FROM documents
"""


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Marker-word language guess per document."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        lang_guess(F.col(text_col)).alias("lang_pred"),
    )


def lang_confusion(df: DataFrame, text_col: str = "text",
                   label_col: str = "lang") -> DataFrame:
    """Confusion matrix of predicted vs labelled language — the
    operator a pipeline uses to calibrate its lang filter."""
    return (
        df.select(
            F.col(label_col).alias("lang_label"),
            lang_guess(F.col(text_col)).alias("lang_pred"),
        )
        .groupBy("lang_label", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang_label", "lang_pred")
    )


LANG_CONFUSION_SQL = f"""
    SELECT lang AS lang_label,
           {lang_guess_sql("text")} AS lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


def keyword_search(docs: DataFrame, keywords: list[str],
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Conjunctive (AND) keyword search via an inverted-index plan:
    explode each doc's DISTINCT normalized tokens, keep only posting
    rows for the query keywords, and a doc matches when its surviving
    posting count equals the keyword count.

    Scale shape: the explode emits ≤ |keywords| rows per document
    (the IN filter sits inside the same projection, so the full
    posting list never materializes), the HAVING aggregate shuffles
    those tiny postings by doc id, and at 100 TB the same plan runs
    against a PRE-BUILT posting table (token-bucketed layout) with
    the filter pushed to its scan — the relation here is exactly
    that table built on the fly."""
    from ..functions.text import tokens

    n = len(keywords)
    postings = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    ).filter(F.col("tok").isin(*keywords))
    return (
        postings.groupBy("doc_id")
        .agg(F.countDistinct("tok").alias("n_hit"))
        .filter(F.col("n_hit") == n)
        .select("doc_id")
    )


def keyword_search_sql(keywords: list[str]) -> str:
    from ..functions.text import TOKENS_SQL

    toks = TOKENS_SQL.format(col="text")
    kw = ", ".join(f"'{k}'" for k in keywords)
    return f"""
        SELECT doc_id FROM (
          SELECT doc_id, unnest(list_distinct({toks})) AS tok
          FROM documents
        )
        WHERE tok IN ({kw})
        GROUP BY doc_id
        HAVING COUNT(DISTINCT tok) = {len(keywords)}
    """


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_rank(docs: DataFrame, keywords: list[str], k: int = 20,
              id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """BM25 ranking (rational-idf variant) for a fixed keyword query,
    bit-deterministic
    across engines and partitionings: every aggregate input is an
    exact integer (term frequency, document frequency, document
    length, corpus size), the per-(doc, term) score is one fixed
    double expression over those integers, and the per-doc total is
    a FIXED-ORDER sum of per-keyword conditional aggregates (one
    column per keyword, added left-to-right) — never a float fold
    over an arbitrarily-ordered posting list.

    Scale shape: the posting explode keeps only query-keyword rows
    (≤ |keywords| per doc survive the projection), tf/dl aggregate
    with map-side partials keyed on doc, and the corpus stats
    (N, Σdl, per-keyword df) are a broadcast one-row relation. The
    top-k is TakeOrderedAndProject on (score, doc_id)."""
    from ..functions.text import tokens

    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("_toks"),
    ).select(
        "doc_id",
        F.size("_toks").cast("long").alias("dl"),
        F.filter("_toks", lambda t: t.isin(*keywords)).alias("_ktoks"),
    )
    # ONE tokenization pass feeds BOTH the corpus stats and the
    # postings: the full token arrays are dropped before the eager
    # materialization (each row keeps dl + the ≤|keywords|-distinct
    # surviving occurrences), so the checkpoint is a few bytes per
    # doc. Unmaterialized, the corpus aggregate and the posting
    # explode each re-ran the regex tokenizer over the whole corpus —
    # the sweep measured it as 2 full passes (123 s at sf10).
    staged = staged.localCheckpoint(eager=True)
    postings = (
        staged.select(
            "doc_id", "dl", F.explode("_ktoks").alias("tok")
        )
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    corpus = staged.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    dfreq = (
        postings.groupBy("tok")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    scored = (
        postings.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(corpus))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    # RATIONAL idf (no log): JVM Math.log and libm ln disagree by
    # 1 ulp on some inputs, which breaks the cross-engine bit-hash.
    # (N - df + 0.5)/(df + 0.5) is the same quantity pre-log — a
    # documented BM25 variant that keeps the idf ordering while
    # using only +,-,*,/ (all IEEE-exact-rounded, so deterministic).
    idf = (
        (F.col("n_docs").cast("double") - F.col("df").cast("double")
         + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf = F.col("tf").cast("double")
    norm = (
        tf + F.lit(BM25_K1)
        * (F.lit(1.0 - BM25_B)
           + F.lit(BM25_B) * F.col("dl").cast("double") / avgdl)
    )
    per_term = scored.select(
        "doc_id", "tok",
        (idf * tf * F.lit(BM25_K1 + 1.0) / norm).alias("term_score"),
    )
    # one column per keyword, summed in FIXED order
    cols = [
        F.sum(
            F.when(F.col("tok") == kw, F.col("term_score")).otherwise(
                F.lit(0.0)
            )
        ).alias(f"_s{i}")
        for i, kw in enumerate(keywords)
    ]
    agg = per_term.groupBy("doc_id").agg(*cols)
    total = F.col("_s0")
    for i in range(1, len(keywords)):
        total = total + F.col(f"_s{i}")
    return (
        agg.select("doc_id", total.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_rank_sql(keywords: list[str], k: int = 20) -> str:
    from ..functions.text import TOKENS_SQL

    toks = TOKENS_SQL.format(col="text")
    kw = ", ".join(f"'{w}'" for w in keywords)
    score_cols = ", ".join(
        f"SUM(CASE WHEN tok = '{w}' THEN term_score ELSE 0.0 END) AS _s{i}"
        for i, w in enumerate(keywords)
    )
    total = " + ".join(f"_s{i}" for i in range(len(keywords)))
    return f"""
        WITH staged AS MATERIALIZED (
          SELECT doc_id, {toks} AS _toks FROM documents
        ),
        with_dl AS MATERIALIZED (
          SELECT doc_id, CAST(len(_toks) AS BIGINT) AS dl, _toks
          FROM staged
        ),
        postings AS MATERIALIZED (
          SELECT doc_id, dl, tok, CAST(COUNT(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, dl, unnest(_toks) AS tok FROM with_dl)
          WHERE tok IN ({kw})
          GROUP BY doc_id, dl, tok
        ),
        corpus AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(dl) AS BIGINT) AS sum_dl
          FROM with_dl
        ),
        dfreq AS (
          SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
          FROM postings GROUP BY tok
        ),
        per_term AS (
          SELECT p.doc_id, p.tok,
                 ((CAST(c.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
                    / (CAST(d.df AS DOUBLE) + 0.5) + 1.0)
                 * CAST(p.tf AS DOUBLE) * {BM25_K1 + 1.0!r}
                 / (CAST(p.tf AS DOUBLE) + {BM25_K1!r}
                    * ({1.0 - BM25_B!r} + {BM25_B!r}
                       * CAST(p.dl AS DOUBLE)
                       / (CAST(c.sum_dl AS DOUBLE)
                          / CAST(c.n_docs AS DOUBLE))))
                     AS term_score
          FROM postings p JOIN dfreq d ON p.tok = d.tok CROSS JOIN corpus c
        )
        SELECT doc_id, {total} AS score
        FROM (SELECT doc_id, {score_cols} FROM per_term GROUP BY doc_id)
        ORDER BY score DESC, doc_id
        LIMIT {k}
    """
