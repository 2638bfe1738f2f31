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
