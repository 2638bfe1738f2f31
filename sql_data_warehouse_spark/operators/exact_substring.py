"""Cross-document exact-substring duplication (ExactSubstr-style).

Implements the span-level exact-duplication detector from
"Deduplicating Training Data Makes Language Models Better" (Lee et
al., 2022): a substring that occurs verbatim in two different
documents is training-set duplication even when the *documents* are
not near-duplicates (boilerplate, licenses, quoted passages). The
suffix-array formulation in the paper is a single-machine algorithm;
the Spark-first re-expression is positioned token n-gram
fingerprints + an interval union:

1. **Positioned grams** — one scan: tokenize, slide a word-``n``
   window, keep ``(doc_id, pos, gram)``. Row count = Σ tokens
   (linear; embarrassingly parallel).
2. **Cross-doc duplicated grams** — ``GROUP BY gram HAVING
   COUNT(DISTINCT doc_id) >= 2``: one shuffle keyed on the gram with
   map-side partial aggregation. (At 100 TB, group on a 128-bit
   digest of the gram instead of the string to cut shuffle bytes —
   the output columns never contain the gram, so the plan is
   unchanged; the string form here keeps the DuckDB oracle
   byte-identical.)
3. **Flag positions** — left-semi join the positioned grams against
   the duplicated-gram keys (second keyed shuffle, linear).
4. **Span union (gaps-and-islands)** — per doc, duplicated positions
   sorted by ``pos``; a new island starts when the gap to the
   previous duplicated position exceeds ``n`` (two n-token intervals
   [p, p+n-1] overlap or touch iff Δpos ≤ n). The window runs over
   the *duplicated* positions only — a tiny relation (duplication
   fraction × corpus), partitioned by doc_id, never a global sort.

Output is the per-document audit a curation pipeline acts on:
``n_tokens``, ``n_dup_positions`` (gram starts inside some repeated
substring), ``n_spans`` (maximal repeated spans), ``dup_tokens``
(tokens covered by the span union — the bytes ExactSubstr would
cut), ``max_span_tokens``. All integers ⇒ the driver's value hash is
bit-exact cross-engine.

Within-doc repetition is deliberately out of scope here (that is
``gopher_repetition``'s signal); a gram must appear in ≥ 2 distinct
documents to count.

Reference context: the reference warehouse's dedup surface is the
ROW_NUMBER latest-record rule (scripts/silver/proc_load_silver.sql:
68-71); span-level substring dedup extends that role to the corpus
scale the 100 TB pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import (
    NORMALIZE_SQL, TOKENS_SQL, normalize_text, tokens,
)
from .curation import ngrams_of

SPAN_GRAM_N = 5  # word n-gram unit: spans shorter than 5 tokens don't count


def positioned_grams(docs: DataFrame, n: int = SPAN_GRAM_N,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(doc_id, pos, gram): word n-grams with their 1-based start
    position. Token array materialized first (HOF-inline pitfall —
    see :func:`ngrams_of`); ``posexplode`` keeps the position without
    a join."""
    # Spread first: gram assembly (array_join per position) runs in
    # the scan stage, and a single-row-group input would serialize it
    # on one task (the minhash/winnow lesson).
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
    return (
        staged.select("doc_id",
                      F.posexplode(ngrams_of(F.col("_t"), n))
                      .alias("pos0", "gram"))
        .select("doc_id", (F.col("pos0") + F.lit(1)).alias("pos"), "gram")
    )


def exact_substring_spans(docs: DataFrame, n: int = SPAN_GRAM_N,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Per-document cross-doc repeated-span audit (see module doc)."""
    grams = positioned_grams(docs, n, id_col, text_col)
    dup_keys = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    # No join hint: dup_keys is corpus-scale at extreme duplication
    # density (AQE keeps the keyed sort-merge semi join from runtime
    # sizes) but tiny for clean corpora, where AQE broadcast-converts
    # and the gram relation skips its shuffle entirely.
    flagged = grams.join(dup_keys, "gram", "left_semi")

    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = (
        flagged.withColumn("_prev", F.lag("pos").over(w))
        .withColumn(
            "_new",
            F.when(F.col("_prev").isNull()
                   | (F.col("pos") - F.col("_prev") > n), 1).otherwise(0))
        .withColumn("island", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    )
    spans = (
        islands.groupBy("doc_id", "island")
        .agg(F.min("pos").alias("s"),
             (F.max("pos") + F.lit(n - 1)).alias("e"),
             F.count(F.lit(1)).alias("n_pos"))
    )
    per_doc = (
        spans.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_spans"),
             F.sum("n_pos").alias("n_dup_positions"),
             F.sum(F.col("e") - F.col("s") + F.lit(1)).alias("dup_tokens"),
             F.max(F.col("e") - F.col("s") + F.lit(1))
             .alias("max_span_tokens"))
    )
    base = docs.select(F.col(id_col).alias("doc_id"),
                       tokens(F.col(text_col)).alias("_t")) \
        .select("doc_id", F.size("_t").cast("long").alias("n_tokens"))
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id", "n_tokens",
            F.coalesce("n_dup_positions", F.lit(0)).cast("long")
            .alias("n_dup_positions"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long")
            .alias("dup_tokens"),
            F.coalesce("max_span_tokens", F.lit(0)).cast("long")
            .alias("max_span_tokens"),
        )
    )


def exact_substring_spans_sql(n: int = SPAN_GRAM_N,
                              doc_filter: str = "TRUE") -> str:
    """DuckDB twin — same positioned grams (inclusive-slice n-gram
    mirror of :func:`ngrams_of`), same HAVING ≥2-docs rule, same
    gaps-and-islands windows, all-integer output."""
    t = TOKENS_SQL.format(col="text")
    return f"""
        WITH toks AS (
            SELECT doc_id, {t} AS ts FROM documents WHERE {doc_filter}
        ),
        grams AS (
            SELECT doc_id, CAST(i AS BIGINT) AS pos,
                   array_to_string(ts[i:i+{n - 1}], ' ') AS gram
            FROM toks CROSS JOIN
                 unnest(range(1, greatest(len(ts) - {n - 1}, 1) + 1)) u(i)
        ),
        dup_keys AS (
            SELECT gram FROM grams
            GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
        ),
        flagged AS (
            SELECT g.doc_id, g.pos FROM grams g
            JOIN dup_keys USING (gram)
        ),
        isl AS (
            SELECT doc_id, pos,
                   SUM(CASE WHEN prev IS NULL OR pos - prev > {n}
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY pos) AS island
            FROM (
                SELECT doc_id, pos,
                       lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                           AS prev
                FROM flagged
            )
        ),
        spans AS (
            SELECT doc_id, island, MIN(pos) AS s,
                   MAX(pos) + {n - 1} AS e, COUNT(*) AS n_pos
            FROM isl GROUP BY doc_id, island
        ),
        per_doc AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_spans,
                   CAST(SUM(n_pos) AS BIGINT) AS n_dup_positions,
                   CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens,
                   CAST(MAX(e - s + 1) AS BIGINT) AS max_span_tokens
            FROM spans GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(len({t}) AS BIGINT) AS n_tokens,
               COALESCE(p.n_dup_positions, 0) AS n_dup_positions,
               COALESCE(p.n_spans, 0) AS n_spans,
               COALESCE(p.dup_tokens, 0) AS dup_tokens,
               COALESCE(p.max_span_tokens, 0) AS max_span_tokens
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
        WHERE {doc_filter}
    """


def source_similarity_matrix(docs: DataFrame, k: int = 8,
                             source_col: str = "source",
                             text_col: str = "text") -> DataFrame:
    """Corpus-composition analysis: exact Jaccard similarity between
    every pair of SOURCES over their distinct char-k-shingle sets —
    the "how much do these crawls overlap" matrix a dataset builder
    reads before mixing sources.

    Scale shape: one shingle scan → DISTINCT (source, shingle) (the
    collapse that makes this safe: the inverted index's Σ df² is
    bounded by n_sources² per shingle, never doc²) → per-source set
    sizes + shared-shingle counts → one division per pair. Output is
    SPARSE: one row per source pair with ≥1 shared shingle (≤
    n_sources·(n_sources−1)/2 rows — tiny at any corpus size); the
    only corpus-∝ stage is the distinct, a map-side-combined
    shuffle."""
    from ..operators.dedup import SHINGLE_K  # noqa: F401  (doc xref)

    sh = (
        docs.select(F.col(source_col).alias("source"),
                    normalize_text(F.col(text_col)).alias("_norm"))
        .select(
            "source",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(
                            F.lit(1),
                            F.greatest(F.length("_norm") - F.lit(k - 1),
                                       F.lit(1))),
                        lambda i: F.col("_norm").substr(i, F.lit(k)),
                    )
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    # Branch point with THREE consumers (sizes + both self-join
    # sides): materialize once or the shingle scan + distinct re-runs
    # per consumer. One write/read of the distinct relation beats
    # re-scanning the corpus even at scale.
    sh = sh.localCheckpoint(eager=True)
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("source_a"),
                 F.col("b.source").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("source_a"),
                      F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"),
                      F.col("n_sh").alias("n_b"))
    return (
        shared.join(sa, "source_a").join(sb, "source_b")
        .select(
            "source_a", "source_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (F.col("n_shared").cast("double")
             / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
             .cast("double")).alias("jaccard"),
        )
    )


def source_similarity_matrix_sql(k: int = 8) -> str:
    norm = NORMALIZE_SQL.format(col="text")
    return f"""
        WITH sh AS MATERIALIZED (
          SELECT DISTINCT source, shingle FROM (
            SELECT source,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(length({norm}) - {k - 1}, 1) + 1),
                       i -> substr({norm}, CAST(i AS INTEGER), {k}))))
                       AS shingle
            FROM documents
          )
        ),
        sizes AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh
          FROM sh GROUP BY source
        ),
        shared AS (
          SELECT a.source AS source_a, b.source AS source_b,
                 CAST(COUNT(*) AS BIGINT) AS n_shared
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.source < b.source
          GROUP BY 1, 2
        )
        SELECT s.source_a, s.source_b, s.n_shared,
               sa.n_sh AS n_a, sb.n_sh AS n_b,
               CAST(s.n_shared AS DOUBLE)
                   / CAST(sa.n_sh + sb.n_sh - s.n_shared AS DOUBLE)
                   AS jaccard
        FROM shared s
        JOIN sizes sa ON s.source_a = sa.source
        JOIN sizes sb ON s.source_b = sb.source
    """
