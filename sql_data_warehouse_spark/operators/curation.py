"""Corpus-curation operators for training-data pipelines.

Four operators the LLM-data stack runs after dedup and before
training, all pure Column expressions (JVM-side, codegen-friendly,
no Python UDFs) with DuckDB SQL twins for the oracle gate:

- **Benchmark decontamination** — flag documents sharing a token
  n-gram with a held-out benchmark set (the GPT-3/Pile
  decontamination rule).  Benchmark grams are DISTINCT'd and
  broadcast; the corpus is scanned once; no shuffle of the big side.
- **Token-budget packing** — select the best documents whose
  cumulative token count fits a budget.  The global running sum is
  computed with the scalable two-pass pattern (range partition →
  per-partition totals → driver prefix offsets → intra-partition
  window), NOT a single-reducer global window, so it holds at 100 TB.
- **Repeated-n-gram fraction** (Gopher-style repetition filter) —
  per-document duplicate-trigram share from integer gram counts;
  one scan, no shuffle.
- **Winnowing fingerprints** (Schleimer et al., MOSS) — window-min
  selection over char-shingle digests; the canonical local
  fingerprinting scheme whose guarantee (any shared substring of
  length ≥ k+w-1 yields a shared fingerprint) powers near-dup and
  clone detection.  Digests are md5 hex so the DuckDB twin is
  bit-identical; swap xxhash64 at production scale.

Reference context: the reference warehouse has no corpus surface at
all (pure sales-star T-SQL, scripts/silver/proc_load_silver.sql) —
these extend the engine for the 100 TB training-data role.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import (
    NORMALIZE_SQL, TOKENS_SQL, normalize_text, tokens,
)

# ------------------------------------------------------------- token grams


def ngrams_of(tokens_col: Column, n: int) -> Column:
    """Sliding n-grams (space-joined) over an ALREADY-MATERIALIZED
    token array column.

    The caller must ``withColumn`` the token array first: higher-order
    -function lambdas inline their argument expression, so passing
    ``tokens(text)`` directly would re-run the regex+split once per
    gram position — O(len²) per document and interpreted. Over a
    materialized column the array is computed once per row and the
    transform only slices it. Documents shorter than n tokens
    contribute one truncated gram — mirrored exactly by the SQL
    twin's inclusive-slice semantics."""
    idx = F.sequence(
        F.lit(1),
        F.greatest(F.size(tokens_col) - F.lit(n - 1), F.lit(1)))
    return F.transform(
        idx, lambda i: F.array_join(F.slice(tokens_col, i, n), " "))


def token_ngrams_sql(col: str, n: int) -> str:
    t = TOKENS_SQL.format(col=col)
    return (
        f"list_transform(range(1, greatest(len({t}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string(({t})[i:i+{n - 1}], ' '))"
    )


# -------------------------------------------------------- decontamination


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Documents that share at least one token ``n``-gram with the
    benchmark set → (doc_id, n_hits = distinct overlapping grams).

    Scale shape: benchmark grams are DISTINCT'd and **broadcast**
    (benchmarks are MBs; the corpus is TBs), so the corpus side is
    one scan + explode with a map-side semi-join — the corpus never
    shuffles on gram. At 100 TB the explode is the dominant cost and
    it is embarrassingly parallel.
    """
    grams = (
        docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
        .select(F.col(id_col),
                F.explode(ngrams_of(F.col("_t"), n)).alias("gram"))
    )
    bench_grams = (
        benchmark.select(tokens(F.col(text_col)).alias("_t"))
        .select(F.explode(ngrams_of(F.col("_t"), n)).alias("gram"))
        .distinct()
    )
    return (
        grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_hits"))
    )


# ------------------------------------------------- scalable running total


def global_running_sum(df: DataFrame, order_cols: list[Column],
                       value_col: Column, out_name: str = "running_total",
                       num_partitions: int = 32) -> DataFrame:
    """Cumulative sum over a GLOBAL order without a single-reducer
    global window.

    Two-pass plan (the standard distributed prefix-sum):
    1. ``repartitionByRange`` on the order → each partition holds a
       contiguous key range; a window *within* the partition computes
       the local prefix sum (parallel across partitions).
    2. Per-partition totals (one tiny aggregate, collected — bytes
       per partition) become driver-side prefix offsets, broadcast
       back and added.

    Equivalent to ``SUM() OVER (ORDER BY ...)`` for a total order
    (ties broken by the caller's order columns being unique), but
    every stage is parallel — this is the form that survives 100 TB,
    where a global window would funnel the table through one task.
    """
    from pyspark.sql import Window

    ranged = df.repartitionByRange(num_partitions, *order_cols)
    part = ranged.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*order_cols) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = part.withColumn("_local_sum", F.sum(value_col).over(w))
    # Two consumers (the totals collect below AND the final join)
    # would otherwise each re-run the caller's upstream projection +
    # the range shuffle — for token_budget_pack that upstream is the
    # full tokenizer, measured as 2 corpus passes (73 s at sf10).
    local = local.localCheckpoint(eager=True)

    totals = (
        local.groupBy("_pid").agg(F.sum(value_col).alias("_tot"))
        .collect()
    )
    offsets = {}
    acc = 0
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = acc
        acc += r["_tot"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], ["_pid", "_offset"])
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(out_name, F.col("_local_sum") + F.col("_offset"))
        .drop("_pid", "_local_sum", "_offset")
    )


# --------------------------------------------------- repetition (Gopher)


def repetition_stats(docs: DataFrame, n: int = 3,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-document repeated-n-gram stats: total grams, distinct
    grams, and the duplicate fraction (the Gopher repetition-filter
    signal). Integer counts; the single final division is
    deterministic across engines."""
    return docs.select(
        F.col(id_col), F.col("lang"), tokens(F.col(text_col)).alias("_t"),
    ).select(
        F.col(id_col), F.col("lang"), ngrams_of(F.col("_t"), n).alias("_g"),
    ).select(
        F.col(id_col),
        F.col("lang"),
        F.size("_g").cast("long").alias("n_grams"),
        F.size(F.array_distinct("_g")).cast("long").alias("n_distinct_grams"),
    ).withColumn(
        "dup_fraction",
        (F.col("n_grams") - F.col("n_distinct_grams"))
        / F.col("n_grams").cast("double"),
    )


def repetition_stats_sql(n: int = 3) -> str:
    g = token_ngrams_sql("text", n)
    return f"""
        WITH per_doc AS (
            SELECT doc_id, lang,
                   CAST(len({g}) AS BIGINT) AS n_grams,
                   CAST(len(list_distinct({g})) AS BIGINT)
                       AS n_distinct_grams
            FROM documents
        )
        SELECT doc_id, lang, n_grams, n_distinct_grams,
               (n_grams - n_distinct_grams) / CAST(n_grams AS DOUBLE)
                   AS dup_fraction
        FROM per_doc
    """


# ------------------------------------------------------------- winnowing

WINNOW_K = 12  # char-shingle length
WINNOW_W = 8   # winnowing window (guarantee: k+w-1 = 19-char matches)


def winnow_fingerprints(docs: DataFrame, k: int = WINNOW_K,
                        w: int = WINNOW_W, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Winnowed fingerprint set per document → (doc_id, fp) exploded.

    Pipeline per doc (all array expressions, one scan, no shuffle):
    char k-shingles of normalized text → md5 digest each → min digest
    per sliding window of w → distinct. min() over hex strings is
    the selection rule — deterministic and engine-portable.
    """
    norm = normalize_text(F.col(text_col))
    # materialize each stage as a column: HOF lambdas inline their
    # argument expression, so slicing an un-materialized hash array
    # would recompute EVERY md5 per window position (O(m²) per doc)
    # Small corpora arrive as one parquet row group = ONE task, which
    # serializes the md5-per-shingle map (the dominant cost — the
    # minhash_signatures lesson, dedup.py): spread it first.
    n_part = docs.sparkSession.sparkContext.defaultParallelism
    # (Guard caveat, ADVICE r9: an input with enough-but-skewed
    # partitions skips the round-robin rebalance — acceptable here
    # because the guard targets the single-row-group LOCAL file case;
    # a skewed cluster-scale scan is AQE's job, not this spread's.)
    if docs.rdd.getNumPartitions() < n_part:
        docs = docs.repartition(n_part)
    with_norm = docs.select(
        F.col(id_col), norm.alias("_norm"))
    with_hashes = with_norm.select(
        F.col(id_col),
        F.transform(
            sh_idx_over(F.col("_norm"), k),
            lambda i: F.md5(F.col("_norm").substr(i, F.lit(k))),
        ).alias("_hashes"),
    )
    h = F.col("_hashes")
    win_idx = F.sequence(
        F.lit(1), F.greatest(F.size(h) - F.lit(w - 1), F.lit(1)))
    fps = F.array_distinct(
        F.transform(win_idx, lambda i: F.array_min(F.slice(h, i, w))))
    return with_hashes.select(F.col(id_col), F.explode(fps).alias("fp"))


def sh_idx_over(norm_col: Column, k: int) -> Column:
    """Shingle start positions 1..max(len-k+1, 1) over a materialized
    normalized-text column."""
    return F.sequence(
        F.lit(1),
        F.greatest(F.length(norm_col) - F.lit(k - 1), F.lit(1)))


def winnow_fingerprints_sql(k: int = WINNOW_K, w: int = WINNOW_W) -> str:
    # staged subqueries mirror the Spark column materialization: each
    # list is computed once per row, never inlined into the next
    # lambda (DuckDB does not CSE across lambda bodies either)
    norm = NORMALIZE_SQL.format(col="text")
    return f"""
        SELECT doc_id, unnest(
            list_distinct(list_transform(
                range(1, greatest(len(h) - {w - 1}, 1) + 1),
                i -> list_aggregate(h[i:i+{w - 1}], 'min')))) AS fp
        FROM (
            SELECT doc_id,
                   list_transform(
                       range(1, greatest(length(nrm) - {k - 1}, 1) + 1),
                       i -> md5(substr(nrm, i, {k}))) AS h
            FROM (SELECT doc_id, {norm} AS nrm FROM documents)
        )
    """


def winnow_near_dup_pairs(docs: DataFrame, min_shared: int = 3,
                          max_doc_freq: int = 50,
                          k: int = WINNOW_K, w: int = WINNOW_W) -> DataFrame:
    """Near-duplicate pairs by shared winnowed fingerprints.

    Fingerprints appearing in more than ``max_doc_freq`` documents
    are dropped (boilerplate/stopword grams — the skew guard that
    keeps bucket sizes bounded: pair volume is Σ df(fp)² over
    surviving fps, never n²).

    Plan shape: ONE fingerprint scan (the md5-per-shingle pipeline is
    the dominant cost — a fp⋈fp self-join would compute it twice,
    plus a third time for the frequency filter), one shuffle
    grouping by fp. Each bucket collects its ≤``max_doc_freq``
    doc_ids and expands pairs IN-ROW with array HOFs (sorted ids ⇒
    a < b without a join predicate), so the "self-join" never touches
    the exchange a second time; the pair aggregation is the only
    other shuffle.
    """
    fp = winnow_fingerprints(docs, k, w)
    buckets = (
        fp.groupBy("fp")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids").between(2, max_doc_freq))
    )
    ids = F.col("ids")
    pairs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2),
                        F.greatest(F.size(ids) - i - F.lit(1), F.lit(0))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"),
                 F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnow_near_dup_pairs_sql(min_shared: int = 3,
                              max_doc_freq: int = 50,
                              k: int = WINNOW_K, w: int = WINNOW_W) -> str:
    # AS MATERIALIZED: DuckDB inlines plain CTEs, which would re-run
    # the whole fingerprint pipeline once per reference (3×: rare +
    # both sides of the self-join) — measured 17.7s -> ~4s at sf0.01
    return f"""
        WITH fp AS MATERIALIZED ({winnow_fingerprints_sql(k, w)}
        ),
        rare AS (
            SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) <= {max_doc_freq}
        ),
        pruned AS (SELECT f.* FROM fp f JOIN rare USING (fp))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM pruned a JOIN pruned b
          ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= {min_shared}
    """


# ------------------------------------------------------------ PII scrub

# Java-regex / RE2-compatible (no backreferences/lookarounds), so the
# Spark and DuckDB sides match byte-for-byte.
EMAIL_PATTERN = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_TOKEN = "<EMAIL>"


def scrub_pii(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Redact email addresses and report per-document scrub stats:
    (doc_id, n_redacted, chars_removed, clean_text). One scan, pure
    JVM regex (``regexp_replace``/``regexp_extract_all`` — no UDF),
    embarrassingly parallel at 100 TB. Extend by OR-ing more
    patterns (phone, SSN, IP) into the same single-pass projection.
    """
    c = F.col(text_col)
    clean = F.regexp_replace(c, EMAIL_PATTERN, PII_TOKEN)
    return docs.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_PATTERN), 0))
        .cast("long").alias("n_redacted"),
        (F.length(c) - F.length(clean)).cast("long").alias("chars_removed"),
        clean.alias("clean_text"),
    )


# ------------------------- DSIR-style hashed importance resampling

DSIR_BUCKETS = 1024


def dsir_importance_topk(docs: DataFrame, target_pred: Column,
                         k_top: int = 100, n_buckets: int = DSIR_BUCKETS,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    public method) in its RATIONAL-WEIGHT form: hash every word into
    ``n_buckets`` md5 buckets, estimate the target and raw bucket
    distributions with Laplace smoothing, and score each document by
    Σ_b tf_b · p_target(b) / p_raw(b) — the linear-ratio variant of
    DSIR's Σ tf·log(pt/pr), chosen for the same reason as
    ``bm25_rank``'s rational idf: log is 1-ulp-unstable across
    engines, while one fixed-order chain of IEEE mult/div over
    exact-integer counts is bit-identical, so the whole selector is
    hash-gatable. Per-bucket terms round to integer micros BEFORE the
    per-doc sum (floor(x·1e6 + 0.5) → BIGINT), making the aggregation
    order-independent — the stream-totals trick.

    Scale shape: two corpus passes collapse to a ≤ n_buckets-row
    stats relation (map-side combined counts) that BROADCASTS back
    onto the per-(doc, bucket) tf rows; the only corpus-wide shuffle
    is the tf groupBy on (doc, bucket); selection is sort+limit
    (TakeOrderedAndProject, never a global window). Driver state: 0
    rows (stats stay relational).

    Returns the top ``k_top`` docs by importance: (doc_id,
    score_micros, rank)."""
    # md5-per-word on the scan stage: spread first (the winnow lesson)
    _par = docs.sparkSession.sparkContext.defaultParallelism
    # (Guard caveat, ADVICE r9: an input with enough-but-skewed
    # partitions skips the round-robin rebalance — acceptable here
    # because the guard targets the single-row-group LOCAL file case;
    # a skewed cluster-scale scan is AQE's job, not this spread's.)
    if docs.rdd.getNumPartitions() < _par:
        docs = docs.repartition(_par)
    b = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            target_pred.alias("_tgt"),
            F.explode(F.split(F.col(text_col), " ")).alias("w"),
        )
        .filter(F.col("w") != "")
        .select(
            "doc_id", "_tgt",
            F.pmod(
                F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long"),
                F.lit(n_buckets),
            ).alias("bk"),
        )
    )
    tf = b.groupBy("doc_id", "bk").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    w_all = Window.partitionBy()
    stats = (
        b.groupBy("bk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cr"),
            F.sum(F.col("_tgt").cast("long")).cast("long").alias("ct"),
        )
        .select(
            "bk", "cr", "ct",
            F.sum("cr").over(w_all).cast("long").alias("nr"),
            F.sum("ct").over(w_all).cast("long").alias("nt"),
        )
    )
    # One fixed left-associative op chain — the DuckDB twin spells the
    # identical expression, so every double rounds identically.
    term = F.floor(
        F.col("tf").cast("double")
        * (F.col("ct") + 1) * (F.col("nr") + n_buckets)
        / (F.col("cr") + 1) / (F.col("nt") + n_buckets)
        * 1000000.0 + 0.5
    ).cast("long")
    scores = (
        tf.join(F.broadcast(stats), "bk")
        .select("doc_id", term.alias("tm"))
        .groupBy("doc_id")
        .agg(F.sum("tm").cast("long").alias("score_micros"))
        .orderBy(F.desc("score_micros"), F.asc("doc_id"))
        .limit(k_top)
    )
    w_rank = Window.orderBy(F.desc("score_micros"), F.asc("doc_id"))
    return scores.withColumn(
        "rank", F.row_number().over(w_rank).cast("int")
    )


def dsir_topk_sql(target_sql: str = "lang = 'en'", k_top: int = 100,
                  n_buckets: int = DSIR_BUCKETS) -> str:
    """DuckDB twin of :func:`dsir_importance_topk` — same md5 buckets,
    same Laplace counts, the same fixed-order mult/div chain, the
    same integer-micros rounding before the per-doc sum."""
    return f"""
        WITH w AS MATERIALIZED (
          SELECT doc_id, CASE WHEN {target_sql} THEN 1 ELSE 0 END AS tgt,
                 unnest(string_split(text, ' ')) AS w
          FROM documents
        ),
        b AS MATERIALIZED (
          SELECT doc_id, tgt,
                 (('0x' || substr(md5(w), 1, 8))::BIGINT) % {n_buckets} AS bk
          FROM w WHERE w != ''
        ),
        tf AS (
          SELECT doc_id, bk, CAST(COUNT(*) AS BIGINT) AS tf
          FROM b GROUP BY doc_id, bk
        ),
        stats AS (
          SELECT bk, CAST(COUNT(*) AS BIGINT) AS cr,
                 CAST(SUM(tgt) AS BIGINT) AS ct,
                 CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS nr,
                 CAST(SUM(SUM(tgt)) OVER () AS BIGINT) AS nt
          FROM b GROUP BY bk
        ),
        scores AS (
          SELECT tf.doc_id,
                 CAST(SUM(CAST(floor(
                   CAST(tf.tf AS DOUBLE)
                   * (s.ct + 1) * (s.nr + {n_buckets})
                   / (s.cr + 1) / (s.nt + {n_buckets})
                   * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS score_micros
          FROM tf JOIN stats s USING (bk)
          GROUP BY tf.doc_id
        ),
        top AS (
          SELECT doc_id, score_micros
          FROM scores ORDER BY score_micros DESC, doc_id LIMIT {k_top}
        )
        SELECT doc_id, score_micros,
               CAST(row_number() OVER (
                 ORDER BY score_micros DESC, doc_id) AS INT) AS rank
        FROM top
    """


# ----------------------------------------- multi-class PII audit

# Class -> (pattern, replacement token). Java-regex / RE2-compatible
# (no backreferences/lookarounds/boundaries), applied in THIS fixed
# order on both engines — replacement order matters when classes
# could overlap, so it is part of the operator contract.
PII_CLASSES: list[tuple[str, str, str]] = [
    ("email", EMAIL_PATTERN, "<EMAIL>"),
    ("phone", r"[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
]


def scrub_pii_multi(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Typed PII audit: per-document match count for each PII class
    plus the fully-redacted text length. One projection, pure JVM
    regex (count via ``regexp_extract_all`` BEFORE any replacement,
    then sequential class-ordered ``regexp_replace``) —
    embarrassingly parallel, no shuffle, the 100 TB shape. Counting
    precedes redaction so an earlier class's token can't mask a later
    class's match; phone (NNN-NNN-NNNN) is replaced before ssn
    (NNN-NN-NNNN) so the two digit shapes never claim each other's
    text."""
    c = F.col(text_col)
    cols = [F.col(id_col)]
    for name, pat, _tok in PII_CLASSES:
        cols.append(
            F.size(F.regexp_extract_all(c, F.lit(pat), 0))
            .cast("long").alias(f"n_{name}"))
    clean = c
    for _name, pat, tok in PII_CLASSES:
        clean = F.regexp_replace(clean, pat, tok)
    cols.append(F.length(clean).cast("long").alias("clean_len"))
    return docs.select(*cols)


def scrub_pii_multi_sql(fixture_sql: str) -> str:
    """DuckDB twin over a fixture CTE named ``fixture(doc_id, text)``
    (the raw corpus has no PII; the fixture injects deterministic
    instances per class)."""
    counts = ",\n               ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)"
        f" AS n_{name}"
        for name, pat, _tok in PII_CLASSES
    )
    clean = "text"
    for _name, pat, tok in PII_CLASSES:
        clean = f"regexp_replace({clean}, '{pat}', '{tok}', 'g')"
    return f"""
        WITH fixture AS ({fixture_sql})
        SELECT doc_id,
               {counts},
               CAST(length({clean}) AS BIGINT) AS clean_len
        FROM fixture
    """


# ------------------------------------------------ RAG chunk manifest

CHUNK_TOKENS = 64   # window length
CHUNK_STRIDE = 48   # => 16-token overlap between consecutive chunks


def rag_chunk_manifest(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Overlapping fixed-token chunk manifest — the retrieval-side
    unit (RAG / embedding-index ingestion): every document splits
    into 64-token windows at stride 48, each row carrying its token
    span and the md5 of the chunk text (the content address an
    embedding pipeline keys on).

    Chunk count is ``max(n-17, 0) // 48 + 1`` — the integer form of
    ``ceil((n - CHUNK)/STRIDE) + 1`` clamped to ≥1, with the
    ``greatest`` BEFORE the division because Spark's ``div``
    truncates toward zero while DuckDB's ``//`` floors (they differ
    exactly on the negative operands the clamp removes).

    Plan shape: one projection + posexplode per doc — no shuffle, no
    UDF; at 100 TB this is a pure map stage that parallelizes with
    the scan. Token array and chunk-index array are materialized as
    columns before the per-chunk lambda (HOF-inline pitfall)."""
    staged = docs.select(F.col(id_col).alias("doc_id"),
                         tokens(F.col(text_col)).alias("_t"))
    t = F.col("_t")
    n = F.size(t)
    n_chunks = (
        F.floor(F.greatest(n - F.lit(CHUNK_TOKENS - CHUNK_STRIDE + 1),
                           F.lit(0)) / F.lit(CHUNK_STRIDE))
        + F.lit(1)
    ).cast("int")
    ks = F.sequence(F.lit(0), n_chunks - F.lit(1))
    chunks = F.transform(
        ks,
        lambda k: F.struct(
            (k * CHUNK_STRIDE + 1).alias("tok_start"),
            F.least(k * CHUNK_STRIDE + CHUNK_TOKENS, n).alias("tok_end"),
            F.md5(F.array_join(
                F.slice(t, k * CHUNK_STRIDE + 1, CHUNK_TOKENS), " "))
            .alias("chunk_hash"),
        ),
    )
    return (
        staged.select("doc_id", F.posexplode(chunks).alias("k", "c"))
        .select(
            "doc_id",
            F.col("k").cast("long").alias("chunk_idx"),
            F.col("c.tok_start").cast("long").alias("tok_start"),
            F.col("c.tok_end").cast("long").alias("tok_end"),
            (F.col("c.tok_end") - F.col("c.tok_start") + 1).cast("long")
            .alias("n_chunk_tokens"),
            F.col("c.chunk_hash").alias("chunk_hash"),
        )
    )


def rag_chunk_manifest_sql() -> str:
    t = TOKENS_SQL.format(col="text")
    c, s = CHUNK_TOKENS, CHUNK_STRIDE
    return f"""
        WITH toks AS (SELECT doc_id, {t} AS ts FROM documents),
        spans AS (
            SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
                   CAST(k * {s} + 1 AS BIGINT) AS tok_start,
                   CAST(least(k * {s} + {c}, len(ts)) AS BIGINT) AS tok_end,
                   md5(array_to_string(
                       ts[(k * {s} + 1):(k * {s} + {c})], ' ')) AS chunk_hash
            FROM toks CROSS JOIN unnest(range(0,
                greatest(len(ts) - {c - s + 1}, 0) // {s} + 1)) u(k)
        )
        SELECT doc_id, chunk_idx, tok_start, tok_end,
               tok_end - tok_start + 1 AS n_chunk_tokens, chunk_hash
        FROM spans
    """


# --------------------------------------------- snapshot drift monitor

DRIFT_BUCKET_CHARS = 100  # n_chars // 100, capped to 10 buckets
DRIFT_N_BUCKETS = 10


def corpus_drift_stat(docs: DataFrame, delta_pred: Column,
                      id_col: str = "doc_id") -> DataFrame:
    """Distribution-drift check between a new ingest batch and the
    base corpus — the monitoring step a pipeline runs before
    admitting a crawl snapshot (CCNet/RefinedWeb-style ops hygiene).
    Documents bucket by length (``n_chars // 100`` capped at 10
    bins); the statistic is the χ²-divergence of the batch's bucket
    PROPORTIONS against the base's:

        drift = Σ_b (p_delta(b) − p_base(b))² / p_base(b)

    — the rational (log-free) drift form, for the same reason as
    bm25/dsir: every term is one subtraction, one multiply, one
    divide over exact-integer-derived doubles, and the ≤10-bucket
    sum folds in bucket order (Spark ``aggregate`` ≡ DuckDB
    ``list_reduce``), so the double is bit-identical cross-engine.
    PSI's log-ratio variant needs ``ln`` and cannot hash-gate.

    Scale shape: two map-side-combined counts over one scan (the
    bucket relation is ≤10 rows), one broadcast-sized join, one
    10-element fold. Returns ONE row: (n_buckets, delta_total,
    base_total, drift_stat)."""
    bucketed = docs.select(
        F.least(F.floor(F.col("n_chars") / DRIFT_BUCKET_CHARS),
                F.lit(DRIFT_N_BUCKETS - 1)).cast("int").alias("bucket"),
        delta_pred.cast("int").alias("is_delta"),
    )
    counts = bucketed.groupBy("bucket").agg(
        F.sum("is_delta").cast("long").alias("delta_cnt"),
        F.sum(1 - F.col("is_delta")).cast("long").alias("base_cnt"),
    )
    totals = counts.agg(
        F.sum("delta_cnt").alias("dt"), F.sum("base_cnt").alias("bt"))
    per_bucket = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (F.col("delta_cnt").cast("double") / F.col("dt").cast("double"))
        .alias("p_delta"),
        (F.col("base_cnt").cast("double") / F.col("bt").cast("double"))
        .alias("p_base"),
        "dt", "bt",
    ).withColumn(
        "contrib",
        F.when(F.col("p_base") == 0,
               F.lit(0.0)).otherwise(
            (F.col("p_delta") - F.col("p_base"))
            * (F.col("p_delta") - F.col("p_base")) / F.col("p_base")),
    )
    return (
        per_bucket.groupBy("dt", "bt")
        .agg(F.array_sort(
            F.collect_list(F.struct("bucket", "contrib"))).alias("_c"),
            F.count(F.lit(1)).alias("n_buckets"))
        .select(
            F.col("n_buckets").cast("long").alias("n_buckets"),
            F.col("dt").cast("long").alias("delta_total"),
            F.col("bt").cast("long").alias("base_total"),
            F.aggregate("_c", F.lit(0.0), lambda acc, x: acc + x["contrib"])
            .alias("drift_stat"),
        )
    )


def corpus_drift_stat_sql(delta_pred_sql: str) -> str:
    b, n = DRIFT_BUCKET_CHARS, DRIFT_N_BUCKETS
    return f"""
        WITH bucketed AS (
          SELECT least(n_chars // {b}, {n - 1}) AS bucket,
                 CAST({delta_pred_sql} AS INTEGER) AS is_delta
          FROM documents
        ),
        counts AS (
          SELECT bucket,
                 CAST(SUM(is_delta) AS BIGINT) AS delta_cnt,
                 CAST(SUM(1 - is_delta) AS BIGINT) AS base_cnt
          FROM bucketed GROUP BY bucket
        ),
        totals AS (
          SELECT SUM(delta_cnt) AS dt, SUM(base_cnt) AS bt FROM counts
        ),
        per_bucket AS (
          SELECT bucket,
                 CAST(delta_cnt AS DOUBLE) / CAST(dt AS DOUBLE) AS p_delta,
                 CAST(base_cnt AS DOUBLE) / CAST(bt AS DOUBLE) AS p_base,
                 dt, bt
          FROM counts CROSS JOIN totals
        ),
        contribs AS (
          SELECT bucket, dt, bt,
                 CASE WHEN p_base = 0 THEN 0.0
                      ELSE (p_delta - p_base) * (p_delta - p_base) / p_base
                 END AS contrib
          FROM per_bucket
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(dt AS BIGINT) AS delta_total,
               CAST(bt AS BIGINT) AS base_total,
               list_reduce(
                   list_prepend(0.0, list(contrib ORDER BY bucket)),
                   (a, x) -> a + x) AS drift_stat
        FROM contribs GROUP BY dt, bt
    """


# ------------------------------------------------- per-source quota capping

QUOTA_CAP = 15      # kept docs per source
QUOTA_SALTS = 16    # phase-1 fanout (scale knob: ~tasks per source)


def source_quota_cap(docs: DataFrame, cap: int = QUOTA_CAP,
                     n_salt: int = QUOTA_SALTS, id_col: str = "doc_id",
                     source_col: str = "source") -> DataFrame:
    """Per-source frequency capping: keep at most ``cap`` documents
    per source, best-first — the RefinedWeb/C4-style rule that stops
    a handful of gigantic hosts from dominating the training mix.
    "Best" here is (n_chars DESC, doc_id) — swap in any deterministic
    quality column in production.

    A naive ``row_number() OVER (PARTITION BY source ...)`` moves
    EVERY document of a source through one reducer — the hottest host
    in a 100 TB crawl is exactly the one that explodes. This runs the
    skew-safe two-phase top-K instead:

    1. salt each doc with ``doc_id % n_salt`` and take the per-(source,
       salt) local top-``cap`` — ``n_salt`` bounded windows per source,
       each ∝ source_size / n_salt;
    2. re-rank the ≤ ``cap × n_salt`` survivors per source — a window
       over a provably bounded relation.

    The global top-``cap`` of a source is contained in the union of
    its per-salt top-``cap``s, so phase 2 returns exactly the naive
    answer (the oracle IS the naive single-window form).

    Reference analogue: the keep-the-latest cap of
    scripts/silver/proc_load_silver.sql:68-71 (ROW_NUMBER ... = 1),
    generalized to top-K per group at corpus scale.
    """
    salted = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        "n_chars",
        (F.col(id_col) % n_salt).alias("_salt"),
    )
    w_local = Window.partitionBy("source", "_salt").orderBy(
        F.col("n_chars").desc(), F.col("doc_id"))
    survivors = (
        salted.withColumn("_lrn", F.row_number().over(w_local))
        .filter(F.col("_lrn") <= cap)
    )
    w_final = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id"))
    return (
        survivors.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= cap)
        .select("doc_id", "source", "n_chars",
                F.col("rank").cast("long").alias("rank"))
    )


def source_quota_cap_sql(cap: int = QUOTA_CAP) -> str:
    """DuckDB twin of :func:`source_quota_cap` — the naive
    single-window form the two-phase plan must reproduce exactly."""
    return f"""
        SELECT doc_id, source, n_chars, CAST(rn AS BIGINT) AS rank
        FROM (
            SELECT doc_id, source, n_chars,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC, doc_id) AS rn
            FROM documents
        ) WHERE rn <= {cap}
    """
