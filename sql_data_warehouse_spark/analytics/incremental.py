"""Incremental-load and dataset-curation operators.

The reference is full-refresh only (README.md:50 "historization of
data is not required"; every load is TRUNCATE+reload,
scripts/bronze/load_bronze.sql:35). These operators add the
incremental counterparts a warehouse needs once full refresh stops
being affordable — SCD2 historization (the reference's LEAD-based
end-dating at scripts/silver/proc_load_silver.sql:104-106 is the
degenerate single-snapshot case), MERGE-style upsert — plus the
deterministic dataset-split / stratified-sampling operators a
training-data pipeline runs over the document corpus.

Scale notes per operator are in the docstrings; the common theme is
that everything shuffles on the entity key exactly once (window
partitionBy or the merge key), so the plans hold at 100 TB with keys
hash-distributed across executors — no global windows, no
driver-side state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import TOKENS_SQL, tokens
from ..sources import load_table
from .registry import query
from .xengine import cents, CENTS_SQL

# ------------------------------------------------------------------- SCD2

@query(
    "scd2_user_history",
    survey="ext-scd2 W1 W4 P8",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
        ),
        changes AS (
            SELECT * FROM ordered
            WHERE prev_type IS DISTINCT FROM event_type
        )
        SELECT user_id,
               event_type AS attr_value,
               CAST(ts AS TIMESTAMP) AS valid_from,
               lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS valid_to,
               CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS INTEGER) AS version
        FROM changes
    """,
)
def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension historization: compress the
    event stream into effective-dated attribute versions (one row per
    *run* of equal ``event_type`` per user; ``valid_to IS NULL`` marks
    the current version). Generalizes the reference's LEAD end-dating
    (scripts/silver/proc_load_silver.sql:104-106) from one snapshot to
    a full change history.

    Scale: both windows partition by ``user_id`` — one hash shuffle of
    the events table, each user's history sorted locally within its
    partition. No global ordering anywhere, so the plan is identical
    at 100 TB; skewed users are bounded by per-user event counts, not
    table size.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(~F.col("prev_type").eqNullSafe(F.col("event_type")))
    )
    return changes.select(
        "user_id",
        F.col("event_type").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("int").alias("version"),
    )


# ----------------------------------------------------------- MERGE upsert

@query(
    "incremental_merge_orders",
    survey="ext-merge S2 W1 U1",
    oracle=f"""
        WITH updates AS (
            SELECT o_orderkey, o_orderstatus,
                   o_totalprice * 1.10 AS o_totalprice,
                   'RE-PRICED' AS o_orderpriority,
                   1 AS _src
            FROM orders WHERE o_orderkey % 7 = 0
        ),
        unioned AS (
            SELECT * FROM updates
            UNION ALL
            SELECT o_orderkey, o_orderstatus, o_totalprice,
                   o_orderpriority, 0 AS _src
            FROM orders
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                       PARTITION BY o_orderkey ORDER BY _src DESC
                   ) AS rn
            FROM unioned
        )
        SELECT o_orderkey, o_orderstatus, o_orderpriority,
               {CENTS_SQL.format(expr="o_totalprice")} AS price_cents
        FROM ranked WHERE rn = 1
    """,
)
def incremental_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style upsert without a transactional table format: a
    deterministic update batch (every 7th order re-priced +10%) is
    merged into the target latest-wins per key — union + one window
    on the merge key, the standard parquet-era incremental-load plan
    (what Delta/Iceberg MERGE INTO compiles to under the hood).

    Scale: one hash shuffle on ``o_orderkey``; update and base rows
    for the same key co-locate, each group resolves locally. When the
    update batch is small relative to the target, the better physical
    plan is a broadcast anti-join (target LEFT ANTI updates, then
    union) — zero shuffle of the big side; this query keeps the
    general-case plan that works at any update:target ratio.
    """
    o = load_table(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") * F.lit(1.10)).alias("o_totalprice"),
        F.lit("RE-PRICED").alias("o_orderpriority"),
        F.lit(1).alias("_src"),
    )
    base = o.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority",
        F.lit(0).alias("_src"),
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("_src"))
    return (
        updates.unionByName(base)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey", "o_orderstatus", "o_orderpriority",
            cents(F.col("o_totalprice")).alias("price_cents"),
        )
    )


# ---------------------------------------------- deterministic data splits

# Lowercase two-char hex prefixes sort identically to their numeric
# value in both engines, so a lexicographic threshold on md5(key) is a
# portable, content-addressed bucket assignment: 'cd' = 205/256 ≈ 80%,
# 'e6' = 230/256 ≈ 90%.
_SPLIT_CASE_SQL = """
    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
         ELSE 'test' END
"""


@query(
    "dataset_split_assignment",
    survey="ext-split A2 A5",
    oracle=f"""
        SELECT {_SPLIT_CASE_SQL} AS split,
               lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1, 2
    """,
)
def dataset_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by content-addressed
    hash: ``md5(doc_id)`` prefix thresholds give a stable ~80/10/10
    split that never moves a document between splits as the corpus
    grows — the property a training pipeline needs to avoid test-set
    leakage across dataset versions. Grouped by language to make the
    stratification visible.

    Scale: embarrassingly parallel map (hash + 2-way compare per row)
    feeding a partial aggregation — no shuffle until the tiny
    (split × lang) group-by. Works unchanged at any corpus size.
    """
    d = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(prefix < "cd", "train")
        .when(prefix < "e6", "val")
        .otherwise("test")
    )
    return d.groupBy(split.alias("split"), "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@query(
    "stratified_sample_by_lang",
    survey="ext-sample W3 A2",
    oracle="""
        WITH ranked AS (
            SELECT doc_id, lang, source,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY lang) AS group_n
            FROM documents
        )
        SELECT doc_id, lang, source,
               CAST(rn AS BIGINT) AS sample_rank
        FROM ranked
        WHERE rn <= CAST(ceil(group_n * 0.10) AS BIGINT)
    """,
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 10%-per-language sample with deterministic
    membership: rank documents inside each language by ``md5(doc_id)``
    (a content-addressed uniform ordering, identical across engines
    and runs) and keep the top ceil(10%) per group. This is the
    mixture-curation primitive — swap the constant for a per-group
    target to rebalance a corpus toward a desired language mix.

    Scale: one hash shuffle on ``lang``. Low-cardinality strata make
    whole languages hot partitions at 100 TB; the scale path is
    two-phase — per-partition top-k on a salted key, then re-rank the
    k·salt survivors — same contract, bounded partition memory.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select(
            "doc_id", "lang", "source",
            F.row_number().over(w).cast("long").alias("sample_rank"),
            F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("group_n"),
        )
        .filter(
            F.col("sample_rank")
            <= F.ceil(F.col("group_n") * F.lit(0.10)).cast("long")
        )
        .drop("group_n")
    )


@query(
    "domain_mixture_realized",
    survey="ext-sample ext-mixture W3 A2 A4",
    oracle="""
        WITH counts AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s,
                   CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n_total,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n_sources
            FROM documents GROUP BY source
        ),
        quota AS (
            SELECT source, n_s,
                   (n_total // n_sources) // n_s AS full_copies,
                   (n_total // n_sources) % n_s AS rem
            FROM counts
        ),
        ranked AS (
            SELECT d.doc_id, d.source, q.full_copies, q.rem,
                   row_number() OVER (
                       PARTITION BY d.source
                       ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
                   ) AS rnk
            FROM documents d JOIN quota q ON q.source = d.source
        )
        SELECT doc_id, source,
               CAST(unnest(range(1, full_copies
                    + CASE WHEN rnk <= rem THEN 1 ELSE 0 END + 1))
                    AS BIGINT) AS copy_idx
        FROM ranked
        WHERE full_copies + CASE WHEN rnk <= rem THEN 1 ELSE 0 END > 0
    """,
)
def domain_mixture_realized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realize a TARGET DOMAIN MIXTURE over the corpus — the
    upsample/downsample step every multi-source training run applies
    before tokenization (uniform target here; any weight vector slots
    into the same integer quota math). Each source gets an integer
    quota T_s = (N // n_sources): every doc of the source is emitted
    ``T_s // n_s`` times (epochs > 1 ⇒ upsampling rare domains), and
    the ``T_s % n_s`` docs ranked first by md5(doc_id) get one extra
    copy (the deterministic fractional epoch — same content-addressed
    rule as ``stratified_sample_by_lang``, so membership is identical
    across engines and runs). Over-represented domains resolve to
    full_copies = 0 with only the md5-top slice kept — downsampling
    falls out of the same formula. Output is the realized (doc_id,
    source, copy_idx) manifest, ~N rows regardless of skew.

    Scale shape: one tiny per-source agg (broadcast back), one
    shuffle on source for the in-source rank (hot-stratum caveat and
    its salted two-phase fix documented at
    ``stratified_sample_by_lang``), one ``explode(sequence)`` whose
    output is the quota — never data² anywhere. Pure integer
    quota arithmetic ⇒ bit-identical cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    w_all = Window.partitionBy()
    quota = counts.select(
        "source", "n_s",
        (F.floor(
            F.sum("n_s").over(w_all) / F.count(F.lit(1)).over(w_all)
        ).cast("long")).alias("t_s"),
    ).select(
        "source",
        F.floor(F.col("t_s") / F.col("n_s")).cast("long")
        .alias("full_copies"),
        (F.col("t_s") % F.col("n_s")).alias("rem"),
    )
    w_src = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = (
        d.select("doc_id", "source")
        .join(F.broadcast(quota), "source")
        .withColumn("rnk", F.row_number().over(w_src))
    )
    copies = (
        F.col("full_copies")
        + F.when(F.col("rnk") <= F.col("rem"), 1).otherwise(0)
    ).cast("long")
    return (
        ranked.withColumn("_copies", copies)
        .filter(F.col("_copies") > 0)
        .select(
            "doc_id", "source",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("_copies")))
            .alias("copy_idx"),
        )
    )


# ------------------------------------------------- percentile sketch twin

@query(
    "approx_order_value_percentiles",
    survey="ext-approx A2",
    oracle=None,  # sketch values are engine-specific; accuracy vs the
    #               exact twin asserted in tests/test_operators.py
)
def approx_order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch twin of ``order_value_percentiles``: KLL-style
    ``approx_percentile`` with mergeable fixed-size state. At 100 TB
    the exact quantile needs a full sort per group; the sketch is one
    map-side pass plus a tiny merge, with the accuracy knob explicit.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(
            "approx_percentile(o_totalprice, array(0.50, 0.90, 0.99), 10000)"
        ).alias("approx_p"),
    ).select(
        "priority", "n_orders",
        F.col("approx_p")[0].alias("p50"),
        F.col("approx_p")[1].alias("p90"),
        F.col("approx_p")[2].alias("p99"),
    )


_N_SHARDS = 32


@query(
    "training_shard_manifest",
    survey="ext-shard ext-split A2 W3",
    tags=("llmops",),
    oracle=f"""
        WITH assigned AS (
          SELECT doc_id, n_chars,
                 md5(CAST(doc_id AS VARCHAR)) AS h
          FROM documents
          WHERE {_SPLIT_CASE_SQL} = 'train'
        ),
        sharded AS (
          SELECT doc_id, n_chars, h,
                 CAST(instr('0123456789abcdef', substr(h, 3, 1)) - 1
                      AS INTEGER)
                 + 16 * CAST(substr(h, 4, 1) < '8' AS INTEGER) AS shard
          FROM assigned
        ),
        with_first AS (
          SELECT shard, n_chars,
                 FIRST_VALUE(doc_id) OVER (
                   PARTITION BY shard ORDER BY h, doc_id) AS first_doc
          FROM sharded
        )
        SELECT CAST(shard AS INTEGER) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               MIN(first_doc) AS first_doc
        FROM with_first GROUP BY shard
    """,
)
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shuffle-and-shard step a tokenizer pipeline runs before
    writing training shards: train-split docs are hash-assigned to
    32 shards and ORDERED WITHIN EACH SHARD by a second hash
    (a deterministic global shuffle — no seed state, stable across
    reruns and cluster sizes), reported as a shard manifest
    (doc count, byte budget, first doc in shuffle order). At scale
    the same expressions feed ``df.repartitionByRange(shard, h)`` +
    ``sortWithinPartitions`` and a partitioned parquet write — the
    manifest here IS the plan's verification surface.

    Shard id = md5 hex chars 3-4 (nibble 3 + high-bit of nibble 4 →
    0..31); shuffle order = (full digest, doc_id). Everything derives
    from md5 so the DuckDB twin replays it bit-for-bit."""
    d = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    train = d.filter(
        F.when(prefix < "cd", "train")
        .when(prefix < "e6", "val")
        .otherwise("test")
        == "train"
    ).select(
        "doc_id", "n_chars", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    shard = (
        (F.instr(F.lit("0123456789abcdef"), F.substring("h", 3, 1)) - 1)
        + 16 * (F.substring("h", 4, 1) < "8").cast("int")
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        train.withColumn("shard", shard)
        .withColumn("first_doc", F.first_value("doc_id").over(w))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("first_doc").alias("first_doc"),
        )
    )


_SEQ_LEN = 2048


def seq_idx_expr(cum_col: str = "cum_tokens") -> Column:
    """Sequence index of the token at running-total ``cum_col``:
    ``greatest(cum - 1, 0) div SEQ_LEN``. Pure int64 on purpose —
    a float divide-then-cast caps exactness at 2^53 cumulative
    tokens, and without the ``greatest`` clamp the one negative
    numerator (cum = 0: a zero-token doc first in shuffle order)
    splits the engines: Spark's ``div`` truncates toward zero (0)
    while DuckDB's ``//`` floors (-1). With the clamp the numerator
    is always ≥ 0, where truncate == floor in any dialect. The
    DuckDB twin fragment is :data:`SEQ_IDX_SQL`; cross-engine
    agreement on the adversarial cases is pinned in
    tests/test_curation.py."""
    return F.expr(f"greatest({cum_col} - 1, 0L) div {_SEQ_LEN}")


SEQ_IDX_SQL = f"CAST(GREATEST({{cum}} - 1, 0) // {_SEQ_LEN} AS BIGINT)"


@query(
    "sequence_packing_manifest",
    survey="ext-pack ext-shard W6 A2",
    tags=("llmops",),
    oracle=f"""
        WITH train AS (
          SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
                 CAST(len({TOKENS_SQL.format(col="text")}) AS BIGINT)
                   AS n_tokens
          FROM documents
          WHERE {_SPLIT_CASE_SQL} = 'train'
        ),
        sharded AS (
          SELECT doc_id, n_tokens, h,
                 CAST(instr('0123456789abcdef', substr(h, 3, 1)) - 1
                      AS INTEGER)
                 + 16 * CAST(substr(h, 4, 1) < '8' AS INTEGER) AS shard
          FROM train
        ),
        packed AS (
          SELECT shard, n_tokens,
                 {SEQ_IDX_SQL.format(cum='''SUM(n_tokens) OVER (
                         PARTITION BY shard ORDER BY h, doc_id
                         ROWS UNBOUNDED PRECEDING)''')} AS seq_idx
          FROM sharded
        )
        SELECT CAST(shard AS INTEGER) AS shard,
               CAST(MAX(seq_idx) + 1 AS BIGINT) AS n_sequences,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(MAX(per_seq) AS BIGINT) AS max_docs_per_seq
        FROM (
          SELECT shard, seq_idx, SUM(n_tokens) AS n_tokens,
                 COUNT(*) AS per_seq
          FROM packed GROUP BY shard, seq_idx
        )
        GROUP BY shard
    """,
)
def sequence_packing_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-split sequence packing: train docs in
    deterministic shuffle order (hash order within hash shards, as in
    ``training_shard_manifest``) are concatenated and cut into
    2048-token sequences — ``seq_idx = greatest(running_tokens - 1, 0)
    div 2048``, pure int64 arithmetic on BOTH engines: a float divide
    would cap exactness at 2^53 cumulative tokens, and the greatest()
    clamp removes the one negative case (a zero-token doc first in
    shuffle order → cum 0) where Spark's truncating ``div`` and
    DuckDB's flooring ``//`` disagree (0 vs -1). Gated by an
    adversarial zero-token fixture in tests/test_curation.py.
    Reported per shard: sequence count, token total, max docs
    landing in one sequence. The running sum is a within-shard window
    (shards are the parallel unit — no global order, no single
    reducer), exactly the job that writes packed training records at
    100 TB; the manifest is its verification surface."""
    d = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    train = d.filter(
        F.when(prefix < "cd", "train")
        .when(prefix < "e6", "val")
        .otherwise("test")
        == "train"
    ).select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    shard = (
        (F.instr(F.lit("0123456789abcdef"), F.substring("h", 3, 1)) - 1)
        + 16 * (F.substring("h", 4, 1) < "8").cast("int")
    ).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        train.withColumn("shard", shard)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn("seq_idx", seq_idx_expr())
        .drop("cum_tokens")
    )
    per_seq = packed.groupBy("shard", "seq_idx").agg(
        F.sum("n_tokens").alias("n_tokens"),
        F.count(F.lit(1)).alias("per_seq"),
    )
    return per_seq.groupBy("shard").agg(
        (F.max("seq_idx") + 1).alias("n_sequences"),
        F.sum("n_tokens").alias("total_tokens"),
        F.max("per_seq").alias("max_docs_per_seq"),
    )


# ------------------------------------------ length-bucketed batch manifest

_BUCKET_CAPS = [16, 32, 64, 128, 256, 512, 1024]
_BATCH_TOKENS = 4096


def _bucket_case_sql(n_col: str) -> str:
    """Shared CASE ladder assigning a doc to the smallest power-of-2
    cap that holds it (identical text in both dialects — pure integer
    compares). Docs over the last cap clamp into it."""
    arms = " ".join(
        f"WHEN {n_col} <= {c} THEN {c}" for c in _BUCKET_CAPS[:-1]
    )
    return f"CASE {arms} ELSE {_BUCKET_CAPS[-1]} END"


@query(
    "length_bucket_batches",
    survey="ext-pack ext-shard A3 W3",
    tags=("llmops",),
    oracle=f"""
        WITH train AS (
          SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
                 CAST(len({TOKENS_SQL.format(col="text")}) AS BIGINT)
                   AS n_tokens
          FROM documents
          WHERE {_SPLIT_CASE_SQL} = 'train'
        ),
        bucketed AS (
          SELECT doc_id, h, n_tokens,
                 CAST(instr('0123456789abcdef', substr(h, 3, 1)) - 1
                      AS INTEGER)
                 + 16 * CAST(substr(h, 4, 1) < '8' AS INTEGER) AS shard,
                 CAST({_bucket_case_sql("n_tokens")} AS BIGINT)
                   AS bucket_cap
          FROM train
        ),
        batched AS (
          SELECT shard, bucket_cap, n_tokens,
                 (row_number() OVER (
                      PARTITION BY shard, bucket_cap
                      ORDER BY h, doc_id) - 1)
                 // GREATEST({_BATCH_TOKENS} // bucket_cap, 1)
                   AS batch_idx
          FROM bucketed
        ),
        per_batch AS (
          SELECT shard, bucket_cap, batch_idx,
                 COUNT(*) AS n, MAX(n_tokens) AS mx,
                 SUM(n_tokens) AS tot
          FROM batched GROUP BY shard, bucket_cap, batch_idx
        )
        SELECT CAST(shard AS INTEGER) AS shard,
               bucket_cap,
               CAST(SUM(n) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_batches,
               CAST(SUM(tot) AS BIGINT) AS total_tokens,
               CAST(SUM(n * mx) AS BIGINT) AS padded_tokens,
               CAST(SUM(n * mx) - SUM(tot) AS BIGINT) AS padding_waste
        FROM per_batch GROUP BY shard, bucket_cap
    """,
)
def length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch manifest with padding-waste accounting —
    the dynamic-batching step that feeds padded (non-packed) training
    and finetuning: train docs go to the smallest power-of-2 length
    bucket that holds them, batches of ``max(BATCH_TOKENS div cap,
    1)`` rows form inside each (hash shard, bucket) in deterministic
    shuffle order, each batch pads to ITS OWN max length, and the
    manifest reports per (shard, bucket) the doc/batch counts, real
    vs padded token totals, and the padding waste the bucketing saved
    vs a single global bucket.

    Scale shape: same as ``sequence_packing_manifest`` — the only
    windows run within (shard, bucket); shards are the parallel unit,
    so no global order, no single reducer, and the manifest is the
    verification surface of the job that would write padded batch
    records at 100 TB. Pure integer arithmetic end to end (token
    counts, integer div batch assignment, Σ n·max padding) ⇒
    bit-identical cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    train = d.filter(
        F.when(prefix < "cd", "train")
        .when(prefix < "e6", "val")
        .otherwise("test")
        == "train"
    ).select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    shard = (
        (F.instr(F.lit("0123456789abcdef"), F.substring("h", 3, 1)) - 1)
        + 16 * (F.substring("h", 4, 1) < "8").cast("int")
    ).cast("int")
    bucket = F.expr(_bucket_case_sql("n_tokens")).cast("long")
    w = Window.partitionBy("shard", "bucket_cap").orderBy("h", "doc_id")
    batched = (
        train.withColumn("shard", shard)
        .withColumn("bucket_cap", bucket)
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "batch_idx",
            F.expr(
                f"(rn - 1) div greatest({_BATCH_TOKENS} div bucket_cap, 1L)"
            ),
        )
    )
    per_batch = batched.groupBy("shard", "bucket_cap", "batch_idx").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("n_tokens").alias("mx"),
        F.sum("n_tokens").alias("tot"),
    )
    return per_batch.groupBy("shard", "bucket_cap").agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("tot").alias("total_tokens"),
        F.sum(F.col("n") * F.col("mx")).alias("padded_tokens"),
        (F.sum(F.col("n") * F.col("mx")) - F.sum("tot"))
        .alias("padding_waste"),
    )


# ----------------------------------------- temperature-scaled mixture plan


@query(
    "domain_mixture_temperature",
    survey="ext-mixture ext-sample A2 A8 W9",
    tags=("llmops",),
    oracle="""
        WITH counts AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s,
                   sqrt(CAST(COUNT(*) AS DOUBLE)) AS w,
                   CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n_total
            FROM documents GROUP BY source
        ),
        z AS (
            SELECT list_reduce(
                       list_prepend(0.0, list(w ORDER BY source)),
                       (a, b) -> a + b) AS z
            FROM counts
        )
        SELECT source, n_s,
               CAST(floor(1000000.0 * w / (SELECT z FROM z))
                    AS BIGINT) AS weight_micros,
               CAST(floor(CAST(n_total AS DOUBLE) * w
                          / (SELECT z FROM z)) AS BIGINT) AS quota,
               CAST(floor(CAST(n_total AS DOUBLE) * w
                          / (SELECT z FROM z)) AS BIGINT) - n_s
                   AS delta_docs
        FROM counts
    """,
)
def domain_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multinomial mixture plan (the mT5/XLM-R
    rule, tau = 0.5): each source's sampling weight is
    ``n_s^tau / Z``, flattening the natural distribution so rare
    domains are upsampled and giant ones capped. tau = 0.5 makes the
    weight ``sqrt(n_s)`` — deliberately, because IEEE sqrt is
    correctly rounded in BOTH engines (unlike pow/exp/ln, which are
    libm-dependent and would break the value hash): every weight,
    the seqfold normalizer Z (folded in source order, the
    lm_quality_scores trick), and the floor'd integer quotas are
    bit-identical cross-engine. Output per source: corpus count,
    weight in micros, integer quota at corpus-size budget, and the
    up/downsampling delta. The quota column feeds
    ``domain_mixture_realized``'s integer copy math unchanged.

    Scale: one groupBy(source) partial agg; the weight table is
    ≤|sources| rows — everything after the first shuffle is
    driver-trivial but stays in the plan (no collect)."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    w_all = Window.partitionBy()
    # counts feeds BOTH the Z-fold aggregate and the main projection;
    # checkpoint the <=|sources|-row relation so the corpus scans once
    # (the ccnet_bucket_sample branch-point lesson).
    counts = counts.select(
        "source", "n_s",
        F.sqrt(F.col("n_s").cast("double")).alias("w"),
        F.sum("n_s").over(w_all).alias("n_total"),
    ).localCheckpoint(eager=True)
    z = counts.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "w"))),
            F.lit(0.0),
            lambda acc, x: acc + x["w"],
        ).alias("z")
    )
    return (
        counts.join(F.broadcast(z))
        .select(
            "source", "n_s",
            F.floor(1000000.0 * F.col("w") / F.col("z"))
            .cast("long").alias("weight_micros"),
            F.floor(F.col("n_total").cast("double") * F.col("w")
                    / F.col("z")).cast("long").alias("quota"),
            (F.floor(F.col("n_total").cast("double") * F.col("w")
                     / F.col("z")).cast("long") - F.col("n_s"))
            .alias("delta_docs"),
        )
    )


@query(
    "scd2_point_in_time_join",
    survey="ext-scd2 ext-asof W1 W4 A3",
    tags=("events", "scd2", "timeseries"),
    oracle="""
        WITH hist AS MATERIALIZED (
          SELECT user_id, ts, event_id,
                 CAST(json_extract(props, '$.k') AS BIGINT) AS k
          FROM events WHERE event_type != 'purchase'
        ),
        versions AS MATERIALIZED (
          SELECT user_id, ts, event_id, k FROM (
            SELECT *, lag(k) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                      ) AS prev_k
            FROM hist
          ) WHERE prev_k IS DISTINCT FROM k
        ),
        probes AS (
          SELECT user_id, ts, event_id
          FROM events WHERE event_type = 'purchase'
        )
        SELECT p.event_id, p.user_id,
               CAST(p.ts AS TIMESTAMP) AS ts,
               (SELECT v.k FROM versions v
                WHERE v.user_id = p.user_id
                  AND (v.ts < p.ts
                       OR (v.ts = p.ts AND v.event_id < p.event_id))
                ORDER BY v.ts DESC, v.event_id DESC LIMIT 1)
                 AS k_at_purchase
        FROM probes p
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME join against the SCD2 history — the query every
    Type-2 dimension exists to answer ("which version was in force
    when the fact happened"), and the feature-store primitive behind
    leakage-free training joins (a feature valid AFTER the label
    event must never attach to it): each purchase picks the user's
    attribute version (the ``k`` property, historized from the
    user's NON-purchase events) effective at the purchase timestamp;
    purchases before any version get NULL, never a future value.

    Scale shape — deliberately NOT an interval inequality join (that
    plans as a nested-loop at any scale): version starts and probes
    UNION into one relation keyed on user, and ONE window per user
    ordered by (ts, event_id, probes-after-versions) carries the
    last version forward onto each probe — the as-of rewrite, one
    hash shuffle of the union, per-user partitions bounded by event
    counts. The oracle is the DEFINITIONAL correlated top-1 lookup,
    so the gate checks the rewrite against an independent
    derivation. Determinism: (ts, event_id) is a total order; at an
    exact tie the version with the smaller event_id is already in
    force (strictly-before semantics on the lexicographic pair) on
    both sides."""
    e = load_table(spark, sf_dir, "events")
    hist = e.filter(F.col("event_type") != "purchase").select(
        "user_id", "ts", "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versions = (
        hist.withColumn("prev_k", F.lag("k").over(w))
        .filter(~F.col("prev_k").eqNullSafe(F.col("k")))
        .select("user_id", "ts", "event_id", "k",
                F.lit(0).alias("is_probe"))
    )
    probes = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("long").alias("k"),
        F.lit(1).alias("is_probe"),
    )
    # at an exact (ts, event_id) tie a version sorts BEFORE a probe —
    # impossible for real event ids but it pins the semantics
    wu = Window.partitionBy("user_id").orderBy(
        "ts", "event_id", "is_probe"
    ).rowsBetween(Window.unboundedPreceding, 0)
    carried = versions.unionByName(probes).select(
        "user_id", "ts", "event_id", "is_probe",
        F.last("k", ignorenulls=True).over(wu).alias("k_at_purchase"),
    )
    return carried.filter(F.col("is_probe") == 1).select(
        "event_id", "user_id", "ts", "k_at_purchase")
