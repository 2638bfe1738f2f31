"""Pattern-mining analytics: event-sequence transition matrices,
vocabulary collocations (lift / pre-log PMI), the 2-D skyline, and
triangle counting over the supported co-purchase graph.

These extend the reference's change-over-time and ranking families
(`/root/reference/scripts/analysis/07_change_over_time_analysis.sql`,
`06_ranking_analysis.sql`) with the sequence / co-occurrence /
multi-criteria shapes a warehouse grows next — each a single
declarative plan, each gated by an independently-derived DuckDB
oracle.

Cross-engine determinism: every probability/score here is a SINGLE
division of exact BIGINT counts into a double (the registry's
rational-score rule), never a log — JVM ``Math.log`` and libm differ
by 1 ulp on some inputs (verify SKILL.md), so PMI is ranked by its
pre-log rational form (lift); log is monotone, so the lift top-k IS
the PMI top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import TOKENS_SQL, tokens
from ..operators import graph as _graph
from ..operators.skyline import pareto_frontier_2d, pareto_frontier_sql
from ..sources import load_table
from .registry import query

# ---------------------------------------------- sequence transitions


@query(
    "event_transition_matrix",
    survey="ext-sequence W4 A3 W9",
    tags=("events", "mining"),
    oracle="""
        WITH t AS (
          SELECT event_type AS from_type,
                 LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS to_type
          FROM events
        ),
        c AS (
          SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_trans
          FROM t WHERE to_type IS NOT NULL
          GROUP BY from_type, to_type
        )
        SELECT from_type, to_type, n_trans,
               CAST(n_trans AS DOUBLE)
                 / CAST(SUM(n_trans) OVER (PARTITION BY from_type)
                        AS DOUBLE) AS p_trans
        FROM c
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: P(next event type | current event type). The row-
    normalized matrix is the input to next-action prediction and the
    anomaly score behind "this session's transitions are improbable".

    Plan shape: one LEAD window PARTITIONED BY user_id (per-partition
    rows = one user's events — bounded, sf-independent), then a
    grouped count. The normalizing SUM window runs over the
    TYPE×TYPE aggregate (rows ≈ |event types|², never ≈ events).
    Determinism: (ts, event_id) is a total order per user, and
    p_trans is one division of exact BIGINT counts."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    c = trans.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_trans"))
    wt = Window.partitionBy("from_type")
    return c.select(
        "from_type", "to_type", "n_trans",
        (F.col("n_trans").cast("double")
         / F.sum("n_trans").over(wt).cast("double")).alias("p_trans"),
    )


# ------------------------------------------------- collocations (lift)

_PMI_VOCAB = 64
_PMI_TOPK = 50
_DOC_TOKENS_SQL = TOKENS_SQL.format(col="text")


@query(
    "pmi_collocations_topk",
    survey="ext-text A2 J-self O2",
    tags=("llmops", "mining"),
    oracle=f"""
        WITH tok AS MATERIALIZED (
          SELECT doc_id, t.tok
          FROM documents,
               UNNEST(list_distinct({_DOC_TOKENS_SQL})) AS t(tok)
          WHERE t.tok <> ''
        ),
        dfc AS MATERIALIZED (
          SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
          FROM tok GROUP BY tok
        ),
        vocab AS MATERIALIZED (
          SELECT tok, df FROM dfc ORDER BY df DESC, tok LIMIT {_PMI_VOCAB}
        ),
        tv AS MATERIALIZED (
          SELECT tok.doc_id, tok.tok FROM tok JOIN vocab USING (tok)
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        pc AS (
          SELECT a.tok AS t1, b.tok AS t2, CAST(COUNT(*) AS BIGINT) AS n_co
          FROM tv a JOIN tv b ON a.doc_id = b.doc_id AND a.tok < b.tok
          GROUP BY a.tok, b.tok
        )
        SELECT t1, t2, n_co,
               CAST(n_co * (SELECT n_docs FROM n) AS DOUBLE)
                 / CAST(va.df * vb.df AS DOUBLE) AS lift
        FROM pc
        JOIN vocab va ON va.tok = pc.t1
        JOIN vocab vb ON vb.tok = pc.t2
        ORDER BY lift DESC, t1, t2
        LIMIT {_PMI_TOPK}
    """,
)
def pmi_collocations_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} collocations among the top-{V} document-frequency
    vocabulary, ranked by LIFT = P(x,y) / (P(x)·P(y)) — the pre-log
    rational form of PMI (log is monotone ⇒ same ranking, and lift is
    one division of exact integer counts where PMI's log would drift
    an ulp across engines). The staple vocabulary-mining signal for
    tokenizer merges and phrase detection over a training corpus.

    Plan shape: ONE tokenize pass (the regex explode is the dominant
    cost — the r7 sf10 sweep measured 74.5 s with the token relation
    recomputed for the vocab aggregate AND the restriction join;
    localCheckpoint(eager=True) fuses the two scans, the branch-point
    rule from the r6 sweep) → doc-frequency aggregate → top-V via
    sort+limit (TakeOrderedAndProject, never a global window) → the
    tiny vocab BROADCASTS into the doc-token restriction, so the
    co-occurrence self-join is keyed on doc_id with per-doc fan-out
    ≤ C(V,2) — a constant — and the grouped pair count shuffles ≤ V²
    rows. At 100 TB the checkpointed token relation is
    (doc_id, tok) — compact columns, a fraction of the text it
    derives from — and on a cluster the same fusion is a persist() or
    an intermediate parquet stage; no stage is quadratic in anything
    but the constant V.

    Overflow note: ``n_co · n_docs`` is exact in BIGINT up to ~9·10¹⁸
    (n_docs ≈ 3·10⁹ at 100 TB ⇒ products ≤ ~10¹⁹ only if a pair
    co-occurs in every doc; real corpora sit orders below — and both
    engines would overflow together, not diverge)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id",
            F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .localCheckpoint(eager=True)  # branch point: vocab agg + tv join
    )
    dfc = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    vocab = dfc.orderBy(F.col("df").desc(), "tok").limit(_PMI_VOCAB)
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tv = tok.join(F.broadcast(vocab.select("tok")), "tok").select(
        "doc_id", "tok")
    a = tv.select("doc_id", F.col("tok").alias("t1"))
    b = tv.select("doc_id", F.col("tok").alias("t2"))
    pc = (
        a.join(b, "doc_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    va = vocab.select(F.col("tok").alias("t1"), F.col("df").alias("df1"))
    vb = vocab.select(F.col("tok").alias("t2"), F.col("df").alias("df2"))
    return (
        pc.join(F.broadcast(va), "t1")
        .join(F.broadcast(vb), "t2")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "t1", "t2", "n_co",
            ((F.col("n_co") * F.col("n_docs")).cast("double")
             / (F.col("df1") * F.col("df2")).cast("double")).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "t1", "t2")
        .limit(_PMI_TOPK)
    )


# ------------------------------------------------------------ skyline


@query(
    "pareto_frontier_parts",
    survey="ext-skyline P8 W-range A2",
    tags=("tpch", "mining"),
    oracle=pareto_frontier_sql(
        rel="(SELECT p_partkey, "
            "CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT) "
            "AS price_cents, CAST(p_size AS BIGINT) AS size_b FROM part)",
        min_col="price_cents", max_col="size_b",
        key_cols="a.p_partkey, a.price_cents, a.size_b",
    ),
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of ``part`` on (cheapest retail price, largest size):
    parts no other part beats on both axes — the multi-criteria
    "best offers" query. Dominance ties on BOTH axes keep both rows.

    Spark side is the bucketed O(n) rewrite
    (:func:`..operators.skyline.pareto_frontier_2d`: per-bucket max
    grid + value-range in-bucket windows — no pairwise stage); the
    oracle is the quadratic NOT-EXISTS DEFINITION, so the gate checks
    the rewrite against an independent derivation, same as the
    salted-top-k and scalable-SK twins."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long").alias("price_cents"),
        F.col("p_size").cast("long").alias("size_b"),
    )
    return pareto_frontier_2d(p, "price_cents", "size_b")


# ------------------------------------------------------------ triangles


@query(
    "copurchase_triangle_counts",
    survey="ext-graph J-self A2",
    tags=("graph", "mining"),
    oracle=_graph.copurchase_triangles_sql(),
)
def copurchase_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts in the SUPPORTED co-purchase graph
    (pairs co-bought in ≥2 orders) — the local clustering signal
    ("parts whose co-purchase neighborhoods are cliques") behind
    bundle detection, next to the global-importance PageRank
    (``copurchase_pagerank_top20``).

    The support cut is the scale decision, not a shortcut: one-off
    co-occurrences are ~uniform noise growing ∝ facts (1.196M pairs →
    3.9k at support 2, sf0.1), and triangle mining on the unsupported
    graph spends its wedges on noise (measured 19–31 s vs ~3 s here
    at sf0.1, same counts semantics on the graph that matters).
    Spark side is DEGREE-ORIENTED wedge counting
    (:func:`..operators.graph.triangle_counts`: orientation bounds
    wedge fan-out by O(sqrt(m)) out-degree — the celebrity-node
    defense); the oracle is the definitional a<b<c triple join, so
    the gate checks the oriented rewrite against an independent
    derivation."""
    from .advanced import _copurchase_pair_counts

    return _graph.triangle_counts(
        _graph.edges_from_pair_counts(
            _copurchase_pair_counts(spark, sf_dir), min_support=2))


# ------------------------------------------------- count-min sketch

_CMS_DEPTH = 4
_CMS_WIDTH = 64


def _cms_bucket_sql(i: int, key_sql: str) -> str:
    return (f"(('0x' || substr(md5(CAST({i} AS VARCHAR) || '|' "
            f"|| {key_sql}), 1, 8))::BIGINT) % {_CMS_WIDTH}")


@query(
    "cms_event_type_estimates",
    survey="ext-sketch A1 A2",
    tags=("events", "mining", "sketch"),
    oracle=f"""
        WITH ev AS MATERIALIZED (SELECT event_type FROM events),
        rows_ AS MATERIALIZED (
          SELECT event_type, g.i,
                 {_cms_bucket_sql("g.i", "event_type")} AS bk
          FROM ev, (SELECT unnest(generate_series(0, {_CMS_DEPTH - 1}))
                    AS i) g
        ),
        sketch AS MATERIALIZED (
          SELECT i, bk, CAST(COUNT(*) AS BIGINT) AS c
          FROM rows_ GROUP BY i, bk
        ),
        keys AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact
          FROM ev GROUP BY event_type
        ),
        probes AS (
          SELECT k.event_type, k.n_exact, g.i,
                 {_cms_bucket_sql("g.i", "k.event_type")} AS bk
          FROM keys k, (SELECT unnest(generate_series(0, {_CMS_DEPTH - 1}))
                        AS i) g
        )
        SELECT p.event_type, p.n_exact,
               CAST(MIN(s.c) AS BIGINT) AS n_est,
               CAST(MIN(s.c) - p.n_exact AS BIGINT) AS overestimate
        FROM probes p
        JOIN sketch s ON s.i = p.i AND s.bk = p.bk
        GROUP BY p.event_type, p.n_exact
    """,
)
def cms_event_type_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch accuracy audit over event types: build a
    depth×width (4×64) CMS (md5 row hashes — deterministic, no RNG
    state), then for every key report exact count, CMS estimate (min
    over rows), and the overestimate — the collision-error
    measurement that sizes (depth, width) for a production sketch,
    the same measure-don't-guess role as ``minhash_estimate_error``.

    Why a sketch at all at 100 TB: the CMS is FIXED-SIZE (d·w
    counters) and MERGEABLE — per-partition partial sketches sum,
    which is exactly what the map-side-combined groupBy((i, bk))
    computes here, so per-day/per-shard sketches OR across time
    ranges without touching raw events. The corpus pass is one
    d-way projection; everything downstream is sketch-sized
    (d·w rows) or key-sized. CMS guarantees est ≥ exact; the
    overestimate column is the audited slack."""
    d, w = _CMS_DEPTH, _CMS_WIDTH
    ev = load_table(spark, sf_dir, "events").select("event_type")

    def bk(i):
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}|"), F.col("event_type"))),
                    1, 8),
                16, 10,
            ).cast("long"),
            F.lit(w),
        )

    hashes = F.array(*[
        F.struct(F.lit(i).alias("i"), bk(i).alias("bk")) for i in range(d)
    ])
    rows = ev.select("event_type", F.explode(hashes).alias("p")).select(
        "event_type", F.col("p.i").alias("i"), F.col("p.bk").alias("bk"))
    sketch = rows.groupBy("i", "bk").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    keys = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"))
    probes = keys.select("event_type", "n_exact",
                         F.explode(hashes).alias("p")).select(
        "event_type", "n_exact",
        F.col("p.i").alias("i"), F.col("p.bk").alias("bk"))
    return (
        probes.join(F.broadcast(sketch), ["i", "bk"])
        .groupBy("event_type", "n_exact")
        .agg(F.min("c").alias("n_est"))
        .select(
            "event_type", "n_exact", "n_est",
            (F.col("n_est") - F.col("n_exact")).alias("overestimate"),
        )
    )


# --------------------------------------------------- group-wise OLS


@query(
    "nation_revenue_trend_ols",
    survey="ext-regression A3 A8",
    tags=("tpch", "mining"),
    oracle="""
        WITH monthly AS MATERIALIZED (
          SELECT n.n_name,
                 CAST(year(o.o_orderdate) * 12
                      + month(o.o_orderdate) AS BIGINT) AS m,
                 CAST(SUM(CAST(floor(o.o_totalprice * 100.0 + 0.5)
                               AS BIGINT)) AS BIGINT) AS y
          FROM orders o
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n ON n.n_nationkey = c.c_nationkey
          GROUP BY n.n_name, m
        ),
        x0 AS (SELECT MIN(m) AS m0 FROM monthly),
        pts AS (
          SELECT n_name, m - (SELECT m0 FROM x0) AS x, y FROM monthly
        ),
        sums AS (
          SELECT n_name,
                 CAST(COUNT(*) AS BIGINT) AS n_months,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM pts GROUP BY n_name
        )
        SELECT n_name, n_months,
               (CAST(n_months AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n_months AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 AS slope_cents_per_month
        FROM sums
    """,
)
def nation_revenue_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation revenue trend as a closed-form OLS slope over the
    monthly series (cents per month) — the change-over-time family
    (reference `07_change_over_time_analysis.sql`) upgraded from
    eyeballing a trend to estimating it: slope = (nΣxy − ΣxΣy) /
    (nΣx² − (Σx)²) with x = months since the corpus's first month.

    Determinism without transcendentals: every Σ is an exact BIGINT
    over integer cents and small month indices (map-side combined,
    order-independent); the slope is ONE fixed-order double
    expression over those exact sums, so both engines round
    identically. Relation sizes: the corpus collapses to a
    (nation × month) grid in one grouped pass; everything after is
    grid-sized, and the global month origin is a 1-row aggregate
    broadcast. Overflow headroom: x < 10³, y-cents < 2⁴⁰ at sf10 ⇒
    Σxy < 2⁶⁰; re-center x per epoch if a series ever spans 10³
    months."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name")
    m = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    monthly = (
        o.select("o_custkey", m.alias("m"),
                 F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
                 .cast("long").alias("cents"))
        .join(F.broadcast(c), "o_custkey")
        .join(F.broadcast(n), "c_nationkey")
        .groupBy("n_name", "m")
        .agg(F.sum("cents").alias("y"))
        # grid-sized branch point: feeds the month-origin aggregate
        # AND the points projection — unmaterialized, the orders scan
        # runs once per consumer
        .localCheckpoint(eager=True)
    )
    m0 = monthly.agg(F.min("m").alias("m0"))
    pts = monthly.crossJoin(F.broadcast(m0)).select(
        "n_name", (F.col("m") - F.col("m0")).alias("x"), "y")
    sums = pts.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_months"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        (F.col("n_months").cast("double") * F.col("sxy").cast("double")
         - F.col("sx").cast("double") * F.col("sy").cast("double"))
        / (F.col("n_months").cast("double") * F.col("sxx").cast("double")
           - F.col("sx").cast("double") * F.col("sx").cast("double"))
    )
    return sums.select("n_name", "n_months",
                       slope.alias("slope_cents_per_month"))


@query(
    "nation_revenue_seasonality",
    survey="ext-regression A3 A8 W9",
    tags=("tpch", "mining"),
    oracle="""
        WITH monthly AS MATERIALIZED (
          SELECT n.n_name,
                 CAST(month(o.o_orderdate) AS BIGINT) AS cal_month,
                 CAST(year(o.o_orderdate) * 12
                      + month(o.o_orderdate) AS BIGINT) AS m,
                 CAST(SUM(CAST(floor(o.o_totalprice * 100.0 + 0.5)
                               AS BIGINT)) AS BIGINT) AS y
          FROM orders o
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n ON n.n_nationkey = c.c_nationkey
          GROUP BY n.n_name, cal_month, m
        ),
        per_cal AS (
          SELECT n_name, cal_month,
                 CAST(COUNT(*) AS BIGINT) AS n_months,
                 CAST(SUM(y) AS BIGINT) AS sum_cents
          FROM monthly GROUP BY n_name, cal_month
        ),
        overall AS (
          SELECT n_name,
                 CAST(COUNT(*) AS BIGINT) AS n_all,
                 CAST(SUM(y) AS BIGINT) AS sum_all
          FROM monthly GROUP BY n_name
        )
        SELECT p.n_name, p.cal_month, p.n_months,
               (CAST(p.sum_cents AS DOUBLE) * CAST(o.n_all AS DOUBLE))
               / (CAST(p.n_months AS DOUBLE) * CAST(o.sum_all AS DOUBLE))
                 AS seasonal_index
        FROM per_cal p JOIN overall o ON o.n_name = p.n_name
    """,
)
def nation_revenue_seasonality(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Per-nation seasonal index by calendar month: the mean revenue
    of each calendar month divided by the nation's all-months mean —
    index > 1 marks the nation's high season. The multiplicative
    decomposition companion to ``nation_revenue_trend_ols`` (trend
    there, seasonality here), and the reference's change-over-time
    family upgraded from a monthly listing to the seasonal profile.

    Determinism: all four inputs to the index are exact BIGINTs
    (map-side-combined cent sums and month counts); the index is one
    fixed-order double expression — a ratio of two means written as
    cross-multiplied exact products, so one multiplication and one
    division per side, identical rounding on both engines. The
    corpus collapses to the (nation × year-month) grid in one
    grouped pass; the calendar profile and the normalizer are both
    grid-sized aggregates, joined on the 25-row nation key."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name")
    monthly = (
        o.select(
            "o_custkey",
            F.month("o_orderdate").cast("long").alias("cal_month"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long").alias("m"),
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
            .cast("long").alias("cents"),
        )
        .join(F.broadcast(c), "o_custkey")
        .join(F.broadcast(n), "c_nationkey")
        .groupBy("n_name", "cal_month", "m")
        .agg(F.sum("cents").alias("y"))
        # grid-sized branch point: feeds the calendar profile AND the
        # per-nation normalizer
        .localCheckpoint(eager=True)
    )
    per_cal = monthly.groupBy("n_name", "cal_month").agg(
        F.count(F.lit(1)).cast("long").alias("n_months"),
        F.sum("y").alias("sum_cents"),
    )
    overall = monthly.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.sum("y").alias("sum_all"),
    )
    idx = (
        (F.col("sum_cents").cast("double") * F.col("n_all").cast("double"))
        / (F.col("n_months").cast("double")
           * F.col("sum_all").cast("double"))
    )
    return per_cal.join(overall, "n_name").select(
        "n_name", "cal_month", "n_months", idx.alias("seasonal_index"))


# ----------------------------------------------------- trigram paths

_PATH_TOPK = 20


@query(
    "event_trigram_paths_topk",
    survey="ext-sequence W4 A3 O2",
    tags=("events", "mining"),
    oracle=f"""
        WITH t AS (
          SELECT event_type AS e1,
                 LEAD(event_type, 1) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS e2,
                 LEAD(event_type, 2) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS e3
          FROM events
        )
        SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_paths
        FROM t WHERE e3 IS NOT NULL
        GROUP BY e1, e2, e3
        ORDER BY n_paths DESC, e1, e2, e3
        LIMIT {_PATH_TOPK}
    """,
)
def event_trigram_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} length-3 event-type paths across per-user streams —
    the second-order extension of ``event_transition_matrix``
    (bigrams there, trigrams here): the sequential-pattern signal
    behind funnel discovery ("what actually precedes purchase?") and
    session-anomaly scoring, the PrefixSpan-depth-3 special case that
    stays fully declarative.

    Plan shape: ONE window pass emits both LEADs (same partition +
    order ⇒ one sort, two frame reads) partitioned by user_id —
    per-partition rows are one user's history, bounded and
    sf-independent — then a grouped count whose key space is
    |event types|³ (a constant), and sort+limit top-{k}
    (TakeOrderedAndProject). Determinism: (ts, event_id) totally
    orders each stream; (n_paths, e1, e2, e3) totally orders the
    result."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        t.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), "e1", "e2", "e3")
        .limit(_PATH_TOPK)
    )


event_trigram_paths_topk.__doc__ = event_trigram_paths_topk.__doc__.format(
    k=_PATH_TOPK)


# ------------------------------------------------ degree assortativity


@query(
    "copurchase_degree_assortativity",
    survey="ext-graph A1 J-self",
    tags=("graph", "mining"),
    oracle="""
        WITH und AS MATERIALIZED (
          SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a
          JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY src, dst HAVING COUNT(*) >= 2
        ),
        dire AS MATERIALIZED (
          SELECT src, dst FROM und
          UNION ALL SELECT dst, src FROM und
        ),
        deg AS MATERIALIZED (
          SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
          FROM dire GROUP BY src
        ),
        s AS (
          SELECT CAST(COUNT(*) AS HUGEINT) AS dd,
                 CAST(SUM(j.d) AS HUGEINT) AS s_j,
                 CAST(SUM(CAST(j.d AS HUGEINT) * k.d) AS HUGEINT) AS s_jk,
                 CAST(SUM(CAST(j.d AS HUGEINT) * j.d) AS HUGEINT) AS s_jj
          FROM dire e
          JOIN deg j ON j.node = e.src
          JOIN deg k ON k.node = e.dst
        )
        SELECT CAST(dd / 2 AS BIGINT) AS n_edges,
               CAST(s_j AS BIGINT) AS s_j,
               CAST(s_jk AS BIGINT) AS s_jk,
               CAST(s_jj AS BIGINT) AS s_jj,
               CAST(dd * s_jk - s_j * s_j AS DOUBLE)
                 / CAST(dd * s_jj - s_j * s_j AS DOUBLE) AS assortativity
        FROM s
    """,
)
def copurchase_degree_assortativity(
    spark: SparkSession, sf_dir: str,
) -> DataFrame:
    """Degree assortativity (Newman's r) of the SUPPORTED co-purchase
    graph: do well-connected parts co-sell with other hubs (r > 0)
    or with the long tail (r < 0)? The one-number structural read
    that tells you whether ``copurchase_pagerank_top20``'s hubs form
    a rich club or a hub-and-spoke catalog — disassortative graphs
    are where the celebrity-node defense in the triangle miner
    actually pays.

    Exactness: over the direction-doubled edge list, r = (D·Σjk −
    (Σj)²) / (D·Σj² − (Σj)²) with every sum an exact integer
    (degrees are counts; HUGEINT/decimal(38,0) guards the products),
    so the gate passes bit-for-bit and r is ONE final division.
    Scale shape: degrees are a grouped count on the shared pair-count
    artifact (one lineitem self-join per session,
    ``advanced._copurchase_pair_counts``), the two degree enrichments
    key on node, and the output is a 1-row aggregate."""
    from .advanced import _copurchase_pair_counts

    edges = _graph.edges_from_pair_counts(
        _copurchase_pair_counts(spark, sf_dir), min_support=2)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    dec = "decimal(38,0)"
    e = (
        edges.join(deg.withColumnRenamed("src", "node")
                   .withColumnRenamed("d", "dj"),
                   F.col("src") == F.col("node")).drop("node")
        .join(deg.select(F.col("src").alias("node2"),
                         F.col("d").alias("dk")),
              F.col("dst") == F.col("node2")).drop("node2")
    )
    s = e.agg(
        F.count(F.lit(1)).cast(dec).alias("dd"),
        F.sum("dj").cast(dec).alias("s_j"),
        F.sum(F.col("dj").cast(dec) * F.col("dk")).cast(dec).alias("s_jk"),
        F.sum(F.col("dj").cast(dec) * F.col("dj")).cast(dec).alias("s_jj"),
    )
    return s.select(
        F.expr("CAST(dd div 2 AS BIGINT)").alias("n_edges"),
        F.col("s_j").cast("long").alias("s_j"),
        F.col("s_jk").cast("long").alias("s_jk"),
        F.col("s_jj").cast("long").alias("s_jj"),
        ((F.col("dd") * F.col("s_jk") - F.col("s_j") * F.col("s_j"))
         .cast("double")
         / (F.col("dd") * F.col("s_jj") - F.col("s_j") * F.col("s_j"))
         .cast("double")).alias("assortativity"),
    )
