"""Distributional statistics and membership-sketch analytics:
market-basket association rules, a Bloom-filter semi-join audit,
revenue-concentration measures (Gini, HHI), and a Benford first-digit
conformance check.

These extend the reference's magnitude / part-to-whole families
(`/root/reference/scripts/analysis/05_magnitude_analysis.sql`,
`11_part_to_whole_analysis.sql`) with the distribution-shape and
affinity questions a warehouse grows next — who dominates a market
(concentration), what sells together (association rules), is the
ledger organic (Benford) — plus the broadcast-Bloom pruning pattern
that matters at 100 TB, audited for false-positive rate instead of
assumed.

Cross-engine determinism (registry rules): all counts and money stay
exact integers (cents; BIGINT / HUGEINT / decimal(38,0)) through every
aggregation; each ratio is ONE fixed-order double expression over
those exact values; hash bucketing is md5-derived (no RNG state, no
engine-specific hash); Benford's transcendental expectations enter as
shared correctly-rounded text literals, never an engine log10 call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

# ------------------------------------------- market-basket rules

_RULES_MIN_SUPPORT = 2
_RULES_TOPK = 50


@query(
    "basket_association_rules",
    survey="ext-mining A2 A8 O2 J-self",
    tags=("tpch", "mining"),
    oracle=f"""
        WITH baskets AS MATERIALIZED (
          SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        ),
        items AS MATERIALIZED (
          SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_item
          FROM baskets GROUP BY pk
        ),
        n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders
              FROM baskets),
        pairs AS MATERIALIZED (
          SELECT a.pk AS p1, b.pk AS p2, CAST(COUNT(*) AS BIGINT) AS n_ab
          FROM baskets a JOIN baskets b
            ON a.ok = b.ok AND a.pk < b.pk
          GROUP BY p1, p2 HAVING COUNT(*) >= {_RULES_MIN_SUPPORT}
        ),
        rules AS (
          SELECT p1 AS antecedent, p2 AS consequent, n_ab FROM pairs
          UNION ALL
          SELECT p2, p1, n_ab FROM pairs
        )
        SELECT r.antecedent, r.consequent, r.n_ab,
               ia.n_item AS n_ante,
               CAST(r.n_ab AS DOUBLE) / CAST(ia.n_item AS DOUBLE)
                 AS confidence,
               CAST(r.n_ab * (SELECT n_orders FROM n) AS DOUBLE)
                 / CAST(ia.n_item * ic.n_item AS DOUBLE) AS lift
        FROM rules r
        JOIN items ia ON ia.pk = r.antecedent
        JOIN items ic ON ic.pk = r.consequent
        ORDER BY lift DESC, antecedent, consequent
        LIMIT {_RULES_TOPK}
    """,
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} market-basket association rules over order baskets
    (A -> B where both parts ship in the same order), ranked by lift
    with per-rule confidence — the directional companion to
    ``copurchase_pagerank_top20`` / ``copurchase_triangle_counts``
    (importance and cliquishness there, "customers who bought A also
    bought B" here). Baskets are DISTINCT (order, part): a part
    listed on two lineitems of one order is one basket membership,
    so support counts orders, the textbook semantics.

    Scale shape: the basket self-join is keyed on the order key
    (per-order fan-out = C(items per order, 2), a bounded constant —
    TPC-H orders hold <=7 lineitems), and the support cut keeps only
    pairs co-bought in >=2 orders, the same noise cut the triangle
    miner uses (one-off co-occurrences grow ~uniformly with facts).
    The surviving rule set is tiny, so the item-frequency enrichment
    broadcasts the RULES side into the part-sized count relation —
    never the reverse — and the final rank is sort+limit
    (TakeOrderedAndProject), not a global window. Determinism:
    confidence and lift are each one division of exact BIGINT counts
    (lift's numerator n_ab * n_orders is exact far past any real
    corpus — see ``pmi_collocations_topk``'s overflow note), and
    (lift, antecedent, consequent) is a total order."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
    # branch point: the distinct basket relation feeds the item
    # counts, the corpus total AND both self-join sides — eagerly
    # checkpointed so the dedup shuffle runs once, not four times
    baskets = li.distinct().localCheckpoint(eager=True)
    items = baskets.groupBy("pk").agg(F.count(F.lit(1)).alias("n_item"))
    n_orders = baskets.agg(
        F.count_distinct("ok").cast("long").alias("n_orders"))
    a = baskets.select(F.col("ok"), F.col("pk").alias("p1"))
    b = baskets.select(F.col("ok"), F.col("pk").alias("p2"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _RULES_MIN_SUPPORT)
    )
    rules = pairs.select(
        F.col("p1").alias("antecedent"), F.col("p2").alias("consequent"),
        "n_ab",
    ).unionAll(pairs.select(
        F.col("p2").alias("antecedent"), F.col("p1").alias("consequent"),
        "n_ab",
    ))
    ia = items.select(F.col("pk").alias("antecedent"),
                      F.col("n_item").alias("n_ante"))
    ic = items.select(F.col("pk").alias("consequent"),
                      F.col("n_item").alias("n_cons"))
    # the post-support rule set is tiny: broadcast IT into the
    # part-sized frequency relation (twice), never the reverse
    with_ante = ia.join(F.broadcast(rules), "antecedent")
    enriched = ic.join(F.broadcast(with_ante), "consequent").crossJoin(
        F.broadcast(n_orders))
    return (
        enriched.select(
            "antecedent", "consequent", "n_ab", "n_ante",
            (F.col("n_ab").cast("double")
             / F.col("n_ante").cast("double")).alias("confidence"),
            ((F.col("n_ab") * F.col("n_orders")).cast("double")
             / (F.col("n_ante") * F.col("n_cons")).cast("double"))
            .alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "antecedent", "consequent")
        .limit(_RULES_TOPK)
    )


# ------------------------------------------- Bloom-filter join audit

_BLOOM_BITS = 2048
_BLOOM_HASHES = 3


def _bloom_bucket_sql(i_sql: str, key_sql: str) -> str:
    return (f"(('0x' || substr(md5(CAST({i_sql} AS VARCHAR) || '|' || "
            f"CAST({key_sql} AS VARCHAR)), 1, 8))::BIGINT) % {_BLOOM_BITS}")


@query(
    "bloom_semi_join_audit",
    survey="ext-sketch A1 J6 P8",
    tags=("tpch", "sketch"),
    oracle=f"""
        WITH build AS MATERIALIZED (
          SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal < 0
        ),
        bits AS MATERIALIZED (
          SELECT DISTINCT {_bloom_bucket_sql("g.i", "k")} AS bk
          FROM build,
               (SELECT unnest(generate_series(0, {_BLOOM_HASHES - 1}))
                AS i) g
        ),
        probe AS MATERIALIZED (
          SELECT DISTINCT o_custkey AS k FROM orders
        ),
        ph AS (
          SELECT p.k, g.i, {_bloom_bucket_sql("g.i", "p.k")} AS bk
          FROM probe p,
               (SELECT unnest(generate_series(0, {_BLOOM_HASHES - 1}))
                AS i) g
        ),
        hits AS (
          SELECT ph.k, CAST(COUNT(b.bk) AS BIGINT) AS n_hit
          FROM ph LEFT JOIN bits b ON b.bk = ph.bk
          GROUP BY ph.k
        ),
        audit AS (
          SELECT h.k,
                 CASE WHEN h.n_hit = {_BLOOM_HASHES} THEN 1 ELSE 0 END
                   AS bloom_pos,
                 CASE WHEN bu.k IS NULL THEN 0 ELSE 1 END AS is_member
          FROM hits h LEFT JOIN build bu ON bu.k = h.k
        )
        SELECT CAST((SELECT COUNT(*) FROM build) AS BIGINT) AS n_build,
               CAST(COUNT(*) AS BIGINT) AS n_probe,
               CAST(SUM(bloom_pos) AS BIGINT) AS n_bloom_pos,
               CAST(SUM(is_member) AS BIGINT) AS n_members,
               CAST(SUM(CASE WHEN bloom_pos = 1 AND is_member = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
               CAST(SUM(CASE WHEN bloom_pos = 1 AND is_member = 0
                             THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) - SUM(is_member) AS DOUBLE) AS fpr
        FROM audit
    """,
)
def bloom_semi_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-Bloom semi-join pruning, audited: build an m={m},
    k={k} Bloom filter over the dim-side key set (customers in
    arrears), probe every fact-side key through it, and report the
    measured false-positive rate next to the exact membership counts
    — the measure-don't-guess companion to ``cms_event_type_estimates``
    and ``minhash_estimate_error`` for the third classic sketch.

    Why this is the 100 TB join pattern: a shuffle join of fact x dim
    moves every fact row; a Bloom filter of the dim keys is FIXED-SIZE
    (m bits — here a <=m-row set-bit relation) and broadcasts to every
    executor, so the fact scan drops (1 - fpr) of the non-matching
    rows BEFORE the shuffle, at the price of fpr false survivors the
    real join later removes. This query measures that fpr for a given
    (m, k) against the exact anti-join truth, which is how you size m
    before trusting the prune. The filter is also MERGEABLE (set-bit
    union), so per-shard builds OR together without touching rows.

    Determinism: bucket indexes are md5-derived (shared text recipe
    with the oracle, same as the CMS), membership truth is an exact
    key join, and fpr is one division of exact BIGINT counts. Bloom
    soundness (a member always passes all k probes) is asserted by
    tests/test_operators.py rather than re-derived here."""
    m, kk = _BLOOM_BITS, _BLOOM_HASHES
    build = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    probe = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )

    def bk(i, key):
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}|"),
                                   key.cast("string"))),
                    1, 8),
                16, 10,
            ).cast("long"),
            F.lit(m),
        )

    def hash_rows(df):
        hashes = F.array(*[bk(i, F.col("k")).alias(f"h{i}")
                           for i in range(kk)])
        return df.select("k", F.explode(hashes).alias("bk"))

    bits = hash_rows(build).select("bk").distinct()
    hits = (
        hash_rows(probe)
        .join(F.broadcast(bits.withColumn("hit", F.lit(1))), "bk", "left")
        .groupBy("k")
        .agg(F.count("hit").alias("n_hit"))
    )
    audit = hits.join(
        F.broadcast(build.withColumn("is_m", F.lit(1))), "k", "left"
    ).select(
        F.when(F.col("n_hit") == kk, 1).otherwise(0).alias("bloom_pos"),
        F.coalesce(F.col("is_m"), F.lit(0)).alias("is_member"),
    )
    n_build = build.agg(F.count(F.lit(1)).cast("long").alias("n_build"))
    fp = F.sum(F.when((F.col("bloom_pos") == 1) & (F.col("is_member") == 0),
                      1).otherwise(0)).cast("long")
    return (
        audit.agg(
            F.count(F.lit(1)).cast("long").alias("n_probe"),
            F.sum("bloom_pos").cast("long").alias("n_bloom_pos"),
            F.sum("is_member").cast("long").alias("n_members"),
            fp.alias("n_false_pos"),
        )
        .crossJoin(F.broadcast(n_build))
        .select(
            "n_build", "n_probe", "n_bloom_pos", "n_members", "n_false_pos",
            (F.col("n_false_pos").cast("double")
             / (F.col("n_probe") - F.col("n_members")).cast("double"))
            .alias("fpr"),
        )
    )


# --------------------------------------------- concentration: Gini


@query(
    "nation_revenue_gini",
    survey="ext-stats A3 A8 W1",
    tags=("tpch", "stats"),
    oracle="""
        WITH rev AS MATERIALIZED (
          SELECT o_custkey,
                 CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5)
                               AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY o_custkey
        ),
        byn AS MATERIALIZED (
          SELECT n.n_name, r.o_custkey, r.cents
          FROM rev r
          JOIN customer c ON c.c_custkey = r.o_custkey
          JOIN nation n ON n.n_nationkey = c.c_nationkey
        ),
        ranked AS (
          SELECT n_name, cents,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY n_name ORDER BY cents, o_custkey
                 ) AS BIGINT) AS i
          FROM byn
        ),
        sums AS (
          SELECT n_name,
                 CAST(COUNT(*) AS BIGINT) AS n_customers,
                 CAST(SUM(cents) AS BIGINT) AS sum_cents,
                 SUM(CAST(i AS HUGEINT) * cents) AS siy
          FROM ranked GROUP BY n_name
        )
        SELECT n_name, n_customers, sum_cents,
               CAST(2 * siy - (CAST(n_customers AS HUGEINT) + 1)
                              * sum_cents AS DOUBLE)
                 / CAST(CAST(n_customers AS HUGEINT) * sum_cents
                        AS DOUBLE) AS gini
        FROM sums
    """,
)
def nation_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue inside each nation — the
    inequality measure behind "is this market a few whales or a broad
    base", extending the reference's magnitude family
    (`05_magnitude_analysis.sql`) from totals to distribution shape.
    Closed form over the ascending-ranked series: G = (2*SUM(i*y_i)
    - (n+1)*SUM(y)) / (n*SUM(y)).

    Scale shape: the corpus collapses to one row per active customer
    in a single grouped pass; the rank window runs over that
    AGGREGATE (per-nation partitions of customer counts, not order
    counts — and the two-level range-bucket rewrite proven in
    ``operators/skew.scalable_row_number`` applies verbatim if even
    that aggregate outgrows a partition). Determinism: (cents,
    o_custkey) totally orders each partition; SUM(i*y) is exact
    integer arithmetic on both engines (HUGEINT there, decimal(38,0)
    here — i*y reaches ~2^63 once a nation holds ~10M customers, so
    64-bit is NOT enough headroom at target scale); the final G is
    one division of two exact integers, each rounded to the nearest
    double identically by both engines."""
    rev = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey",
                F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
                .cast("long").alias("cents"))
        .groupBy("o_custkey")
        .agg(F.sum("cents").alias("cents"))
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name")
    byn = rev.join(F.broadcast(c), "o_custkey").join(
        F.broadcast(n), "c_nationkey")
    w = Window.partitionBy("n_name").orderBy("cents", "o_custkey")
    ranked = byn.select(
        "n_name", "cents",
        F.row_number().over(w).cast("long").alias("i"))
    sums = ranked.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").alias("sum_cents"),
        F.sum(F.col("i").cast("decimal(19,0)")
              * F.col("cents").cast("decimal(19,0)")).alias("siy"),
    )
    nc = F.col("n_customers").cast("decimal(38,0)")
    sy = F.col("sum_cents").cast("decimal(38,0)")
    gini = (
        (F.lit(2).cast("decimal(38,0)") * F.col("siy")
         - (nc + F.lit(1)) * sy).cast("double")
        / (nc * sy).cast("double")
    )
    return sums.select("n_name", "n_customers", "sum_cents",
                       gini.alias("gini"))


# ----------------------------------------------- Benford audit

# log10(1 + 1/d) for d = 1..9 as correctly-rounded text literals —
# shared verbatim with the oracle (CAST('...' AS DOUBLE) there, a
# Python float literal here) so no engine evaluates a transcendental.
_BENFORD = {
    1: "0.3010299956639812", 2: "0.17609125905568124",
    3: "0.12493873660829992", 4: "0.09691001300805642",
    5: "0.07918124604762482", 6: "0.06694678963061322",
    7: "0.05799194697768673", 8: "0.05115252244738129",
    9: "0.04575749056067514",
}

_BENFORD_CASE_SQL = "CASE digit " + " ".join(
    f"WHEN {d} THEN CAST('{p}' AS DOUBLE)" for d, p in _BENFORD.items()
) + " END"


@query(
    "benford_first_digit_audit",
    survey="ext-stats A4 A8",
    tags=("tpch", "stats", "quality"),
    oracle=f"""
        WITH cents AS (
          SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v
          FROM orders
        ),
        d AS MATERIALIZED (
          SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                 CAST(COUNT(*) AS BIGINT) AS n_orders
          FROM cents GROUP BY digit
        )
        SELECT digit, n_orders,
               CAST(n_orders AS DOUBLE)
                 / CAST(SUM(n_orders) OVER () AS DOUBLE) AS share,
               {_BENFORD_CASE_SQL} AS expected_share
        FROM d
    """,
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit (Benford's law) conformance audit over order
    totals: observed share of each leading digit next to the Benford
    expectation log10(1 + 1/d) — the classic ledger-forensics /
    synthetic-data smell test (organic monetary amounts follow
    Benford; fabricated or clamped ones don't). TPC-H prices are
    uniform-ish, so the DELTA itself is the finding — the audit's
    job is to measure, not to assume.

    Scale shape: one map-side-combined 9-group aggregate over the
    fact scan; the normalizing SUM() OVER () runs on the 9-row
    aggregate (the W9 grand-total rewrite, never a fact-sized
    window). Determinism: the leading digit is string-of-integer
    arithmetic (no float formatting); share is one division of exact
    BIGINTs; the expectations are shared correctly-rounded TEXT
    literals — DuckDB CASTs the same string to double that Python
    parsed for F.lit, so neither engine computes a log10."""
    cents = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long").alias("v"))
    d = cents.select(
        F.substring(F.col("v").cast("string"), 1, 1).cast("long")
        .alias("digit")
    ).groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    expected = F.create_map(*[
        x for dd, p in _BENFORD.items()
        for x in (F.lit(dd).cast("long"), F.lit(float(p)))
    ])[F.col("digit")]
    return d.select(
        "digit", "n_orders",
        (F.col("n_orders").cast("double")
         / F.sum("n_orders").over(Window.partitionBy()).cast("double"))
        .alias("share"),
        expected.alias("expected_share"),
    )


# --------------------------------------------- concentration: HHI


@query(
    "nation_brand_revenue_hhi",
    survey="ext-stats A3 A8 J4 J5",
    tags=("tpch", "stats"),
    oracle="""
        WITH rev AS MATERIALIZED (
          SELECT n.n_name, p.p_brand,
                 CAST(SUM(CAST(floor(l.l_extendedprice * 100.0 + 0.5)
                               AS BIGINT)) AS BIGINT) AS cents
          FROM lineitem l
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n ON n.n_nationkey = c.c_nationkey
          JOIN part p ON p.p_partkey = l.l_partkey
          GROUP BY n.n_name, p.p_brand
        )
        SELECT n_name,
               CAST(COUNT(*) AS BIGINT) AS n_brands,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DOUBLE)
                 / (CAST(SUM(cents) AS DOUBLE)
                    * CAST(SUM(cents) AS DOUBLE)) AS hhi
        FROM rev GROUP BY n_name
    """,
)
def nation_brand_revenue_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of brand revenue inside each
    nation: HHI = SUM(share_b^2) = SUM(cents_b^2) / (SUM(cents_b))^2
    — the market-concentration measure regulators use (1/n_brands =
    perfectly even, 1.0 = monopoly), the per-segment companion to the
    customer-side ``nation_revenue_gini``. HHI is chosen over Shannon
    entropy deliberately: it is RATIONAL in the exact integer revenue
    totals (no engine log), per the registry's determinism rules.

    Scale shape: one fact pass collapses to the (nation x brand)
    grid (the dims broadcast into the fact scan; on a cluster where
    customer/part outgrow broadcast, both joins shuffle on their
    keys and the grouped aggregate is still map-side combined); every
    later stage is grid-sized. SUM(cents^2) is kept exact past 64-bit
    (HUGEINT / decimal(38,0) — brand-level cents reach ~2^42 at
    100 TB, so squares need ~2^84); hhi is one division whose
    operands are identical exact integers on both engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey",
        F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long").alias("cents"))
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name")
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand")
    grid = (
        li.join(o, "l_orderkey")
        .join(F.broadcast(c), "o_custkey")
        .join(F.broadcast(n), "c_nationkey")
        .join(F.broadcast(p), "l_partkey")
        .groupBy("n_name", "p_brand")
        .agg(F.sum("cents").alias("cents"))
    )
    sums = grid.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_brands"),
        F.sum("cents").alias("total_cents"),
        F.sum(F.col("cents").cast("decimal(19,0)")
              * F.col("cents").cast("decimal(19,0)")).alias("ssq"),
    )
    t = F.col("total_cents").cast("double")
    return sums.select(
        "n_name", "n_brands", "total_cents",
        (F.col("ssq").cast("double") / (t * t)).alias("hhi"),
    )


# --------------------------------------------- graph: 2-hop reach


@query(
    "copurchase_2hop_reach",
    survey="ext-graph A2 J-self P9",
    tags=("graph", "mining"),
    oracle="""
        WITH und AS MATERIALIZED (
          SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a
          JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY src, dst HAVING COUNT(*) >= 2
        ),
        sym AS MATERIALIZED (
          SELECT src, dst FROM und
          UNION ALL SELECT dst, src FROM und
        ),
        reach AS (
          SELECT src, dst FROM sym
          UNION
          SELECT a.src, b.dst
          FROM sym a JOIN sym b ON b.src = a.dst
          WHERE b.dst <> a.src
        )
        SELECT src AS part_id, CAST(COUNT(*) AS BIGINT) AS n_reach
        FROM reach GROUP BY src
    """,
)
def copurchase_2hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct parts reachable within <=2 hops of each part in the
    SUPPORTED co-purchase graph — the neighborhood-size signal behind
    "how far does a substitution/bundle effect propagate", completing
    the graph family (global importance = PageRank, local density =
    triangles, reach = this). Reuses the session-cached pair-count
    artifact (one lineitem self-join per corpus snapshot,
    ``advanced._copurchase_pair_counts``) at the same support-2 cut
    as the triangle miner and for the same reason: unsupported
    one-off edges are volume-proportional noise.

    Scale shape: the 2-hop expansion is one self-join of the
    supported edge relation keyed on the middle vertex — fan-out
    bounded by the supported graph's degree distribution, the graph
    itself orders smaller than the fact table (3.9k edges from 600k
    facts at sf0.1) — then a distinct + grouped count. The UNION's
    dedup is the only wide exchange and it runs on path pairs, never
    on facts. Determinism: pure integer set semantics, no scores."""
    from ..operators import graph as _graph
    from .advanced import _copurchase_pair_counts

    sym = _graph.edges_from_pair_counts(
        _copurchase_pair_counts(spark, sf_dir), min_support=2)
    a = sym.select(F.col("src"), F.col("dst").alias("mid"))
    b = sym.select(F.col("src").alias("mid"), F.col("dst"))
    two = a.join(b, "mid").filter(F.col("dst") != F.col("src")).select(
        "src", "dst")
    return (
        sym.select("src", "dst").union(two).distinct()
        .groupBy("src").agg(F.count(F.lit(1)).alias("n_reach"))
        .select(F.col("src").alias("part_id"), "n_reach")
    )


# ------------------------------ per-language calibrated filtering


@query(
    "lang_calibrated_length_filter",
    survey="ext-curation A2 A4 W6",
    tags=("llmops", "curation"),
    oracle="""
        WITH grid AS MATERIALIZED (
          SELECT lang, n_chars, CAST(COUNT(*) AS BIGINT) AS n
          FROM documents GROUP BY lang, n_chars
        ),
        cum AS (
          SELECT lang, n_chars,
                 CAST(COALESCE(SUM(n) OVER (
                   PARTITION BY lang ORDER BY n_chars
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT) AS n_below,
                 CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
        FROM grid
        )
        SELECT d.doc_id, d.lang, d.n_chars,
               CAST(CASE WHEN c.n_below * 10 >= c.n_lang
                         THEN 1 ELSE 0 END AS INTEGER) AS keep_flag
        FROM documents d
        JOIN cum c ON c.lang = d.lang AND c.n_chars = d.n_chars
    """,
)
def lang_calibrated_length_filter(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Per-language calibrated length filtering: drop each language's
    bottom length decile (docs with fewer than 10% of same-language
    docs strictly shorter) instead of one global cutoff — the
    Gopher-style per-language threshold calibration that keeps a
    short-form language from being wiped out by a threshold tuned on
    a long-form one. ``keep_flag`` is the curation verdict column
    the downstream pack/shard queries consume.

    Scale shape — deliberately NOT a doc-level percent_rank window
    (a window PARTITIONed BY lang has ~corpus/n_langs rows per
    partition, the exact global-window hazard the scalable-SK work
    retired): the corpus collapses to the (lang x n_chars) GRID in
    one grouped pass, both windows (running count below, language
    total) run over that grid, and the verdict joins back to docs by
    (lang, n_chars) — a broadcast of the grid, so the second corpus
    pass is map-only. Determinism: the decile test is pure integer
    arithmetic (n_below * 10 >= n_lang), no division at all."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    grid = docs.groupBy("lang", "n_chars").agg(
        F.count(F.lit(1)).alias("n"))
    w_run = (Window.partitionBy("lang").orderBy("n_chars")
             .rowsBetween(Window.unboundedPreceding, -1))
    w_all = Window.partitionBy("lang")
    cum = grid.select(
        "lang", "n_chars",
        F.coalesce(F.sum("n").over(w_run), F.lit(0)).alias("n_below"),
        F.sum("n").over(w_all).alias("n_lang"),
    )
    return docs.join(F.broadcast(cum), ["lang", "n_chars"]).select(
        "doc_id", "lang", "n_chars",
        F.when(F.col("n_below") * 10 >= F.col("n_lang"), 1).otherwise(0)
        .cast("int").alias("keep_flag"),
    )


# ---------------------------- weighted systematic sample (scalable)

_SAMPLE_PER_NATION = 20
_SAMPLE_BUCKET_WIDTH = 8192


@query(
    "nation_weighted_systematic_sample",
    survey="ext-sampling A3 W6 P8",
    tags=("tpch", "sampling"),
    oracle=f"""
        WITH o AS MATERIALIZED (
          SELECT n.n_name, o.o_orderkey,
                 CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
                   AS cents
          FROM orders o
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n ON n.n_nationkey = c.c_nationkey
        ),
        cum AS (
          SELECT n_name, o_orderkey, cents,
                 CAST(SUM(cents) OVER (
                   PARTITION BY n_name ORDER BY o_orderkey
                 ) AS BIGINT) AS cum_cents,
                 CAST(SUM(cents) OVER (PARTITION BY n_name) AS BIGINT)
                   AS total_cents
          FROM o
        )
        SELECT n_name, o_orderkey, cents, cum_cents
        FROM (SELECT *, GREATEST(total_cents // {_SAMPLE_PER_NATION}, 1)
                          AS step FROM cum)
        WHERE cum_cents // step > (cum_cents - cents) // step
    """,
)
def nation_weighted_systematic_sample(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Weighted systematic sample of ~{k} orders per nation with
    inclusion probability proportional to order value: lay the orders
    end-to-end on a per-nation money axis (integer-cent cumulative
    sum in o_orderkey order) and take the order straddling every
    (total/{k})-cent boundary — the deterministic PPS (probability-
    proportional-to-size) sampler a training-data pipeline uses to
    draw token-budget-weighted shard audits without RNG state.

    Scale shape — the running sum is TWO-LEVEL, not a per-nation
    window over raw orders (that partition holds ~corpus/25 rows, the
    global-window hazard): orders land in fixed-width o_orderkey
    buckets; an in-bucket cumsum windows over <={w} rows; per-nation
    bucket subtotals (grid-sized) window once for prefix offsets and
    broadcast back; cum = offset + in-bucket. Boundary-crossing
    selection is pure integer division ((cum div step) >
    ((cum-cents) div step)), so every boundary selects EXACTLY one
    order, ties impossible. The oracle is the definitional
    single-window form — the gate proves the two-level rewrite, the
    same twin pattern as ``scalable_row_number`` / the skyline.
    Determinism: all integers; no doubles anywhere."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long").alias("cents"))
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name")
    rows = (
        o.join(F.broadcast(c), "o_custkey")
        .join(F.broadcast(n), "c_nationkey")
        .select("n_name", "o_orderkey", "cents",
                (F.col("o_orderkey") / F.lit(_SAMPLE_BUCKET_WIDTH))
                .cast("long").alias("bkt"))
        # branch point: the 4-integer-column projection feeds the
        # in-bucket window, the bucket subtotals AND the nation
        # totals — checkpointed so the joins scan orders once
        .localCheckpoint(eager=True)
    )
    w_in = (Window.partitionBy("n_name", "bkt").orderBy("o_orderkey")
            .rowsBetween(Window.unboundedPreceding, 0))
    in_bucket = rows.select(
        "n_name", "o_orderkey", "cents", "bkt",
        F.sum("cents").over(w_in).alias("c_in"))
    w_pre = (Window.partitionBy("n_name").orderBy("bkt")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (
        rows.groupBy("n_name", "bkt").agg(F.sum("cents").alias("c_bkt"))
        .select("n_name", "bkt",
                F.coalesce(F.sum("c_bkt").over(w_pre), F.lit(0))
                .alias("offset"))
    )
    totals = rows.groupBy("n_name").agg(
        F.sum("cents").alias("total_cents"))
    step = F.greatest(
        F.expr(f"total_cents div {_SAMPLE_PER_NATION}"), F.lit(1))
    cum = (
        in_bucket.join(F.broadcast(offsets), ["n_name", "bkt"])
        .withColumn("cum_cents", F.col("offset") + F.col("c_in"))
        .join(F.broadcast(totals), "n_name")
        .withColumn("step", step)
    )
    return cum.filter(
        F.expr("cum_cents div step") > F.expr("(cum_cents - cents) div step")
    ).select("n_name", "o_orderkey", "cents", "cum_cents")


# --------------------------------------------- grouped correlation


@query(
    "brand_qty_price_correlation",
    survey="ext-stats A2 A8",
    tags=("tpch", "stats"),
    oracle="""
        WITH pts AS (
          SELECT p.p_brand,
                 CAST(l.l_quantity AS BIGINT) AS x,
                 CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        ),
        sums AS (
          SELECT p_brand,
                 CAST(COUNT(*) AS BIGINT) AS n_items,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 SUM(CAST(x AS HUGEINT) * y) AS sxy,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx,
                 SUM(CAST(y AS HUGEINT) * y) AS syy
          FROM pts GROUP BY p_brand
        )
        SELECT p_brand, n_items,
               (CAST(n_items AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / sqrt((CAST(n_items AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n_items AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                 AS pearson_r
        FROM sums
    """,
)
def brand_qty_price_correlation(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Per-brand Pearson correlation between line quantity and line
    price (cents), in closed form over exact integer sums:
    r = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2)) —
    the grouped-correlation primitive behind "which brand's pricing
    actually tracks volume", extending the OLS
    trend family (``nation_revenue_trend_ols``) from slope to
    association strength.

    Determinism without engine corr(): every S is an exact integer
    (HUGEINT / decimal(38,0) — Syy sums squares of ~2^40-cent values,
    far past 64-bit at scale) aggregated with map-side combine
    (order-free); r is ONE fixed-order double expression over those
    exact sums, and sqrt is IEEE correctly-rounded (the one safe
    transcendental — see the verify notes), so both engines round
    identically. Relation sizes: one fact pass collapses to a
    brand-sized sums grid (the brand lookup broadcasts into the fact
    scan); everything after is grid-sized."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long").alias("y"),
    )
    pp = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand")
    pts = li.join(F.broadcast(pp), "l_partkey")
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    sums = pts.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
    )
    n = F.col("n_items").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    r = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy))
    return sums.select("p_brand", "n_items", r.alias("pearson_r"))


# --------------------------------------------- CUSUM change point


@query(
    "nation_revenue_changepoint",
    survey="ext-stats A3 W6",
    tags=("tpch", "stats", "mining"),
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
        cum AS (
          SELECT n_name, m,
                 CAST(ROW_NUMBER() OVER w AS BIGINT) AS k,
                 CAST(SUM(y) OVER w AS BIGINT) AS prefix,
                 CAST(COUNT(*) OVER (PARTITION BY n_name) AS BIGINT)
                   AS n_months,
                 CAST(SUM(y) OVER (PARTITION BY n_name) AS BIGINT)
                   AS total
          FROM monthly
          WINDOW w AS (PARTITION BY n_name ORDER BY m
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        stat AS (
          SELECT n_name, m, n_months,
                 abs(n_months * prefix - k * total) AS cusum_stat
          FROM cum
        ),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name
                      ORDER BY cusum_stat DESC, m) AS rn
          FROM stat
        )
        SELECT n_name, n_months, m AS cp_month,
               CAST(cusum_stat AS BIGINT) AS cusum_stat
        FROM ranked WHERE rn = 1
    """,
)
def nation_revenue_changepoint(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Single change-point detection on each nation's monthly revenue
    series via the integer CUSUM statistic: the month k maximizing
    |n*prefix_k - k*total| — the scaled form of the classic
    max-|cumulative deviation from mean| test (multiply CUSUM_k =
    prefix_k - k*mean by n and every quantity is an EXACT integer, so
    the argmax is decided on exact arithmetic, never a float margin).
    The structural-break companion to trend (OLS slope) and season
    (seasonal index) over the same monthly grid.

    Scale shape: the corpus collapses to the (nation x month) grid in
    one grouped pass; the prefix/total windows and the argmax rank
    all run over that grid (<= ~10^3 rows per nation after decades of
    data). Overflow: n_months < 2^10, prefix-cents < 2^45 => the stat
    stays under 2^55 — BIGINT-exact on both engines. Tie-break:
    earliest month."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name")
    monthly = (
        o.select("o_custkey",
                 (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
                 .cast("long").alias("m"),
                 F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
                 .cast("long").alias("cents"))
        .join(F.broadcast(c), "o_custkey")
        .join(F.broadcast(n), "c_nationkey")
        .groupBy("n_name", "m")
        .agg(F.sum("cents").alias("y"))
    )
    w = (Window.partitionBy("n_name").orderBy("m")
         .rowsBetween(Window.unboundedPreceding, 0))
    wa = Window.partitionBy("n_name")
    cum = monthly.select(
        "n_name", "m",
        F.row_number().over(Window.partitionBy("n_name").orderBy("m"))
        .cast("long").alias("k"),
        F.sum("y").over(w).alias("prefix"),
        F.count(F.lit(1)).over(wa).cast("long").alias("n_months"),
        F.sum("y").over(wa).alias("total"),
    )
    stat = cum.select(
        "n_name", "m", "n_months",
        F.abs(F.col("n_months") * F.col("prefix")
              - F.col("k") * F.col("total")).alias("cusum_stat"),
    )
    best = stat.groupBy("n_name").agg(
        F.max(F.struct(F.col("cusum_stat"), (-F.col("m")).alias("neg_m"),
                       F.col("n_months"))).alias("b"))
    return best.select(
        "n_name",
        F.col("b.n_months").alias("n_months"),
        (-F.col("b.neg_m")).alias("cp_month"),
        F.col("b.cusum_stat").alias("cusum_stat"),
    )


# --------------------------------------- time-weighted average


@query(
    "user_value_twap",
    survey="ext-timeseries ext-stats A2 W4 A8",
    tags=("events", "stats", "timeseries"),
    oracle="""
        WITH pts AS MATERIALIZED (
          SELECT user_id,
                 epoch_us(ts) AS t,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
                 LEAD(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS t_next
          FROM events
        ),
        segs AS (
          SELECT user_id, cents, t_next - t AS dur_us
          FROM pts WHERE t_next IS NOT NULL
        ),
        sums AS (
          SELECT user_id,
                 CAST(COUNT(*) AS BIGINT) AS n_segments,
                 CAST(SUM(dur_us) AS BIGINT) AS span_us,
                 SUM(CAST(cents AS HUGEINT) * dur_us) AS area
          FROM segs GROUP BY user_id
        )
        SELECT user_id, n_segments, span_us,
               CAST(area AS DOUBLE) / CAST(span_us AS DOUBLE)
                 AS twap_cents
        FROM sums WHERE span_us > 0
    """,
)
def user_value_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-WEIGHTED average event value (TimescaleDB's
    ``time_weight`` with last-observation-carried-forward
    interpolation): each observation holds until the user's next
    event, so the mean weights every value by how long it was in
    force — the correct average for irregularly-sampled series
    (a plain AVG over-weights busy periods), and the hypertable-
    rollup primitive the reference's change-over-time family grows
    into.

    Scale shape: one LEAD window PARTITIONed BY user_id (per-user
    event counts — bounded, the same W4 shape as the silver
    end-dating pipeline), then a map-side-combined grouped sum; no
    corpus-sized window or join anywhere. Determinism: timestamps
    enter as exact epoch-MICROSECOND integers (Spark unix_micros ==
    DuckDB epoch_us — both truncate the parquet value identically),
    values as exact cents; the value x duration areas sum exactly
    (HUGEINT / decimal(38,0) — cents x a year of microseconds is
    ~2^58 per segment, so 64-bit headroom runs out at ~32 segments);
    twap is ONE division of two exact integers. Zero-span users
    (single event or all-same-timestamp) are excluded rather than
    divided by zero — both engines would disagree on inf/NULL."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.unix_micros(F.col("ts")).alias("t"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pts = e.select(
        "user_id", "cents", "t",
        F.lead("t").over(w).alias("t_next"),
    )
    segs = pts.filter(F.col("t_next").isNotNull()).select(
        "user_id", "cents", (F.col("t_next") - F.col("t")).alias("dur_us"))
    sums = segs.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("dur_us").alias("span_us"),
        F.sum(F.col("cents").cast("decimal(19,0)")
              * F.col("dur_us").cast("decimal(19,0)")).alias("area"),
    )
    return sums.filter(F.col("span_us") > 0).select(
        "user_id", "n_segments", "span_us",
        (F.col("area").cast("double") / F.col("span_us").cast("double"))
        .alias("twap_cents"),
    )


# ----------------------------------- hierarchical part-to-whole


@query(
    "region_nation_revenue_shares",
    survey="ext-stats A3 W9 J1",
    tags=("tpch", "stats"),
    oracle="""
        WITH rev AS MATERIALIZED (
          SELECT r.r_name, n.n_name,
                 CAST(SUM(CAST(floor(o.o_totalprice * 100.0 + 0.5)
                               AS BIGINT)) AS BIGINT) AS cents
          FROM orders o
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n ON n.n_nationkey = c.c_nationkey
          JOIN region r ON r.r_regionkey = n.n_regionkey
          GROUP BY r.r_name, n.n_name
        )
        SELECT r_name, n_name, cents,
               CAST(cents AS DOUBLE)
                 / CAST(SUM(cents) OVER (PARTITION BY r_name) AS DOUBLE)
                 AS share_in_region,
               CAST(SUM(cents) OVER (PARTITION BY r_name) AS DOUBLE)
                 / CAST(SUM(cents) OVER () AS DOUBLE)
                 AS region_share_global
        FROM rev
    """,
)
def region_nation_revenue_shares(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Hierarchical part-to-whole: each nation's share of its REGION
    next to the region's share of the WORLD — the two-level rollup
    behind every drill-down revenue dashboard, extending the
    reference's single-level part-to-whole
    (`/root/reference/scripts/analysis/11_part_to_whole_analysis.sql`,
    the Q11 family) to a hierarchy in one pass.

    Scale shape: the fact collapses to the (region x nation) grid in
    one grouped pass (dims broadcast); BOTH share windows — the
    per-region subtotal and the grand total — run over that ~25-row
    grid, the W9 rewrite applied twice. Determinism: each share is
    one division of exact BIGINT cent sums."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name",
        "n_regionkey")
    r = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("n_regionkey"), "r_name")
    rev = (
        o.select("o_custkey",
                 F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
                 .cast("long").alias("cents"))
        .join(F.broadcast(c), "o_custkey")
        .join(F.broadcast(n), "c_nationkey")
        .join(F.broadcast(r), "n_regionkey")
        .groupBy("r_name", "n_name")
        .agg(F.sum("cents").alias("cents"))
    )
    w_region = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    return rev.select(
        "r_name", "n_name", "cents",
        (F.col("cents").cast("double")
         / F.sum("cents").over(w_region).cast("double"))
        .alias("share_in_region"),
        (F.sum("cents").over(w_region).cast("double")
         / F.sum("cents").over(w_all).cast("double"))
        .alias("region_share_global"),
    )


# --------------------------------------------- KMV distinct sketch

_KMV_K = 64


@query(
    "kmv_distinct_users_estimate",
    survey="ext-sketch A1 O2",
    tags=("events", "stats", "sketch"),
    oracle=f"""
        WITH hashed AS MATERIALIZED (
          SELECT DISTINCT
                 ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                   ::BIGINT AS h
          FROM events
        ),
        kth AS (
          SELECT CAST(MAX(h) AS BIGINT) AS h_k,
                 CAST(COUNT(*) AS BIGINT) AS kn
          FROM (SELECT h FROM hashed ORDER BY h LIMIT {_KMV_K})
        ),
        exact AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM hashed
        )
        SELECT exact.n_exact, kth.h_k AS kth_min_hash,
               CASE WHEN kth.kn < {_KMV_K} THEN CAST(kth.kn AS DOUBLE)
                    ELSE CAST({_KMV_K - 1} AS DOUBLE)
                         * (CAST(1152921504606846976 AS DOUBLE)
                            / CAST(kth.h_k AS DOUBLE))
               END AS n_est
        FROM exact CROSS JOIN kth
    """,
)
def kmv_distinct_users_estimate(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch, audited against the
    exact count — the fourth classic sketch measured in this repo
    (CMS for frequencies, MinHash for similarity, Bloom for
    membership, KMV for cardinality): hash every user id into the
    60-bit space [0, 2^60), keep the K = {k} smallest DISTINCT hash
    values, and estimate |users| = (K-1) / R where R = h_K / 2^60 is
    the fraction of hash space the K minima span (Bar-Yossef et al.
    2002). The sketch is K values — FIXED-SIZE and MERGEABLE (union
    the minima, re-take the K smallest), which is why per-shard
    cardinality sketches combine without a COUNT(DISTINCT) shuffle.

    Why audit instead of approx_count_distinct: Spark's HLL++ and any
    other engine's HLL disagree in implementation (the registered
    ``approx_distinct_users`` is rows-only for exactly that reason) —
    KMV's estimate is a PURE FUNCTION of md5 values, so this sketch
    hash-gates bit-for-bit cross-engine, estimate included.

    Scale shape: one distinct-projection of the key column, then the
    K smallest via sort+limit (TakeOrderedAndProject — per-partition
    top-K + driver merge of K·partitions values, never a global
    sort); the estimate is arithmetic on a 1-row relation.
    Determinism: h_K is an exact integer; the estimate is a
    fixed-order double expression ((K-1) * (2^60 / h_K)) over exact
    operands — 2^60 = 1152921504606846976 is exactly representable.
    Degenerate case (|keys| < K, e.g. the sf0.001 smoke corpus's 15
    users): the sketch holds EVERY value, so the estimate is the
    exact count — the standard KMV convention, encoded identically
    on both sides."""
    k = _KMV_K
    hashed = (
        load_table(spark, sf_dir, "events")
        .select(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16, 10,
            ).cast("long").alias("h")
        )
        .distinct()
        # branch point: feeds the exact count AND the k-th minimum
        .localCheckpoint(eager=True)
    )
    kth = hashed.orderBy("h").limit(k).agg(
        F.max("h").alias("kth_min_hash"),
        F.count(F.lit(1)).cast("long").alias("kn"))
    exact = hashed.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    est = F.when(
        F.col("kn") < k, F.col("kn").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        * (F.lit(1152921504606846976.0)
           / F.col("kth_min_hash").cast("double"))
    )
    return exact.crossJoin(F.broadcast(kth)).select(
        "n_exact", "kth_min_hash", est.alias("n_est"))


# --------------------------------------- linear-interpolation gapfill


@query(
    "events_hourly_interpolate",
    survey="ext-timeseries A4 W-none",
    tags=("events", "stats", "timeseries"),
    oracle="""
        WITH bounds AS (
          SELECT date_trunc('hour', MIN(ts)) AS t0,
                 date_trunc('hour', MAX(ts)) AS t1
          FROM events
        ),
        grid AS (
          SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR))
                   AS hour_start
          FROM bounds
        ),
        agg AS (
          SELECT date_trunc('hour', ts) AS hour_start,
                 CAST(SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
                      AS BIGINT) AS v_micros
          FROM events
          WHERE event_type = 'purchase' AND value > 18.0
          GROUP BY 1
        ),
        spine AS (
          SELECT g.hour_start,
                 epoch_us(g.hour_start) // 3600000000 AS h,
                 a.v_micros
          FROM grid g LEFT JOIN agg a USING (hour_start)
        ),
        ctx AS (
          SELECT hour_start, h, v_micros,
                 last_value(v_micros IGNORE NULLS) OVER past AS prev_v,
                 last_value(CASE WHEN v_micros IS NOT NULL THEN h END
                            IGNORE NULLS) OVER past AS prev_h,
                 first_value(v_micros IGNORE NULLS) OVER fut AS next_v,
                 first_value(CASE WHEN v_micros IS NOT NULL THEN h END
                             IGNORE NULLS) OVER fut AS next_h
          FROM spine
          WINDOW past AS (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW),
                 fut AS (ORDER BY h ROWS BETWEEN CURRENT ROW
                         AND UNBOUNDED FOLLOWING)
        )
        SELECT hour_start,
               v_micros IS NULL AS was_gap,
               CASE
                 WHEN prev_h IS NULL OR next_h IS NULL THEN NULL
                 WHEN next_h = prev_h
                   THEN CAST(prev_v AS DOUBLE) / 1000000.0
                 ELSE (CAST(prev_v * (next_h - h)
                            + next_v * (h - prev_h) AS DOUBLE)
                       / CAST(next_h - prev_h AS DOUBLE)) / 1000000.0
               END AS interp_value
        FROM ctx
    """,
)
def events_hourly_interpolate(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Gap-fill by LINEAR INTERPOLATION — the TimescaleDB
    ``interpolate()`` companion to ``events_hourly_locf`` (same dense
    hourly grid, same sparse series — step-hold there, straight line
    between the surrounding observations here; leading/trailing gaps
    stay NULL rather than extrapolate). The right fill for
    rate-like series where a gap means "not measured", not "still
    the old value".

    Scale shape: identical to the LOCF twin — the four context
    windows (previous/next observed hour and value) run over the
    GRID (span hours, aggregate-sized), never over raw events; the
    same month-partition + boundary-row carry applies if the span
    ever outgrows a partition. Determinism: hours enter as exact
    epoch-hour integers, values as exact micro-units; the
    interpolation is one fixed-order rational expression
    (v0*(h1-h) + v1*(h-h0)) / (h1-h0) over exact BIGINTs (micros
    ~2^40 x span-hours < 2^17 stays far under 2^63), divided once."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = bounds.select(
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR")))
        .alias("hour_start")
    )
    agg = (
        e.filter((F.col("event_type") == "purchase")
                 & (F.col("value") > 18.0))
        .groupBy(F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(F.sum(F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5))
                   .cast("long")).alias("v_micros"))
    )
    spine = grid.join(agg, "hour_start", "left").select(
        "hour_start",
        F.expr("unix_micros(hour_start) div 3600000000").alias("h"),
        "v_micros",
    )
    past = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    fut = Window.orderBy("h").rowsBetween(0, Window.unboundedFollowing)
    obs_h = F.when(F.col("v_micros").isNotNull(), F.col("h"))
    ctx = spine.select(
        "hour_start", "h", "v_micros",
        F.last("v_micros", ignorenulls=True).over(past).alias("prev_v"),
        F.last(obs_h, ignorenulls=True).over(past).alias("prev_h"),
        F.first("v_micros", ignorenulls=True).over(fut).alias("next_v"),
        F.first(obs_h, ignorenulls=True).over(fut).alias("next_h"),
    )
    interp = (
        F.when(F.col("prev_h").isNull() | F.col("next_h").isNull(),
               F.lit(None).cast("double"))
        .when(F.col("next_h") == F.col("prev_h"),
              F.col("prev_v").cast("double") / F.lit(1000000.0))
        .otherwise(
            ((F.col("prev_v") * (F.col("next_h") - F.col("h"))
              + F.col("next_v") * (F.col("h") - F.col("prev_h")))
             .cast("double")
             / (F.col("next_h") - F.col("prev_h")).cast("double"))
            / F.lit(1000000.0))
    )
    return ctx.select(
        "hour_start",
        F.col("v_micros").isNull().alias("was_gap"),
        interp.alias("interp_value"),
    )


# --------------------------------------------- co-purchase communities


@query(
    "copurchase_communities",
    survey="ext-graph A2 J-self W9",
    tags=("graph", "mining"),
    oracle="""
        WITH RECURSIVE und AS (
          SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a
          JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY src, dst HAVING COUNT(*) >= 2
        ),
        edges AS (
          SELECT src, dst FROM und
          UNION ALL SELECT dst, src FROM und
        ),
        nodes AS (SELECT DISTINCT src AS id FROM edges),
        reach(id, label) AS (
          SELECT id, id FROM nodes
          UNION
          SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
        ),
        lab AS (
          SELECT id, CAST(MIN(label) AS BIGINT) AS community_id
          FROM reach GROUP BY id
        )
        SELECT id AS part_id, community_id,
               CAST(COUNT(*) OVER (PARTITION BY community_id) AS BIGINT)
                 AS community_size
        FROM lab
    """,
)
def copurchase_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community assignment over the SUPPORTED co-purchase graph:
    connected components by min-label propagation (community_id =
    smallest member part id) with each community's size — the
    market-structure view that completes the graph family
    (importance = PageRank, local density = triangles, propagation =
    2-hop reach, PARTITION STRUCTURE = this). Reuses the session
    pair-count artifact and the O(log diameter) label-propagation
    loop proven in the dedup pipeline
    (``operators/dedup.connected_components``: neighbor-min hop +
    pointer-jumping shortcut, monotone label-sum convergence test).

    Scale shape: the supported graph orders smaller than the fact
    table (one-off co-occurrences are cut exactly as in the triangle
    miner); each propagation round is two keyed joins + a
    min-aggregate on that graph; the size window runs over the
    node-sized label relation. The oracle is the definitional
    recursive-CTE transitive closure, so the iterative loop is gated
    against an independent derivation — the dedup_clusters gate
    pattern on a different edge set."""
    from ..operators import dedup as _dedup
    from .advanced import _copurchase_pair_counts

    # ONE-direction supported edges: connected_components symmetrizes
    # internally, so pre-symmetrizing would double every edge
    und = (_copurchase_pair_counts(spark, sf_dir)
           .filter(F.col("n") >= 2).select("src", "dst"))
    cc = _dedup.connected_components(und, src="src", dst="dst")
    sizes = cc.groupBy("label").agg(
        F.count(F.lit(1)).alias("community_size"))
    return (
        cc.join(F.broadcast(sizes), "label")
        .select(F.col("id").alias("part_id"),
                F.col("label").alias("community_id"),
                "community_size")
    )


@query(
    "kmv_daily_merge_estimate",
    survey="ext-sketch A1 A5 O2",
    tags=("events", "stats", "sketch"),
    oracle=f"""
        WITH hashed AS MATERIALIZED (
          SELECT DISTINCT
                 ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                   ::BIGINT AS h
          FROM events
        ),
        kth AS (
          SELECT CAST(MAX(h) AS BIGINT) AS h_k,
                 CAST(COUNT(*) AS BIGINT) AS kn
          FROM (SELECT h FROM hashed ORDER BY h LIMIT {_KMV_K})
        ),
        d AS (SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                AS n_days FROM events)
        SELECT d.n_days, kth.h_k AS kth_min_hash,
               CASE WHEN kth.kn < {_KMV_K} THEN CAST(kth.kn AS DOUBLE)
                    ELSE CAST({_KMV_K - 1} AS DOUBLE)
                         * (CAST(1152921504606846976 AS DOUBLE)
                            / CAST(kth.h_k AS DOUBLE))
               END AS n_est
        FROM d CROSS JOIN kth
    """,
)
def kmv_daily_merge_estimate(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """KMV cardinality via PER-DAY SKETCH MERGE: build an independent
    K-minimum-values sketch for every event day (the per-shard /
    per-partition form a 100 TB pipeline actually materializes — one
    fixed-size sketch per ingest unit, combinable later without
    re-reading the data), union the daily minima, re-take the K
    smallest, estimate. The GATE is the mergeability theorem itself:
    bottom-K of a union equals bottom-K of the per-part bottom-Ks, so
    the DuckDB oracle computes the DIRECT single-pass sketch
    (``kmv_distinct_users_estimate``'s path, no daily stage) — if the
    merge lost or duplicated any minimum, the hash gate breaks. The
    estimate formula, hash space, and degenerate-case convention are
    documented on the sibling.

    Scale shape: the daily stage is one distinct-projection of
    (day, user-hash) plus a bottom-K rank window whose partitions are
    per-day distinct users (the reduced relation, never raw events);
    the merge input is ≤ K·days rows — driver-mergeable by
    construction — and the final bottom-K is sort+limit over it.
    At 1000 shards this is the plan that replaces a global
    COUNT(DISTINCT) shuffle with K·shards integers."""
    k = _KMV_K
    day_hashed = (
        load_table(spark, sf_dir, "events")
        .select(
            F.to_date("ts").alias("d"),
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16, 10,
            ).cast("long").alias("h"),
        )
        .distinct()
        # branch point: feeds the day count AND the daily sketches
        .localCheckpoint(eager=True)
    )
    n_days = day_hashed.select("d").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_days"))
    wd = Window.partitionBy("d").orderBy("h")
    daily_sketch = (
        day_hashed.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") <= k)
        .select("h")
        .distinct()  # the union-of-sketches value set
    )
    kth = daily_sketch.orderBy("h").limit(k).agg(
        F.max("h").alias("kth_min_hash"),
        F.count(F.lit(1)).cast("long").alias("kn"))
    est = F.when(
        F.col("kn") < k, F.col("kn").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        * (F.lit(1152921504606846976.0)
           / F.col("kth_min_hash").cast("double"))
    )
    return n_days.crossJoin(F.broadcast(kth)).select(
        "n_days", "kth_min_hash", est.alias("n_est"))
