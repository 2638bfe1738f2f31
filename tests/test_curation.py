"""Corpus-curation operators: decontamination, budget packing,
repetition stats, winnowing — semantics plus oracle parity (the
registry gate replica covers hashes; these check behavior)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sql_data_warehouse_spark.operators.curation import (
    decontaminate, global_running_sum, ngrams_of, repetition_stats,
    winnow_fingerprints, winnow_near_dup_pairs,
)
from sql_data_warehouse_spark.functions.text import tokens


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, lang="en", text=t) for i, t in enumerate(rows)])


def test_ngrams_of_basic(spark):
    df = spark.range(1).select(
        F.lit("one two three four").alias("text")
    ).select(tokens(F.col("text")).alias("t"))
    out = df.select(ngrams_of(F.col("t"), 2).alias("g")).collect()[0]["g"]
    assert out == ["one two", "two three", "three four"]


def test_ngrams_short_doc_truncates(spark):
    df = spark.range(1).select(F.lit("hi").alias("text")).select(
        tokens(F.col("text")).alias("t"))
    out = df.select(ngrams_of(F.col("t"), 8).alias("g")).collect()[0]["g"]
    assert out == ["hi"]


def test_decontaminate_flags_overlap(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = _docs(spark, [
        f"prefix {shared} suffix",      # contains the benchmark 8-gram
        "totally different words here no overlap at all present",
    ])
    bench = _docs(spark, [f"unrelated {shared} tail words"])
    hits = {r["doc_id"]: r["n_hits"]
            for r in decontaminate(corpus, bench, n=8).collect()}
    assert 0 in hits and hits[0] >= 1
    assert 1 not in hits


def test_global_running_sum_matches_window(spark):
    df = spark.createDataFrame(
        [Row(k=i, v=(i * 37) % 11 + 1) for i in range(500)])
    out = global_running_sum(df, [F.asc("k")], F.col("v"),
                             out_name="rt", num_partitions=7)
    got = {r["k"]: r["rt"] for r in out.collect()}
    acc = 0
    for i in range(500):
        acc += (i * 37) % 11 + 1
        assert got[i] == acc, i


def test_repetition_stats_detects_loops(spark):
    df = _docs(spark, [
        "spam spam spam spam spam spam",          # one distinct trigram
        "all words here are fully distinct now",  # no repeats
    ])
    out = {r["doc_id"]: r for r in repetition_stats(df, n=3).collect()}
    assert out[0]["n_distinct_grams"] == 1
    assert out[0]["dup_fraction"] > 0.7
    assert out[1]["dup_fraction"] == 0.0


def test_winnow_shared_substring_guarantee(spark):
    # Winnowing guarantee: substring matches of length >= k+w-1
    # (12+8-1=19 chars) always share a fingerprint.
    common = "the quick brown fox jumps over the lazy dog repeatedly"
    df = _docs(spark, [
        f"AAA {common} BBB",
        f"CCC {common} DDD",
        "entirely unrelated content with no shared substrings at all",
    ])
    fp = winnow_fingerprints(df)
    shared01 = (
        fp.filter("doc_id = 0").select("fp")
        .intersect(fp.filter("doc_id = 1").select("fp")).count())
    shared02 = (
        fp.filter("doc_id = 0").select("fp")
        .intersect(fp.filter("doc_id = 2").select("fp")).count())
    assert shared01 >= 1
    assert shared02 == 0


def test_winnow_pairs_doc_freq_guard(spark):
    # a fingerprint present in every doc must not create pairs when
    # max_doc_freq excludes it
    boiler = "identical boilerplate sentence shared by every document"
    df = _docs(spark, [f"{boiler} variant {i}" for i in range(6)])
    pairs = winnow_near_dup_pairs(df, min_shared=1, max_doc_freq=3)
    # every shared fp has doc-frequency 6 > 3 -> no candidate pairs
    assert pairs.count() == 0


def test_shard_and_split_stable_across_corpus_growth(spark):
    """Content-addressed split/shard assignments must never move a
    document as the corpus grows — the property that prevents
    test-set leakage across dataset versions. The sf0.001 corpus is a
    subset of sf0.01's id space; every shared doc_id must land in the
    same split and the same shard at both scales."""
    from pyspark.sql import functions as F

    from sql_data_warehouse_spark.sources import load_table

    def assignments(sf_dir):
        d = load_table(spark, sf_dir, "documents")
        h = F.md5(F.col("doc_id").cast("string"))
        prefix = F.substring(h, 1, 2)
        split = (
            F.when(prefix < "cd", "train")
            .when(prefix < "e6", "val")
            .otherwise("test")
        )
        shard = (
            (F.instr(F.lit("0123456789abcdef"), F.substring(h, 3, 1)) - 1)
            + 16 * (F.substring(h, 4, 1) < "8").cast("int")
        )
        return {
            r["doc_id"]: (r["split"], r["shard"])
            for r in d.select(
                "doc_id", split.alias("split"), shard.alias("shard")
            ).collect()
        }

    small = assignments("/root/testdata/sf0.001")
    big = assignments("/root/testdata/sf0.01")
    shared = set(small) & set(big)
    assert shared, "corpora must overlap in doc_id space"
    assert all(small[d] == big[d] for d in shared)


def test_semantic_dedup_cells_are_label_exact(spark):
    """The registered semantic-dedup form partitions by label ONLY —
    a data-independent sign-bit subdivision was tried and measured at
    15 % pair recall in this similarity regime (cosine 0.35-0.5 pairs
    sit ~60-70 deg apart; every hyperplane bit flips almost half the
    time), so it was removed. Pin the exactness: every within-label
    pair of the exact all-pairs form must be co-clustered by the
    registered operator."""
    from pyspark.sql import functions as F

    from sql_data_warehouse_spark.operators.similarity import (
        embedding_near_dup_pairs, semantic_dedup_clusters,
    )
    from sql_data_warehouse_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    clusters = {
        r["vec_id"]: r["cluster_id"]
        for r in semantic_dedup_clusters(emb, threshold=0.35).collect()
    }
    labels = {r["vec_id"]: r["label"]
              for r in emb.select("vec_id", "label").collect()}
    pairs = [
        (r["vec_id_a"], r["vec_id_b"])
        for r in embedding_near_dup_pairs(emb, threshold=0.35).collect()
        if labels[r["vec_id_a"]] == labels[r["vec_id_b"]]
    ]
    assert pairs, "sf0.01 embeddings must contain within-label near-dups"
    assert all(clusters[a] == clusters[b] for a, b in pairs)


def test_seq_idx_zero_token_and_int64_exactness(spark):
    """Adversarial gate for the sequence-packing index (VERDICT r3
    #2-wrong): a zero-token doc FIRST in shuffle order makes the
    running total 0, where Spark's truncating ``div`` and DuckDB's
    flooring ``//`` disagree on (cum-1)/2048 (0 vs -1) — the
    ``greatest`` clamp in ``seq_idx_expr`` must keep both engines at
    seq 0. Also pins pure-int64 exactness past 2^53 cumulative
    tokens, where the old float divide-then-cast loses low bits."""
    import duckdb

    from pyspark.sql import Window

    from sql_data_warehouse_spark.analytics.incremental import (
        SEQ_IDX_SQL, seq_idx_expr,
    )

    # (shard, pos, n_tokens): shard 0 starts with a zero-token doc
    # (cum=0 → the truncate-vs-floor divergence); shard 1 carries a
    # cumulative total past 2^53 (float64 would round 2^53+1 → 2^53,
    # flipping a boundary: cum = 2^53 + 2048·k + 1 cases).
    rows = [
        (0, 0, 0), (0, 1, 0), (0, 2, 5), (0, 3, 2043), (0, 4, 1),
        (0, 5, 2048), (0, 6, 0),
        (1, 0, (1 << 53) + 1), (1, 1, 2047), (1, 2, 1), (1, 3, 2048),
    ]
    df = spark.createDataFrame(rows, "shard int, pos int, n_tokens long")
    w = (
        Window.partitionBy("shard").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        (r["shard"], r["pos"]): r["seq_idx"]
        for r in df.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn("seq_idx", seq_idx_expr())
        .collect()
    }
    con = duckdb.connect()
    try:
        con.sql(
            "CREATE TABLE t(shard INT, pos INT, n_tokens BIGINT)")
        con.executemany(
            "INSERT INTO t VALUES (?, ?, ?)", rows)
        cum = ("SUM(n_tokens) OVER (PARTITION BY shard ORDER BY pos "
               "ROWS UNBOUNDED PRECEDING)")
        want = {
            (s, p): i
            for s, p, i in con.sql(
                f"SELECT shard, pos, {SEQ_IDX_SQL.format(cum=cum)} FROM t"
            ).fetchall()
        }
    finally:
        con.close()
    assert got == want
    assert got[(0, 0)] == 0  # the clamped case: cum=0 → seq 0, not -1
    # int64 exactness: (2^53 + 1 - 1) div 2048 — a float64 path
    # rounds 2^53+1 down and lands one sequence earlier
    assert got[(1, 0)] == (1 << 53) // 2048


# ------------------------------------------- exact-substring span audit


def test_exact_substring_spans_shared_passage(spark):
    """Two docs share a verbatim 9-token passage; a third is clean.
    The span union must cover exactly the shared passage (9 tokens =
    5 consecutive 5-gram starts merged into ONE island), and the
    clean doc must report zeros."""
    from sql_data_warehouse_spark.operators.exact_substring import (
        exact_substring_spans,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta iota"
    docs = spark.createDataFrame([
        Row(doc_id=1, text=f"one two {shared} three four"),
        Row(doc_id=2, text=f"{shared} five six seven eight nine ten"),
        Row(doc_id=3, text="clean words only nothing repeated here at all"),
    ])
    out = {r["doc_id"]: r for r in exact_substring_spans(docs).collect()}
    # doc 1: passage starts at token 3 -> gram starts 3..7, span 3..11
    assert out[1]["n_spans"] == 1
    assert out[1]["dup_tokens"] == 9
    assert out[1]["max_span_tokens"] == 9
    assert out[1]["n_dup_positions"] == 5
    assert out[2]["n_spans"] == 1 and out[2]["dup_tokens"] == 9
    assert out[3]["n_spans"] == 0 and out[3]["dup_tokens"] == 0


def test_exact_substring_within_doc_repeat_not_flagged(spark):
    """A 5-gram repeated WITHIN one document only (distinct-doc count
    = 1) is gopher_repetition's signal, not span duplication."""
    from sql_data_warehouse_spark.operators.exact_substring import (
        exact_substring_spans,
    )

    rep = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame([
        Row(doc_id=1, text=f"{rep} filler words {rep}"),
        Row(doc_id=2, text="totally different content with other tokens here"),
    ])
    out = {r["doc_id"]: r for r in exact_substring_spans(docs).collect()}
    assert out[1]["n_spans"] == 0
    assert out[2]["n_spans"] == 0


def test_exact_substring_adjacent_spans_merge(spark):
    """Two shared passages separated by MORE than n tokens stay two
    islands; separated by <= n they merge (interval-union rule)."""
    from sql_data_warehouse_spark.operators.exact_substring import (
        exact_substring_spans,
    )

    p1 = "alpha beta gamma delta epsilon"
    p2 = "zeta eta theta iota kappa"
    far = "one two three four five six seven"
    docs = spark.createDataFrame([
        Row(doc_id=1, text=f"{p1} {far} {p2}"),
        Row(doc_id=2, text=f"{p1} unrelated tail words here now okay fine"),
        Row(doc_id=3, text=f"lead tokens first then {p2} and trailing stuff"),
    ])
    out = {r["doc_id"]: r for r in exact_substring_spans(docs).collect()}
    assert out[1]["n_spans"] == 2
    assert out[1]["dup_tokens"] == 10


# ------------------------------------------------- bigram-LM quality


def test_lm_quality_scores_short_doc_zero_bigrams(spark):
    """A single-token doc has no bigrams: n_bigrams = 0, mean_p = 0,
    dropped — and the guarded sequence() must not descend."""
    from sql_data_warehouse_spark.operators.lm import lm_quality_scores

    docs = spark.createDataFrame([
        Row(doc_id=1, lang="en", text="word"),
        Row(doc_id=2, lang="en", text="the cat sat on the mat"),
    ])
    out = {r["doc_id"]: r for r in
           lm_quality_scores(docs, docs.filter(F.col("doc_id") == 2))
           .collect()}
    assert out[1]["n_bigrams"] == 0 and out[1]["mean_p"] == 0.0
    assert not out[1]["keep"]
    assert out[2]["n_bigrams"] == 5


def test_lm_quality_reference_docs_score_higher(spark):
    """Docs drawn from the reference distribution must outscore
    out-of-distribution docs (every bigram OOV)."""
    from sql_data_warehouse_spark.operators.lm import lm_quality_scores

    ref_text = "the cat sat on the mat and the dog sat on the rug"
    docs = spark.createDataFrame([
        Row(doc_id=1, lang="en", text=ref_text),
        Row(doc_id=2, lang="en", text="the cat sat on the rug"),
        Row(doc_id=3, lang="xx", text="voila quelque chose entierement autre"),
    ])
    ref = docs.filter(F.col("doc_id") == 1)
    out = {r["doc_id"]: r for r in lm_quality_scores(docs, ref).collect()}
    assert out[2]["mean_p"] > out[3]["mean_p"]
    assert out[3]["n_oov"] == out[3]["n_bigrams"]  # fully OOV


# --------------------------------------------- multi-class PII scrub


def test_scrub_pii_multi_counts_and_order(spark):
    """Counts are per class and replacement is class-ordered: the
    phone shape (NNN-NNN-NNNN) must never be claimed by the SSN shape
    (NNN-NN-NNNN) or vice versa."""
    from sql_data_warehouse_spark.operators.curation import scrub_pii_multi

    docs = spark.createDataFrame([
        Row(doc_id=1, text="mail a@b.com call 555-123-4567 "
                           "ssn 123-45-6789 ip 10.0.0.1"),
        Row(doc_id=2, text="no pii here at all"),
    ])
    out = {r["doc_id"]: r for r in scrub_pii_multi(docs).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"],
            out[1]["n_ssn"], out[1]["n_ipv4"]) == (1, 1, 1, 1)
    assert (out[2]["n_email"], out[2]["n_phone"],
            out[2]["n_ssn"], out[2]["n_ipv4"]) == (0, 0, 0, 0)
    assert out[2]["clean_len"] == len("no pii here at all")


# ------------------------------------------------ RAG chunk manifest


def test_rag_chunk_manifest_spans(spark):
    """A 100-token doc at 64/48 gives chunks [1,64] and [49,100]; a
    short doc gives exactly one full-coverage chunk."""
    from sql_data_warehouse_spark.operators.curation import (
        rag_chunk_manifest,
    )

    long_text = " ".join(f"w{i}" for i in range(100))
    docs = spark.createDataFrame([
        Row(doc_id=1, text=long_text),
        Row(doc_id=2, text="just five little words here"),
    ])
    rows = rag_chunk_manifest(docs).collect()
    d1 = sorted([r for r in rows if r["doc_id"] == 1],
                key=lambda r: r["chunk_idx"])
    assert [(r["tok_start"], r["tok_end"]) for r in d1] == [(1, 64), (49, 100)]
    assert d1[1]["n_chunk_tokens"] == 52
    d2 = [r for r in rows if r["doc_id"] == 2]
    assert len(d2) == 1 and (d2[0]["tok_start"], d2[0]["tok_end"]) == (1, 5)


def test_rag_chunk_overlap_tokens_shared(spark):
    """Consecutive chunks share exactly CHUNK - STRIDE = 16 tokens:
    the second chunk's hash over a doc built from distinct tokens
    equals the hash of tokens 49..100 recomputed directly."""
    import hashlib

    from sql_data_warehouse_spark.operators.curation import (
        rag_chunk_manifest,
    )

    toks = [f"w{i}" for i in range(100)]
    docs = spark.createDataFrame([Row(doc_id=1, text=" ".join(toks))])
    rows = {r["chunk_idx"]: r for r in rag_chunk_manifest(docs).collect()}
    want = hashlib.md5(" ".join(toks[48:100]).encode()).hexdigest()
    assert rows[1]["chunk_hash"] == want


def test_source_similarity_matrix_overlap(spark):
    """Two sources sharing half their text overlap strongly; a third
    disjoint source shows ~zero jaccard against both."""
    from sql_data_warehouse_spark.operators.exact_substring import (
        source_similarity_matrix,
    )

    shared = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame([
        Row(doc_id=1, source="s1", text=shared + " alpha beta gamma"),
        Row(doc_id=2, source="s2", text=shared + " delta epsilon zeta"),
        Row(doc_id=3, source="s3", text="entirely unrelated words here"),
    ])
    out = {(r["source_a"], r["source_b"]): r["jaccard"]
           for r in source_similarity_matrix(docs).collect()}
    assert out[("s1", "s2")] > 0.5
    # zero-overlap pairs emit NO row (sparse matrix semantics): any
    # s3 pair present must be near-zero incidental shingle overlap
    assert out.get(("s1", "s3"), 0.0) < 0.1
    assert out.get(("s2", "s3"), 0.0) < 0.1


def test_source_quota_cap_matches_naive_on_skew(spark):
    """Two-phase salted top-K == the naive single-window form, on a
    fixture where one 'host' dominates (the skew the operator exists
    to survive) and quality ties abound."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sql_data_warehouse_spark.operators.curation import source_quota_cap

    rows = []
    # hot source: 400 docs, heavy n_chars ties (only 5 distinct values)
    rows += [(i, "hot", (i * 7) % 5 + 100) for i in range(400)]
    # cold sources: fewer docs than the cap
    rows += [(1000 + i, "cold_a", 50 + i) for i in range(3)]
    rows += [(2000 + i, "cold_b", 50) for i in range(7)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")

    got = source_quota_cap(docs, cap=10, n_salt=4)
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id"))
    want = (
        docs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("doc_id", "source", "n_chars", F.col("rank").cast("long").alias("rank"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # cold sources keep everything (below cap), hot is capped exactly
    counts = {r["source"]: r["n"] for r in
              got.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"hot": 10, "cold_a": 3, "cold_b": 7}


def test_ccnet_buckets_partition_and_keep_rule(spark):
    """Buckets partition each language; tail keeps nothing, head keeps
    everything, middle keeps a strict md5-coin subset."""
    from pyspark.sql import functions as F

    from sql_data_warehouse_spark.operators.lm import ccnet_bucket_sample
    from sql_data_warehouse_spark.sources import load_table

    from .conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    out = ccnet_bucket_sample(docs, docs.filter(F.col("lang") == "en"))
    rows = {(r["lang"], r["bucket"]): r for r in out.collect()}
    per_lang_total = {}
    for (lang, bucket), r in rows.items():
        assert r["n_kept"] <= r["n_docs"]
        if bucket == "head":
            assert r["n_kept"] == r["n_docs"]
        if bucket == "tail":
            assert r["n_kept"] == 0
        per_lang_total[lang] = per_lang_total.get(lang, 0) + r["n_docs"]
    n_docs = docs.count()
    assert sum(per_lang_total.values()) == n_docs
    # the cutoffs actually split: multiple buckets exist, and the
    # middle coin keeps a strict, non-empty subset somewhere
    assert len({b for (_, b) in rows}) >= 2
    mids = [r for (_, b), r in rows.items() if b == "middle"]
    assert any(r["n_kept"] > 0 for r in mids)
    assert any(r["n_kept"] < r["n_docs"] for r in mids)


def test_ccnet_sample_cutoffs_approximate_true_tertiles(spark):
    """The held-out-slice cutoffs must agree with the TRUE per-lang
    tertiles for most documents — measured 72.6% at sf0.01 (21-doc
    held-out) rising to 94.3% at sf0.1 (217 docs): sample-quantile
    error shrinks ∝ 1/sqrt(sample), converging on the exact split.
    Gate at 0.70 on the sf0.01 fixture."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sql_data_warehouse_spark.operators.lm import lm_quality_scores
    from sql_data_warehouse_spark.sources import load_table

    from .conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    scores = lm_quality_scores(
        docs, docs.filter(F.col("lang") == "en")
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("lang").orderBy(
        F.col("mean_p").desc(), F.col("doc_id"))
    wn = Window.partitionBy("lang")
    truth = (
        scores.select("doc_id", "lang", "mean_p")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn(
            "true_bucket",
            F.when(F.expr("rn <= (n + 2) div 3"), "head")
            .when(F.expr("rn <= (2*n + 2) div 3"), "middle")
            .otherwise("tail"),
        )
    )
    held = scores.filter(F.col("doc_id") % 23 == 0)
    rh = (
        held.select("lang", "mean_p", "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
    )
    cuts = rh.groupBy("lang").agg(
        F.max(F.when(F.expr("rn = (n + 2) div 3"), F.col("mean_p"))).alias("c1p"),
        F.max(F.when(F.expr("rn = (n + 2) div 3"), F.col("doc_id"))).alias("c1i"),
        F.max(F.when(F.expr("rn = (2 * n + 2) div 3"), F.col("mean_p"))).alias("c2p"),
        F.max(F.when(F.expr("rn = (2 * n + 2) div 3"), F.col("doc_id"))).alias("c2i"),
    )
    p, i = F.col("mean_p"), F.col("doc_id")
    est = scores.join(F.broadcast(cuts), "lang", "left").select(
        "doc_id", "lang",
        F.when(
            F.col("c1p").isNull() | (p > F.col("c1p"))
            | ((p == F.col("c1p")) & (i <= F.col("c1i"))), "head")
        .when((p > F.col("c2p"))
              | ((p == F.col("c2p")) & (i <= F.col("c2i"))), "middle")
        .otherwise("tail").alias("est_bucket"),
    )
    j = truth.join(est, ["doc_id", "lang"])
    row = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("true_bucket") == F.col("est_bucket")).cast("long"))
        .alias("ok"),
    ).collect()[0]
    assert row["ok"] / row["n"] >= 0.70, (row["ok"], row["n"])
