"""Property gates for the retrieval family (analytics/search.py):
phrase semantics strictly tighten conjunctive search, and RRF fusion
behaves like a rank combiner — correctness is oracle-gated via the
registry (tests/test_correctness.py and the driver)."""

from __future__ import annotations

from sql_data_warehouse_spark.analytics import search
from sql_data_warehouse_spark.operators import text_analysis
from sql_data_warehouse_spark.sources import load_table

from .conftest import SF_SMOKE


def test_phrase_hits_are_subset_of_conjunctive_hits(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    phrase = {r.doc_id for r in
              search.phrase_search_positions(spark, SF_SMOKE).collect()}
    conj = {r.doc_id for r in text_analysis.keyword_search(
        docs, list(search._PHRASE)).collect()}
    assert phrase, "phrase should occur in the smoke corpus"
    assert phrase <= conj


def test_rrf_scores_are_bounded_and_sorted(spark):
    rows = search.rrf_hybrid_search(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= search._RRF_DEPTH
    hi = 1.0 / (search._RRF_K + 1) * 2
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 0.0 < r.rrf_score <= hi
        assert r.lex_rank is not None or r.sem_rank is not None
        # a doc ranked by BOTH lists beats the best possible
        # single-list doc at the same ranks
        if r.lex_rank is not None and r.sem_rank is not None:
            assert r.rrf_score > 1.0 / (search._RRF_K + r.lex_rank)


def test_hard_negatives_never_share_the_query_label(spark):
    rows = search.hard_negative_mining(spark, SF_SMOKE).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        assert r.neg_label != r.q_label
        by_q.setdefault(r.query_id, []).append(r)
    for sims in by_q.values():
        ordered = sorted(sims, key=lambda r: r.rank)
        vals = [r.cosine_sim for r in ordered]
        assert vals == sorted(vals, reverse=True)
        assert len(sims) <= search._HN_TOPK


def test_knn_classify_emits_one_verdict_per_query(spark):
    rows = search.knn_label_classify(spark, SF_SMOKE).collect()
    assert rows
    assert len({r.query_id for r in rows}) == len(rows)
    for r in rows:
        assert 1 <= r.n_votes <= search._KNN_K
        assert r.correct == int(r.predicted_label == r.true_label)


def test_tf_cosine_pairs_bounded_and_rare_blocked(spark):
    from sql_data_warehouse_spark.analytics.search import (
        _SPARSE_TOPK, tf_cosine_pairs_topk,
    )

    df = tf_cosine_pairs_topk(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k is sort+limit
    assert "BroadcastNestedLoopJoin" not in plan
    rows = df.collect()
    assert 0 < len(rows) <= _SPARSE_TOPK
    for r in rows:
        assert r.doc1 < r.doc2
        # Cauchy-Schwarz on exact integers; score is their ratio
        assert r.dot * r.dot <= r.norm1 * r.norm2
        assert 0.0 < r.cosine_rare <= 1.0


def test_tf_cosine_adaptive_cap_and_champion_truncation(spark, tmp_path):
    """VERDICT r8 ask #2 regression: under replication density a FIXED
    df cap empties the rare window (the sf10 0-row artifact). Build a
    6,000-doc corpus where one copy-cluster's shingles have df=36 —
    above the base cap 32, below the adaptive cap 32·6000/5000=38 —
    and assert (a) the window admits them (rows come back), (b) the
    champion list truncates the cluster to its 32 lowest doc_ids
    (tf ties break by doc_id), and (c) Spark and the DuckDB oracle
    agree row-for-row on the truncated definition."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sql_data_warehouse_spark.analytics.registry import all_queries
    from sql_data_warehouse_spark.analytics.search import (
        _SPARSE_CHAMP, tf_cosine_pairs_topk,
    )

    import duckdb

    from .oracle_harness import compare

    n_copies, n_fill = 36, 5964
    texts = ["the quick brown fox jumps over the lazy dog"] * n_copies + [
        f"unique filler document number {i:06d} with its own tail {i * 7:07d}"
        for i in range(n_fill)
    ]
    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}),
        str(tmp_path / "documents.parquet"),
    )
    df = tf_cosine_pairs_topk(spark, str(tmp_path))
    rows = df.collect()
    assert rows, "adaptive cap must keep the df=36 cluster in-window"
    seen = {d for r in rows for d in (r.doc1, r.doc2)}
    assert seen and max(seen) < _SPARSE_CHAMP, (
        "champion truncation must keep only the 32 lowest doc_ids "
        f"of the copy cluster, got {sorted(seen)[-3:]}"
    )
    assert all(r.cosine_rare == 1.0 for r in rows)  # exact copies
    con = duckdb.connect()
    try:
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
        oracle_pdf = con.sql(
            all_queries()["tf_cosine_pairs_topk"].oracle).df()
    finally:
        con.close()
    compare(df, oracle_pdf, "tf_cosine_adaptive")


def test_dhash_near_dup_pairs_found_and_symmetric_free(spark):
    from sql_data_warehouse_spark.analytics.llmops import (
        _DHASH_HAM_MAX, media_dhash_near_dup,
    )

    df = media_dhash_near_dup(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # banded pair generation + hash verify join — never all-pairs
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert rows, "sf0.001 corpus carries suffix-edited image near-dups"
    seen = set()
    for r in rows:
        assert r.doc1 < r.doc2 and r.doc1 % 3 == 0 and r.doc2 % 3 == 0
        assert 0 <= r.hamming <= _DHASH_HAM_MAX
        assert (r.doc1, r.doc2) not in seen
        seen.add((r.doc1, r.doc2))


def test_jl_recall_includes_self_and_is_discrete(spark):
    from sql_data_warehouse_spark.analytics.llmops import (
        jl_projection_ann_recall,
    )

    rows = jl_projection_ann_recall(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        # self is rank 1 in BOTH spaces (cos=1.0) => always >= 1 hit
        assert 1 <= r.n_hits <= 10
        assert r.recall_at_10 == r.n_hits / 10.0


def test_contrastive_manifest_semantics(spark):
    from sql_data_warehouse_spark.analytics.search import (
        contrastive_pair_manifest,
    )

    rows = contrastive_pair_manifest(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.anchor_id < r.positive_id       # near-dup pair order
        assert r.neg_label != r.anchor_label     # negative crosses labels
        assert r.negative_id != r.anchor_id
        assert -1.0 <= r.neg_cosine <= 1.0
        assert 0 <= r.pos_hamming <= 3


def test_mmr_rerank_diversifies(spark):
    """Greedy-MMR invariants: rank-1 is the relevance argmax (its
    gain IS its relevance), later gains differ from relevance by at
    most |max-sim| <= 1, and picks are distinct."""
    from sql_data_warehouse_spark.analytics.search import (
        _MMR_K, mmr_diverse_rerank,
    )

    rows = mmr_diverse_rerank(spark, SF_SMOKE).collect()
    assert [r.rank for r in rows] == list(range(1, _MMR_K + 1))
    assert len({r.vec_id for r in rows}) == _MMR_K
    assert rows[0].gain == rows[0].rel  # first pick pays no penalty
    for r in rows[1:]:
        # gain = rel - max_sim(selected); cosines live in [-1, 1], so
        # the penalty term is bounded, not sign-constrained
        assert abs(r.gain - r.rel) <= 1.0 + 1e-12


def test_mrr_bounds(spark):
    from sql_data_warehouse_spark.analytics.search import (
        retrieval_mrr_at_10,
    )

    [r] = retrieval_mrr_at_10(spark, SF_SMOKE).collect()
    assert r.n_queries == 20 and 0 <= r.n_hit <= 20
    assert 0.0 <= r.mrr <= 1.0
    assert r.mrr == r.mrr_micros_sum / (1e6 * r.n_queries)


def test_label_noise_audit_covers_sample(spark):
    from sql_data_warehouse_spark.analytics.search import (
        _NOISE_SAMPLE, label_noise_suspects,
    )

    from pyspark.sql import functions as F

    rows = label_noise_suspects(spark, SF_SMOKE).collect()
    n_vecs = (load_table(spark, SF_SMOKE, "embeddings")
              .filter(F.col("vec_id") < _NOISE_SAMPLE).count())
    assert len(rows) == n_vecs  # one verdict per sampled vector
    for r in rows:
        assert r.is_suspect in (0, 1)
        if r.is_suspect:
            assert r.suggested_label != r.own_label and r.n_votes >= 4


def test_mutual_nn_is_symmetric_and_kfold_balanced(spark):
    from pyspark.sql import functions as F

    from sql_data_warehouse_spark.analytics.curation import (
        _KFOLD_K, kfold_stratified_assignment,
    )
    from sql_data_warehouse_spark.analytics.search import mutual_nn_pairs

    pairs = mutual_nn_pairs(spark, SF_SMOKE).collect()
    for r in pairs:
        assert r.vec_a < r.vec_b and -1.0 <= r.cosine_ab <= 1.0

    folds = kfold_stratified_assignment(spark, SF_SMOKE).collect()
    assert folds
    from collections import defaultdict

    per_label = defaultdict(list)
    for r in folds:
        assert 0 <= r.fold < _KFOLD_K
        per_label[r.label].append(r.n_vectors)
    for label, sizes in per_label.items():
        assert max(sizes) - min(sizes) <= 1, (label, sizes)
