"""Recall gates for the two LSH-bucketed approximate similarity
queries. They are `no_oracle` in the driver's hash gate (approximate
by design), so this is their correctness contract: measured recall
against the exact hash-gated twin, mirroring
tests/test_kmeans.py::test_ivf_kmeans_recall_vs_exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_data_warehouse_spark.operators import similarity
from sql_data_warehouse_spark.sources import load_table

from .conftest import SF_ORACLE


def test_lsh_ann_topk_recall_vs_exact(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(emb, queries, k=10)
    approx = similarity.lsh_ann_topk(emb, queries, k=10)

    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    assert len(e) == 50
    recall = len(e & a) / len(e)
    # 8 bands × 4 bits: measured 0.76 at sf0.01.
    assert recall >= 0.6, recall


def test_embedding_near_dup_lsh_pair_recall_vs_exact(spark):
    # Same 500-vector slice the exact registry query is bounded to, so
    # the comparison is pair-for-pair against a hash-gated baseline.
    emb = load_table(spark, SF_ORACLE, "embeddings").filter(
        F.col("vec_id") < 500
    )
    exact = similarity.embedding_near_dup_pairs(emb, threshold=0.35)
    approx = similarity.embedding_near_dup_pairs_lsh(emb, threshold=0.35)

    e = {(r["vec_id_a"], r["vec_id_b"]) for r in exact.collect()}
    a = {(r["vec_id_a"], r["vec_id_b"]) for r in approx.collect()}
    assert e, "exact near-dup baseline returned no pairs"
    # LSH candidates are a subset of all pairs; every surviving pair
    # must be a true near-dup (precision 1.0 by construction) ...
    assert a <= e
    # ... and banding must retain most true pairs. 8 bands × 4 bits
    # predicts 1-(1-p^4)^8 ≈ 0.71 at cosine 0.35; measured 0.72.
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall


def test_pq_ann_topk_recall_vs_exact_l2(spark):
    import numpy as np

    from sql_data_warehouse_spark.operators import pq

    emb = load_table(spark, SF_ORACLE, "embeddings")
    books = pq.pq_fit_sampled(emb, m=16, k=16, n_iter=2)
    rows = emb.select("vec_id", "embedding").collect()
    V = np.asarray([np.asarray(r["embedding"], dtype=np.float64)
                    for r in rows])
    ids = np.asarray([r["vec_id"] for r in rows])
    queries = [(int(ids[i]), [float(x) for x in V[i]])
               for i in range(len(ids)) if ids[i] < 5]

    approx = pq.pq_ann_topk(emb, queries, books, k=10, rerank=50)
    a = {(r["query_id"], r["id"]) for r in approx.collect()}

    # exact L2 top-10 (PQ's ADC approximates L2, not cosine)
    e = set()
    for qid, qv in queries:
        d2 = ((V - np.asarray(qv)) ** 2).sum(axis=1)
        order = np.lexsort((ids, d2))  # distance, id tiebreak
        e.update((qid, int(ids[j])) for j in order[:10])

    assert len(e) == 50
    recall = len(e & a) / len(e)
    # 16 subspaces × 16 codewords + exact re-rank of the ADC-top-50:
    # measured 0.82 at sf0.01 (ADC-only with m=8 was 0.28 — the
    # re-rank stage is what makes PQ usable at this dimensionality).
    assert recall >= 0.6, recall


def test_pq_ann_distfit_recall_vs_exact_l2(spark):
    """The DISTRIBUTED codebook fit (pq.pq_fit — the path for training
    sets too large to collect) must match the sampled fit's search
    quality: recall@10 ≥ 0.8 vs exact L2 (VERDICT r3 #5 criterion;
    measured 0.82 at sf0.01 with m=16, k=16, 2 iters, rerank=50 —
    level with the sampled fit, as expected)."""
    import numpy as np

    from sql_data_warehouse_spark.operators import pq

    emb = load_table(spark, SF_ORACLE, "embeddings")
    books = pq.pq_fit(emb, m=16, k=16, n_iter=2)
    rows = emb.select("vec_id", "embedding").collect()
    V = np.asarray([np.asarray(r["embedding"], dtype=np.float64)
                    for r in rows])
    ids = np.asarray([r["vec_id"] for r in rows])
    queries = [(int(ids[i]), [float(x) for x in V[i]])
               for i in range(len(ids)) if ids[i] < 5]

    approx = pq.pq_ann_topk(emb, queries, books, k=10, rerank=50)
    a = {(r["query_id"], r["id"]) for r in approx.collect()}

    e = set()
    for qid, qv in queries:
        d2 = ((V - np.asarray(qv)) ** 2).sum(axis=1)
        order = np.lexsort((ids, d2))
        e.update((qid, int(ids[j])) for j in order[:10])

    assert len(e) == 50
    recall = len(e & a) / len(e)
    assert recall >= 0.8, recall


def test_pq_fit_deterministic(spark):
    from sql_data_warehouse_spark.operators import pq

    emb = load_table(spark, SF_ORACLE, "embeddings")
    b1 = pq.pq_fit(emb, m=16, k=16, n_iter=2)
    b2 = pq.pq_fit(emb, m=16, k=16, n_iter=2)
    assert b1 == b2


def test_pq_search_plan_shape(spark):
    """Stage-1 shortlist must be TakeOrderedAndProject (distributed
    top-R, not a single-partition window), and the encode/scoring
    path must stay JVM-side (no Python eval in the plan)."""
    from sql_data_warehouse_spark.operators import pq

    emb = load_table(spark, SF_ORACLE, "embeddings")
    books = pq.pq_fit_sampled(emb, m=16, k=16, n_iter=1)
    r = emb.filter(F.col("vec_id") == 0).collect()[0]
    queries = [(0, [float(x) for x in r["embedding"]])]
    plan = (
        pq.pq_ann_topk(emb, queries, books, k=5, rerank=20)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_lsh_clusters_recall_vs_exact_pairs(spark):
    """The hash-gated OR-amplified cluster form must co-locate most
    exact near-dup pairs — the property the cell-partitioned forms
    measurably lack (15% sign-bit subcells / 42% k-means k=4 cells,
    BASELINE.md round 3). 8 bands x 4 bits predicts ~0.7 recall at
    cosine 0.35; require >= 0.6."""
    from sql_data_warehouse_spark.operators.similarity import (
        embedding_near_dup_pairs, embedding_near_dup_lsh_clusters,
    )
    from sql_data_warehouse_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    clusters = {
        r["vec_id"]: r["cluster_id"]
        for r in embedding_near_dup_lsh_clusters(
            emb, threshold=0.35).collect()
    }
    pairs = [
        (r["vec_id_a"], r["vec_id_b"])
        for r in embedding_near_dup_pairs(emb, threshold=0.35).collect()
    ]
    assert pairs
    recall = sum(clusters[a] == clusters[b] for a, b in pairs) / len(pairs)
    assert recall >= 0.6, recall


def test_semantic_dedup_kmeans_cells(spark):
    """Gates for the registered SemDeDup form (learned cells, VERDICT
    r3 #1): (1) cells stay ≈ target_cell — the property that makes
    Σ cell² linear in n; (2) the emitted clusters are EXACTLY the
    connected components of exact-cosine edges within those cells
    (plumbing correctness, recomputed independently in numpy);
    (3) cell pair-recall vs the exact all-pairs ground truth meets
    the measured floor (0.41 at sf0.1 / target_cell=500 / cosine
    0.35 — weak-threshold cell partitioning is intrinsically
    recall-limited, BASELINE.md)."""
    import numpy as np

    from sql_data_warehouse_spark.operators.kmeans import (
        kmeans_assign_arrow, kmeans_fit,
    )

    sf_dir = "/root/testdata/sf0.1"  # 2000 vectors → k = 4 learned cells
    emb = load_table(spark, sf_dir, "embeddings")
    target = 500
    out = {
        r["vec_id"]: r["cluster_id"]
        for r in similarity.semantic_dedup_clusters_kmeans(
            emb, threshold=0.35, target_cell=target, n_iter=2
        ).collect()
    }

    # Re-derive the same deterministic cells for the independent check
    n = emb.count()
    cents = kmeans_fit(emb, k=max(1, -(-n // target)), n_iter=2)
    cells = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_assign_arrow(emb, cents)
        .select("vec_id", "cluster_id").collect()
    }
    sizes = np.bincount(list(cells.values()))
    assert sizes.max() <= 3 * target, sizes

    rows = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    iu, ju = np.triu_indices(len(ids), 1)
    hit = S[iu, ju] >= 0.35
    exact_pairs = [(ids[a], ids[b]) for a, b in zip(iu[hit], ju[hit])]
    assert exact_pairs

    # (3) recall: fraction of true near-dup pairs sharing a cell
    co = [cells[a] == cells[b] for a, b in exact_pairs]
    recall = sum(co) / len(co)
    assert recall >= 0.3, recall

    # (2) exact cluster equality: union-find over within-cell edges
    parent = {v: v for v in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in exact_pairs:
        if cells[a] == cells[b]:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    want = {v: min(u for u in ids if find(u) == find(v)) for v in ids}
    # min-id keeper: cluster label is the component's min id
    mismatches = {v for v in ids if out[v] != want[v]}
    assert not mismatches, (len(mismatches), sorted(mismatches)[:5])


def test_int8_ann_topk_recall_vs_exact_cosine(spark):
    """INT8 scalar quantization keeps ~7 bits/dim of resolution —
    top-10 sets should match the exact cosine ranking almost
    everywhere (quantization only reorders near-ties)."""
    emb = load_table(spark, SF_ORACLE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(emb, queries, k=10)
    quant = similarity.int8_ann_topk(emb, queries, k=10)

    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in quant.collect()}
    assert len(e) == 50 and len(a) == 50
    recall = len(e & a) / len(e)
    assert recall >= 0.9, recall


def test_multiprobe_lsh_topk_recall_vs_exact(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(emb, queries, k=10)
    approx = similarity.multiprobe_lsh_topk(emb, queries, k=10)

    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    assert len(e) == 50
    recall = len(e & a) / len(e)
    # one 6-bit table, 22 probes at hamming <= 2; measured 0.46 at sf0.01
    # (the driver's gate scale) — record the measured value here if
    # the corpus ever changes.
    assert recall >= 0.35, recall
