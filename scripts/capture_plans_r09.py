"""Capture .explain("formatted") output for the round-9-touched
queries into plans/r09/<name>_{before,after}.txt.

Run once from the PRE-optimization tree (worktree at the round-9
build head) with ``--tag before`` and once from the optimized tree
with ``--tag after``:

    python scripts/capture_plans_r09.py before /root/repo/plans/r09
    python scripts/capture_plans_r09.py after  /root/repo/plans/r09

Every capture is plan-only where possible; entries whose builders run
driver-side work (mmr's bounded greedy, index builds) execute it —
that is the honest way to obtain the executed shape.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

TAG = sys.argv[1]
OUT = Path(sys.argv[2])
OUT.mkdir(parents=True, exist_ok=True)
REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
SF = "/root/testdata/sf0.1"

from pyspark.sql import functions as F  # noqa: E402

from sql_data_warehouse_spark.session import get_spark  # noqa: E402

spark = get_spark(f"plans_{TAG}")
spark.sparkContext.setLogLevel("ERROR")


def cap(name: str, df) -> None:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    (OUT / f"{name}_{TAG}.txt").write_text(buf.getvalue())
    print("captured", name, TAG)


from sql_data_warehouse_spark.analytics import all_queries  # noqa: E402

qs = all_queries()

# Registry queries captured whole.
for q in [
    "mmr_diverse_rerank",
    "tf_cosine_pairs_topk",
    "embedding_near_dup",
    "lm_quality_scores",
    "curriculum_shard_order",
    "source_similarity_matrix",
    "etl_silver_audit_columns",
    "semantic_dedup_clusters",
    "ivf_kmeans_ann_topk",
    "minhash_bands",
    "exact_priority_quantiles",
    "winsorized_nation_order_value",
    "nation_weighted_systematic_sample",
]:
    if q in qs:
        try:
            cap(q, qs[q].builder(spark, SF))
        except Exception as e:  # pragma: no cover - capture aid only
            print("FAILED", q, e)

# Internal sub-plans whose shape the round's claims reference.
from sql_data_warehouse_spark.operators import kmeans, pq  # noqa: E402
from sql_data_warehouse_spark.sources import load_table  # noqa: E402

emb = load_table(spark, SF, "embeddings")
books = pq.pq_fit(emb, m=16, k=16, n_iter=2)
cap("pq_encode", pq.pq_encode(emb, books))

# One Lloyd-update means aggregation (the kmeans iteration body).
corpus = emb.select(F.col("vec_id").alias("_id"),
                    F.col("embedding").alias("_v"))
cents = [[float(x) for x in r["_v"]]
         for r in corpus.orderBy(F.md5(F.col("_id").cast("string")),
                                 F.col("_id")).limit(8).collect()]
scale = 1000000.0


def _partial_sums(batches):
    import numpy as np
    import pandas as pd

    C = np.asarray(cents, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)
    for pdf in batches:
        if len(pdf) == 0:
            continue
        V = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
        d2 = ((V * V).sum(axis=1)[:, None] - 2.0 * (V @ C.T) + c_sq[None, :])
        a = d2.argmin(axis=1)
        S = np.floor(V * scale + 0.5).astype(np.int64)
        out = []
        for cid in np.unique(a):
            mask = a == cid
            psum = S[mask].sum(axis=0)
            cnt = int(mask.sum())
            out.extend((int(cid), int(p), int(s), cnt)
                       for p, s in enumerate(psum))
        yield pd.DataFrame(out, columns=["cluster_id", "pos", "psum", "pcnt"])


partials = corpus.mapInPandas(
    _partial_sums, "cluster_id int, pos int, psum long, pcnt long")
per_dim = partials.groupBy("cluster_id", "pos").agg(
    (F.sum("psum").cast("double") / scale
     / F.sum("pcnt").cast("double")).alias("c"))
if TAG == "before":
    means = (
        per_dim.groupBy("cluster_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("cluster_id",
                F.transform("pc", lambda s: s.getField("c")).alias("centroid"))
    )
else:
    means = per_dim
cap("kmeans_lloyd_means", means)

# tf_cosine_pairs_topk: the df-window change sits UPSTREAM of the
# query's eager champion-list checkpoint, so the registered query's
# final plan cannot show it. Reconstruct the pre-checkpoint champion
# relation exactly as the (before|after) code builds it and capture
# that sub-plan.
from sql_data_warehouse_spark.functions.text import normalize_text  # noqa: E402
from pyspark.sql import Window  # noqa: E402

_docs = load_table(spark, SF, "documents")
_sh = (
    _docs.repartition(spark.sparkContext.defaultParallelism)
    .select("doc_id", normalize_text(F.col("text")).alias("nm"))
    .select("doc_id", "nm",
            F.explode(F.sequence(
                F.lit(1), F.greatest(F.length("nm") - 7, F.lit(1)))).alias("i"))
    .select("doc_id", F.expr("substring(nm, i, 8)").alias("s"))
)
_tf = _sh.groupBy("doc_id", "s").agg(F.count(F.lit(1)).alias("tf"))
if TAG == "before":
    _feats = (_tf.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
              .filter(F.col("df").between(2, 32)).select("s"))
    _rare = _tf.join(_feats, "s").select("doc_id", "s", "tf")
else:
    _rare = (_tf.withColumn("df", F.count(F.lit(1))
                            .over(Window.partitionBy("s")))
             .filter(F.col("df").between(2, 32))
             .select("doc_id", "s", "tf"))
_wch = Window.partitionBy("s").orderBy(F.col("tf").desc(), "doc_id")
_champ = (_rare.withColumn("rk", F.row_number().over(_wch))
          .filter(F.col("rk") <= 32).select("doc_id", "s", "tf"))
cap("tf_cosine_champion_stage", _champ)
