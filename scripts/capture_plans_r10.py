"""Capture .explain("formatted") output for the round-10-touched
queries into plans/r10/<name>_{before,after}.txt.

Run once from the PRE-optimization tree (worktree at the round-10
start commit, a758fd2) with ``before`` and once from the optimized
tree with ``after``:

    python scripts/capture_plans_r10.py before /root/repo/plans/r10
    python scripts/capture_plans_r10.py after  /root/repo/plans/r10

Streaming entries execute their drain to produce the returned batch
DataFrame — the captured plan is the materialization shape the bench
times after the drain (LocalTableScan of collected rows before vs the
localCheckpoint block scan after); the drain machinery itself is
code-level, not plan-level, evidence. The LSH/SemDeDup edge relations
are reconstructed per version exactly as the (before|after) operators
build them, because the registered cluster queries eagerly checkpoint
inside connected_components and the final plan cannot show the edge
pipeline.
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

spark = get_spark(f"plans_r10_{TAG}")
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

# Registry queries captured whole (the hint-removal and Arrow-assign
# sites appear in the final plan; streaming entries show the post-
# drain materialization shape).
for q in [
    "embedding_near_dup_lsh",
    "ivf_kmeans_ann_topk",
    "simhash_near_dup_clusters",
    "dedup_keep_best_chain",
    "split_leakage_repair_chain",
    "rag_chunk_dedup_rate",
    "copurchase_triangle_counts",
    "exact_substring_spans",
    "stream_session_window_append",
    "stream_replay_user_totals",
]:
    if q in qs:
        try:
            cap(q, qs[q].builder(spark, SF))
        except Exception as e:  # pragma: no cover - capture aid only
            print("FAILED", q, e)

# Edge sub-plans reconstructed per version (checkpointed downstream in
# the registered cluster queries).
import math  # noqa: E402

from sql_data_warehouse_spark.functions.vectors import norm_fixed  # noqa: E402
from sql_data_warehouse_spark.operators import kmeans, similarity  # noqa: E402
from sql_data_warehouse_spark.sources import load_table  # noqa: E402

emb = load_table(spark, SF, "embeddings")
n = emb.count()
k = max(1, math.ceil(n / 500))
cents = kmeans.kmeans_fit(emb, k=k, n_iter=2)
e = kmeans.kmeans_assign_arrow(emb, cents).select(
    F.col("cluster_id").cast("string").alias("_cell"),
    F.col("vec_id"),
    F.col("embedding").alias("vec"),
    norm_fixed("embedding", 64).alias("nrm"),
)
if TAG == "before":
    from sql_data_warehouse_spark.operators.similarity import _cosine_seqfold

    a = e.alias("a")
    b = e.hint("merge").alias("b")
    edges = (
        a.join(
            b,
            (F.col("a._cell") == F.col("b._cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("src"),
            F.col("b.vec_id").alias("dst"),
            _cosine_seqfold("a.vec", "b.vec", "a.nrm", "b.nrm", 64)
            .alias("sim"),
        )
        .filter(F.col("sim") >= 0.35)
        .select("src", "dst")
    )
else:
    from sql_data_warehouse_spark.operators.similarity import (
        _grouped_pair_verify,
    )

    edges = _grouped_pair_verify(e, ["_cell"], 0.35, 64,
                                 with_sim=False).select(
        F.col("vec_id_a").alias("src"), F.col("vec_id_b").alias("dst"))
cap("semantic_dedup_edges", edges)

bits = similarity.adaptive_band_bits(n)
if TAG == "before":
    pre = emb.select(
        F.col("vec_id"),
        F.col("embedding").alias("vec"),
        norm_fixed("embedding", 64).alias("nrm"),
        similarity._bucket_array_seqfold("embedding", 8, bits, 64)
        .alias("bks"),
    )
    bands = pre.select(
        "vec_id", "vec", "nrm", "bks",
        F.posexplode("bks").alias("band", "bucket"),
    )
    a = bands.alias("a")
    b = bands.hint("merge").alias("b")
    ledges = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(F.expr(
            "NOT exists(zip_with(slice(a.bks, 1, a.band), "
            "slice(b.bks, 1, a.band), (x, y) -> x = y), p -> p)"
        ))
        .select(
            F.col("a.vec_id").alias("src"),
            F.col("b.vec_id").alias("dst"),
            similarity._cosine_seqfold(
                "a.vec", "b.vec", "a.nrm", "b.nrm", 64).alias("sim"),
        )
        .filter(F.col("sim") >= 0.35)
        .select("src", "dst")
    )
else:
    pre = emb.select(
        F.col("vec_id"),
        F.col("embedding").alias("vec"),
        norm_fixed("embedding", 64).alias("nrm"),
        similarity._bucket_array_seqfold("embedding", 8, bits, 64)
        .alias("buckets"),
    )
    bands = pre.select(
        "vec_id", "vec", "nrm", "buckets",
        F.posexplode("buckets").alias("band", "bucket"),
    )
    n_part = spark.sparkContext.defaultParallelism * 2
    ledges = similarity._grouped_pair_verify(
        bands.repartition(n_part, "band", "bucket"),
        ["band", "bucket"], 0.35, 64,
        with_sim=False, first_collision=True,
    ).select(F.col("vec_id_a").alias("src"),
             F.col("vec_id_b").alias("dst"))
cap("lsh_cluster_edges", ledges)

print("DONE", TAG)
