"""Unit tests for operator-library functions that aren't (fully)
covered by the registry's oracle gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_data_warehouse_spark.operators import multimodal
from sql_data_warehouse_spark.operators.asof import asof_join_backward
from sql_data_warehouse_spark.operators.skew import salted_join
from sql_data_warehouse_spark.sources import load_table

from .conftest import SF_SMOKE


def test_salted_join_matches_plain_join(spark):
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = o.join(c, "o_custkey")
    salted = salted_join(o, c, "o_custkey", salt_from="o_orderkey", n_salts=4)
    assert salted.count() == plain.count()
    assert salted.select(F.sum("o_orderkey")).collect() == plain.select(
        F.sum("o_orderkey")
    ).collect()


def test_asof_join_edges(spark):
    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 20, "l2"), (2, 5, "l3")],
        "k long, t long, lv string",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "lv")
    right = spark.createDataFrame(
        [(1, 10, "r_eq"), (1, 15, "r_mid"), (3, 1, "r_other")],
        "k long, t long, rv string",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "rv")
    out = {
        r["lv"]: r["matched_rv"]
        for r in asof_join_backward(left, right, key="k").collect()
    }
    # Equal timestamps match (inclusive); later right rows win;
    # keys with no prior right row get NULL.
    assert out == {"l1": "r_eq", "l2": "r_mid", "l3": None}


def test_multimodal_resize_and_real_decode(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    media = multimodal.attach_fake_media(docs)
    resized = multimodal.resize_images(media, max_side=128)
    rows = resized.collect()
    assert rows and all(r["resized_to"] == 128 for r in rows)
    n_images = media.filter(F.col("media_type") == "image").count()
    assert len(rows) == n_images
    with pytest.raises(NotImplementedError):
        multimodal.decode_real(b"x", "image", "png")


def test_fake_decode_batch_shape():
    import pandas as pd

    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "payload": [b"abc", b"defgh"], "media_type": ["image", "audio"]}
    )
    out = multimodal.fake_decode_batch(pdf)
    assert list(out.columns) == [
        "doc_id", "media_type", "n_bytes", "checksum", "width", "height"
    ]
    assert out["n_bytes"].tolist() == [3, 5]


def test_approx_distinct_error_bound(spark):
    from sql_data_warehouse_spark.analytics.extended import approx_distinct_users

    row = approx_distinct_users(spark, SF_SMOKE).collect()[0]
    assert row["exact_users"] > 0
    # rsd=0.02 → stay well inside 5× the nominal bound.
    assert row["rel_error"] < 0.10


def test_approx_percentiles_track_exact(spark):
    from sql_data_warehouse_spark.analytics.extended import order_value_percentiles
    from sql_data_warehouse_spark.analytics.incremental import (
        approx_order_value_percentiles,
    )

    exact = {r["priority"]: r for r in order_value_percentiles(spark, SF_SMOKE).collect()}
    approx = {
        r["priority"]: r
        for r in approx_order_value_percentiles(spark, SF_SMOKE).collect()
    }
    assert set(exact) == set(approx)
    for prio, e in exact.items():
        a = approx[prio]
        for q in ("p50", "p90", "p99"):
            assert abs(a[q] - e[q]) / e[q] < 0.05, (prio, q, a[q], e[q])


def test_connected_components_deep_chain(spark):
    # A 30-node path (diameter 29) plus a triangle and two isolates:
    # proves the min-label propagation actually iterates to the fixed
    # point (the registry's real-data clusters are shallow) and that
    # isolated nodes keep their own id.
    from sql_data_warehouse_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(100, 129)]
    tri = [(7, 3), (3, 5), (5, 7)]
    edges = spark.createDataFrame(chain + tri, "src long, dst long")
    nodes = spark.createDataFrame(
        [(i,) for i in range(100, 130)] + [(3,), (5,), (7,), (900,), (901,)],
        "id long",
    )
    out = {
        r["id"]: r["label"]
        for r in connected_components(edges, nodes=nodes).collect()
    }
    assert all(out[i] == 100 for i in range(100, 130))
    assert out[3] == out[5] == out[7] == 3
    assert out[900] == 900 and out[901] == 901


def test_simhash_banding_full_recall(spark):
    # Pigeonhole property: every pair within max_hamming of each other
    # appears in the banded join output — compare against the
    # brute-force all-pairs hamming filter on the same signatures.
    from sql_data_warehouse_spark.operators.dedup import (
        simhash_near_dup_pairs,
        simhash_signatures,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    banded = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    sigs = simhash_signatures(docs).alias("a")
    brute = (
        sigs.join(
            simhash_signatures(docs).alias("b"),
            F.col("a.doc_id") < F.col("b.doc_id"),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )
    expected = {(r["doc_a"], r["doc_b"]) for r in brute.collect()}
    assert banded == expected


def test_banded_fuzzy_equals_naive_blocked(spark):
    """Pass-Join segment blocking must recover every naive
    nation-blocked Levenshtein<=2 pair on the oracle-scale data."""
    from sql_data_warehouse_spark.analytics import all_queries

    reg = all_queries()
    sf = "/root/testdata/sf0.01"
    key = lambda df: sorted(
        map(tuple, df.toPandas().astype(str).values.tolist())
    )
    banded = key(reg["supplier_fuzzy_pairs_banded"].builder(spark, sf))
    naive = key(reg["supplier_fuzzy_pairs"].builder(spark, sf))
    assert banded == naive and len(banded) > 0


def test_minhash_from_sets_identical_to_text_path(spark):
    """The shared-shingle OPH path (minhash_signatures_from_sets,
    used by dedup_pipeline_keep_best) must produce bit-identical
    signatures to the position-explode text path the DuckDB twin
    mirrors — MIN over duplicate shingles == MIN over the distinct
    set."""
    from sql_data_warehouse_spark.operators import dedup

    docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.col("doc_id") < 60
    )
    via_text = {
        r["doc_id"]: tuple(r["signature"])
        for r in dedup.minhash_signatures(docs).collect()
    }
    via_sets = {
        r["doc_id"]: tuple(r["signature"])
        for r in dedup.minhash_signatures_from_sets(
            dedup.shingle_sets(docs)
        ).collect()
    }
    assert via_sets == via_text and len(via_sets) > 0
