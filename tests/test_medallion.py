"""Medallion-pipeline invariants (reference tests/quality_check_*.sql
"expect: no rows" contract) + cleansing-rule unit checks over the
reference's dirty CSVs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_data_warehouse_spark.medallion.gold import (
    gold_dim_customers,
    gold_dim_products,
    gold_fact_sales,
)
from sql_data_warehouse_spark.medallion.quality import wh_qc_domains, wh_qc_silver

# Checks the cleansing rules must drive to zero. az12_bdate_out_of_range
# stays >0 by design: the reference repairs *future* birthdates only
# (proc_load_silver.sql:176-178); pre-1925 dirt flows through.
ZERO_CHECKS = {
    "cust_pk_dup_or_null",
    "cust_unwanted_spaces",
    "prd_pk_dup_or_null",
    "prd_nm_spaces",
    "prd_cost_null_or_negative",
    "sales_bad_date_order",
    "sales_inconsistent",
    "az12_cid_dup_or_null",
    "loc_cid_dup_or_null",
    "px_cat_unwanted_spaces",
}

EXPECTED_DOMAINS = {
    "cst_gndr": {"Female", "Male", "N/A"},
    "cst_marital_status": {"Married", "Single", "N/A"},
    "prd_line": {"Mountain", "Road", "Other Sales", "Touring", "N/A"},
    "gen": {"Female", "Male", "N/A"},
}


def test_qc_silver_zero_checks(spark):
    report = {r["check_name"]: r["n_bad"] for r in wh_qc_silver(spark, "").collect()}
    bad = {k: v for k, v in report.items() if k in ZERO_CHECKS and v != 0}
    assert not bad, f"silver quality violations: {bad}"


def test_qc_domains(spark):
    rows = wh_qc_domains(spark, "").collect()
    domains: dict[str, set] = {}
    for r in rows:
        domains.setdefault(r["field"], set()).add(r["value"])
    for field, allowed in EXPECTED_DOMAINS.items():
        assert domains[field] <= allowed, (field, domains[field] - allowed)
    # Country codes are decoded; raw codes and blanks must be gone.
    assert not ({"DE", "US", "USA", ""} & domains["cntry"])


@pytest.fixture(scope="module")
def gold(spark):
    return {
        "dim_customers": gold_dim_customers(spark).cache(),
        "dim_products": gold_dim_products(spark).cache(),
        "fact_sales": gold_fact_sales(spark).cache(),
    }


def test_gold_surrogate_keys_unique(gold):
    for name in ("dim_customers", "dim_products"):
        key = "customer_key" if name == "dim_customers" else "product_key"
        df = gold[name]
        assert df.groupBy(key).count().filter(F.col("count") > 1).isEmpty(), name


def test_gold_fact_referential_integrity(gold):
    # quality_check_gold.sql:37-45 — every fact row resolves both dims.
    fact = gold["fact_sales"]
    assert fact.filter(F.col("customer_key").isNull()).isEmpty()
    assert fact.filter(F.col("product_key").isNull()).isEmpty()


def test_gold_row_counts(gold):
    # Reference data: 18,484 unique customers, 295 current products,
    # 60,398 sales rows (datasets/*.csv minus headers, post-dedup).
    assert gold["dim_customers"].count() == 18484
    assert gold["fact_sales"].count() == 60398
    n_prod = gold["dim_products"].count()
    assert 0 < n_prod <= 397


def test_load_all_materializes_warehouse(spark, tmp_path):
    from sql_data_warehouse_spark.medallion.load import load_all

    counts = load_all(spark, str(tmp_path / "wh"), materialize_gold=True)
    assert counts["bronze"]["crm_sales_details"] == 60398
    assert counts["silver"]["crm_cust_info"] == 18484
    assert counts["gold"]["fact_sales"] == 60398
    # Gold views land in the catalog; ad-hoc SQL works like the
    # reference's gold.* names, and materialized == virtual results.
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM wh_gold_dim_customers WHERE country = 'Germany'"
    ).collect()[0]["n"]
    virtual = (
        gold_dim_customers(spark).filter(F.col("country") == "Germany").count()
    )
    assert n == virtual
