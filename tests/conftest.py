from __future__ import annotations

import shutil
import tempfile

import pytest

from sql_data_warehouse_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    wh = tempfile.mkdtemp(prefix="spark-warehouse-")
    spark = get_spark("tests", master="local[4]",
                      **{"spark.sql.shuffle.partitions": "8",
                         "spark.ui.enabled": "false",
                         "spark.sql.warehouse.dir": wh})
    yield spark
    shutil.rmtree(wh, ignore_errors=True)
