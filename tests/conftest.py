import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pudl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR",
                               "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pudl_spark_tests", extra_conf={
        "spark.sql.shuffle.partitions": "8",
        "spark.driver.memory": "6g",
    })
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from pudl_spark.catalog import load_tables

    return load_tables(spark, sf_dir)

