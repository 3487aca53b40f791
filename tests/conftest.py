import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_flink_spark.session import get_spark, load_tables, testdata_dir  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", testdata_dir("0.001"))


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mini-flink-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    return load_tables(spark, sf_dir)
