import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF001_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from chroma_rs_spark.session import get_spark

    spark = get_spark(app_name="chroma_rs_spark_tests", master="local[8]",
                      shuffle_partitions=8)
    yield spark


@pytest.fixture()
def engine(spark, tmp_path):
    from chroma_rs_spark.catalog import Engine

    return Engine(spark, str(tmp_path / "warehouse"), allow_reset=True)
