import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF001_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from chroma_rs_spark.session import get_spark

    wh = str(tmp_path_factory.mktemp("spark-warehouse"))
    spark = get_spark(
        app_name="chroma_rs_spark_tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield spark


@pytest.fixture()
def engine(spark, tmp_path):
    from chroma_rs_spark.catalog import Engine

    return Engine(spark, str(tmp_path / "warehouse"), allow_reset=True)
