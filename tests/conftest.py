import os
import tempfile

import pytest

TEST_WAREHOUSE = tempfile.mkdtemp(prefix="x_spark_warehouse_")


@pytest.fixture(scope="session")
def spark():
    from x_spark.session import get_session

    spark = get_session(
        "x_spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": TEST_WAREHOUSE},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
