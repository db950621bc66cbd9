import os

import pytest

from adhesive_spark.session import AdhesiveSession, build_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = build_spark(app_name="adhesive-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sess(spark):
    return AdhesiveSession(spark)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
