import os
import shutil
import tempfile

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small & fast for unit tests
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from meerschaum_spark.session import get_spark
    spark = get_spark("meerschaum_spark_tests")
    yield spark
    spark.stop()


@pytest.fixture()
def instance_dir():
    d = tempfile.mkdtemp(prefix="mrsm_spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
