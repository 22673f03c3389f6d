import os
import shutil
import tempfile

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM small


@pytest.fixture(scope="session")
def spark():
    from datasketches_pig_spark.session import get_spark

    s = get_spark("tests", cores=int(os.environ["SPARK_GRAFT_CPUS"]), shuffle_partitions=16)
    yield s
    s.stop()


@pytest.fixture()
def tmp_run_dir():
    d = tempfile.mkdtemp(prefix="dsps_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


SF_DIR = os.environ.get("SPARK_GRAFT_SF_TEST_DIR", "/root/testdata/sf0.001")
