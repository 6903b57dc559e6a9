import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conduino_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("conduino_spark_tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(autouse=True)
def _drain_cachereg():
    """Drain the pipeline cache registry between tests: a test that
    aborts mid-pipeline (e.g. an analysis error) leaves tracked persists
    behind, which skews registry-count assertions in LATER tests (the
    r4 cascade: NTZ aborts made two unrelated cachereg tests fail that
    pass in isolation).  Draining after every test makes the suite
    robust to any future mid-test abort."""
    from conduino_spark.plans.cachereg import release_caches
    yield
    release_caches()


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
