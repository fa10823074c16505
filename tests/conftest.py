import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datax_spark.config import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="datax-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.default.parallelism": "4",
            # A long-lived suite session runs hundreds of queries in one
            # JVM; Spark's stream-execution threads have been seen dying
            # with StackOverflowError near the end of the full suite
            # (deep Catalyst recursion on accumulated session state),
            # which kills a micro-batch mid-log and flakes the restart
            # test. Wider thread stacks at JVM launch close it.
            "spark.driver.extraJavaOptions": "-Xss16m",
        },
    )
    yield s
    s.stop()


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
