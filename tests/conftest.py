import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
# Python workers must import addressit_spark too.
os.environ["PYTHONPATH"] = REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


@pytest.fixture(scope="session")
def spark():
    from addressit_spark.session import get_spark

    s = get_spark(master="local[8]", app_name="addressit_spark_tests", shuffle_partitions=16)
    yield s
    s.stop()
