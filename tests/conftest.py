import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rapids_and_rivers_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="rars_tests", master="local[4]", shuffle_partitions=4)
    yield s


def sf_dir(sf: str = "sf0.001") -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", f"/root/testdata/{sf}")
