import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # fast test startup


@pytest.fixture(scope="session")
def spark():
    from geobuf_cpp_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=8)
    yield s
    s.stop()
