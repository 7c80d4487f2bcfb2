import pytest

from dlkp_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dlkp_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
