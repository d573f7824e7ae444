import pytest

from data_exchange_hl7_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("dex-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
