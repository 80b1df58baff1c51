import pytest

from institutional_fx_etl_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s
    s.stop()
