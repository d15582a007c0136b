import pytest


@pytest.fixture(scope="session")
def spark():
    from nimbus_crawler_spark.session import build_session

    s = build_session(app_name="nimbus-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
