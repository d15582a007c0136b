import pytest


@pytest.fixture(scope="session")
def spark():
    from nimbus_crawler_spark.session import build_session

    s = build_session(app_name="nimbus-tests", master="local[8]", shuffle_partitions=4)
    yield s
    s.stop()
