import pytest

from crawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # tiny fixtures: AQE's per-stage re-planning only adds driver latency here
    s = get_spark(
        app="crawler-spark-tests",
        cpus=8,
        shuffle_partitions=4,
        extra={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.warehouse.dir": "/tmp/crawler-spark-test-warehouse",
        },
    )
    yield s
