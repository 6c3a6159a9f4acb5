from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from don_crawler_spark.session import get_spark

    s = get_spark("don-crawler-spark-tests", cpus=8, shuffle_partitions=16)
    yield s
    s.stop()
