from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from bucketizers_spark.plans.session import get_spark

    s = get_spark("bucketizers-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
