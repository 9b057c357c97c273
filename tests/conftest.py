from __future__ import annotations

import pytest

from sdlt_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sdlt_tests", shuffle_partitions=8)
    yield s
