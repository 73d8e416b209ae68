from __future__ import annotations

import pytest

from lakeflow import get_spark


@pytest.fixture(scope="session")
def spark():
    return get_spark("lakeflow-tests", shuffle_partitions=8)
