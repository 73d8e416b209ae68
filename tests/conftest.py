from __future__ import annotations

import os

import pytest

from lakeflow import get_spark

# pytest.ini pins --basetemp=.tmp/pytest (keeps Spark scratch out of /tmp),
# but pytest does not create the parent dir — on a fresh clone every
# Spark-fixture test would error with FileNotFoundError without this.
os.makedirs(
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".tmp", "pytest"),
    exist_ok=True,
)


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    return get_spark(
        "lakeflow-tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": str(warehouse)},
    )
