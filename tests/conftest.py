from __future__ import annotations

import tempfile

import pytest

from aiports_data_warehouse_etl_spark.session import get_spark

REFERENCE = "/root/reference"
TESTDATA = "/root/testdata"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.memory": "4g",
            # keep managed tables (bucketing tests) out of the repo dir
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-wh-"),
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_small():
    return f"{TESTDATA}/sf0.001"


@pytest.fixture(scope="session")
def sf_oracle():
    return f"{TESTDATA}/sf0.01"
