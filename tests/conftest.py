from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_lambda_ecs_container_data_etl_aws_spark.session import get_spark

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    cpus = int(os.environ.get("SPARK_TEST_CPUS", "4"))
    s = get_spark("tests", cpus=cpus)
    yield s


@pytest.fixture(scope="session")
def duck():
    from tests.parity import duck_connect

    con = duck_connect(SF_DIR)
    yield con
    con.close()
