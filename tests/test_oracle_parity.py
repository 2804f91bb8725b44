"""Every declared query must hash-match its DuckDB oracle (t2 stand-in).

Run at sf0.001 by default; set PARITY_SF_DIR=/root/testdata/sf0.01 for
the driver-scale check.
"""

from __future__ import annotations

import pytest

from python_lambda_ecs_container_data_etl_aws_spark.plans import ORACLE, QUERIES
from tests.conftest import SF_DIR
from tests.parity import compare


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    if name not in ORACLE:
        assert df.count() >= 0  # rows-only check for non-SQL-expressible ops
        return
    compare(df, duck, ORACLE[name], name)


def test_every_oracle_has_query():
    assert set(ORACLE) <= set(QUERIES)
