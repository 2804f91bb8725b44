"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q05 report-aggregate) on /root/testdata/sf0.001."""
    from python_lambda_ecs_container_data_etl_aws_spark.plans import QUERIES
    from python_lambda_ecs_container_data_etl_aws_spark.session import configure

    configure(spark)
    return QUERIES["q05_report_aggregate"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from python_lambda_ecs_container_data_etl_aws_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (same column names)."""
    from python_lambda_ecs_container_data_etl_aws_spark.plans import ORACLE

    return dict(ORACLE)
