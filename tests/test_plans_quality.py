"""Physical-plan regression tests: the scale posture is asserted, not
hoped for. If a refactor turns a broadcast join into a sort-merge join
or un-pushes a filter, these fail."""

from __future__ import annotations

import re

from python_lambda_ecs_container_data_etl_aws_spark.plans import QUERIES
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q05_dims_broadcast_and_filters_pushed(spark):
    plan = _plan(spark, "q05_report_aggregate")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, part at minimum
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "EqualTo(n_name,NATION_3)" in pushed  # dim filter reaches the scan


def test_q05_lineitem_scan_prunes_columns(spark):
    plan = _plan(spark, "q05_report_aggregate")
    schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
    li = [s for s in schemas if "l_orderkey" in s]
    assert li and all("l_comment" not in s and "l_shipdate" not in s for s in li)
    # only the 3 needed lineitem columns are read
    assert any(s.count(":") == 3 for s in li), li


def test_q07_wide_join_all_dims_broadcast(spark):
    plan = _plan(spark, "q07_report_table_build")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 5


def test_q02_projection_reaches_scan(spark):
    plan = _plan(spark, "q02_canonical_projection")
    schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
    assert schemas and all("l_comment" not in s for s in schemas)


def test_q13_uses_semi_anti_joins_not_except(spark):
    plan = _plan(spark, "q13_snapshot_reconcile")
    assert "LeftSemi" in plan and "LeftAnti" in plan
