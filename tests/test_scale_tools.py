"""Skew helpers, idempotent partition overwrite, completion tracking,
and the end-to-end ingest pipeline."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from python_lambda_ecs_container_data_etl_aws_spark.catalog import load_table
from python_lambda_ecs_container_data_etl_aws_spark.functions.skew import (
    salted_count_sum,
    salted_join,
)
from python_lambda_ecs_container_data_etl_aws_spark.sources import registry
from python_lambda_ecs_container_data_etl_aws_spark.sources.idempotent import (
    write_partitioned_idempotent,
)
from python_lambda_ecs_container_data_etl_aws_spark.sources.pipeline import ingest_file
from python_lambda_ecs_container_data_etl_aws_spark.streaming.completion import (
    CompletionTracker,
    with_source_file,
)
from tests.conftest import SF_DIR

HEADER = ",".join(registry.PRICEINDEX.canonical_columns)


def _row(dguid: str, value: str) -> str:
    return f"2023-01-01,Canada,{dguid},food,u,1,f,2,v,c,{value},ok,,n,1"


def test_salted_count_sum_equals_unsalted(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    salted = {
        (r.l_returnflag, r.l_linestatus): (r.n_rows, r.sum_l_extendedprice)
        for r in salted_count_sum(li, ["l_returnflag", "l_linestatus"], "l_extendedprice").collect()
    }
    plain = {
        (r.l_returnflag, r.l_linestatus): (r.n, r.s)
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(38,2)")).cast("double").alias("s"),
        )
        .collect()
    }
    assert salted == plain


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    sup = load_table(spark, SF_DIR, "supplier").select("s_suppkey", "s_name")
    plain = li.join(sup, li.l_suppkey == sup.s_suppkey).count()
    salted = salted_join(
        li.withColumnRenamed("l_suppkey", "k"),
        sup.withColumnRenamed("s_suppkey", "k"),
        "k",
    ).count()
    assert salted == plain


def test_idempotent_partition_overwrite(spark, tmp_path):
    path = str(tmp_path / "tbl")
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "y", F.year("o_orderdate")
    )
    d95 = orders.filter(F.col("y") == 1995)
    d96 = orders.filter(F.col("y") == 1996)
    write_partitioned_idempotent(d95, path, ["y"])
    write_partitioned_idempotent(d96, path, ["y"])
    n = spark.read.parquet(path).count()
    assert n == d95.count() + d96.count()
    # re-run 1995: replaces that partition, no duplication, 1996 intact
    write_partitioned_idempotent(d95, path, ["y"])
    assert spark.read.parquet(path).count() == n


def test_completion_tracker_fires_once(spark, tmp_path):
    fired = []
    land = tmp_path / "land"
    land.mkdir()
    for name in ["a.csv", "b.csv"]:
        (land / name).write_text("k\n1\n2\n")
    df = with_source_file(spark.read.option("header", True).csv(str(land)))
    tracker = CompletionTracker({"a.csv", "b.csv"}, lambda s: fired.append(s))
    # simulate two micro-batches: first sees only a.csv, then everything
    tracker(df.filter(F.col("source_file") == "a.csv"), 0)
    assert not tracker.fired and tracker.remaining() == {"b.csv"}
    tracker(df, 1)
    assert tracker.fired and fired == [{"a.csv", "b.csv"}]
    tracker(df, 2)  # already complete: must not re-fire
    assert len(fired) == 1


def test_ingest_pipeline_end_to_end(spark, tmp_path):
    land = tmp_path / "landing"
    land.mkdir()
    wh = str(tmp_path / "wh")
    backup = str(tmp_path / "backup")
    day1 = land / "PriceIndex_day1.csv"
    day1.write_text("\n".join([HEADER] + [_row(f"D{i}", f"{100+i}.5") for i in range(10)]) + "\n")
    rep1 = ingest_file(spark, str(day1), wh, backup_dir=backup, keys=["DGUID"])
    assert (rep1.status, rep1.route, rep1.loaded_rows) == ("ok", "priceindex", 10)
    assert not day1.exists()  # archived

    day2 = land / "price_day2.csv"
    day2.write_text("\n".join([HEADER, _row("D3", "999.9"), _row("D99", "1.0")]) + "\n")
    rep2 = ingest_file(spark, str(day2), wh, keys=["DGUID"])
    assert rep2.status == "ok" and rep2.loaded_rows == 11  # 1 update + 1 insert
    final = {r.DGUID: r.VALUE for r in spark.read.parquet(os.path.join(wh, "priceindex")).collect()}
    assert final["D3"] == "999.9" and final["D99"] == "1.0" and final["D5"] == "105.5"

    unknown = land / "mystery.csv"
    unknown.write_text("a,b\n1,2\n")
    rep3 = ingest_file(spark, str(unknown), wh)
    assert rep3.status == "skipped" and rep3.route == registry.ROUTE_QUARANTINE
