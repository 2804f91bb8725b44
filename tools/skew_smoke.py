"""sf10 skew smokes (round-5 verdict item 4): the synthesized scale
tiers replicate keys UNIFORMLY, so the catalog's four-point scale
series never stresses a skewed key distribution at the 100x tier.
This tool re-runs the two skew postures from the round-3/4 smokes at
sf10 row counts with REAL lineitem keys:

1. **80%-hot-key join** — sf10 lineitem (~60M rows) with 80% of rows
   remapped to ONE orderkey, joined to an orders-shaped key relation.
   Run once under plain AQE (DEFAULT skew thresholds — at this tier
   the hot partition is multi-GB, so the production 256MB threshold
   fires without any local-scale tuning, unlike the pytest smoke) and
   once through functions.skew.salted_join; assert `skew=true`
   appears in the executed plan, and that both paths agree.
2. **80%-hot-domain cap** — the q82 shape (map-side count aggregate +
   WindowGroupLimit-pruned rank filter) over the same 60M rows with
   one domain holding 80%; assert WindowGroupLimit in the plan.

Emits one JSON line; intended to run EXCLUSIVELY (no concurrent Spark
sessions) — same discipline as the scale-tier benches.

    python tools/skew_smoke.py --sf-dir /tmp/sfsynth/sf10
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sfsynth/sf10")
    ap.add_argument("--cap", type=int, default=5)
    args = ap.parse_args()

    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from python_lambda_ecs_container_data_etl_aws_spark.functions.skew import (
        salted_join,
    )
    from python_lambda_ecs_container_data_etl_aws_spark.session import get_spark

    spark = get_spark("skew-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "sf10_skew_smoke", "sf_dir": args.sf_dir}

    li = spark.read.parquet(f"{args.sf_dir}/lineitem.parquet")
    n = li.count()
    out["n_fact_rows"] = n

    # 80% of rows onto ONE key, the rest spread over a 10k-key domain
    # (the salting use-case: hot fact key against a dim too large to
    # broadcast comfortably but small enough that ×buckets replication
    # is cheap). The pad is a 32-char digest so the hot partition's
    # SHUFFLE bytes are realistically wide — an all-zeros bigint pad
    # compresses below the 256MB default skew threshold and
    # understates real row widths.
    n_keys = 10_000
    fact = li.select(
        F.when(F.xxhash64("l_orderkey", "l_linenumber") % 10 < 8, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("l_orderkey"), F.lit(n_keys - 1)) + 1)
        .alias("k"),
        F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber")).alias("pad"),
    )
    dim = spark.range(n_keys).withColumnRenamed("id", "k").withColumn(
        "w", (F.col("k") * 31) % 101
    )

    def agg_of(j):
        return j.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("pad") + F.col("w")).alias("s"),
        )

    # Plain join under AQE with PRODUCTION-default skew thresholds.
    # Both broadcast thresholds off: the session pins an explicit
    # adaptive.autoBroadcastJoinThreshold (round 7), and AQE converting
    # the SMJ to broadcast would hide the skew split under test.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    t0 = time.perf_counter()
    plain = agg_of(fact.join(dim, "k"))
    plain_rows = [tuple(r) for r in plain.collect()]
    out["hot_key_aqe_sec"] = round(time.perf_counter() - t0, 2)
    executed = plain._jdf.queryExecution().executedPlan().toString()
    out["aqe_skew_split_fired"] = "skew=true" in executed

    t0 = time.perf_counter()
    salted = agg_of(salted_join(fact, dim, "k", salt_buckets=32))
    salted_rows = [tuple(r) for r in salted.collect()]
    out["hot_key_salted_sec"] = round(time.perf_counter() - t0, 2)
    out["salted_agrees"] = salted_rows == plain_rows
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    # Hot-domain cap (q82 shape) on the same skewed frame: domain 0
    # holds 80% of 60M rows; the kept set must prune via
    # WindowGroupLimit, the counts via plain aggregate.
    host = li.select(
        F.when(F.xxhash64("l_orderkey", "l_linenumber") % 10 < 8, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("l_partkey"), F.lit(10_000)))
        .alias("domain"),
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("l_partkey").alias("n_chars"),
    )
    counts = host.groupBy("domain").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("domain").orderBy(F.col("n_chars").desc(), "doc_id")
    kept = (
        host.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= args.cap)
        .groupBy("domain")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"))
    )
    capped = counts.join(kept, "domain", "left")
    t0 = time.perf_counter()
    res = capped.agg(
        F.count(F.lit(1)).alias("n_domains"),
        F.max("n_docs").alias("max_domain_rows"),
        F.max("n_kept").alias("max_kept"),
    ).collect()[0]
    out["hot_domain_cap_sec"] = round(time.perf_counter() - t0, 2)
    out["n_domains"] = res.n_domains
    out["max_domain_rows"] = res.max_domain_rows
    out["max_kept"] = res.max_kept
    plan = capped._jdf.queryExecution().explainString(
        capped.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    out["window_group_limit_in_plan"] = "WindowGroupLimit" in plan
    out["cap_respected"] = res.max_kept == args.cap

    out["ok"] = all(
        out[k]
        for k in (
            "aqe_skew_split_fired",
            "salted_agrees",
            "window_group_limit_in_plan",
            "cap_respected",
        )
    )
    print(json.dumps(out))
    # a smoke that records a failure must FAIL: CI/driver invocations
    # check exit status, not JSON booleans
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
