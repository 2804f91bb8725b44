"""Benchmark runner: executes the declared query catalog at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from python_lambda_ecs_container_data_etl_aws_spark.plans import QUERIES
from python_lambda_ecs_container_data_etl_aws_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths (scan, join, agg, window) once so
    # per-query times measure the plans, not first-run JIT — q03
    # measured 8.0s cold vs 0.7s steady-state for this reason.
    QUERIES["q01_ingest_count"](spark, sf_dir).collect()
    QUERIES["q04_recency_window"](spark, sf_dir).collect()
    QUERIES["q11_latest_version_dedup"](spark, sf_dir).collect()
    # Also warm the two engine paths the above never touch: interpreted
    # higher-order functions (shingle/signature folds) and the Python
    # worker pool (mapInPandas) — synthetic micro-jobs, not catalog
    # queries, so nothing measured gets a silent second run.
    spark.range(1000).selectExpr(
        "aggregate(transform(sequence(0, 50), i -> concat('t', i)),"
        " cast(0 as bigint), (a, v) -> a + length(v))"
    ).collect()
    spark.range(1000).toDF("v").mapInPandas(
        lambda it: it, schema="v bigint"
    ).collect()

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        # collect() uniformly: count() would let Catalyst prune unused
        # projection columns and under-measure wide queries
        _ = len(df.collect())
        timings[name] = round(time.perf_counter() - t0, 3)
        # operators persist intermediates (shingles, signatures, ranged
        # partitions) whose lifetime is the consuming action — drop them
        # so 39 queries in one session don't accumulate cached blocks
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
