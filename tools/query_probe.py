"""Per-query timing probe (guide §1): time named queries with the noop
sink (compute only) and with the bench's collect(), repeated, in one
warmed session — the isolation step before touching any operator.

Usage: python tools/query_probe.py q180_bootstrap_ci[,q111_...] [reps]
Env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.

Prints one JSON line per query:
  {"name": ..., "noop": [s...], "collect": [s...], "rows": n}
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from python_lambda_ecs_container_data_etl_aws_spark.plans import QUERIES  # noqa: E402
from python_lambda_ecs_container_data_etl_aws_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [n.strip() for n in sys.argv[1].split(",") if n.strip()]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown query names: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    spark = get_spark("query-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # JIT-warm each shape on the tiny tier (bench.py discipline)
    for name in names:
        try:
            QUERIES[name](spark, warm_dir).collect()
        except Exception:
            pass
        spark.catalog.clearCache()
    for name in names:
        out = {"name": name, "noop": [], "collect": [], "rows": None}
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"{name} noop")
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out["noop"].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"{name} collect")
            t0 = time.perf_counter()
            rows = QUERIES[name](spark, sf_dir).collect()
            out["collect"].append(round(time.perf_counter() - t0, 3))
            out["rows"] = len(rows)
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
