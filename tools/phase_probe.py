"""Build-vs-action phase probe (guide §1): split a query's wall time
into DataFrame CONSTRUCTION (which for operator-eager paths — q111's
stats aggregate, q35's IVF fit, q158's support collect — runs real
Spark jobs) and the consuming action. The split tells you whether to
attack build-time sub-jobs or the main plan.

Usage: python tools/phase_probe.py q111_setsim_prefix_join[,q35_...] [reps]
Env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.

Prints one JSON line per query:
  {"name": ..., "build": [s...], "action": [s...], "rows": n}
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown query names: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    spark = get_spark("phase-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:  # JIT-warm each shape on the tiny tier
        try:
            QUERIES[name](spark, warm_dir).collect()
        except Exception:
            pass
        spark.catalog.clearCache()
    for name in names:
        out = {"name": name, "build": [], "action": [], "rows": None}
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"{name} build")
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            out["build"].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(f"{name} action")
            t1 = time.perf_counter()
            rows = df.collect()
            out["action"].append(round(time.perf_counter() - t1, 3))
            out["rows"] = len(rows)
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
