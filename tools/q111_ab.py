"""q111 sf30 mitigation A/B: AQE initialPartitionNum × verify nver.

The round-9 attribution (tools/q111_probe.py + tools/spill_probe.py)
shows every q111 intermediate scales exactly linearly while the wall
goes α≈1.5 on the fixed box, split between (a) sort/agg spill in the
window + candidate-agg stages (32 shuffle partitions regardless of
tier) and (b) allocation contention in the array-carrying verify
exchange. Both have partition-count levers; this tool measures them.

    python tools/q111_ab.py --sf-dir /tmp/sfsynth/sf30 --runs 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_lambda_ecs_container_data_etl_aws_spark.plans import QUERIES
from python_lambda_ecs_container_data_etl_aws_spark.session import get_spark

_IPN = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sfsynth/sf30")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--query", default="q111_setsim_prefix_join")
    args = ap.parse_args()

    spark = get_spark("q111-ab")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    # warm JIT on the tiny tier
    QUERIES[args.query](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    spark.catalog.clearCache()

    configs = [
        ("baseline", None, None),
        ("ipn8x", cores * 8, None),
        ("ipn8x+nver32x", cores * 8, cores * 32),
        ("nver32x", None, cores * 32),
    ]
    out = {"sf_dir": args.sf_dir, "cores": cores, "results": {}}
    base_ipn = spark.conf.get(_IPN, None)
    for label, ipn, nver in configs:
        if ipn is None:
            spark.conf.unset(_IPN)
        else:
            spark.conf.set(_IPN, str(ipn))
        if nver is None:
            os.environ.pop("SPARK_GRAFT_SETSIM_VERIFY_PARTITIONS", None)
        else:
            os.environ["SPARK_GRAFT_SETSIM_VERIFY_PARTITIONS"] = str(nver)
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            QUERIES[args.query](spark, args.sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out["results"][label] = {"runs": times, "best": min(times)}
        print(f"[ab] {label}: {times}", file=sys.stderr, flush=True)
    if base_ipn is not None:
        spark.conf.set(_IPN, base_ipn)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
