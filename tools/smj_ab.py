"""Catalog-wide A/B of spark.sql.join.preferSortMergeJoin (guide §3.1):
run every declared query twice per rep — once with the session default
(SMJ preferred, the round-11 posture) and once with shuffled-hash
allowed — interleaved back-to-back so container drift hits both arms,
best-of-N per arm. Prints one JSON line with per-query (smj, shj)
seconds and the arm totals.

Usage: python tools/smj_ab.py [reps] [only,names]
Env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
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

_CONF = "spark.sql.join.preferSortMergeJoin"


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    names = (
        [n.strip() for n in sys.argv[2].split(",") if n.strip()]
        if len(sys.argv) > 2
        else sorted(QUERIES)
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    spark = get_spark("smj-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:  # JIT-warm both shapes on the tiny tier
        for v in ("true", "false"):
            spark.conf.set(_CONF, v)
            try:
                QUERIES[name](spark, warm_dir).collect()
            except Exception:
                pass
            spark.catalog.clearCache()
    spark.conf.set(_CONF, "true")
    out: dict[str, dict[str, float]] = {n: {"smj": 9e9, "shj": 9e9} for n in names}
    errs: dict[str, str] = {}
    for rep in range(reps):
        # alternate arm order between reps so neither arm always runs
        # into a colder cache/window
        arms = [("smj", "true"), ("shj", "false")]
        if rep % 2:
            arms.reverse()
        for name in names:
            for tag, v in arms:
                spark.conf.set(_CONF, v)
                t0 = time.perf_counter()
                try:
                    QUERIES[name](spark, sf_dir).collect()
                    out[name][tag] = min(
                        out[name][tag], round(time.perf_counter() - t0, 3)
                    )
                except Exception as exc:
                    errs[name] = f"{tag}: {type(exc).__name__}"
                spark.catalog.clearCache()
    spark.conf.set(_CONF, "true")
    tot = {
        tag: round(sum(v[tag] for v in out.values()), 3)
        for tag in ("smj", "shj")
    }
    payload = {"reps": reps, "totals": tot, "per_query": out, "errors": errs}
    with open(os.path.join(_HERE, "BENCH_SMJ_AB_r12.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({"totals": tot, "n": len(names), "errors": errs}))
    spark.stop()


if __name__ == "__main__":
    main()
