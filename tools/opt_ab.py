"""Interleaved old-code-vs-new-code A/B over named queries — the only
wall measurement this container supports (BASELINE.md drift notes:
identical-code full-catalog walls swing ±15% between consecutive runs,
so old and new must run back-to-back inside one session/window).

Loads the SAME package from two checkouts by sys.path swapping, warms
both shapes at sf0.001, then runs old/new back-to-back per query with
the arm order alternating between reps; reports best-of-N per arm and
whether collected rows are identical.

Usage: python tools/opt_ab.py <old_checkout> <names,comma> [reps] [tag]
Env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
Writes BENCH_OPT_AB_r12_<tag>.json beside this repo's root.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def _load(path: str) -> dict:
    sys.path.insert(0, path)
    for m in list(sys.modules):
        if m.startswith("python_lambda_ecs_container_data_etl_aws_spark"):
            del sys.modules[m]
    from python_lambda_ecs_container_data_etl_aws_spark.plans import QUERIES

    sys.path.pop(0)
    return dict(QUERIES)


def main() -> None:
    old_path = sys.argv[1]
    names = [n.strip() for n in sys.argv[2].split(",") if n.strip()]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    tag = sys.argv[4] if len(sys.argv) > 4 else "winA"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")

    from python_lambda_ecs_container_data_etl_aws_spark.session import get_spark

    spark = get_spark("opt-ab")
    spark.sparkContext.setLogLevel("ERROR")
    old_q, new_q = _load(old_path), _load(_HERE)
    for qs in (old_q, new_q):
        for n in names:
            try:
                qs[n](spark, warm_dir).collect()
            except Exception:
                pass
            spark.catalog.clearCache()
    res = {n: {"old": 9e9, "new": 9e9} for n in names}
    ident: dict[str, bool] = {}
    for rep in range(reps):
        arms = [("old", old_q), ("new", new_q)]
        if rep % 2:
            arms.reverse()
        for n in names:
            vals = {}
            for arm_tag, qs in arms:
                t0 = time.perf_counter()
                vals[arm_tag] = [tuple(r) for r in qs[n](spark, sf_dir).collect()]
                res[n][arm_tag] = min(
                    res[n][arm_tag], round(time.perf_counter() - t0, 3)
                )
                spark.catalog.clearCache()
            ident[n] = ident.get(n, True) and (vals["old"] == vals["new"])
    payload = {
        "window": tag,
        "reps": reps,
        "sf_dir": sf_dir,
        "old_checkout": old_path,
        "per_query": {
            n: {**res[n], "rows_identical": ident[n]} for n in names
        },
        "totals": {
            "old": round(sum(v["old"] for v in res.values()), 3),
            "new": round(sum(v["new"] for v in res.values()), 3),
        },
    }
    out = os.path.join(_HERE, f"BENCH_OPT_AB_r12_{tag}.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload["totals"]), "->", out)
    spark.stop()


if __name__ == "__main__":
    main()
