"""Compute-only heavy-tail scale probe (round-8 verdict item 2).

The bench contract collect()s every result, so wide-output queries pay
a driver-transfer + result-GC cost a cluster sink never would — at
sf30 that artifact DOMINATES the heavy tail (q100's 60M-row history
even trips spark.driver.maxResultSize, and collect-inclusive sf10→sf30
exponents read α≈1.5-1.9 for fact-sized outputs). This probe times the
same queries into a noop sink — full computation, every shuffle, zero
driver transfer — at two scale tiers and prints per-query exponents
α = log(t_hi/t_lo) / log(sf_hi/sf_lo), the quantity that actually
predicts 1000-executor behavior.

    python tools/compute_scale_probe.py \
        --lo /tmp/sfsynth/sf10 --hi /tmp/sfsynth/sf30 \
        --queries q100_scd2_history,q34_sessionize --runs 2

Prints one JSON line last (artifact-ready).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_lambda_ecs_container_data_etl_aws_spark.plans import QUERIES
from python_lambda_ecs_container_data_etl_aws_spark.session import get_spark


def _sf_of(path: str) -> float:
    return float(path.rstrip("/").rsplit("sf", 1)[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", default="/tmp/sfsynth/sf10")
    ap.add_argument("--hi", default="/tmp/sfsynth/sf30")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"not in catalog: {unknown}")

    spark = get_spark("compute-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def compute_sec(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        elapsed = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        return elapsed

    # JIT warm every shape on the tiny tier first (same rationale as
    # bench.py: C2 compilation lands nondeterministically otherwise)
    for name in names:
        try:
            compute_sec(name, args.warm_dir)
        except Exception as exc:
            print(
                f"[probe] WARM FAILED for {name}: {exc!r} — first "
                f"measured run will include C2 compilation",
                file=sys.stderr,
                flush=True,
            )

    lo_sf, hi_sf = _sf_of(args.lo), _sf_of(args.hi)
    out = {"lo": args.lo, "hi": args.hi, "runs": args.runs, "queries": {}}
    for name in names:
        print(f"[probe] {name}", file=sys.stderr, flush=True)
        t_lo = min(compute_sec(name, args.lo) for _ in range(args.runs))
        t_hi = min(compute_sec(name, args.hi) for _ in range(args.runs))
        # elapsed is rounded to ms; clamp so a sub-ms tier run can't
        # ZeroDivisionError away the whole probe after expensive runs
        alpha = round(
            math.log(max(t_hi, 1e-3) / max(t_lo, 1e-3))
            / math.log(hi_sf / lo_sf),
            3,
        )
        out["queries"][name] = {
            "compute_lo_sec": t_lo,
            "compute_hi_sec": t_hi,
            "alpha": alpha,
        }
        print(f"[probe] {name} lo={t_lo}s hi={t_hi}s alpha={alpha}",
              file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
