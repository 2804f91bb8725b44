"""Standalone q26 (SimHash near-dup) scale probe — round-8 verdict
item 7. q26 is the heaviest per-byte near-dup family at sf10 (61 s
in-catalog, round 7). This probe answers, on one exclusive session:

1. steady-state cost: min-of-N timed runs of the full q26 plan
   (in-catalog numbers carry the documented ~2x context noise);
2. WHERE the time goes: signature build alone vs candidate join vs
   the full verify+distinct pipeline;
3. WHY: the (band, bucket) occupancy histogram and the implied raw
   candidate-pair volume sum(sz*(sz-1)/2) — the quantity a q25-style
   ``max_bucket_size`` cap would cut. A cap is only admissible here
   if the hot buckets are degenerate boilerplate; q26's oracle is the
   EXACT all-pairs Hamming filter, so any candidate dropped by a cap
   is a wrong answer unless it re-pairs through another band.

    python tools/q26_probe.py --sf-dir /tmp/sfsynth/sf10 --runs 3

Prints a JSON summary line last.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from python_lambda_ecs_container_data_etl_aws_spark.catalog import load_table
from python_lambda_ecs_container_data_etl_aws_spark.operators import dedup
from python_lambda_ecs_container_data_etl_aws_spark.plans import QUERIES
from python_lambda_ecs_container_data_etl_aws_spark.session import get_spark


def _banded(sig, num_bands: int):
    """Mirror simhash_pairs' banding (widths spread over 60 bits)."""
    base, extra = divmod(dedup.SIMHASH_BITS, num_bands)
    widths = [base + (1 if i < extra else 0) for i in range(num_bands)]
    offsets = [sum(widths[:i]) for i in range(num_bands)]
    bands = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned(F.col("simhash"), offsets[i])
            .bitwiseAND(F.lit((1 << widths[i]) - 1))
            .alias("bucket"),
        )
        for i in range(num_bands)
    ]
    return sig.select(F.explode(F.array(*bands)).alias("bb")).select(
        "bb.band", "bb.bucket"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sfsynth/sf10")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--max-distance", type=int, default=6)
    args = ap.parse_args()

    spark = get_spark("q26-probe")
    spark.sparkContext.setLogLevel("ERROR")
    num_bands = args.max_distance + 1

    # --- steady-state full-plan timings (first run doubles as JIT warm)
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        n_pairs = len(QUERIES["q26_simhash_neardup"](spark, args.sf_dir).collect())
        times.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()

    docs = load_table(spark, args.sf_dir, "documents")

    # --- stage split: signature build alone (noop sink = no transfer)
    t0 = time.perf_counter()
    dedup.simhash_signatures(docs).write.format("noop").mode("overwrite").save()
    t_sig = round(time.perf_counter() - t0, 3)

    # --- candidate volume + bucket histogram (aggregates only — the
    # raw pair multiset is never materialized)
    sig = dedup.simhash_signatures(docs).persist()
    n_docs = sig.count()
    occ = (
        _banded(sig, num_bands)
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("sz"))
        .persist()
    )
    hist = (
        occ.select(
            F.floor(F.log2("sz")).cast("int").alias("log2_sz"),
            F.col("sz"),
        )
        .groupBy("log2_sz")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(F.expr("sz * (sz - 1) / 2")).cast("bigint").alias("pairs"),
        )
        .orderBy("log2_sz")
        .collect()
    )
    top = (
        occ.orderBy(F.desc("sz")).limit(10).collect()
    )
    raw_pairs = sum(r["pairs"] for r in hist)
    occ.unpersist()
    sig.unpersist()

    payload = {
        "sf_dir": args.sf_dir,
        "n_docs": n_docs,
        "runs_sec": times,
        "steady_sec": min(times),
        "t_signature_noop_sec": t_sig,
        "n_result_pairs": n_pairs,
        "raw_candidate_pairs": int(raw_pairs),
        "bucket_hist": [
            {"log2_sz": r["log2_sz"], "n_buckets": r["n_buckets"], "pairs": int(r["pairs"])}
            for r in hist
        ],
        "top_buckets": [
            {"band": r["band"], "bucket": r["bucket"], "sz": r["sz"]} for r in top
        ],
    }
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
