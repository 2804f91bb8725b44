"""q193 vs q26 candidate-density probe (round-9 verdict item 2).

Round 8 measured q26's 60-bit/7-band raw band-bucket candidates
growing quadratically (3.0B at sf10 → 23.8B at sf30) because the
pigeonhole-minimum 7 bands cap widths at {9,8} bits ⇒ ≤2^9
buckets/band. q193's 120-bit signature gives the SAME 7 bands w ≥ 17
⇒ ≥131k buckets/band. This probe measures both geometries' bucket
occupancy on the same corpus — aggregates only, the raw pair multiset
is never materialized — plus full-plan wall for both queries, to
certify the promised ~2^8 (~250×) density cut at scale tiers.

    python tools/q193_density_probe.py --sf-dir /tmp/sfsynth/sf10

Prints one JSON line last (artifact-ready).
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


def _occupancy(banded):
    """(raw_pairs, histogram rows, top buckets) from a (band, bucket)
    relation — sum of sz*(sz-1)/2 is the raw candidate volume the
    banded self-join would generate."""
    occ = banded.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("sz")
    ).persist()
    hist = (
        occ.select(F.floor(F.log2("sz")).cast("int").alias("log2_sz"), "sz")
        .groupBy("log2_sz")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(F.expr("sz * (sz - 1) / 2")).cast("bigint").alias("pairs"),
        )
        .orderBy("log2_sz")
        .collect()
    )
    top = occ.orderBy(F.desc("sz")).limit(5).collect()
    occ.unpersist()
    raw = int(sum(r["pairs"] for r in hist))
    return (
        raw,
        [
            {
                "log2_sz": r["log2_sz"],
                "n_buckets": r["n_buckets"],
                "pairs": int(r["pairs"]),
            }
            for r in hist
        ],
        [{"band": r["band"], "sz": r["sz"]} for r in top],
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sfsynth/sf10")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--num-bands", type=int, default=7)
    ap.add_argument(
        "--skip-narrow-wall",
        action="store_true",
        help="skip timing the full q26 plan (slow at big tiers)",
    )
    args = ap.parse_args()

    spark = get_spark("q193-density-probe")
    spark.sparkContext.setLogLevel("ERROR")
    nb = args.num_bands
    docs = load_table(spark, args.sf_dir, "documents")
    out: dict = {"sf_dir": args.sf_dir, "num_bands": nb}

    # --- 60-bit geometry occupancy
    sig = dedup.simhash_signatures(docs).persist()
    out["n_docs"] = sig.count()
    base, extra = divmod(dedup.SIMHASH_BITS, nb)
    widths = [base + (1 if i < extra else 0) for i in range(nb)]
    offsets = [sum(widths[:i]) for i in range(nb)]
    narrow = sig.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), offsets[i])
                        .bitwiseAND(F.lit((1 << widths[i]) - 1))
                        .alias("bucket"),
                    )
                    for i in range(nb)
                ]
            )
        ).alias("bb")
    ).select("bb.band", "bb.bucket")
    raw_n, hist_n, top_n = _occupancy(narrow)
    sig.unpersist()
    out["narrow"] = {
        "bits": dedup.SIMHASH_BITS,
        "min_band_width": min(widths),
        "raw_candidate_pairs": raw_n,
        "bucket_hist": hist_n,
        "top_buckets": top_n,
    }

    # --- 120-bit geometry occupancy
    wsig = dedup.simhash_wide_signatures(docs).persist()
    wsig.count()
    wb, wextra = divmod(dedup.SIMHASH_WIDE_BITS, nb)
    wwidths = [wb + (1 if i < wextra else 0) for i in range(nb)]
    woffsets = [sum(wwidths[:i]) for i in range(nb)]
    wide = wsig.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        dedup._wide_bucket(woffsets[i], wwidths[i]).alias(
                            "bucket"
                        ),
                    )
                    for i in range(nb)
                ]
            )
        ).alias("bb")
    ).select("bb.band", "bb.bucket")
    raw_w, hist_w, top_w = _occupancy(wide)
    wsig.unpersist()
    out["wide"] = {
        "bits": dedup.SIMHASH_WIDE_BITS,
        "min_band_width": min(wwidths),
        "raw_candidate_pairs": raw_w,
        "bucket_hist": hist_w,
        "top_buckets": top_w,
    }
    out["density_cut"] = round(raw_n / max(raw_w, 1), 1)

    # --- full-plan walls (noop sink: engine compute, no collect)
    def wall(qname: str) -> float:
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            QUERIES[qname](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        return best

    out["q193_wall_sec"] = wall("q193_simhash_wide_neardup")
    if not args.skip_narrow_wall:
        out["q26_wall_sec"] = wall("q26_simhash_neardup")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
